package graft

import org.apache.spark.sql.SparkSession

/** Shared helpers for the randomized property suites.
  *
  * `withExecutedMode` exists because of a review finding that made the
  * naive codegen differential VACUOUS: Spark's `ConvertToLocalRelation`
  * optimizer rule pre-evaluates Project-over-LocalRelation at optimization
  * time with an interpreted projection, so toggling
  * `spark.sql.codegen.factoryMode` over a `Seq(...).toDF` pipeline never
  * executes any expression's `doGenCode` at all — both "legs" ran the same
  * driver-side interpreted path. Excluding the rule forces a real
  * executor-side ProjectExec; the codegen leg keeps whole-stage codegen on
  * (doGenCode must compile and run) while the interpreted leg turns it off
  * so `eval`/`nullSafeEval` is what actually executes.
  */
object PropertyTestKit {

  /** One per-run seed from which EVERY `sampled` draw in the test run
    * derives, printed once at first use. A generator-found failure is
    * replayed with `sbt -Dgraft.prop.seed=<printed seed> test` (same suite
    * selection — draws are positional). This exists because a seedless run
    * let the r9 config-writer bug ship red-at-HEAD unreproducibly.
    */
  val runSeed: Long = {
    val s = sys.props.get("graft.prop.seed").map(_.toLong)
      .getOrElse(new java.security.SecureRandom().nextLong())
    println(s"[PropertyTestKit] property seed=$s " +
      s"(replay: sbt -Dgraft.prop.seed=$s test)")
    s
  }

  private var seedState = org.scalacheck.rng.Seed(runSeed)

  def sampled[T](g: org.scalacheck.Gen[T]): T = synchronized {
    var s = seedState
    var out: Option[T] = None
    var tries = 0
    while (out.isEmpty && tries < 1000) {
      out = g.apply(org.scalacheck.Gen.Parameters.default, s)
      s = s.next
      tries += 1
    }
    seedState = s
    out.getOrElse(throw new IllegalStateException(
      s"generator produced no value in 1000 tries (run seed=$runSeed)"))
  }

  /** Type-7 (pandas/numpy default) quantile over a sorted sample. */
  def type7(sorted: IndexedSeq[Double], p: Double): Double = {
    val h = (sorted.length - 1) * p
    val lo = sorted(h.floor.toInt); val hi = sorted(h.ceil.toInt)
    lo + (h - h.floor) * (hi - lo)
  }

  private val LocalRelationRule =
    "org.apache.spark.sql.catalyst.optimizer.ConvertToLocalRelation"

  /** Run `body` with expression evaluation forced through a REAL execution
    * path: mode "codegen" = whole-stage codegen with compilation mandatory
    * (CODEGEN_ONLY + fallback disabled, so a compile failure fails the
    * test instead of silently executing the interpreted child), mode
    * "interpreted" = no whole-stage codegen and interpreted projections
    * (NO_CODEGEN). ConvertToLocalRelation is excluded in both so local
    * test frames execute instead of being pre-evaluated on the driver.
    *
    * Prior conf values are RESTORED on exit (not blindly unset), so nested
    * or pre-configured sessions keep their settings. Intended for
    * shuffle-free local pipelines: a plan with an exchange comes back as
    * an AdaptiveSparkPlan whose pre-execution string carries no
    * whole-stage markers, which would defeat callers' plan assertions —
    * keep differential inputs local and narrow.
    */
  def withExecutedMode[A](spark: SparkSession, mode: String)(body: => A): A = {
    val (factory, wholeStage) = mode match {
      case "codegen" => ("CODEGEN_ONLY", "true")
      case "interpreted" => ("NO_CODEGEN", "false")
      case other => throw new IllegalArgumentException(s"mode: $other")
    }
    val keys = Seq("spark.sql.codegen.factoryMode", "spark.sql.codegen.wholeStage",
      "spark.sql.codegen.fallback", "spark.sql.optimizer.excludedRules")
    val saved = keys.map(k => k -> spark.conf.getOption(k))
    spark.conf.set("spark.sql.codegen.factoryMode", factory)
    spark.conf.set("spark.sql.codegen.wholeStage", wholeStage)
    spark.conf.set("spark.sql.codegen.fallback", "false")
    // APPEND to any pre-existing exclusions instead of clobbering them — a
    // session configured with its own excluded rules must keep them during
    // the differential
    val prior = spark.conf.getOption("spark.sql.optimizer.excludedRules")
      .map(_.trim).filter(_.nonEmpty)
    val merged = prior match {
      case Some(p) if p.split(",").map(_.trim).contains(LocalRelationRule) => p
      case Some(p) => p + "," + LocalRelationRule
      case None => LocalRelationRule
    }
    spark.conf.set("spark.sql.optimizer.excludedRules", merged)
    try body
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
