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

  def sampled[T](g: org.scalacheck.Gen[T]): T =
    Iterator.continually(g.sample).flatten.next()

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
    spark.conf.set("spark.sql.optimizer.excludedRules", LocalRelationRule)
    try body
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
