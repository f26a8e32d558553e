package graft

import org.apache.spark.sql.SparkSession
import graft.queries.QueryCorpus

/** Benchmark main: times the headline queries (QueryCorpus.benchNames) at
  * `SPARK_GRAFT_SF_DIR` and prints one JSON line for the driver.
  *
  * Materialization uses the `noop` sink so every output column is actually
  * computed (a bare `count()` lets Catalyst prune the plan to row counting).
  *
  * Noise armor (a contended box once produced a bench whose sf0.01 times
  * exceeded its sf0.1 times — impossible on a healthy run, and invisible
  * from inside the JSON). Four defenses make a degraded run self-labeling:
  *   - queries are timed CHEAPEST-FIRST (by warm-up time), so one heavy
  *     query's GC/page-cache wake can't poison a long tail of cheap ones;
  *   - every raw run per query is emitted (`queries_raw`; a healed query
  *     carries >2 entries and is named in `healed`), so min-vs-max spread
  *     exposes intra-run contention after the fact — healing never rewrites
  *     the raw record;
  *   - each query's warm-up time (emitted as `queries_warm`) anchors a
  *     second retry rule: a timed PAIR that is mutually consistent but
  *     collectively >2× the warm-up measurement sat in one shared degraded
  *     window (the r5 q144/q168 failure mode) and earns one extra run;
  *   - the first-timed query is re-timed at the VERY END and the ratio is
  *     emitted as `noise_sentinel` (last/first ≈ 1.0 healthy; >> 1 means
  *     the box degraded mid-bench and the later numbers are inflated).
  */
object Bench {

  /** Spread rule for the self-healing retry: two valid timed runs of the
    * same query differing by more than `limit`× can't both be the query's
    * cost — one sat in a degraded window (GC storm, page-cache eviction,
    * external contention), so a third run is warranted. Failed runs (< 0)
    * never trigger healing: a deterministic failure re-fails identically.
    */
  def needsHealing(a: Double, b: Double, limit: Double = 3.0): Boolean =
    a > 0 && b > 0 && math.max(a, b) / math.min(a, b) > limit

  /** Warm-anchor rule (r5 lesson: q144's timed pair [6.39, 5.71] sat
    * ENTIRELY inside one degraded window — mutually consistent, so the
    * spread rule never fired, and the end-of-run sentinel can't see a
    * window that closed before the bench ended — while the warm-up pass
    * had already measured the query at ~1.2 s). The warm-up time is a
    * per-query anchor taken OUTSIDE the timed window: when even the best
    * timed run exceeds `factor`× it, both timed runs are suspect and one
    * extra run is warranted. A degraded WARM-UP only raises the anchor
    * (never a false trigger); warm-up failure (< 0) disables the anchor.
    */
  def needsWarmAnchorHeal(runs: Seq[Double], warmTime: Double,
      factor: Double = 2.0): Boolean = {
    val ok = runs.filter(_ >= 0)
    warmTime > 0 && ok.nonEmpty && ok.min > factor * warmTime
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // same SQL-function registration path as GraftSession: the bench
      // exercises the extension wiring, not a privately-built session
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Isolate timed queries from each other: drop every cached plan AND every
    // still-persisted RDD (localCheckpoint blocks are not catalog-tracked)
    // so one query's residue can't occupy BlockManager memory when the next
    // one runs. Done BEFORE each run so the run's own time includes none of
    // the cleanup.
    def isolate(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    def run(name: String, dir: String): Double = {
      isolate()
      val t0 = System.nanoTime()
      try QueryCorpus.queries(name)(spark, dir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => System.err.println(s"[bench] $name failed: $e"); return -1.0 }
      (System.nanoTime() - t0) / 1e9
    }
    def fmt(rs: Seq[(String, Double)]): String =
      rs.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    def fmtRaw(rs: Seq[(String, Seq[Double])]): String =
      rs.map { case (k, vs) => "\"" + k + "\":[" + vs.mkString(",") + "]" }
        .mkString("{", ",", "}")

    // min of 2 timed runs after a full warm-up pass: single-JVM wall times
    // on this box vary +-15% run to run; the min is the stable estimator of
    // the query's actual cost (the variance is GC/JIT noise, not work).
    // Self-healing (r4 lesson: a contended box produced run pairs like
    // [10.69, 1.98] — labeled by the sentinel but still polluting the
    // official record): when the two runs diverge more than SPREAD_LIMIT,
    // one hit a degraded window, so schedule ONE extra run. Bounded at one
    // retry — a box degraded for the whole bench should stay visibly
    // degraded, not retry forever. EVERY raw run stays in `queries_raw`
    // (a 3-element entry marks a healed query) so the contention evidence
    // the raw record exists for is never rewritten.
    // warmTime < 0 disables the warm anchor (the sentinel re-run and the
    // small-SF curve have no same-dir warm-up to anchor on)
    def timedRuns(name: String, dir: String, warmTime: Double = -1.0): Seq[Double] = {
      val a = run(name, dir); val b = run(name, dir)
      val base = if (Bench.needsHealing(a, b)) Seq(a, b, run(name, dir)) else Seq(a, b)
      // second line of defense, same one-extra-run bound: fires when BOTH
      // timed runs sat in one degraded window (consistent with each other,
      // inconsistent with the out-of-window warm-up measurement)
      if (Bench.needsWarmAnchorHeal(base, warmTime)) base :+ run(name, dir) else base
    }
    def best(runs: Seq[Double]): Double = {
      val ok = runs.filter(_ >= 0)
      if (ok.isEmpty) -1.0 else ok.min
    }

    // Local-iteration subset (mirrors Verify's GRAFT_QUERY_FILTER): bench
    // only queries matching a comma-separated prefix list. Unset in driver
    // runs — the official bench always times the full headline list.
    val benchNames = sys.env.get("GRAFT_BENCH_FILTER") match {
      case Some(f) if f.nonEmpty =>
        val prefixes = f.split(',').map(_.trim).filter(_.nonEmpty)
        val kept = QueryCorpus.benchNames.filter(n => prefixes.exists(n.startsWith))
        require(kept.nonEmpty,
          s"GRAFT_BENCH_FILTER='$f' matches no bench query — known: ${QueryCorpus.benchNames.mkString(", ")}")
        kept
      case _ => QueryCorpus.benchNames
    }

    // warm-up: JIT + parquet footer cache; its times order the timed pass
    // cheapest-first
    val warm = benchNames.map(n => n -> run(n, sfDir))
    val warmByName = warm.toMap
    val names = warm.sortBy { case (_, t) => if (t < 0) Double.MaxValue else t }.map(_._1)
    val raw = names.map(n => n -> timedRuns(n, sfDir, warmByName(n)))
    val results = raw.map { case (n, runs) => n -> best(runs) }
    val total = results.map(_._2).sum

    // the 9 queries BENCH_r01 timed — their subtotal makes the
    // round-over-round ratio directly readable as the bench list grows
    val r1Shared = Set("q01_agg_pricing_summary", "q03_join_topk_revenue",
      "q07_window_rank", "q38_tfidf", "q51_exact_dedup", "q53_minhash_lsh_jaccard",
      "q55_cosine_topk", "q64_asof_join", "q95_corpus_clean")
    val sharedTotal = results.collect { case (k, v) if r1Shared(k) && v > 0 => v }.sum

    // Second scale point (sf0.01 sibling dir, if distinct and present) → a
    // two-point scale curve in the same JSON line; extra keys are
    // backward-compatible with the driver's {"value","queries","sf"} read.
    val smallDir = new java.io.File(new java.io.File(sfDir).getParentFile, "sf0.01")
    val curve =
      if (smallDir.isDirectory && smallDir.getAbsolutePath != new java.io.File(sfDir).getAbsolutePath) {
        // same min-of-2 + healing estimator as the main pass: the curve runs
        // cold at the END of the bench, and a single cold run once recorded
        // sf0.01 "costing more" than sf0.1 — a physically impossible scale
        // curve that was page-cache noise, not work
        val small = names.map(n => n -> best(timedRuns(n, smallDir.getAbsolutePath)))
        s""","sf_small":"sf0.01","queries_small":${fmt(small)}"""
      } else ""

    // noise sentinel: re-time the first-timed (cheapest) query after
    // EVERYTHING else — min-of-2 again, so the ratio compares like
    // estimators. Bracketing the whole bench (including the small-SF curve)
    // makes a mid-bench slowdown visible in the JSON itself.
    val sentinelName = names.head
    val firstTime = results.head._2
    val lastTime = best(timedRuns(sentinelName, sfDir))
    val sentinel =
      if (firstTime > 0 && lastTime > 0) lastTime / firstTime else -1.0

    // healed = queries whose raw entry has >2 runs (spread-retry and/or
    // warm-anchor retry fired — 4 runs means both did);
    // "runs":2 stays the BASE methodology, healed lists the exceptions
    val healed = raw.collect { case (n, rs) if rs.size > 2 => "\"" + n + "\"" }
      .mkString("[", ",", "]")
    val line = s"""{"metric":"total","value":$total,"unit":"sec","runs":2,"timing":"min","healed":$healed,"queries":${fmt(results)},"queries_raw":${fmtRaw(raw)},"queries_warm":${fmt(warm)},"noise_sentinel":$sentinel,"noise_sentinel_query":"$sentinelName","sf":"$sfDir","r1_shared_total":$sharedTotal$curve}"""
    println(line)
    // the stdout line gets truncated/regex-reconstructed by log capture
    // (every BENCH_r1-r5 artifact carries "parsed": null) — also write the
    // exact line to a file so the official record parses as JSON
    val outPath = sys.env.getOrElse("GRAFT_BENCH_OUT", "bench_out.json")
    try {
      java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
        (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
      System.err.println(s"[bench] wrote $outPath")
    } catch { case e: Throwable => System.err.println(s"[bench] could not write $outPath: $e") }
    spark.stop()
  }
}
