package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew and co-location utilities — the mechanisms SURVEY.md §4 and the
  * scale mandate call for when AQE's automatic skew handling isn't enough:
  * salting for hot keys and bucketing for shuffle-free repeated joins.
  */
object Scale {

  /** Content-derived salt in [0, salts) — deterministic under task retries,
    * never monotonically_increasing_id: a positional id in a shuffle key is
    * the SPARK-23207 failure class (a task retry re-fetches inputs in a
    * different order, re-salts the same rows differently, and reducers
    * mixing old and new map output double-count or drop rows). MapType
    * columns are excluded from the hash — Spark disallows hashing maps
    * (`spark.sql.legacy.allowHashOnMapType` is off by default), so including
    * one fails analysis; a frame whose EVERY column is a map cannot be
    * content-salted and is refused loudly. Rows identical in all hashable
    * columns co-locate on one salt — exact full-row duplicates of a hot key
    * re-concentrate (common in log-like data); de-duplicate or pre-aggregate
    * such data before salting.
    */
  private[ops] def contentSalt(df: DataFrame, salts: Int): Column = {
    val hashable = df.schema.fields.collect {
      case f if !f.dataType.isInstanceOf[org.apache.spark.sql.types.MapType] => f.name
    }
    require(hashable.nonEmpty,
      "content salt needs at least one non-MapType column to hash " +
        s"(all ${df.columns.length} columns are maps — Spark cannot hash MapType)")
    pmod(xxhash64(hashable.toSeq.map(col): _*), lit(salts))
  }

  /** Two-stage salted aggregation: a hot group key (think: the empty
    * document, the null user) funnels its rows through `salts` partial
    * groups before the final combine, so no single task owns the hot key.
    * Correct for algebraic aggregates expressed as (partial, combine)
    * pairs on the same column name.
    *
    * @param partials per-output (partialAgg, finalCombine) keyed by alias,
    *   e.g. "n" -> (count(lit(1)), sum) — partial runs per (key, salt),
    *   combine re-aggregates per key.
    */
  def saltedAggregate(
      df: DataFrame,
      keys: Seq[String],
      salts: Int,
      partials: Map[String, (Column, Column => Column)]): DataFrame = {
    // content-derived salt (see contentSalt) — retry-deterministic, skips
    // unhashable MapType columns
    val salted = df.withColumn("__salt__", contentSalt(df, salts))
    val partial = salted
      .groupBy((keys :+ "__salt__").map(col): _*)
      .agg(partials.head._2._1.as(partials.head._1),
        partials.tail.map { case (n, (p, _)) => p.as(n) }.toSeq: _*)
    partial
      .groupBy(keys.map(col): _*)
      .agg(partials.head._2._2(col(partials.head._1)).as(partials.head._1),
        partials.tail.map { case (n, (_, c)) => c(col(n)).as(n) }.toSeq: _*)
  }

  /** Salted equi-join for a skewed LEFT side: left rows get a random-ish
    * stable salt in [0, salts); the (small-enough) right side replicates
    * once per salt value, so each hot-key's rows spread over `salts` tasks.
    * Result equals the plain inner join.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String], salts: Int): DataFrame = {
    // content-derived salt for retry determinism — see contentSalt; any
    // salt value joins correctly (the right side replicates all of them),
    // but a positional id could re-salt rows on task retry and lose/double
    // rows mid-shuffle (SPARK-23207 class)
    val l = left.withColumn("__salt__", contentSalt(left, salts))
    val r = right.withColumn("__salt__", explode(sequence(lit(0L), lit(salts - 1L))))
    l.join(r, keys :+ "__salt__").drop("__salt__")
  }

  /** Spread an under-partitioned frame before COMPUTE-heavy map work.
    *
    * Scan parallelism is sized by BYTES (`files.maxPartitionBytes`, bounded
    * below by parquet row-group granularity), which is the right proxy for
    * scan-bound plans and the wrong one for compute-bound kernels: a 17 MB
    * single-row-group text corpus arrives as ONE scan partition, so per-doc
    * kernels costing ~1 ms/row (tokenization, entropy, n-gram stats) run
    * single-threaded on a 32-core box — measured 6-9 s single-task stages on
    * the sf1.0 bench corpus, ~0.5 s once spread. The same mismatch appears
    * on real clusters whenever text sits in few-but-large files.
    *
    * Round-robin repartition to `target` when the planned scan parallelism
    * is below half of it AND the frame is big enough that one exchange of
    * its bytes is noise next to the kernel work (`minBytes` gate keeps
    * 5-row dimension tables from paying a 32-way shuffle). Both checks run
    * at PLAN time (partition count from the physical scan, bytes from
    * optimizer stats) — no job. Explicit numPartitions, so AQE never
    * coalesces it back below the kernel's parallelism.
    */
  def spreadForCompute(df: DataFrame, minBytes: Long = 256L << 10,
      fence: Seq[String] = Nil): DataFrame = {
    val spark = df.sparkSession
    val target = spark.sparkContext.defaultParallelism
    // planned scan parallelism read off the physical FILE scan directly —
    // NOT Dataset.rdd, which wraps the conversion in a SQL execution and
    // polluted the staged-pass budgets (PlanSpec counts executions; the
    // probe must be listener-silent). Partition computation is driver-side
    // file splitting: no job, no event. Frames without a file scan (local
    // relations, post-shuffle inputs) skip the spread — the helper's
    // contract is scan-parallelism repair, nothing else.
    // an AQE-wrapped plan (any frame that already contains an exchange or
    // subquery) reports no children to collect — descend into its input
    val phys = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.inputPlan
      case p => p
    }
    val planned = phys.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.inputRDDs().map(_.getNumPartitions).sum
    }.reduceOption(_ + _).getOrElse(Int.MaxValue)
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    if (planned >= math.max(2, target / 2) || bytes < minBytes) df
    else {
      val spread = df.repartition(target)
      if (fence.isEmpty) spread
      else {
        // Fence the payload column(s) with an optimizer barrier: without
        // it, a filter over kernel-derived columns is pushed through BOTH
        // the staging projections and this exchange, dragging the whole
        // kernel stack back into the single-task scan stage (and inlining
        // staged subexpressions once per reference) — the exact serialism
        // this repartition exists to break. See [[graft.functions
        // .OptBarrier]] for the trade-off (fencing also blocks cheap
        // scan-column prunes: filter those BEFORE calling this).
        spread.select(spread.columns.toSeq.map { c =>
          if (fence.contains(c)) graft.functions.OptBarrier.barrier(col(c)).as(c)
          else col(c)
        }: _*)
      }
    }
  }

  /** Persist a frame bucketed (and sorted) by join keys: repeated joins on
    * those keys become shuffle-free AND sort-free (bucket-local sort-merge)
    * — the co-location strategy for fact-to-fact joins at 100 TB.
    */
  def writeBucketed(df: DataFrame, table: String, keys: Seq[String], buckets: Int): Unit =
    df.write
      .mode("overwrite")
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .saveAsTable(table)

  /** Skew-adaptive inner join — [[keyProfile]]'s findings applied
    * automatically: keys whose left-side row count exceeds `hotThreshold`
    * route through [[saltedJoin]] (hot key fans across `salts` tasks), the
    * rest join plain; the union is the exact inner join. The hot-key set is
    * tiny by construction (each member exceeds the threshold, so there are
    * at most rows/threshold of them) and broadcasts to split both inputs
    * without an extra shuffle. Use when one static skew plan must hold
    * across engines/runs; inside one Spark session AQE's runtime skew
    * handling covers the same ground.
    */
  def adaptiveJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      salts: Int, hotThreshold: Long): DataFrame = {
    require(salts > 0 && hotThreshold > 0, s"bad adaptiveJoin params ($salts, $hotThreshold)")
    val hot = left.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("__cnt__"))
      .filter(col("__cnt__") > hotThreshold)
      .drop("__cnt__")
    val cold = left.join(broadcast(hot), keys, "left_anti")
      .join(right.join(broadcast(hot), keys, "left_anti"), keys)
    val salted = saltedJoin(
      left.join(broadcast(hot), keys, "left_semi"),
      right.join(broadcast(hot), keys, "left_semi"), keys, salts)
    cold.unionByName(salted)
  }

  /** Key-distribution skew profile — the diagnostic run BEFORE choosing a
    * salting/broadcast strategy: the `topK` hottest keys with their counts
    * and share of all rows. One map-side-combined count aggregate, a
    * broadcast 1-row total (no driver round-trip), and a TakeOrdered top-k —
    * nothing here scales with the key cardinality beyond the count shuffle.
    */
  def keyProfile(df: DataFrame, keyCol: String, topK: Int): DataFrame = {
    val counts = df.groupBy(col(keyCol).as("key")).agg(count(lit(1)).as("cnt"))
    val total = counts.agg(sum(col("cnt")).as("__total__"))
    counts.crossJoin(broadcast(total))
      .withColumn("share", round(col("cnt") / col("__total__"), 6))
      .orderBy(col("cnt").desc, col("key"))
      .limit(topK)
      .select(col("key"), col("cnt"), col("share"))
  }
}
