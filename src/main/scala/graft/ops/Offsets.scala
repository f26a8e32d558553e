package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Global-position stitching over a range layout — the shared scheme behind
  * every "global order without a global window" op
  * ([[Sampling.selectByTokenBudget]], [[RankStats.withAverageRank]];
  * `SCol.is_monotonic` uses the same idea over raw partitions): lay the
  * frame out by `repartitionByRange` on the sort key, then synthesize each
  * partition's global offset from a ≤1-row-per-partition weight aggregate.
  * Partition-local windows + the broadcast offset join then reconstruct
  * exact global positions with no single-task `Window.orderBy` anywhere.
  */
object Offsets {

  /** Range-partition `df` by `sortCols`, append `__pid__`, persist + warm
    * the layout (one count action — the consumers below otherwise race to
    * populate the same cache blocks), and return it with the per-partition
    * EXCLUSIVE prefix sum of `weight` as a broadcastable (`__pid__`,
    * `__off__`) frame.
    *
    * No `sortWithinPartitions`: both downstream shapes (a `__pid__`-keyed
    * aggregate and a `Window.partitionBy(__pid__).orderBy(sortCols)`)
    * hash-exchange the layout by `__pid__` anyway, so a cache-time sort
    * would be destroyed before any consumer could use it — the window's own
    * sort is the one that counts. `__pid__` depends only on the range
    * boundaries, which are fixed when the cache materializes.
    *
    * The caller owns the returned frame's release
    * (`laid.unpersist(false)` after its eager cut — the Dedup materialize
    * discipline).
    */
  def rangeLayout(df: DataFrame, sortCols: Seq[Column],
      weight: Column): (DataFrame, DataFrame) = {
    import org.apache.spark.sql.expressions.Window
    val laid = df
      .repartitionByRange(sortCols: _*)
      .withColumn("__pid__", spark_partition_id())
      .persist()
    laid.count()
    val offsets = laid.groupBy(col("__pid__"))
      .agg(sum(weight).as("__ptot__"))
      .withColumn("__off__",
        coalesce(sum(col("__ptot__")).over(
          Window.orderBy(col("__pid__"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__pid__"), col("__off__"))
    (laid, offsets)
  }
}
