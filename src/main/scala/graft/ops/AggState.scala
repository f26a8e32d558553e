package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable per-key aggregate state — the incremental-aggregation pattern
  * for snapshot pipelines: keep `(n, sum, min, max)` per key on disk, fold
  * each new delta in with algebraic merges, and NEVER re-scan the
  * historical corpus. Derived statistics (mean; and via the extended state
  * `sumsq`, variance/std) come out of the state frame for free. The merge
  * is one union + one keyed aggregate — state size is O(keys), so at
  * 100 TB the expensive side (the full corpus) is read exactly once over
  * its lifetime, delta by delta.
  */
object AggState {

  /** Build state for `valueCol` grouped by `keys`:
    * `(keys..., n, sum, sumsq, mn, mx)`. Nulls are skipped (SQL aggregate
    * semantics) but every key keeps a row (n = 0 when all-null).
    */
  def build(df: DataFrame, keys: Seq[String], valueCol: Column): DataFrame = {
    val v = valueCol.cast("double")
    df.groupBy(keys.map(col): _*)
      .agg(
        count(v).as("n"),
        sum(v).as("sum"),
        sum(v * v).as("sumsq"),
        min(v).as("mn"),
        max(v).as("mx"))
  }

  /** Fold a state frame and a new state frame (built from a delta) into one:
    * counts/sums add, extrema merge. Associative and commutative — state
    * files can merge in any order, across any number of snapshots.
    */
  def merge(state: DataFrame, deltaState: DataFrame, keys: Seq[String]): DataFrame =
    state.unionByName(deltaState)
      .groupBy(keys.map(col): _*)
      .agg(
        sum(col("n")).as("n"),
        sum(col("sum")).as("sum"),
        sum(col("sumsq")).as("sumsq"),
        min(col("mn")).as("mn"),
        max(col("mx")).as("mx"))

  /** Read derived statistics off a state frame: mean and sample std
    * (Welford-free closed form `(sumsq − n·mean²) / (n−1)`, NaN below two
    * observations — pandas semantics).
    */
  def withStats(state: DataFrame): DataFrame = {
    val mean = col("sum") / col("n")
    val varS = (col("sumsq") - col("n") * mean * mean) / (col("n") - 1)
    state
      .withColumn("mean", when(col("n") > 0, mean).otherwise(lit(Double.NaN)))
      .withColumn("std", when(col("n") > 1, sqrt(greatest(varS, lit(0.0))))
        .otherwise(lit(Double.NaN)))
  }
}
