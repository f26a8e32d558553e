package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable per-key aggregate state — the incremental-aggregation pattern
  * for snapshot pipelines: keep `(n, sum, sumsq, min, max)` per key on disk,
  * fold each new delta in with algebraic merges, and NEVER re-scan the
  * historical corpus. Derived statistics (mean; and via `sumsq`,
  * variance/std) come out of the state frame for free. The merge is one
  * union + one keyed aggregate — state size is O(keys), so at 100 TB the
  * expensive side (the full corpus) is read exactly once over its
  * lifetime, delta by delta.
  *
  * Accumulation is EXACT: the value is quantized to `decimal(18,6)` and
  * `sum`/`sumsq` are carried as wide decimals, so the merged state is
  * bit-identical no matter how the corpus was split into deltas or how
  * partitions folded — floating-point `sum(double)` would drift with
  * partition order, making "merge order doesn't matter" false at the last
  * ulp and state hashes nondeterministic across runs.
  */
object AggState {

  /** Quantization applied before accumulation: 6 fractional digits, exact. */
  private val Quantized = "decimal(18,6)"

  /** Build state for `valueCol` grouped by `keys`:
    * `(keys..., n, sum, sumsq, mn, mx)`. Nulls are skipped (SQL aggregate
    * semantics) but every key keeps a row (n = 0 when all-null).
    */
  def build(df: DataFrame, keys: Seq[String], valueCol: Column): DataFrame = {
    val v = valueCol.cast(Quantized)
    df.groupBy(keys.map(col): _*)
      .agg(
        count(v).as("n"),
        sum(v).as("sum"),          // decimal(28,6), exact
        sum(v * v).as("sumsq"),    // decimal(38,12), exact
        min(v).as("mn"),
        max(v).as("mx"))
  }

  /** Fold a state frame and a new state frame (built from a delta) into one:
    * counts/sums add, extrema merge. Associative and commutative — state
    * files can merge in any order, across any number of snapshots, and the
    * decimal carry keeps the result independent of that order.
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
    * observations — pandas semantics). Derivation happens in double — the
    * exact decimal state is the canonical artifact; the derived columns
    * are deterministic functions of it.
    */
  def withStats(state: DataFrame): DataFrame = {
    val s = col("sum").cast("double")
    val sq = col("sumsq").cast("double")
    val mean = s / col("n")
    val varS = (sq - col("n") * mean * mean) / (col("n") - 1)
    state
      .withColumn("mean", when(col("n") > 0, mean).otherwise(lit(Double.NaN)))
      .withColumn("std", when(col("n") > 1, sqrt(greatest(varS, lit(0.0))))
        .otherwise(lit(Double.NaN)))
  }
}
