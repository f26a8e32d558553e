package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM training: group documents into bins of roughly
  * `budget` tokens each (batch construction for fixed context windows).
  *
  * Exact greedy packing is a sequential scan — unparallelizable. The
  * scalable formulation packs independently inside `shards` hash-shards:
  * within a shard, documents are ordered by id and binned by
  * `floor(exclusive-cumsum(tokens) / budget)`: bins are contiguous doc runs
  * whose token span covers a full `budget` stride — a bin's last doc may
  * overflow the budget, and the following bin may start short by up to one
  * doc's worth (the standard streaming-packing relaxation; callers that
  * need hard caps split oversized docs first with
  * [[TextAnalysis.chunkWindows]]). Each shard's window is partition-local:
  * one shuffle by shard id, no global sort, deterministic on any cluster
  * layout.
  */
object Packing {

  /** Adds `shard` and `bin` columns; (shard, bin) is the pack id. */
  def packByTokenBudget(
      df: DataFrame,
      id: Column,
      tokens: Column,
      budget: Long,
      shards: Int): DataFrame = {
    require(budget > 0 && shards > 0, s"bad packing params ($budget, $shards)")
    val shard = pmod(TextAnalysis.hash60(id.cast("string")), lit(shards.toLong))
    val w = Window.partitionBy(col("__pack_shard__")).orderBy(id)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__pack_shard__", shard)
      .withColumn("__pack_cum__", sum(tokens).over(w) - tokens)
      .withColumn("bin", floor(col("__pack_cum__") / budget).cast("long"))
      .withColumnRenamed("__pack_shard__", "shard")
      .drop("__pack_cum__")
  }

  /** Length-bucketed batching — the padding-minimizing complement of budget
    * packing: sequences group by log₂ length bucket, then fixed-size batches
    * form inside each (bucket, shard) from length-sorted runs, so a batch's
    * members have near-equal lengths and `max(len)·size − Σlen` padding
    * waste stays small. Sharding keeps the window partition-local (a hot
    * bucket never funnels into one task); batches never cross buckets.
    * Adds `bucket`, `shard`, `batch`.
    */
  def bucketByLength(
      df: DataFrame,
      id: Column,
      tokens: Column,
      batchSize: Int,
      shards: Int): DataFrame = {
    require(batchSize > 0 && shards > 0, s"bad batching params ($batchSize, $shards)")
    val len = greatest(tokens.cast("long"), lit(1L))
    val shard = pmod(TextAnalysis.hash60(id.cast("string")), lit(shards.toLong))
    val w = Window.partitionBy(col("bucket"), col("shard"))
      .orderBy(col("__len__"), id)
    df.withColumn("__len__", len)
      // floor(log2) via binary-string length: exact integer math — float
      // log2 returns 3.0000000000000004 at exact powers on some engines
      .withColumn("bucket", (length(bin(col("__len__"))) - 1).cast("long"))
      .withColumn("shard", shard)
      .withColumn("batch",
        ((row_number().over(w) - 1) / batchSize).cast("long"))
      .drop("__len__")
  }
}
