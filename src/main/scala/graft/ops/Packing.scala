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
}
