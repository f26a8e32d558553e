package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Rank-based statistics — the Spearman method of the reference's
  * `corr(other, method)` contract (`ScalableSeries.py:896-898`; SURVEY §2.4
  * maps it to "rank-window then corr").
  *
  * Scale: fractional ranks need a global total order, but NOT a global
  * `Window.orderBy` (which funnels the table through one task). We range-sort
  * in parallel, synthesize positions with `zipWithIndex` (per-partition
  * offsets, one lightweight count job), average positions per tie-group with
  * an ordinary `groupBy`, and map ranks back with a shuffle join — every
  * stage is partition-parallel at any scale.
  */
object RankStats {

  /** Append fractional (average) rank of `c` as `out`: for a tie-group of
    * size k starting at 1-based sorted position p, every member ranks
    * p + (k-1)/2 — pandas `rank(method="average")`. Null values rank null.
    */
  def withAverageRank(df: DataFrame, c: String, out: String): DataFrame = {
    val vals = df.select(col(c)).filter(col(c).isNotNull).orderBy(col(c))
    val posSchema = StructType(Seq(
      StructField("__val__", df.schema(c).dataType),
      StructField("__pos__", LongType, nullable = false)))
    val positions = df.sparkSession.createDataFrame(
      vals.rdd.zipWithIndex().map { case (r, i) => Row(r.get(0), i + 1L) }, posSchema)
    val ranks = positions.groupBy("__val__").agg(avg("__pos__").as(out))
    df.join(ranks, df(c) === ranks("__val__"), "left").drop("__val__")
  }

  /** Spearman rank correlation of two columns, pairwise-complete (rows where
    * either side is null are dropped before ranking — pandas semantics).
    */
  def spearman(df: DataFrame, a: String, b: String): Double = {
    val clean = df.select(col(a), col(b))
      .filter(col(a).isNotNull && col(b).isNotNull)
    val ranked = withAverageRank(withAverageRank(clean, a, "__ra__"), b, "__rb__")
    val r = ranked.agg(corr(col("__ra__"), col("__rb__"))).head()
    if (r.isNullAt(0)) Double.NaN else r.getDouble(0)
  }
}
