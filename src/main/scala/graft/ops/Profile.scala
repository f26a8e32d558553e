package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, MapType, NumericType, StructType}

/** Column profiling — the diagnostic scan run before designing a pipeline
  * over an unknown 100 TB corpus (pandas `df.describe`'s schema-wide,
  * null-aware sibling; the reference surfaces the same signals through
  * `ScalableDataFrame.describe`/`isna` composition).
  *
  * Every column profiles in ONE aggregate pass over the data — a single
  * map-side-combined job regardless of column count — never one job per
  * column. Distinct counts default to HyperLogLog (`approx_count_distinct`,
  * constant memory at any cardinality); `exact = true` swaps in exact
  * distincts for small frames or oracle replay. Non-atomic columns (arrays,
  * structs, maps) get null min/max/distinct — they aren't orderable.
  */
object Profile {

  def summary(df: DataFrame, exact: Boolean = false): DataFrame = {
    val fields = df.schema.fields
    require(fields.nonEmpty, "cannot profile a zero-column frame")
    val aggs = fields.flatMap { f =>
      val c = col(f.name)
      val atomic = f.dataType match {
        case _: ArrayType | _: MapType | _: StructType => false
        case _ => true
      }
      val numeric = f.dataType.isInstanceOf[NumericType]
      val distinct =
        if (!atomic) lit(null).cast("long")
        else if (exact) count_distinct(c)
        else approx_count_distinct(c)
      Seq(
        count(c).as(s"${f.name}__n"),
        coalesce(sum(c.isNull.cast("long")), lit(0L)).as(s"${f.name}__nulls"),
        distinct.cast("long").as(s"${f.name}__distinct"),
        (if (atomic) min(c).cast("string") else lit(null).cast("string"))
          .as(s"${f.name}__min"),
        (if (atomic) max(c).cast("string") else lit(null).cast("string"))
          .as(s"${f.name}__max"),
        (if (numeric) round(avg(c.cast("double")), 4) else lit(null).cast("double"))
          .as(s"${f.name}__mean"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val entries = fields.map { f =>
      struct(
        lit(f.name).as("column"),
        col(s"${f.name}__n").as("n"),
        col(s"${f.name}__nulls").as("nulls"),
        col(s"${f.name}__distinct").as("n_distinct"),
        col(s"${f.name}__min").as("min"),
        col(s"${f.name}__max").as("max"),
        col(s"${f.name}__mean").as("mean"))
    }
    wide.select(explode(array(entries: _*)).as("p")).select(col("p.*"))
  }

  /** k-anonymity audit over quasi-identifier columns (the pre-release
    * privacy gate next to the PII scrub): a dataset is k-anonymous when
    * every quasi-identifier combination is shared by ≥ k rows. One grouped
    * count + one scalar aggregate — map-side combined, no row data moves
    * beyond the quasi-identifier tuple. Returns a single row:
    * `k_min` (the anonymity the data actually achieves), `groups_total`,
    * `groups_below` and `rows_at_risk` (groups/rows with < k peers).
    */
  def kAnonymity(df: DataFrame, quasiCols: Seq[String], k: Long): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier column")
    require(k >= 1, s"k must be >= 1: $k")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("__sz__"))
      .agg(min(col("__sz__")).as("k_min"),
        count(lit(1)).as("groups_total"),
        sum(when(col("__sz__") < k, 1L).otherwise(0L)).as("groups_below"),
        coalesce(sum(when(col("__sz__") < k, col("__sz__"))), lit(0L)).as("rows_at_risk"))
  }
}
