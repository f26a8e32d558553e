package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension history building — the warehouse lifecycle op
  * beside [[graft.sdf.SDF.upsert]] (which keeps only the latest state):
  * given stacked snapshot versions of an entity table, produce the SCD
  * Type-2 validity intervals each attribute combination was live for.
  */
object History {

  /** Collapse stacked snapshots into SCD Type-2 intervals.
    *
    * Input: one row per (entity, snapshot version) — the union of periodic
    * extracts, `versionCol` totally ordered within a key (a date, a load
    * id). Output: one row per CHANGE RUN — the first version where the
    * tracked attributes took a new combination — with `effective_from` =
    * that version, `effective_to` = the next change's version (null while
    * still current). Attribute equality is null-safe (`<=>`), so
    * null→value and value→null transitions open new intervals.
    *
    * Scale shape: ONE shuffle on the entity keys drives both windows (the
    * change-detection lag and the interval-closing lead share the same
    * partitioning); rows carry only keys + tracked columns. A key with V
    * versions costs V window rows — no self-joins, no per-entity collects.
    */
  def scd2(snapshots: DataFrame, keys: Seq[String], versionCol: String,
      trackedCols: Seq[String]): DataFrame = {
    require(keys.nonEmpty && trackedCols.nonEmpty, "need keys and tracked columns")
    val byVersion = Window.partitionBy(keys.map(col): _*).orderBy(col(versionCol))
    val changed = trackedCols.map(c =>
        !(col(c) <=> lag(col(c), 1).over(byVersion)))
      .reduce(_ || _) || row_number().over(byVersion) === 1
    val marked = snapshots.withColumn("__chg__", changed)
      .filter(col("__chg__"))
    // second window over the SAME key partitioning: close each interval at
    // the next change (Catalyst reuses the exchange — PlanSpec-class shape)
    val toNext = Window.partitionBy(keys.map(col): _*).orderBy(col(versionCol))
    marked
      .withColumn("effective_from", col(versionCol))
      .withColumn("effective_to", lead(col(versionCol), 1).over(toNext))
      .select((keys.map(col) :+ col("effective_from") :+ col("effective_to"))
        ++ trackedCols.map(col): _*)
  }
}
