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

  /** Point-in-time lookup against SCD2 history: each fact row gets the
    * dimension attributes that were effective AT its timestamp.
    *
    * The naive spelling is an inequality join (`fact.ts >= from AND
    * (fact.ts < to OR to IS NULL)`) — a range join that degenerates to
    * per-key row expansion. Because SCD2 intervals tile the version axis,
    * the interval containing a timestamp is exactly the LAST change at or
    * before it — so this delegates to [[AsOfJoin.backward]]: one keyed
    * sort-window shuffle, no range join, facts before the first version
    * get nulls. `history` is `[[scd2]]` output (only `effective_from` is
    * consulted; the tiling makes `effective_to` redundant for lookup).
    */
  def pointInTime(facts: DataFrame, factTime: String, history: DataFrame,
      keys: Seq[String], attrCols: Seq[String]): DataFrame =
    AsOfJoin.backward(facts, history.select((keys :+ "effective_from").map(col)
        ++ attrCols.map(col): _*),
      keys, factTime, "effective_from",
      attrCols.map(c => c -> c).toMap)
}
