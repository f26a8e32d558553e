package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session factory for the graft engine.
  *
  * The reference (amazon-science/bears) has no session concept — execution is
  * delegated to pandas/Dask kernels per layout
  * (`src/bears/core/frame/ScalableDataFrame.py:84`). On Spark the session IS
  * the engine; we pin the settings every oracle comparison depends on
  * (UTC timestamps, ANSI off for pandas-flavored null semantics) and the
  * local-mode scale knobs (shuffle partitions = cores, AQE on).
  */
object GraftSession {

  /** Create (or reuse) a local session sized for `local[cpus]`.
    *
    * At cluster scale the same builder settings apply, except
    * `shuffle.partitions` should be ~2-3x total executor cores and AQE
    * coalescing takes care of the rest.
    */
  def local(cpus: Int = Runtime.getRuntime.availableProcessors()): SparkSession = {
    val spark = SparkSession
      .builder()
      .master(s"local[$cpus]")
      .appName("graft")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      // 100 TB knobs, as relevant locally as on a cluster: AQE converts
      // oversized SMJ partitions into skew splits, and the runtime bloom
      // filter semi-prunes the probe side of selective joins BEFORE the
      // shuffle (row-group level on parquet) — both free correctness-wise
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  /** Read one of the standard test tables (`TESTDATA.md`):
    * `region nation customer supplier part orders lineitem events documents
    * embeddings`, each a single parquet at `dir/name.parquet`.
    *
    * `events.ts` has changed physical encoding across fixture generations
    * (parquet `timestamp[ns]` in one, `timestamp[us]` in another), so the
    * read is schema-adaptive rather than type-assuming: the nanosAsLong
    * legacy conf (SPARK-40819) is set so an ns file loads at all (as long),
    * then [[normalizeEventTs]] dispatches on the type the reader actually
    * produced. Either encoding lands on the same session-TZ µs timestamps —
    * the truncation DuckDB applies too, so oracle comparisons agree.
    */
  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name != "events") spark.read.parquet(s"$dir/$name.parquet")
    else {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      normalizeEventTs(spark.read.parquet(s"$dir/$name.parquet"))
    }
  }

  /** Normalize an events frame's `ts` to session-TZ `TimestampType` (µs)
    * regardless of how the parquet stored it:
    *   - `LongType`        → ns-as-long under the legacy conf; integer-DIV
    *                         truncate to µs (`/` would route through double
    *                         and lose µs above 2^53)
    *   - `TimestampNTZType`→ µs file without UTC adjustment; reinterpret the
    *                         wall clock in the session TZ (pinned UTC)
    *   - `TimestampType`   → already session-TZ µs; pass through
    * Anything else is a fixture regression worth failing loudly on.
    */
  def normalizeEventTs(raw: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    raw.schema("ts").dataType match {
      case LongType => raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType => raw
      case other => throw new IllegalStateException(
        s"events.ts stored as unsupported type $other; expected ns-as-long, timestamp_ntz or timestamp")
    }
  }
}
