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
    * `events.ts` is written as parquet `timestamp[ns]`, which Spark's reader
    * rejects; we read nanos as long (SPARK-40819 legacy conf) and truncate to
    * microseconds — the same ns→µs truncation DuckDB applies, so oracle
    * comparisons agree.
    */
  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name != "events") spark.read.parquet(s"$dir/$name.parquet")
    else {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$dir/$name.parquet")
      import org.apache.spark.sql.functions.{expr, timestamp_micros}
      // integer DIV, not `/`: ns epochs exceed 2^53, double division loses µs
      raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
    }
  }
}
