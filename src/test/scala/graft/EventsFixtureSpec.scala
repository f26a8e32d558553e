package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core.GraftSession
import graft.streaming.EventStreams

/** Fixture-drift armor: the driver-generated `events.parquet` changed its
  * physical `ts` encoding once (round 3: timestamp[ns]; round 4:
  * timestamp[us]) and silently broke 27 queries. This spec writes the SAME
  * logical events table in every encoding the fixture has used or could
  * plausibly use — session-TZ timestamp[us], timestamp_ntz[us], and raw
  * ns-epoch int64 — and asserts that BOTH read paths
  * ([[GraftSession.table]] batch, [[EventStreams.readEvents]] streaming)
  * land every encoding on identical µs timestamps. If the fixture drifts
  * again, this is the test that goes red with a readable diff instead of
  * 27 downstream oracle mismatches.
  */
class EventsFixtureSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSession.spark

  // µs-precision instants (non-zero sub-ms digits so a ms-rounding bug or a
  // 1000× misread cannot cancel out), crossing a day boundary
  private val microStamps = Seq(
    1700000000000001L, 1700000000123456L, 1700003600999999L,
    1700086400000123L, 1700086400500500L)

  private def base(s: SparkSession): DataFrame = {
    import s.implicits._
    microStamps.zipWithIndex.map { case (us, i) =>
      (i.toLong, us, i.toLong % 2, if (i % 2 == 0) "click" else "purchase",
        i * 1.5, s"""{"i":$i}""")
    }.toDF("event_id", "us", "user_id", "event_type", "value", "props")
  }

  /** Write the base table under `dir/events.parquet` with the given ts
    * encoding; returns the directory.
    */
  private def writeEncoded(encoding: String): String = {
    val dir = java.nio.file.Files.createTempDirectory(s"events_$encoding").toString
    val b = base(spark)
    val encoded = encoding match {
      case "utc" => b.withColumn("ts", timestamp_micros(col("us")))
      case "ntz" => b.withColumn("ts",
        timestamp_micros(col("us")).cast("timestamp_ntz"))
      case "ns_long" => b.withColumn("ts", col("us") * lit(1000L))
    }
    encoded.select("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  private val encodings = Seq("utc", "ntz", "ns_long")

  test("batch read (GraftSession.table) normalizes every ts encoding to identical µs timestamps") {
    val results = encodings.map { enc =>
      val df = GraftSession.table(spark, writeEncoded(enc), "events")
      assert(df.schema("ts").dataType == org.apache.spark.sql.types.TimestampType,
        s"$enc: expected TimestampType after normalization")
      enc -> df.select(col("event_id"), unix_micros(col("ts")).as("us"))
        .orderBy("event_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    }.toMap
    assert(results("utc") == microStamps.indices.map(i => (i.toLong, microStamps(i))),
      "utc encoding did not round-trip the exact µs instants")
    assert(results("ntz") == results("utc"), "ntz read disagrees with utc read")
    assert(results("ns_long") == results("utc"), "ns-as-long read disagrees with utc read")
  }

  test("streaming read (EventStreams.readEvents) agrees with the batch read for every encoding") {
    encodings.foreach { enc =>
      val dir = writeEncoded(enc)
      val streamed = EventStreams.runToCompletion(
        EventStreams.readEvents(spark, dir)
          .select(col("event_id"), unix_micros(col("ts")).as("us")),
        mode = "append")
      val got = streamed.orderBy("event_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(got == microStamps.indices.map(i => (i.toLong, microStamps(i))),
        s"$enc: streaming read produced wrong µs instants")
    }
  }

  test("streaming read REFUSES a landing directory that mixes ts encodings") {
    // one ns-as-long file + one timestamp[us] file in the same directory:
    // splicing either type would silently misread the other file 1000×,
    // so the probe must fail loudly instead
    val dir = java.nio.file.Files.createTempDirectory("events_mixed").toString
    val b = base(spark)
    b.withColumn("ts", col("us") * lit(1000L))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(s"$dir/events_a.parquet")
    b.withColumn("ts", timestamp_micros(col("us")))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(s"$dir/events_b.parquet")
    val err = intercept[IllegalArgumentException] {
      EventStreams.readEvents(spark, dir)
    }
    assert(err.getMessage.contains("mix ts encodings"), err.getMessage)
  }

  test("mixed encodings BEYOND the probe's 8-file spread still fail loudly at scan time") {
    // 10 path-sorted files: the spread probe samples indices
    // {0,1,2,3,5,6,7,9}, leaving 4 and 8 unsampled — a drift file at index
    // 8 passes the probe (the spliced type comes from the 9 majority
    // files), so the refusal guarantee there is the SCAN-TIME backstop: the
    // ns-encoded file's parquet logical type cannot convert to the spliced
    // timestamp type, and the stream must die loudly instead of silently
    // compressing that file's timeline 1000×. This spec pins the backstop;
    // if a Spark upgrade ever makes that conversion lenient, this goes red
    // and the probe must widen.
    val dir = java.nio.file.Files.createTempDirectory("events_mixed10").toString
    val b = base(spark)
    (0 until 10).foreach { i =>
      val enc =
        if (i == 8) b.withColumn("ts", col("us") * lit(1000L)) // ns-as-long drift
        else b.withColumn("ts", timestamp_micros(col("us")))
      enc.select("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.parquet(f"$dir/events_$i%02d.parquet")
    }
    // the probe itself passes — the drift is invisible at footer-spread level
    val stream = EventStreams.readEvents(spark, dir)
      .select(col("event_id"), unix_micros(col("ts")).as("us"))
    val err = intercept[Throwable] {
      EventStreams.runToCompletion(stream, mode = "append")
    }
    val chain = Iterator.iterate(err)(_.getCause).takeWhile(_ != null)
      .map(_.toString).mkString(" | ").toLowerCase
    assert(Seq("parquet", "convert", "mismatch").exists(chain.contains),
      s"scan-time failure lost its readable cause: $chain")
  }

  test("µs fixture read leaves the session-global nanosAsLong conf UNTOUCHED") {
    // the legacy conf silently downgrades every LATER ns-timestamp parquet
    // read in the session to raw-nanos Long — table() must only set it when
    // the events file actually stores TIMESTAMP(NANOS)
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    val saved = spark.conf.getOption(key)
    spark.conf.unset(key)
    try {
      val df = GraftSession.table(spark, writeEncoded("utc"), "events")
      assert(df.count() == microStamps.size.toLong)
      assert(!spark.conf.getOption(key).contains("true"), // unset -> registered default "false"
        "reading a µs events fixture must not flip the session-global legacy conf")
    } finally saved.foreach(spark.conf.set(key, _))
  }

  test("real TIMESTAMP(NANOS) file: footer probe detects it; table() truncates to µs") {
    import org.apache.parquet.schema.{LogicalTypeAnnotation, Types}
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
    import org.apache.parquet.example.data.simple.SimpleGroupFactory
    import org.apache.parquet.hadoop.example.ExampleParquetWriter
    // Spark cannot WRITE ns parquet, so build the round-3-fixture shape
    // directly with parquet-hadoop: INT64 annotated timestamp(NANOS)
    val dir = java.nio.file.Files.createTempDirectory("events_ns").toString
    val file = s"$dir/events.parquet"
    val msg = Types.buildMessage()
      .required(PrimitiveTypeName.INT64).named("event_id")
      .required(PrimitiveTypeName.INT64)
      .as(LogicalTypeAnnotation.timestampType(true, LogicalTypeAnnotation.TimeUnit.NANOS))
      .named("ts")
      .named("events")
    val writer = ExampleParquetWriter
      .builder(org.apache.parquet.hadoop.util.HadoopOutputFile.fromPath(
        new org.apache.hadoop.fs.Path(file),
        spark.sparkContext.hadoopConfiguration))
      .withType(msg).build()
    val gf = new SimpleGroupFactory(msg)
    try microStamps.zipWithIndex.foreach { case (us, i) =>
      val g = gf.newGroup()
      g.add("event_id", i.toLong)
      g.add("ts", us * 1000L + 789L) // non-zero ns digits: truncation, not scaling
      writer.write(g)
    } finally writer.close()
    assert(GraftSession.parquetTsIsNanos(spark, file), "footer probe missed NANOS")
    assert(!GraftSession.parquetTsIsNanos(spark, s"${writeEncoded("utc")}/events.parquet"),
      "footer probe false-positived on a µs file")
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    val saved = spark.conf.getOption(key)
    spark.conf.unset(key)
    try {
      val got = GraftSession.table(spark, dir, "events")
        .select(col("event_id"), unix_micros(col("ts")).as("us"))
        .orderBy("event_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(got == microStamps.indices.map(i => (i.toLong, microStamps(i))),
        "ns file did not land on the truncated µs instants")
      assert(spark.conf.getOption(key).contains("true"),
        "ns fixture requires the legacy conf set (and kept) for scan time")
    } finally {
      spark.conf.unset(key); saved.foreach(spark.conf.set(key, _))
    }
  }

  test("the real fixture reads without throwing and spans its multi-day history") {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR_SMALL", "/root/testdata/sf0.001")
    val ev = GraftSession.table(spark, dir, "events")
    val span = ev.agg(
      ((unix_micros(max(col("ts"))) - unix_micros(min(col("ts"))))
        / lit(86400000000L)).as("days")).head.getDouble(0)
    // the ns/µs confusion class compresses 35 days into ~50 minutes — a
    // whole-history span of at least a day proves the scale is right
    assert(span > 1.0, s"events history spans $span days — ts scale misread?")
  }
}
