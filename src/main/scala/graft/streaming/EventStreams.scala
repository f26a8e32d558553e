package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Structured Streaming over the `events` table (parity-plus — the reference
  * has no event streaming at all, SURVEY.md §2.9 last row / §7 M5a): the
  * same `readStream → transform → writeStream` plans run unchanged against
  * a Kafka source at scale; here the parquet fixture drives them.
  *
  * State design for 100 TB/day streams: every aggregation below keys its
  * state by (window, type) or (user) — state size is bounded by key
  * cardinality × window retention, and the watermark expires old state;
  * nothing accumulates unboundedly.
  */
object EventStreams {

  /** The events schema minus the physical `ts` encoding, which has drifted
    * across fixture generations (timestamp[ns] in one, timestamp[us] in
    * another — see GraftSession.normalizeEventTs). Streaming sources demand
    * an explicit schema, so [[readEvents]] probes the parquet footer through
    * a batch read first and splices the actual `ts` type in here.
    */
  def rawSchema(tsType: DataType): StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", tsType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Streaming source over the parquet fixture: one file = one micro-batch
    * replay of the full history.
    */
  def readEvents(spark: SparkSession, dir: String): DataFrame =
    readEvents(spark, dir, maxFilesPerTrigger = None)

  /** [[readEvents]] with a micro-batch size bound: `maxFilesPerTrigger`
    * caps how many source files each trigger consumes — the lever that
    * turns a multi-file landing directory into a deterministic sequence of
    * micro-batches (file order = modification time, ties by path), which
    * outer joins and state eviction need: watermark advances BETWEEN
    * batches, never inside one.
    */
  def readEvents(spark: SparkSession, dir: String,
      maxFilesPerTrigger: Option[Int]): DataFrame =
    readEvents(spark, dir, maxFilesPerTrigger, tsTypeHint = None)

  /** [[readEvents]] with an explicit physical-ts-type hint, for the one
    * case the probe cannot serve: starting the stream against a landing
    * directory that has no files YET (a legitimate streaming deployment —
    * the query monitors the directory and picks files up as they land).
    * With a hint the probe is skipped entirely; without one an empty
    * directory fails loudly rather than guessing an encoding.
    */
  def readEvents(spark: SparkSession, dir: String,
      maxFilesPerTrigger: Option[Int], tsTypeHint: Option[DataType]): DataFrame = {
    // The nanosAsLong legacy conf is session-global and changes how every
    // later parquet read decodes ns timestamps — set it only when ns data is
    // actually in play (footer-probed below, or declared via a LongType
    // hint), in which case it must stay set for the stream's scans.
    if (tsTypeHint.contains(org.apache.spark.sql.types.LongType))
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // glob, not the bare file: the streaming source wants a directory-like
    // path to monitor (at scale this is the landing directory / Kafka topic).
    val glob = s"$dir/events*.parquet"
    // Footer-only batch probe for the physical ts type (no data scan): a
    // forced LongType schema over a timestamp[us] file would silently read
    // raw µs ints as if ns — 1000× timeline compression, structurally wrong
    // windows. Glob through the Hadoop FS (the batch reader's streaming-sink
    // metadata check logs a scary stack trace for glob paths) and probe a
    // SPREAD of up to 8 matched files (first/last/evenly spaced in path
    // order — encoding drift lands as a transition between generator
    // versions, which a spread straddles): a directory MIXING encodings
    // must fail loudly here, since one spliced type would silently misread
    // every file of the other encoding. Beyond the probe's coverage the
    // same mix surfaces as a scan-time conversion error.
    val tsType = tsTypeHint.getOrElse {
      val hPath = new org.apache.hadoop.fs.Path(glob)
      val matched = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .globStatus(hPath)
      require(matched != null && matched.nonEmpty,
        s"no events files match $glob — for a not-yet-populated landing " +
          "directory pass an explicit tsTypeHint (the probe needs one footer)")
      val sorted = matched.toSeq.sortBy(_.getPath.toString)
      val picks =
        if (sorted.size <= 8) sorted
        else (0 until 8).map(i => sorted(i * (sorted.size - 1) / 7)).distinct
      // conf-independent footer probe first: an ns file needs nanosAsLong
      // set BEFORE the spark.read schema probe below can even load it
      if (picks.exists(f =>
          graft.core.GraftSession.parquetTsIsNanos(spark, f.getPath.toString)))
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val probed = picks.map(f =>
        f.getPath.toString -> spark.read.parquet(f.getPath.toString).schema("ts").dataType)
      val tsTypes = probed.map(_._2).distinct
      // NOTE: the refusal is certain only within the sampled spread — a mix
      // confined to unsampled files of a >8-file directory passes the probe
      // and is caught by the scan-time backstop instead (the spliced type
      // mismatches the other encoding's parquet logical type, so the scan
      // fails loudly rather than misreading; EventsFixtureSpec pins this).
      require(tsTypes.size == 1,
        s"events files mix ts encodings ${tsTypes.mkString(", ")} — " +
          probed.groupBy(_._2).map { case (t, fs) => s"$t: ${fs.head._1}" }.mkString("; ") +
          s"; rewrite the directory to one encoding before streaming it " +
          s"(probe sampled ${picks.size} of ${sorted.size} files; a mix " +
          "confined to unsampled files fails at scan time instead)")
      tsTypes.head
    }
    val reader = spark.readStream.schema(rawSchema(tsType))
    maxFilesPerTrigger.foreach(m => reader.option("maxFilesPerTrigger", m))
    graft.core.GraftSession.normalizeEventTs(reader.parquet(glob))
  }

  /** Tumbling-window counts + sums per event type with a watermark. */
  def tumblingCounts(events: DataFrame, width: String, watermark: String): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), width), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("total"))
      .select(
        col("window.start").as("w_start"),
        col("window.end").as("w_end"),
        col("event_type"), col("n"), col("total"))

  /** Streaming OHLC: per (window, type) open/high/low/close of `value` —
    * open/close via `min_by`/`max_by` on the event timestamp (declarative
    * aggregates, so they partial-merge across micro-batches like any
    * watermarked windowed agg; deterministic because event ts is the
    * fixture's unique key).
    */
  def tumblingOhlc(events: DataFrame, width: String, watermark: String): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), width), col("event_type"))
      .agg(min_by(col("value"), col("ts")).as("open"),
        max(col("value")).as("high"),
        min(col("value")).as("low"),
        max_by(col("value"), col("ts")).as("close"))
      .select(col("window.start").as("w_start"), col("event_type"),
        col("open"), col("high"), col("low"), col("close"))

  /** Sliding-window event counts (width, slide). */
  def slidingCounts(events: DataFrame, width: String, slide: String, watermark: String): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), width, slide))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("w_start"), col("window.end").as("w_end"), col("n"))

  /** Stateful exact-once dedup on event_id within the watermark horizon
    * (`dropDuplicates` keeps per-key state, expired by the watermark).
    */
  def dedupEvents(events: DataFrame, watermark: String): DataFrame =
    events.withWatermark("ts", watermark).dropDuplicates(Seq("event_id"))

  /** Stream-static incremental dedup — the streaming counterpart of
    * [[graft.ops.Dedup.exactDedupIncremental]]: drop stream rows whose
    * content digest already exists in a STATIC digest state (the persisted
    * [[graft.ops.Dedup.contentDigests]] of earlier snapshots), then
    * watermark-dedup repeats arriving within the stream itself. Stream-
    * static left-anti joins are stateless on the stream side (the static
    * frame broadcasts or re-scans per micro-batch), so the only state held
    * is the watermark-bounded digest set of in-stream repeats — O(horizon),
    * not O(history).
    */
  def dedupAgainstState(stream: DataFrame, contentCol: org.apache.spark.sql.Column,
      staticDigests: DataFrame, watermark: String): DataFrame = {
    val seen = staticDigests.select(
      col(staticDigests.columns.head).as("__digest__"))
    stream
      // joinDigest (null -> -1 sentinel): a raw null digest never matches in
      // the anti-join, so null-content events would always pass as unseen
      .withColumn("__digest__", graft.ops.Dedup.joinDigest(contentCol))
      .join(seen, Seq("__digest__"), "left_anti")
      .withWatermark("ts", watermark)
      // NOT dropDuplicates(key): without the event-time column among the
      // keys Spark never evicts that state, so it would grow with every
      // distinct digest ever seen. WithinWatermark keys state eviction to
      // the watermark — the O(horizon) contract.
      .dropDuplicatesWithinWatermark(Seq("__digest__"))
      .drop("__digest__")
  }

  /** Per-user session windows with an inactivity gap: session end = last
    * event + gap (Spark `session_window` semantics).
    */
  def sessionCounts(events: DataFrame, gap: String, watermark: String): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("total"))
      .select(
        col("session_window.start").as("s_start"),
        col("session_window.end").as("s_end"),
        col("user_id"), col("n"), col("total"))

  /** Stream-stream inner join with event-time bounds: every `leftType` event
    * matched to the same user's `rightType` events in `[l_ts, l_ts + within]`.
    * Both sides carry watermarks and the join condition is time-bounded, so
    * each side's buffered state expires as the watermark advances — the
    * canonical bounded-state stream join (conversion attribution, funnel
    * steps) that stays O(active-horizon) at any throughput.
    */
  def intervalJoin(
      events: DataFrame,
      leftType: String, rightType: String,
      watermark: String, within: String): DataFrame =
    intervalJoin(events, leftType, rightType, watermark, within, "inner")

  /** Stream-stream interval join, inner or left-outer. The outer variant
    * emits a left row with null right columns only once the watermark
    * proves no match can still arrive (left state evicted) — so unmatched
    * rows surface in the micro-batch AFTER the watermark passes
    * `l_ts + within`, and a single-batch replay emits no outer rows at all.
    * Feed multi-batch input (maxFilesPerTrigger) when outer results matter.
    */
  def intervalJoin(
      events: DataFrame,
      leftType: String, rightType: String,
      watermark: String, within: String, joinType: String): DataFrame = {
    val l = events.filter(col("event_type") === leftType)
      .select(col("event_id").as("l_id"), col("user_id"), col("ts").as("l_ts"))
      .withWatermark("l_ts", watermark)
    val r = events.filter(col("event_type") === rightType)
      .select(col("event_id").as("r_id"), col("user_id").as("r_user"), col("ts").as("r_ts"))
      .withWatermark("r_ts", watermark)
    val joined = l.join(
      r,
      col("user_id") === col("r_user") &&
        col("r_ts") >= col("l_ts") &&
        col("r_ts") <= col("l_ts") + expr(s"INTERVAL $within"),
      joinType)
    // outer rows carry l_ts so callers can separate real unmatched rows
    // from watermark-driver sentinels; the inner shape stays as before
    if (joinType == "inner") joined.select(col("l_id"), col("r_id"), col("user_id"))
    else joined.select(col("l_id"), col("r_id"), col("user_id"), col("l_ts"))
  }

  /** Output row of [[statefulUserTotals]]. */
  final case class UserTotals(user_id: Long, n: Long, total: Double)

  /** Custom per-key state via `mapGroupsWithState` (the
    * `KeyValueGroupedDataset` custom-state API — arbitrary accumulator logic
    * the built-in aggregates can't express): running (count, sum) per user,
    * one updated row per key per micro-batch. State is one small tuple per
    * user — O(distinct users), partitioned across executors by key.
    */
  def statefulUserTotals(events: DataFrame): org.apache.spark.sql.Dataset[UserTotals] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
    val spark = events.sparkSession
    import spark.implicits._
    // Option decode, not (Long, Double): a NULL value (or user) in the
    // stream is ordinary data and the non-nullable tuple encoder kills the
    // whole QUERY with NOT_NULL_ASSERT_VIOLATION. SQL-aggregate semantics
    // instead: null values count toward n but add nothing to the total
    // (count(*) + sum-skips-nulls); null-user events are dropped map-side
    // (the typed output row cannot carry a null key).
    events.select(col("user_id").cast("long"), col("value").cast("double"))
      .as[(Option[Long], Option[Double])]
      .filter((r: (Option[Long], Option[Double])) => r._1.isDefined)
      .groupByKey(_._1.get)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[(Option[Long], Option[Double])],
            state: GroupState[(Long, Double)]) =>
          var (n, total) = state.getOption.getOrElse((0L, 0.0))
          rows.foreach { case (_, v) => n += 1; total += v.getOrElse(0.0) }
          state.update((n, total))
          UserTotals(user, n, total)
      }
  }

  /** The documents table as a streaming landing-directory source, with a
    * deterministic ingest time derived from doc_id (a real deployment's
    * Kafka/landing files carry arrival time; the fixture has none).
    */
  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  def readDocuments(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(docSchema).parquet(s"$dir/documents*.parquet")
      .withColumn("ts", timestamp_seconds(col("doc_id")))

  /** Streaming corpus curation: the batch cleaning recipe (token floor +
    * entropy floor + dedup) as ONE streaming plan. The stateless quality
    * gates run map-side BEFORE the stateful dedup, so dedup state only ever
    * holds gated survivors — gate placement is the state-size lever when
    * the stream is raw crawl at 100 TB/day.
    */
  def curateDocuments(stream: DataFrame, textCol: org.apache.spark.sql.Column,
      minTokens: Long, minEntropy: Double, staticDigests: DataFrame,
      watermark: String): DataFrame =
    dedupAgainstState(
      stream.filter(
        graft.ops.TextAnalysis.tokenCount(textCol) >= minTokens &&
          graft.ops.TextAnalysis.charEntropy(textCol) >= minEntropy),
      textCol, staticDigests, watermark)

  /** Drive a streaming frame to completion against the finite fixture and
    * return the materialized result (memory sink; `complete` for
    * aggregations so the final windows emit, `append` for row streams).
    */
  def runToCompletion(df: DataFrame, mode: String): DataFrame = {
    val name = s"graft_stream_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    val q = df.writeStream.outputMode(mode).format("memory").queryName(name).start()
    q.processAllAvailable()
    q.stop()
    df.sparkSession.table(name)
  }

  /** File-sink variant of [[runToCompletion]]: drives the stream through
    * `foreachBatch` with each micro-batch written as parquet under `outDir`
    * (overwrite for `complete` mode, append otherwise) — the shape that
    * connects these plans to a lakehouse sink at scale. The checkpoint
    * location carries source offsets + state; batch-id-keyed writes are the
    * exactly-once hook (idempotent re-write on replay).
    */
  def runToParquet(df: DataFrame, mode: String, outDir: String): DataFrame = {
    val writeMode = if (mode == "complete") "overwrite" else "append"
    val q = df.writeStream.outputMode(mode)
      .option("checkpointLocation", outDir + "_chk")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        batch.write.mode(writeMode).parquet(outDir)
      }
      .start()
    q.processAllAvailable()
    q.stop()
    df.sparkSession.read.parquet(outDir)
  }
}
