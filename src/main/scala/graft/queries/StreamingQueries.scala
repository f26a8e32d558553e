package graft.queries

import org.apache.spark.sql.functions._
import graft.streaming.EventStreams

/** Structured Streaming corpus (SURVEY.md §7 M5a): each query actually runs
  * the streaming engine (readStream → watermark → stateful op → memory
  * sink, driven to completion) and the materialized result is compared to a
  * batch SQL oracle over the same events — proving the streaming plans
  * compute the same answers the batch engine would.
  */
object StreamingQueries {

  /** Tumbling 5-minute windows per event type with watermark. */
  val q60_stream_tumbling: Q = Q(
    fn = (s, dir) => {
      val out = EventStreams.runToCompletion(
        EventStreams.tumblingCounts(EventStreams.readEvents(s, dir), "5 minutes", "1 minute"),
        mode = "complete")
      out.orderBy(col("w_start"), col("event_type"))
    },
    oracle = Some("""
      SELECT time_bucket(INTERVAL '5 minutes', ts) AS w_start,
             time_bucket(INTERVAL '5 minutes', ts) + INTERVAL '5 minutes' AS w_end,
             event_type, count(*) AS n, round(sum(value), 4) AS total
      FROM events
      GROUP BY 1, 2, 3
      ORDER BY w_start, event_type"""))

  /** Sliding windows: width 10 min, slide 5 min — every event lands in two
    * windows; the oracle unnests both bucket starts.
    */
  val q61_stream_sliding: Q = Q(
    fn = (s, dir) => {
      val out = EventStreams.runToCompletion(
        EventStreams.slidingCounts(EventStreams.readEvents(s, dir), "10 minutes", "5 minutes", "1 minute"),
        mode = "complete")
      out.orderBy(col("w_start"))
    },
    oracle = Some("""
      SELECT w_start, w_start + INTERVAL '10 minutes' AS w_end, count(*) AS n
      FROM (SELECT UNNEST([time_bucket(INTERVAL '5 minutes', ts),
                           time_bucket(INTERVAL '5 minutes', ts) - INTERVAL '5 minutes']) AS w_start
            FROM events)
      GROUP BY w_start
      ORDER BY w_start"""))

  /** Stateful streaming dedup: two replays of the stream unioned (every
    * event twice) → `dropDuplicates(event_id)` with watermark state →
    * exactly one row per event survives.
    */
  val q62_stream_dedup: Q = Q(
    fn = (s, dir) => {
      val doubled = EventStreams.readEvents(s, dir)
        .unionByName(EventStreams.readEvents(s, dir))
      val deduped = EventStreams.runToCompletion(
        EventStreams.dedupEvents(doubled, "1 minute"), mode = "append")
      deduped.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), count_distinct(col("event_id")).as("n_ids"))
        .orderBy(col("event_type"))
    },
    oracle = Some("""
      SELECT event_type, count(*) AS n, count(DISTINCT event_id) AS n_ids
      FROM events
      GROUP BY event_type
      ORDER BY event_type"""))

  /** Per-user session windows (10-minute inactivity gap): streaming
    * `session_window` vs the batch gaps-and-islands derivation. Session end
    * = last event + gap; a gap of exactly 10 minutes starts a new session
    * (window end is exclusive).
    */
  val q63_stream_sessions: Q = Q(
    fn = (s, dir) => {
      val out = EventStreams.runToCompletion(
        EventStreams.sessionCounts(EventStreams.readEvents(s, dir), "10 minutes", "1 minute"),
        mode = "complete")
      out.orderBy(col("user_id"), col("s_start"))
    },
    oracle = Some("""
      WITH e AS (
        SELECT user_id, ts, value,
               CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                         OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                            >= INTERVAL '10 minutes'
                    THEN 1 ELSE 0 END AS new_s
        FROM events),
      s AS (
        SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        FROM e)
      SELECT min(ts) AS s_start,
             max(ts) + INTERVAL '10 minutes' AS s_end,
             user_id, count(*) AS n, round(sum(value), 4) AS total
      FROM s
      GROUP BY user_id, sid
      ORDER BY user_id, s_start"""))

  /** Stream-stream interval join (bounded-state conversion attribution):
    * clicks matched to same-user purchases within 30 minutes, replayed
    * against the batch self-join oracle.
    */
  val q85_stream_interval_join: Q = Q(
    fn = (s, dir) => {
      val ev = EventStreams.readEvents(s, dir)
      val out = EventStreams.runToCompletion(
        EventStreams.intervalJoin(ev, "click", "purchase", watermark = "1 minute", within = "30 minutes"),
        mode = "append")
      out.orderBy(col("l_id"), col("r_id"))
    },
    oracle = Some("""
      SELECT c.event_id AS l_id, p.event_id AS r_id, c.user_id
      FROM events c
      JOIN events p
        ON c.user_id = p.user_id
       AND p.ts >= c.ts
       AND p.ts <= c.ts + INTERVAL '30 minutes'
      WHERE c.event_type = 'click' AND p.event_type = 'purchase'
      ORDER BY l_id, r_id"""))

  /** Custom stateful accumulation (`mapGroupsWithState`): per-user running
    * (count, total). The fixture replays as one micro-batch, so the final
    * update per user equals the batch aggregate — the oracle.
    */
  val q86_stream_stateful_totals: Q = Q(
    fn = (s, dir) => {
      val out = EventStreams.runToCompletion(
        EventStreams.statefulUserTotals(EventStreams.readEvents(s, dir)).toDF(),
        mode = "update")
      out.select(col("user_id"), col("n"), round(col("total"), 4).as("total"))
        .orderBy(col("user_id"))
    },
    oracle = Some("""
      SELECT user_id, count(*) AS n, round(sum(value), 4) AS total
      FROM events
      GROUP BY user_id
      ORDER BY user_id"""))

  /** Stream-stream LEFT-OUTER interval join ([[EventStreams.intervalJoin]]
    * with `leftOuter`): clicks with their within-30-min purchase, or null
    * right columns when the watermark PROVES no purchase can still arrive.
    *
    * Outer rows only emit when left state is evicted, which happens in the
    * micro-batch AFTER the watermark passes `l_ts + within` — so the replay
    * stages the history as three deterministic micro-batches
    * (`maxFilesPerTrigger = 1`, file order pinned by explicit modification
    * times): (1) the real events, (2) a far-future sentinel click that
    * advances the watermark past every real row, (3) a second sentinel
    * whose batch runs WITH that advanced watermark and flushes every
    * unmatched real click. Sentinels are excluded from the result by their
    * timestamp. This is exactly the production shape: a quiet landing
    * directory needs one more arrival (or a no-data trigger) before the
    * final outer rows surface.
    */
  val q195_stream_outer_join: Q = Q(
    fn = (s, dir) => {
      val staged = java.nio.file.Paths.get(
        sys.props("java.io.tmpdir"), "graft_scratch", "events_outer").toString
      val stagedDir = new java.io.File(staged)
      if (stagedDir.exists()) stagedDir.listFiles().foreach(f =>
        org.apache.commons.io.FileUtils.deleteQuietly(f))
      stagedDir.mkdirs()
      def writeOne(df: org.apache.spark.sql.DataFrame, name: String, mtime: Long): Unit = {
        val tmp = staged + "_tmp"
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        val part = new java.io.File(tmp).listFiles()
          .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
        val dst = new java.io.File(stagedDir, name)
        java.nio.file.Files.move(part.toPath, dst.toPath,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        dst.setLastModified(mtime)
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
      }
      // read through the schema-adaptive path (ns or µs fixture both land
      // on TimestampType), so the staged copies and sentinels share one
      // encoding no matter how the fixture drifts
      val raw = graft.core.GraftSession.table(s, dir, "events")
      val t0 = 1600000000000L // fixed epoch-ms stamps: deterministic file order
      writeOne(raw, "events_1.parquet", t0)
      // one sentinel per JOIN BRANCH: the global watermark is the MIN over
      // both sides' watermarks, and each side filters to its own event
      // type — a click-only sentinel would advance the click branch while
      // the purchase branch (never seeing it) pins the join watermark in
      // the past and the tail of unmatched clicks never flushes
      def sentinel(id: Long, isoDay: String) = {
        import s.implicits._
        Seq("click", "purchase").toDF("event_type")
          .withColumn("event_id", lit(id))
          .withColumn("ts", lit(isoDay).cast("timestamp"))
          .withColumn("user_id", lit(-1L))
          .withColumn("value", lit(0.0))
          .withColumn("props", lit(null).cast("string"))
          .select(raw.columns.map(col): _*)
      }
      writeOne(sentinel(-1L, "2030-01-01"), "events_2.parquet", t0 + 60000)
      writeOne(sentinel(-2L, "2031-01-01"), "events_3.parquet", t0 + 120000)
      val ev = EventStreams.readEvents(s, staged, maxFilesPerTrigger = Some(1))
      val out = EventStreams.runToCompletion(
        EventStreams.intervalJoin(ev, "click", "purchase",
          watermark = "1 minute", within = "30 minutes", joinType = "leftOuter"),
        mode = "append")
      out.filter(col("l_ts") < lit("2028-01-01").cast("timestamp"))
        .select(col("l_id"), col("r_id"), col("user_id"))
        .orderBy(col("l_id"), col("r_id"))
    },
    oracle = Some("""
      SELECT c.event_id AS l_id, p.event_id AS r_id, c.user_id
      FROM events c
      LEFT JOIN events p
        ON c.user_id = p.user_id
       AND p.event_type = 'purchase'
       AND p.ts >= c.ts
       AND p.ts <= c.ts + INTERVAL '30 minutes'
      WHERE c.event_type = 'click'
      ORDER BY l_id, r_id"""))

  /** Streaming OHLC ([[EventStreams.tumblingOhlc]]): min_by/max_by inside
    * a watermarked window aggregate, replayed against the batch
    * arg_min/arg_max oracle.
    */
  val q210_stream_ohlc: Q = Q(
    fn = (s, dir) => {
      val out = EventStreams.runToCompletion(
        EventStreams.tumblingOhlc(EventStreams.readEvents(s, dir),
          "1 hour", watermark = "1 minute"),
        mode = "complete")
      out.select(col("w_start"), col("event_type"),
          round(col("open"), 4).as("open"), round(col("high"), 4).as("high"),
          round(col("low"), 4).as("low"), round(col("close"), 4).as("close"))
        .orderBy(col("w_start"), col("event_type"))
    },
    oracle = Some("""
      -- struct-packed arg_min/arg_max (the q204 discipline): the engine's
      -- min_by/max_by return the strict first/last value, null included
      SELECT time_bucket(INTERVAL '1 hour', ts) AS w_start, event_type,
             round(arg_min({'v': value}, ts).v, 4) AS open,
             round(max(value), 4) AS high,
             round(min(value), 4) AS low,
             round(arg_max({'v': value}, ts).v, 4) AS close
      FROM events
      GROUP BY 1, 2
      ORDER BY 1, 2"""))

  val all: Map[String, Q] = Map(
    "q195_stream_outer_join" -> q195_stream_outer_join,
    "q210_stream_ohlc" -> q210_stream_ohlc,
    "q85_stream_interval_join" -> q85_stream_interval_join,
    "q86_stream_stateful_totals" -> q86_stream_stateful_totals,
    "q60_stream_tumbling" -> q60_stream_tumbling,
    "q61_stream_sliding" -> q61_stream_sliding,
    "q62_stream_dedup" -> q62_stream_dedup,
    "q63_stream_sessions" -> q63_stream_sessions)
}
