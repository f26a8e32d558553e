package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.EventStreams

/** Randomized stream-vs-driver differentials for the event-window family:
  * a generated event history (clustered timestamps so tumbling, sliding,
  * and session windows all get collisions and gaps) is written as a
  * parquet landing file, run through the ACTUAL streaming engine
  * (readStream → watermark → stateful agg → memory sink, complete mode so
  * lateness semantics cannot drop rows), and compared to driver window
  * arithmetic. The fixed-corpus streaming queries (q60-q63) prove
  * stream==batch-oracle on one dataset; this proves it on fresh data every
  * run.
  */
class StreamingPropertySpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSession.spark
  import spark.implicits._

  import PropertyTestKit.sampled

  private val base = 1700000000000000L // µs epoch, window-aligned arithmetic below

  // events clustered into bursts with > 2-minute quiet gaps between some
  private val events: Seq[(Long, Long, Long, String, Double)] = {
    import org.scalacheck.Gen
    var t = base
    Seq.tabulate(180) { i =>
      val gap = sampled(Gen.frequency(
        6 -> Gen.chooseNum(1_000_000L, 50_000_000L),       // 1-50 s
        1 -> Gen.chooseNum(130_000_000L, 400_000_000L)))   // 2.2-6.6 min
      t += gap
      (i.toLong, t, sampled(Gen.chooseNum(1L, 4L)),
        sampled(Gen.oneOf("view", "click", "buy")),
        math.rint(sampled(Gen.chooseNum(0.0, 100.0)) * 100) / 100)
    }
  }

  private lazy val landingDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("stream_prop").toFile
    val tmp = new java.io.File(dir, "_stage")
    // write via a typed frame with an explicit timestamp column (µs exact)
    val df = events.toDF("event_id", "us", "user_id", "event_type", "value")
      .withColumn("ts", timestamp_micros(col("us"))).drop("us")
      .withColumn("props", lit("{}"))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
    df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val part = tmp.listFiles().find(_.getName.endsWith(".parquet")).get
    val dest = new java.io.File(dir, "events_gen.parquet")
    java.nio.file.Files.move(part.toPath, dest.toPath)
    dir.toString
  }

  test("streaming tumbling counts match driver window arithmetic") {
    val width = 300_000_000L // 5 minutes in µs
    val got = EventStreams.runToCompletion(
        EventStreams.tumblingCounts(
          EventStreams.readEvents(spark, landingDir), "5 minutes", "1 minute"),
        mode = "complete")
      .collect().map(r => (r.getTimestamp(0).getTime, r.getString(2),
        r.getLong(3), r.getDouble(4))).toSet
    val want = events.groupBy { case (_, ts, _, et, _) =>
      (ts / width * width, et)
    }.map { case ((w, et), es) =>
      (w / 1000, et, es.size.toLong,
        math.rint(es.map(_._5).sum * 10000) / 10000)
    }.toSet
    assert(got == want, s"tumbling diverged:\n got=${got.toSeq.sorted.take(5)}...\nwant=${want.toSeq.sorted.take(5)}...")
  }

  test("streaming sliding counts match driver double-bucket arithmetic") {
    val width = 600_000_000L; val slide = 300_000_000L
    val got = EventStreams.runToCompletion(
        EventStreams.slidingCounts(
          EventStreams.readEvents(spark, landingDir), "10 minutes", "5 minutes", "1 minute"),
        mode = "complete")
      .collect().map(r => r.getTimestamp(0).getTime -> r.getLong(2)).toMap
    val want = events.flatMap { case (_, ts, _, _, _) =>
      // the two slide-aligned starts whose [start, start+width) contains ts
      val b = ts / slide * slide
      Seq(b, b - slide).filter(s => ts >= s && ts < s + width)
    }.groupBy(identity).map { case (s, hits) => s / 1000 -> hits.size.toLong }
    assert(got == want, "sliding diverged")
  }

  test("streaming session counts match a driver gap merge") {
    val gap = 120_000_000L // 2 minutes
    val got = EventStreams.runToCompletion(
        EventStreams.sessionCounts(
          EventStreams.readEvents(spark, landingDir), "2 minutes", "1 minute"),
        mode = "complete")
      .collect().map(r => (r.getTimestamp(0).getTime, r.getTimestamp(1).getTime,
        r.getLong(2), r.getLong(3), r.getDouble(4))).toSet
    val want = events.groupBy(_._3).toSeq.flatMap { case (uid, es) =>
      val ts = es.sortBy(_._2)
      val sessions = scala.collection.mutable.ArrayBuffer.empty[Seq[(Long, Long, Long, String, Double)]]
      var cur = scala.collection.mutable.ArrayBuffer(ts.head)
      ts.tail.foreach { e =>
        // session_window semantics: a session extends while the next event
        // starts BEFORE the current session end (prev ts + gap, exclusive)
        if (e._2 < cur.last._2 + gap) cur += e
        else { sessions += cur.toSeq; cur = scala.collection.mutable.ArrayBuffer(e) }
      }
      sessions += cur.toSeq
      sessions.map { s =>
        (s.head._2 / 1000, (s.last._2 + gap) / 1000, uid, s.size.toLong,
          math.rint(s.map(_._5).sum * 10000) / 10000)
      }
    }.toSet
    assert(got == want, "session diverged")
  }
}
