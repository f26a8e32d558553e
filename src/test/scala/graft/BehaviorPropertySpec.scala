package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Behavior

/** Randomized driver-reference differentials for the behavior-analytics
  * ops: generated per-user event timelines (repeat events, out-of-order
  * types, users that stall mid-funnel) check funnel step counts against a
  * driver first-match walk, topTransitions against a driver bigram count,
  * and conversionLag against a driver first-from/first-to-after scan.
  */
class BehaviorPropertySpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSession.spark
  import spark.implicits._

  import PropertyTestKit.sampled

  private val types = Vector("view", "cart", "buy", "refund")

  // per user: a strictly increasing timeline of typed events
  private val events: Seq[(Long, Long, String, Long)] = {
    import org.scalacheck.Gen
    var eid = 0L
    (1L to 25L).flatMap { u =>
      var t = 0L
      Seq.fill(sampled(Gen.chooseNum(1, 20))) {
        t += sampled(Gen.chooseNum(1L, 50L))
        eid += 1
        (u, t, sampled(Gen.oneOf(types)), eid)
      }
    }
  }

  test("funnel step counts match the driver first-match walk") {
    val steps = Seq("view", "cart", "buy")
    val got = Behavior.funnel(events.toDF("u", "t", "y", "eid"),
        col("u"), col("t"), col("y"), steps)
      .collect().map(r => r.getAs[Long]("step") -> r.getAs[Long]("users")).toMap
    val byUser = events.groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    val counts = steps.indices.map { si =>
      byUser.values.count { tl =>
        // walk: first step-0 event, then first later step-1 event, ...
        var prev = Option.empty[Long]
        var ok = true
        for (s <- 0 to si if ok) {
          val hit = tl.find(e => e._3 == steps(s) &&
            (prev.isEmpty || e._2 > prev.get)).map(_._2)
          if (hit.isEmpty) ok = false else prev = hit
        }
        ok
      }.toLong
    }
    steps.indices.foreach { i =>
      assert(got(i + 1L) == counts(i), s"step ${i + 1}: ${got(i + 1L)} vs ${counts(i)}")
    }
    // monotone by construction
    assert(counts.zip(counts.tail).forall { case (a, b) => a >= b })
  }

  test("topTransitions matches the driver bigram count") {
    val got = Behavior.topTransitions(events.toDF("u", "t", "y", "eid"),
        col("u"), col("t"), col("y"), col("eid"), topN = 100)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getAs[Long]("n")).toMap
    val want = events.groupBy(_._1).values.flatMap { tl =>
      tl.sortBy(e => (e._2, e._4)).map(_._3).sliding(2).filter(_.size == 2)
        .map(p => (p(0), p(1)))
    }.toSeq.groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(got == want, "transition counts diverged")
  }

  test("conversionLag matches the driver first-from/first-to-after scan") {
    val df = events.toDF("u", "us", "y", "eid")
      .withColumn("t", timestamp_micros(col("us") * 1000000L))
    val row = Behavior.conversionLag(df, col("u"), col("t"), col("y"), "view", "buy")
      .head()
    val byUser = events.groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    val lags = byUser.values.flatMap { tl =>
      tl.find(_._3 == "view").flatMap { v =>
        tl.find(e => e._3 == "buy" && e._2 >= v._2).map(b => (b._2 - v._2).toDouble)
      }
    }.toSeq.sorted
    assert(row.getAs[Long]("converted_users") == lags.size)
    def type7(p: Double): Double = {
      val h = (lags.size - 1) * p
      lags(h.floor.toInt) + (h - h.floor) * (lags(h.ceil.toInt) - lags(h.floor.toInt))
    }
    assert(math.abs(row.getAs[Double]("p50_sec") - math.rint(type7(0.5) * 10000) / 10000) < 1e-9)
    assert(math.abs(row.getAs[Double]("p90_sec") - math.rint(type7(0.9) * 10000) / 10000) < 1e-9)
  }
}
