package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.History

/** Randomized driver-reference differentials for the SCD2 lifecycle ops:
  * generated snapshot stacks (repeated values, null attribute states,
  * single-version keys) collapse to change-run intervals, checked against
  * a driver scan; point-in-time lookups (including timestamps before the
  * first version and after the last) check against a driver interval walk.
  */
class HistoryPropertySpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSession.spark
  import spark.implicits._

  import PropertyTestKit.sampled

  // per key: snapshots at versions 1..n with an attribute that repeats and
  // sometimes goes null (null->value and value->null must open intervals)
  private val snaps: Seq[(String, Long, Option[String])] = {
    import org.scalacheck.Gen
    val attr = Gen.frequency(
      3 -> Gen.oneOf("a", "b", "c").map(Some(_)),
      1 -> Gen.const(None))
    Seq("e1", "e2", "e3", "e4").flatMap { k =>
      val n = sampled(Gen.chooseNum(1, 12))
      (1 to n).map(v => (k, v.toLong, sampled(attr)))
    }
  }

  private def refIntervals: Seq[(String, Long, Option[Long], Option[String])] =
    snaps.groupBy(_._1).toSeq.flatMap { case (k, rows) =>
      val ordered = rows.sortBy(_._2)
      val changes = ordered.zipWithIndex.filter { case ((_, _, a), i) =>
        i == 0 || a != ordered(i - 1)._3
      }.map(_._1)
      changes.zipWithIndex.map { case ((_, v, a), i) =>
        val to = if (i + 1 < changes.length) Some(changes(i + 1)._2) else None
        (k, v, to, a)
      }
    }

  test("scd2 matches the driver change-run scan, null transitions included") {
    val df = snaps.map { case (k, v, a) => (k, v, a.orNull) }.toDF("k", "v", "attr")
    val got = History.scd2(df, Seq("k"), "v", Seq("attr"))
      .collect().map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        Option(r.getString(3)))).toSet
    assert(got == refIntervals.toSet, s"scd2 diverged:\n got=$got\nwant=${refIntervals.toSet}")
    // intervals tile the axis per key: from(next) == to(prev), last open
    got.groupBy(_._1).foreach { case (k, ivs) =>
      val sorted = ivs.toSeq.sortBy(_._2)
      sorted.sliding(2).foreach {
        case Seq(a, b) => assert(a._3.contains(b._2), s"gap in $k tiling")
        case _ =>
      }
      assert(sorted.last._3.isEmpty, s"last interval of $k must be open")
    }
  }

  test("pointInTime matches a driver interval walk, outside-range facts included") {
    import org.scalacheck.Gen
    val history = History.scd2(
      snaps.map { case (k, v, a) => (k, v, a.orNull) }.toDF("k", "v", "attr"),
      Seq("k"), "v", Seq("attr"))
    // fact times 0..14 cover before-first (0) and after-last versions
    val facts = Seq.tabulate(60)(i =>
      (sampled(Gen.oneOf("e1", "e2", "e3", "e4", "e_unknown")),
        sampled(Gen.chooseNum(0L, 14L)), i.toLong))
    val got = History.pointInTime(facts.toDF("k", "t", "fid"), "t",
        history, Seq("k"), Seq("attr"))
      .collect().map(r => r.getAs[Long]("fid") -> Option(r.getAs[String]("attr"))).toMap
    val ref = refIntervals
    facts.foreach { case (k, t, fid) =>
      val live = ref.filter(iv => iv._1 == k && iv._2 <= t)
        .sortBy(_._2).lastOption.flatMap(_._4)
      assert(got(fid) == live, s"fact $fid (k=$k, t=$t): ${got(fid)} vs $live")
    }
  }
}
