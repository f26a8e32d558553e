package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.AggState

/** Randomized algebra checks for the mergeable aggregate state: a generated
  * (key, value) corpus is split into random deltas, and the state folded
  * from the deltas must be BIT-IDENTICAL to the state built in one pass —
  * in every merge order, at every split, left- or right-folded (the
  * documented associativity/commutativity contract that makes snapshot
  * pipelines never re-scan history). Derived stats check against driver
  * mean/std.
  */
class AggStatePropertySpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSession.spark
  import spark.implicits._

  import PropertyTestKit.sampled

  private val rows: Seq[(String, Option[Double])] = {
    import org.scalacheck.Gen
    val v = Gen.frequency(
      8 -> Gen.chooseNum(-1000.0, 1000.0).map(x => Some(math.rint(x * 1e6) / 1e6)),
      1 -> Gen.const(None))
    val key = Gen.oneOf("k0", "k1", "k2", "k3", "k4")
    Seq.fill(300)((sampled(key), sampled(v)))
  }

  // exact textual form of a state frame — decimals compared as strings so
  // a single-ulp drift (the failure mode the decimal carry exists to
  // prevent) cannot hide behind tolerant comparison
  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(r => (0 until r.length).map(i =>
      if (r.isNullAt(i)) "<null>" else r.get(i).toString).mkString("|")).sorted.toSeq

  test("state folded from random deltas is bit-identical to the one-pass build") {
    import org.scalacheck.Gen
    val full = AggState.build(rows.toDF("k", "v"), Seq("k"), col("v"))
    val want = canon(full)
    for (trial <- 1 to 3) {
      val parts = sampled(Gen.chooseNum(2, 6))
      val assign = rows.map(r => (r, sampled(Gen.chooseNum(0, parts - 1))))
      val deltas = (0 until parts).map { p =>
        AggState.build(assign.collect { case (r, q) if q == p => r }
          .toDF("k", "v"), Seq("k"), col("v"))
      }
      val leftFold = deltas.reduceLeft((a, b) => AggState.merge(a, b, Seq("k")))
      assert(canon(leftFold) == want, s"trial $trial: left fold diverged")
      val reversed = deltas.reverse.reduceLeft((a, b) => AggState.merge(a, b, Seq("k")))
      assert(canon(reversed) == want, s"trial $trial: reversed merge order diverged")
    }
  }

  test("withStats matches driver mean/std on the exact state") {
    val state = AggState.build(rows.toDF("k", "v"), Seq("k"), col("v"))
    val got = AggState.withStats(state)
      .collect().map(r => r.getString(0) ->
        ((r.getAs[Double]("mean"), r.getAs[Double]("std")))).toMap
    rows.groupBy(_._1).foreach { case (k, rs) =>
      // the state quantizes to 6 decimals before accumulating — mirror it
      val vs = rs.flatMap(_._2).map(v => math.rint(v * 1e6) / 1e6)
      val (gm, gs) = got(k)
      if (vs.isEmpty) assert(gm.isNaN && gs.isNaN)
      else {
        val mean = vs.sum / vs.size
        assert(math.abs(gm - mean) < 1e-6, s"mean($k): $gm vs $mean")
        if (vs.size < 2) assert(gs.isNaN)
        else {
          val std = math.sqrt(vs.map(x => (x - mean) * (x - mean)).sum / (vs.size - 1))
          assert(math.abs(gs - std) < 1e-6, s"std($k): $gs vs $std")
        }
      }
    }
  }
}
