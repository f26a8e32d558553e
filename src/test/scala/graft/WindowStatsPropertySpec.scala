package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.WindowStats

/** Randomized driver-reference differentials for the window-statistics
  * family: generated multi-key series (with nulls where the contract
  * admits them) are checked against direct driver folds of the pandas
  * formulas each op documents — ewm both adjust modes, linear
  * interpolation, gap sessionization, rolling corr/quantile.
  */
class WindowStatsPropertySpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSession.spark
  import spark.implicits._

  import PropertyTestKit.sampled

  // per key: a series of (order, value) with UNIQUE, IRREGULARLY-gapped
  // order positions — unique so the engine's collect_list order is not
  // tie-ambiguous, irregular so row-position semantics (the documented
  // pandas default-index contract, e.g. interpolate weights) cannot be
  // confused with order-VALUE distance semantics (review finding: with
  // uniform gaps the two coincide and the differential cannot tell them
  // apart)
  private val series: Map[String, Seq[(Long, Double)]] = {
    import org.scalacheck.Gen
    val v = Gen.chooseNum(-20.0, 20.0)
    Seq("g0", "g1", "g2").map { k =>
      val n = sampled(Gen.chooseNum(5, 40))
      var o = 0L
      k -> Seq.fill(n) { o += sampled(Gen.chooseNum(1L, 19L)); (o, sampled(v)) }
    }.toMap
  }

  private def seriesDf = series.toSeq
    .flatMap { case (k, s) => s.map { case (o, x) => (k, o, x) } }
    .toDF("k", "o", "x")

  test("ewmMean matches the driver recurrence, both adjust modes") {
    for (adjust <- Seq(false, true); alpha <- Seq(0.2, 0.7, 1.0)) {
      val got = WindowStats.ewmMean(seriesDf, Seq("k"), "o", "x", alpha, adjust)
        .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(3)).toMap
      val beta = 1.0 - alpha
      series.foreach { case (k, s) =>
        if (adjust) {
          var num = 0.0; var den = 0.0
          s.foreach { case (o, x) =>
            num = x + num * beta; den = 1.0 + den * beta
            assert(math.abs(got((k, o)) - num / den) < 1e-9,
              s"ewm adjust=true alpha=$alpha at ($k,$o)")
          }
        } else {
          var y = Double.NaN
          s.zipWithIndex.foreach { case ((o, x), i) =>
            y = if (i == 0) x else alpha * x + beta * y
            assert(math.abs(got((k, o)) - y) < 1e-9,
              s"ewm adjust=false alpha=$alpha at ($k,$o)")
          }
        }
      }
    }
  }

  test("interpolateLinear matches the driver gap fill") {
    import org.scalacheck.Gen
    // re-use the orders but null ~1/3 of values; ensure nulls at both edges
    val rows = series.toSeq.flatMap { case (k, s) =>
      s.zipWithIndex.map { case ((o, x), i) =>
        val v = if (i == 0 || i == s.length - 1 ||
          sampled(Gen.chooseNum(0, 2)) == 0) None else Some(x)
        (k, o, v)
      }
    }
    val got = WindowStats.interpolateLinear(rows.toDF("k", "o", "x"),
        Seq("k"), Seq(col("o")), "x")
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    rows.groupBy(_._1).foreach { case (k, rs) =>
      val s = rs.sortBy(_._2)
      s.indices.foreach { i =>
        val (_, o, v) = s(i)
        val want: Option[Double] = v match {
          case Some(x) => Some(x)
          case None =>
            val prev = (i - 1 to 0 by -1).find(j => s(j)._3.isDefined)
            val next = (i + 1 until s.length).find(j => s(j)._3.isDefined)
            (prev, next) match {
              case (None, _) => None
              case (Some(p), None) => s(p)._3
              case (Some(p), Some(nx)) =>
                val pv = s(p)._3.get; val nv = s(nx)._3.get
                Some(pv + (nv - pv) * (i - p).toDouble / (nx - p).toDouble)
            }
        }
        (got((k, o)), want) match {
          case (None, None) =>
          case (Some(g), Some(w)) =>
            assert(math.abs(g - w) < 1e-9, s"interp at ($k,$o): $g vs $w")
          case other => fail(s"interp at ($k,$o): $other")
        }
      }
    }
  }

  test("sessionize matches the driver gap scan") {
    import org.scalacheck.Gen
    val gap = 10L
    val rows = Seq("g0", "g1").flatMap { k =>
      var t = 0L
      Seq.fill(40) {
        t += sampled(Gen.frequency(3 -> Gen.chooseNum(1L, 9L), 1 -> Gen.chooseNum(11L, 40L)))
        (k, t)
      }
    }
    val got = WindowStats.sessionize(rows.toDF("k", "t"), Seq("k"),
        Seq(col("t")), "t", gapMicros = gap)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    rows.groupBy(_._1).foreach { case (k, rs) =>
      var sid = 0L; var prev = Long.MinValue
      rs.map(_._2).sorted.foreach { t =>
        if (prev == Long.MinValue || t - prev > gap) sid += 1
        assert(got((k, t)) == sid, s"session at ($k,$t): ${got((k, t))} vs $sid")
        prev = t
      }
    }
  }

  test("rollingCorr and rollingQuantile match driver folds over the last n rows") {
    val n = 5
    val w = Window.partitionBy(col("k")).orderBy(col("o"))
    val df2 = seriesDf.withColumn("y", col("x") * 2 + pmod(col("o"), lit(7)).cast("double"))
    val got = df2
      .withColumn("rc", WindowStats.rollingCorr(col("x"), col("y"), n, w))
      .withColumn("rq", WindowStats.rollingQuantile(col("x"), 0.25, n, w))
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        ((if (r.isNullAt(4)) None else Some(r.getDouble(4))),
          (if (r.isNullAt(5)) None else Some(r.getDouble(5))))).toMap
    series.foreach { case (k, s) =>
      val xs = s.map(_._2)
      val ys = s.map { case (o, x) => x * 2 + (o % 7).toDouble }
      s.indices.foreach { i =>
        val (o, _) = s(i)
        val (gc, gq) = got((k, o))
        if (i < n - 1) assert(gc.isEmpty && gq.isEmpty, s"warm-up at ($k,$o)")
        else {
          val wx = xs.slice(i - n + 1, i + 1); val wy = ys.slice(i - n + 1, i + 1)
          val sx = wx.sum; val sy = wy.sum
          val sxy = wx.zip(wy).map { case (a, b) => a * b }.sum
          val sx2 = wx.map(a => a * a).sum; val sy2 = wy.map(b => b * b).sum
          val corrW = (n * sxy - sx * sy) /
            (math.sqrt(n * sx2 - sx * sx) * math.sqrt(n * sy2 - sy * sy))
          assert(math.abs(gc.get - corrW) < 1e-6, s"rollingCorr at ($k,$o)")
          val srt = wx.sorted.toIndexedSeq
          val h = (n - 1) * 0.25
          val quantW = srt(h.floor.toInt) + (h - h.floor) *
            (srt(h.ceil.toInt) - srt(h.floor.toInt))
          assert(math.abs(gq.get - quantW) < 1e-9, s"rollingQuantile at ($k,$o)")
        }
      }
    }
  }
}
