package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.RankStats

/** Randomized driver-reference differentials for the rank-statistics
  * family. The oracle corpus verifies these ops against DuckDB on fixed
  * tables; this spec generates tie-heavy columns with nulls and checks the
  * distributed implementations against small, obviously-correct driver
  * folds (type-7 quantiles, average-rank Pearson, O(n^2) tau-b pairs).
  */
class RankStatsPropertySpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSession.spark
  import spark.implicits._

  import PropertyTestKit.sampled

  // tie-heavy pairs: x mixes a small integer domain (ties) with continuous
  // values; y correlates loosely with x so tau/rho are neither 0 nor 1
  private val rows: Seq[(Option[Double], Option[Double])] = {
    import org.scalacheck.Gen
    val x = Gen.frequency(
      3 -> Gen.chooseNum(0, 6).map(_.toDouble),
      2 -> Gen.chooseNum(-50.0, 50.0),
      1 -> Gen.const(3.0)) // extra mass on one tie value
    val pair = for {
      xv <- x
      noise <- Gen.chooseNum(-10.0, 10.0)
      nx <- Gen.frequency(9 -> Gen.const(false), 1 -> Gen.const(true))
      ny <- Gen.frequency(9 -> Gen.const(false), 1 -> Gen.const(true))
    } yield (if (nx) None else Some(xv), if (ny) None else Some(xv * 2 + noise))
    Seq.fill(150)(sampled(pair))
  }

  private def df = rows.toDF("x", "y")

  private def clean: Seq[(Double, Double)] =
    rows.collect { case (Some(a), Some(b)) => (a, b) }

  import PropertyTestKit.type7

  test("exactQuantiles matches driver type-7 interpolation on tie-heavy data") {
    val xs = rows.flatMap(_._1).sorted.toIndexedSeq
    val ps = Seq(0.0, 0.01, 0.25, 0.5, 0.75, 0.9, 0.99, 1.0)
    val got = RankStats.exactQuantiles(df, "x", ps)
    ps.zip(got).foreach { case (p, g) =>
      val want = type7(xs, p)
      assert(math.abs(g - want) < 1e-9, s"quantile $p: $g vs $want")
    }
  }

  private def averageRanks(v: Seq[Double]): Seq[Double] = {
    val sortedVals = v.sorted
    val firstPos = sortedVals.zipWithIndex.groupBy(_._1).view
      .mapValues(g => (g.map(_._2).sum.toDouble / g.size) + 1.0).toMap
    v.map(firstPos)
  }

  test("safeCorr equals the built-in corr on randomized non-degenerate data") {
    // the ANSI-safe spelling (covar_pop / sqrt(var_pop*var_pop)) must be the
    // SAME statistic as built-in corr wherever the built-in is defined; the
    // guard only changes behavior where the built-in THROWS (zero variance)
    import org.apache.spark.sql.functions._
    val pairs = clean
    val d = pairs.toDF("a", "b")
    val row = d.agg(corr(col("a"), col("b")),
      graft.sdf.SCol.safeCorr(col("a"), col("b"))).head()
    if (row.isNullAt(0)) assert(row.isNullAt(1), "both must agree on undefined")
    else assert(math.abs(row.getDouble(0) - row.getDouble(1)) < 1e-10,
      s"corr ${row.getDouble(0)} vs safeCorr ${row.getDouble(1)}")
    // per-group agreement, including groups the generator makes tiny
    val g = pairs.zipWithIndex.map { case ((a, b), i) => (i % 7, a, b) }
      .toDF("g", "a", "b")
    val both = g.groupBy(col("g")).agg(
        corr(col("a"), col("b")).as("c1"),
        graft.sdf.SCol.safeCorr(col("a"), col("b")).as("c2"))
      .collect()
    both.foreach { r =>
      val c1 = if (r.isNullAt(1)) Double.NaN else r.getDouble(1)
      val c2 = if (r.isNullAt(2)) Double.NaN else r.getDouble(2)
      assert((c1.isNaN && c2.isNaN) || math.abs(c1 - c2) < 1e-10,
        s"group ${r.getInt(0)}: $c1 vs $c2")
    }
  }

  test("spearman matches driver average-rank Pearson") {
    val (xs, ys) = clean.unzip
    val (ra, rb) = (averageRanks(xs), averageRanks(ys))
    val n = ra.length
    val ma = ra.sum / n; val mb = rb.sum / n
    val cov = ra.zip(rb).map { case (a, b) => (a - ma) * (b - mb) }.sum
    val va = ra.map(a => (a - ma) * (a - ma)).sum
    val vb = rb.map(b => (b - mb) * (b - mb)).sum
    val want = cov / math.sqrt(va * vb)
    val got = RankStats.spearman(df, "x", "y")
    assert(math.abs(got - want) < 1e-9, s"spearman $got vs $want")
  }

  test("kendall tau-b matches the O(n^2) driver pair count") {
    val data = clean
    var c = 0L; var d = 0L; var tx = 0L; var ty = 0L; var n0 = 0L
    for (i <- data.indices; j <- (i + 1) until data.length) {
      val ((x1, y1), (x2, y2)) = (data(i), data(j))
      n0 += 1
      val p = (x1 - x2) * (y1 - y2)
      if (x1 == x2) tx += 1
      if (y1 == y2) ty += 1
      if (p > 0) c += 1 else if (p < 0) d += 1
    }
    val want = (c - d) / math.sqrt((n0 - tx).toDouble * (n0 - ty).toDouble)
    val got = RankStats.kendall(df, "x", "y")
    assert(math.abs(got - want) < 1e-9, s"kendall $got vs $want")
  }

  test("trimmedMean matches the driver quantile-band mean") {
    val xs = rows.flatMap(_._1).sorted.toIndexedSeq
    val p = 0.1
    val lo = type7(xs, p); val hi = type7(xs, 1 - p)
    val band = xs.filter(v => v >= lo && v <= hi)
    val want = band.sum / band.size
    val got = RankStats.trimmedMean(df, "x", p)
    assert(math.abs(got - want) < 1e-9, s"trimmedMean $got vs $want")
  }
}
