package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sdf.SDF

/** Crash-free-on-degenerate-input sweep: the statistic/similarity/text
  * surface driven over the frames that crashed or silently lied before the
  * round-11 ANSI sweep — empty, all-null, single-row, constant, NaN-laced,
  * zero-containing, negative-containing, zero-vector, empty/null text.
  * Spark 4's default ANSI mode turns an unguarded `x/0` (or `1/x` at x=0)
  * into a job-killing throw, so every op here must (a) never throw on these
  * shapes and (b) return the pandas/scipy-flavored NaN/null/0 value where
  * one is defined. A new statistic that forgets its guard fails this sweep
  * before it can ship.
  */
class DegenerateInputSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSession.spark
  import spark.implicits._

  private def col1(vals: Seq[Option[Double]]): SDF =
    SDF(vals.toDF("x"))

  private val empty = col1(Seq.empty)
  private val allNull = col1(Seq(None, None))
  private val single = col1(Seq(Some(5.0)))
  private val constant = col1(Seq(Some(5.0), Some(5.0), Some(5.0), Some(5.0)))
  private val nanLaced = col1(Seq(Some(1.0), Some(Double.NaN), Some(3.0)))
  private val withZero = col1(Seq(Some(2.0), Some(0.0), Some(8.0)))
  private val withNeg = col1(Seq(Some(2.0), Some(-3.0), Some(8.0)))

  private val frames: Seq[(String, SDF)] = Seq(
    "empty" -> empty, "all-null" -> allNull, "single" -> single,
    "constant" -> constant, "nan-laced" -> nanLaced,
    "with-zero" -> withZero, "with-negative" -> withNeg)

  test("every scalar statistic survives every degenerate frame (no ANSI throw)") {
    val stats: Seq[(String, SDF => Double)] = Seq(
      "mean" -> (_("x").mean), "std" -> (_("x").std),
      "variance" -> (_("x").variance), "mad" -> (_("x").mad),
      "kurt" -> (_("x").kurt), "skew" -> (_("x").skew),
      "geomean" -> (_("x").geomean), "harmonicMean" -> (_("x").harmonicMean),
      "quantileApprox" -> (_("x").quantileApprox(0.5)),
      "prod" -> (_("x").prod), "sum" -> (_("x").sum_))
    for ((fn, f) <- frames; (sn, s) <- stats) {
      val v = try s(f) catch {
        case e: Exception => fail(s"$sn on $fn threw: ${e.getMessage.take(120)}")
      }
      assert(!v.isInfinity || sn == "sum",
        s"$sn on $fn must not be infinite, got $v")
    }
  }

  test("defined degenerate values: the pandas/scipy contracts") {
    assert(empty("x").mean.isNaN && allNull("x").mean.isNaN)
    assert(single("x").std.isNaN, "sample std of one row")
    assert(constant("x").std == 0.0)
    assert(constant("x").corrWith(lit(1.0) * col("x")).isNaN,
      "corr of constants is undefined, not 0.0 and not a crash")
    assert(single("x").geomean == 5.0 && single("x").harmonicMean == 5.0)
    assert(withZero("x").harmonicMean == 0.0, "scipy hmean with a zero is 0")
    assert(withZero("x").geomean == 0.0, "scipy gmean with a zero is 0")
    assert(withNeg("x").geomean.isNaN, "scipy gmean with a negative is NaN")
    assert(withNeg("x").harmonicMean.isNaN,
      "hmean with a negative is a scipy domain error — NaN, never a finite lie")
    assert(nanLaced("x").hasnans, "hasnans sees real NaN")
    assert(empty("x").prod == 1.0, "pandas prod of empty is 1.0")
  }

  test("binning, histogram and value_counts survive empty/constant frames") {
    for ((fn, f) <- Seq("empty" -> empty, "all-null" -> allNull, "constant" -> constant)) {
      val h = try f("x").histogram(4).collect() catch {
        case e: Exception => fail(s"histogram on $fn threw: ${e.getMessage.take(120)}")
      }
      if (fn != "constant") assert(h.isEmpty, s"histogram on $fn must be empty")
      val vc = f("x").valueCounts().collect()
      if (fn == "constant") assert(vc.length == 1 && vc.head.getLong(1) == 4L)
      else assert(vc.isEmpty)
    }
    // qcut of a constant column: every boundary collides; all rows bucket 0
    val q = constant.df.select(constant("x").qcut(4).as("b")).collect()
    assert(q.forall(r => !r.isNullAt(0) && r.getInt(0) == 0),
      "constant qcut must land every row in bucket 0")
  }

  test("similarity surface survives zero vectors and empty embeddings") {
    val vecs = Seq(
      (1L, Seq(3.0, 4.0)), (2L, Seq(0.0, 0.0)), (3L, Seq.empty[Double]))
      .toDF("id", "v")
    // cosine with zero/empty vectors: null cells, never a crash
    val cos = vecs.select(
      graft.ops.Similarity.cosine(col("v"), typedLit(Seq(1.0, 0.0))).as("c"))
      .collect()
    assert(cos.count(_.isNullAt(0)) == 2, "zero AND empty vectors yield null cosine")
    // quantizeInt8 of a zero vector: zeros with scale 1 (documented)
    val qz = vecs.filter(col("id") === 2L)
      .select(graft.ops.Similarity.quantizeInt8(col("v")).as("q")).head()
    assert(qz.getStruct(0).getDouble(0) == 1.0)
    // meanPool over a group whose vectors are empty arrays: group vanishes
    // (posexplode of empty emits nothing) rather than crashing
    val mp = graft.ops.Similarity.meanPool(
      vecs.withColumn("g", lit(1)), Seq("g"), col("v"), "m").collect()
    assert(mp.length == 1)
  }

  test("text analysis survives null and empty documents") {
    val docs = Seq((1L, Some("")), (2L, None: Option[String]), (3L, Some("real text here")))
      .toDF("id", "text")
    val out = docs.select(
      graft.ops.TextAnalysis.tokenCount(col("text")).as("n"),
      graft.ops.TextAnalysis.charEntropy(col("text")).as("e"),
      graft.ops.TextAnalysis.qualityStruct(col("text")).as("q"),
      graft.ops.TextAnalysis.gopherFlags(col("text")).as("g"),
      graft.ops.TextAnalysis.fleschReadingEase(col("text")).as("f"),
      graft.ops.TextAnalysis.langId(col("text")).as("l"),
      graft.ops.TextAnalysis.duplicateLineFraction(col("text")).as("d"))
      .orderBy(col("n").asc_nulls_first)
      .collect()
    assert(out.length == 3, "no degenerate doc may crash the projection")
    // empty doc: zero tokens, zero entropy, flesch undefined
    val emptyRow = out.find(r => !r.isNullAt(0) && r.getLong(0) == 0L).get
    assert(emptyRow.getDouble(1) == 0.0 && emptyRow.isNullAt(4))
    // bigramNll / unigramNll over a corpus whose docs are all empty: no
    // grams/tokens -> empty result, not a crash
    val blank = Seq((1L, ""), (2L, "")).toDF("id", "t")
    assert(graft.ops.TextAnalysis.unigramNll(blank, col("t"), col("id")).count() >= 0)
    assert(graft.ops.Bm25.score(blank, col("t"), Seq("q"), "s")
      .collect().forall(_.getDouble(2) == 0.0))
  }
}
