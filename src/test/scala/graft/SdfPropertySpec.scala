package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sdf.SDF

/** Randomized pandas-semantics differentials for the SDF relational
  * surface: generated key-collision-heavy frames check merge (all four
  * hows, suffixes, indicator) against a driver nested-loop pandas merge,
  * dropDuplicates keep=first/last/none against a driver group walk, and
  * ffill/bfill against a driver carry scan.
  */
class SdfPropertySpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSession.spark
  import spark.implicits._

  import PropertyTestKit.sampled

  test("merge matches a driver pandas merge for every how, with indicator") {
    import org.scalacheck.Gen
    val key = Gen.chooseNum(0, 7).map(k => s"k$k")  // collisions + one-sided keys
    val left = Seq.tabulate(40)(i => (sampled(key), i.toLong))
    val right = Seq.tabulate(30)(i => (sampled(key), i * 10.0))
    val ldf = SDF(left.toDF("k", "lv"))
    val rdf = SDF(right.toDF("k", "rv"))
    for (how <- Seq("inner", "left", "right", "outer")) {
      val got = ldf.merge(rdf, Seq("k"), how, indicator = true).df
        .collect().map(r => (r.getString(0),
          if (r.isNullAt(1)) None else Some(r.getLong(1)),
          if (r.isNullAt(2)) None else Some(r.getDouble(2)),
          r.getString(3)))
        .groupBy(identity).view.mapValues(_.length).toMap
      // driver pandas merge: per key, cartesian of the two sides;
      // unmatched rows survive per the how with nulls + indicator
      val want = scala.collection.mutable.Map.empty[(String, Option[Long], Option[Double], String), Int]
      def add(t: (String, Option[Long], Option[Double], String)): Unit =
        want(t) = want.getOrElse(t, 0) + 1
      val rightByKey = right.groupBy(_._1)
      val leftKeys = left.map(_._1).toSet
      left.foreach { case (k, lv) =>
        rightByKey.get(k) match {
          case Some(rs) => rs.foreach { case (_, rv) => add((k, Some(lv), Some(rv), "both")) }
          case None if how == "left" || how == "outer" => add((k, Some(lv), None, "left_only"))
          case None => ()
        }
      }
      if (how == "right" || how == "outer")
        right.foreach { case (k, rv) =>
          if (!leftKeys.contains(k)) add((k, None, Some(rv), "right_only"))
        }
      assert(got == want.toMap, s"merge how=$how diverged")
    }
  }

  test("merge suffixes rename colliding non-key columns on both sides") {
    val l = SDF(Seq(("a", 1L, 2L)).toDF("k", "v", "only_l"))
    val r = SDF(Seq(("a", 9L, 8L)).toDF("k", "v", "only_r"))
    val out = l.merge(r, Seq("k"), "inner", suffixes = ("_x", "_y")).df
    assert(out.columns.toSet == Set("k", "v_x", "only_l", "v_y", "only_r"))
    val row = out.head()
    assert(row.getAs[Long]("v_x") == 1L && row.getAs[Long]("v_y") == 9L)
  }

  test("dropDuplicates keep=first/last/none matches the driver group walk") {
    import org.scalacheck.Gen
    val key = Gen.chooseNum(0, 9).map(k => s"g$k")
    val rows = Seq.tabulate(80)(i => (sampled(key), i.toLong))
    val df = SDF(rows.toDF("k", "ord"))
    val groups = rows.groupBy(_._1)
    def got(keep: String): Set[(String, Long)] =
      df.dropDuplicates(Seq("k"), keep, Seq(col("ord"))).df
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got("first") == groups.values.map(_.minBy(_._2)).toSet, "keep=first")
    assert(got("last") == groups.values.map(_.maxBy(_._2)).toSet, "keep=last")
    assert(got("none") == groups.values.filter(_.size == 1).flatten.toSet, "keep=none")
  }

  test("ffill and bfill match the driver carry scan per group") {
    import org.scalacheck.Gen
    val rows = Seq("g0", "g1", "g2").flatMap { g =>
      Seq.tabulate(30)(i => (g, i.toLong,
        sampled(Gen.frequency(1 -> Gen.chooseNum(0.0, 9.0).map(Some(_)),
          1 -> Gen.const(Option.empty[Double])))))
    }
    val df = SDF(rows.toDF("g", "o", "v"))
    def collectV(s: SDF): Map[(String, Long), Option[Double]] =
      s.df.collect().map(r => (r.getString(0), r.getLong(1)) ->
        (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    val gotF = collectV(df.ffill(Seq("v"), Seq(col("o")), Seq(col("g"))))
    val gotB = collectV(df.bfill(Seq("v"), Seq(col("o")), Seq(col("g"))))
    rows.groupBy(_._1).foreach { case (g, rs) =>
      val s = rs.sortBy(_._2)
      var carry = Option.empty[Double]
      s.foreach { case (_, o, v) =>
        carry = v.orElse(carry)
        assert(gotF((g, o)) == carry, s"ffill at ($g,$o)")
      }
      var bcarry = Option.empty[Double]
      s.reverse.foreach { case (_, o, v) =>
        bcarry = v.orElse(bcarry)
        assert(gotB((g, o)) == bcarry, s"bfill at ($g,$o)")
      }
    }
  }

  test("valueCounts matches a driver tally, normalize and dropna both ways") {
    import org.scalacheck.Gen
    val vals = Seq.fill(100)(sampled(Gen.frequency(
      4 -> Gen.oneOf("a", "b", "c").map(Some(_)), 1 -> Gen.const(Option.empty[String]))))
    val df = vals.zipWithIndex.map { case (v, i) => (i.toLong, v.orNull) }.toDF("i", "v")
    val sdf = SDF(df)
    for (dropna <- Seq(true, false); normalize <- Seq(false, true)) {
      val out = sdf("v").valueCounts(normalize = normalize, dropna = dropna)
        .collect().map(r => Option(r.getString(0)) ->
          r.get(1).toString.toDouble).toMap
      val kept = if (dropna) vals.flatten.map(Some(_): Option[String]) else vals
      val tally = kept.groupBy(identity).view.mapValues(_.size.toDouble).toMap
      val denom = if (normalize) kept.size.toDouble else 1.0
      val want = tally.view.mapValues(n => if (normalize) n / denom else n).toMap
      assert(out == want, s"valueCounts dropna=$dropna normalize=$normalize")
    }
  }
}
