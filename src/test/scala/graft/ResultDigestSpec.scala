package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core.ResultDigest

/** Laws of the cross-execution-mode digest behind ClusterValidate: it must
  * be invariant to everything a different execution topology legitimately
  * changes (row order, partitioning, float last-ulp) and sensitive to
  * everything it must not (values, multiplicity, null-vs-empty, schema).
  */
class ResultDigestSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSession.spark
  import spark.implicits._

  test("invariant under row order and partitioning") {
    val df = Seq((3, "c", 1.5), (1, "a", 0.25), (2, "b", -7.0)).toDF("k", "s", "d")
    val a = ResultDigest.digest(df.orderBy($"k"))
    val b = ResultDigest.digest(df.orderBy($"k".desc).repartition(7))
    assert(a.matches(b))
  }

  test("sensitive to duplicate-row multiplicity (xor alone would cancel)") {
    val one = ResultDigest.digest(Seq(("x", 1)).toDF("a", "b"))
    val three = ResultDigest.digest(Seq(("x", 1), ("x", 1), ("x", 1)).toDF("a", "b"))
    assert(!one.matches(three))
    // an identical PAIR xors to 0 — the count+sum legs must still differ
    val pairPlus = ResultDigest.digest(Seq(("x", 1), ("x", 1), ("y", 2)).toDF("a", "b"))
    val justY = ResultDigest.digest(Seq(("y", 2)).toDF("a", "b"))
    assert(!pairPlus.matches(justY))
  }

  test("doubles: last-ulp drift matches, 6th-significant-digit drift does not") {
    val base = Seq((1, 0.1 + 0.2)).toDF("k", "d")
    val ulp = Seq((1, 0.30000000000000004 + 1e-17)).toDF("k", "d")
    val real = Seq((1, 0.300001)).toDF("k", "d")
    assert(ResultDigest.digest(base).matches(ResultDigest.digest(ulp)))
    assert(!ResultDigest.digest(base).matches(ResultDigest.digest(real)))
  }

  test("null, empty string, empty array and missing are all distinct") {
    def d1(v: Option[String]) = ResultDigest.digest(Seq((1, v)).toDF("k", "v"))
    assert(!d1(None).matches(d1(Some(""))))
    val nullArr = ResultDigest.digest(
      Seq((1, null.asInstanceOf[Array[Int]])).toDF("k", "v"))
    val emptyArr = ResultDigest.digest(Seq((1, Array.empty[Int])).toDF("k", "v"))
    assert(!nullArr.matches(emptyArr))
  }

  test("nested struct/array/map canonicalize; map entry order is immaterial") {
    val a = ResultDigest.digest(Seq((1, Map("x" -> 1.0, "y" -> 2.0),
      (3, Seq(1.5F, 2.5F)))).toDF("k", "m", "st"))
    val b = ResultDigest.digest(Seq((1, Map("y" -> 2.0, "x" -> 1.0),
      (3, Seq(1.5F, 2.5F)))).toDF("k", "m", "st"))
    assert(a.matches(b))
    val c = ResultDigest.digest(Seq((1, Map("y" -> 2.0, "x" -> 1.0),
      (3, Seq(1.5F, 2.6F)))).toDF("k", "m", "st"))
    assert(!a.matches(c))
  }

  test("schema drift (name or type) breaks the match even with equal values") {
    val a = ResultDigest.digest(Seq((1, 2L)).toDF("k", "v"))
    val renamed = ResultDigest.digest(Seq((1, 2L)).toDF("k", "w"))
    val retyped = ResultDigest.digest(Seq((1, 2)).toDF("k", "v"))
    assert(!a.matches(renamed))
    assert(!a.matches(retyped))
  }

  test("binary, NaN and duplicate column names digest without error") {
    val bin = Seq((1, Array[Byte](0, 1, 2))).toDF("k", "b")
    assert(ResultDigest.digest(bin).rows == 1)
    val nan = Seq((1, Double.NaN), (2, 1.0)).toDF("k", "d")
    assert(ResultDigest.digest(nan).rows == 2)
    val dup = Seq((1, 2)).toDF("k", "k")
    assert(ResultDigest.digest(dup).rows == 1)
  }
}
