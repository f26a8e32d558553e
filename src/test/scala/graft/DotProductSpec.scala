package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.DotProduct
import graft.ops.Similarity

/** Native dot-product expression spec: codegen == interpreted == the HOF
  * spelling it replaces, across double/float elements, empty arrays, null
  * elements, and length mismatches.
  */
class DotProductSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSession.spark
  import spark.implicits._

  private def rng(seed: Int): Iterator[Double] = {
    var s = seed.toLong
    Iterator.continually { s = s * 6364136223846793005L + 1442695040888963407L; (s >> 20).toDouble / 1e12 }
  }

  test("matches the HOF spelling on random double vectors (both eval paths)") {
    val vecs = (0 until 50).map { i =>
      val it = rng(i)
      (i.toLong, it.take(16).toArray, rng(i + 1000).take(16).toArray)
    }
    val df = vecs.toDF("id", "a", "b")
    // via PropertyTestKit.withExecutedMode: a bare factory-mode toggle is
    // VACUOUS here (ConvertToLocalRelation pre-evaluates the projection)
    def run(mode: String): Seq[(Long, Double)] =
      PropertyTestKit.withExecutedMode(spark, mode) {
        df.select(col("id"), DotProduct.dot_product(col("a"), col("b")).as("d"))
          .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      }
    val viaHof = df.select(col("id"), Similarity.dotHof(col("a"), col("b")).as("d"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    // left-to-right summation order means results are bit-identical, not
    // merely close — the kernel is a drop-in for oracle-verified queries
    assert(run("codegen") == viaHof)
    assert(run("interpreted") == viaHof)
  }

  test("float arrays widen per element exactly like casting first") {
    val df = Seq((Array(1.5f, 2.5f, -3.0f), Array(2.0f, 0.5f, 1.0f))).toDF("a", "b")
    val native = df.select(DotProduct.dot_product(col("a"), col("b"))).head().getDouble(0)
    val cast = df.select(Similarity.dotHof(
      col("a").cast("array<double>"), col("b").cast("array<double>"))).head().getDouble(0)
    assert(native == cast && native == 1.5 * 2.0 + 2.5 * 0.5 - 3.0)
  }

  test("edge semantics: empty -> 0.0; null element / length mismatch / null input -> null") {
    val df = Seq(
      (1L, Some(Seq[Option[Double]]()), Some(Seq[Option[Double]]())),
      (2L, Some(Seq[Option[Double]](Some(1.0), None)), Some(Seq[Option[Double]](Some(2.0), Some(3.0)))),
      (3L, Some(Seq[Option[Double]](Some(1.0))), Some(Seq[Option[Double]](Some(2.0), Some(3.0)))),
      (4L, None, Some(Seq[Option[Double]](Some(2.0))))
    ).toDF("id", "a", "b")
    val out = df.select(col("id"), DotProduct.dot_product(col("a"), col("b")).as("d"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(out(1L).contains(0.0))
    assert(out(2L).isEmpty && out(3L).isEmpty && out(4L).isEmpty)
  }

  test("SQL registration via GraftExtensions") {
    graft.functions.GraftExtensions.installInto(spark)
    val d = spark.sql("SELECT dot_product(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
      .head().getDouble(0)
    assert(d == 11.0)
  }
}
