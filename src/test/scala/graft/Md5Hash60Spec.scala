package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Md5Hash60
import graft.ops.TextAnalysis

/** The native md5_hash60 kernel must be BIT-IDENTICAL to the portable
  * string spelling `conv(substring(md5(c),1,15),16,10)::long` — every
  * oracle replay in the corpus rides on this equivalence.
  */
class Md5Hash60Spec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSession.spark
  import spark.implicits._

  test("native == conv/substring/md5 reference spelling, incl. unicode and empty") {
    val data = Seq("", "a", "hello world", "graft engine é中文 🚀",
      "0", "f" * 64, "line\nbreak\ttab") ++ (0 until 200).map(i => s"doc-$i-payload")
    val rows = data.toDF("s")
      .withColumn("native", TextAnalysis.hash60(col("s")))
      .withColumn("ref", TextAnalysis.hash60Reference(col("s")))
      .collect()
    rows.foreach { r =>
      assert(r.getLong(1) == r.getLong(2),
        s"native/reference mismatch for '${r.getString(0)}': ${r.getLong(1)} vs ${r.getLong(2)}")
      assert(r.getLong(1) >= 0, "60-bit value must be non-negative")
    }
  }

  test("codegen and interpreted paths agree") {
    // via PropertyTestKit.withExecutedMode: a bare factory-mode toggle is
    // VACUOUS here (ConvertToLocalRelation pre-evaluates the projection)
    val df = (0 until 100).map(i => s"row-$i").toDF("s")
    def hashes(mode: String): Seq[Long] =
      PropertyTestKit.withExecutedMode(spark, mode) {
        df.withColumn("h", Md5Hash60.md5_hash60(col("s")))
          .collect().map(_.getLong(1)).toSeq
      }
    assert(hashes("codegen") == hashes("interpreted"))
  }

  test("SQL registration and binary input") {
    Md5Hash60.register(spark)
    val viaSql = spark.sql("SELECT md5_hash60('abc') AS h").head().getLong(0)
    assert(viaSql == Md5Hash60.hash("abc".getBytes("UTF-8")))
    val viaBinary = Seq("abc").toDF("s")
      .select(Md5Hash60.md5_hash60(encode(col("s"), "UTF-8"))).head().getLong(0)
    assert(viaBinary == viaSql)
  }
}
