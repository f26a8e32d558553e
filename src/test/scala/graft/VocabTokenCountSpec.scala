package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.VocabTokenCount

class VocabTokenCountSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSession.spark
  import spark.implicits._

  /** Independent reference: no index, just "longest vocab prefix at p, else
    * 1 char" — deliberately a different shape from the kernel's
    * first-char-indexed scan.
    */
  private def reference(s: String, vocab: Seq[String]): Long = {
    var p = 0; var n = 0L
    while (p < s.length) {
      val matches = vocab.filter(v => s.regionMatches(p, v, 0, v.length))
      p += (if (matches.isEmpty) 1 else matches.map(_.length).max)
      n += 1L
    }
    n
  }

  private val vocab = Seq("the", "thee", "th", "he", "abc", "abcd", " ", "ing")

  test("greedy longest-match semantics, hand cases") {
    val idx = VocabTokenCount.buildIndex(vocab)
    assert(VocabTokenCount.count("", idx) == 0L)
    assert(VocabTokenCount.count("thee", idx) == 1L) // longest wins over the+e
    assert(VocabTokenCount.count("theX", idx) == 2L) // the + X fallback
    assert(VocabTokenCount.count("ththe", idx) == 2L) // th + the
    assert(VocabTokenCount.count("abcde", idx) == 2L) // abcd (longest) + e fallback
    assert(VocabTokenCount.count("zzz", idx) == 3L) // all fallback
    assert(VocabTokenCount.count("the the", idx) == 3L) // the,' ',the
  }

  test("kernel == independent reference on a pseudo-random grid and on corpus text") {
    val idx = VocabTokenCount.buildIndex(vocab)
    val alphabet = "thabcde ing"
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 300) {
      val s = Seq.fill(rnd.nextInt(30))(alphabet(rnd.nextInt(alphabet.length))).mkString
      assert(VocabTokenCount.count(s, idx) == reference(s, vocab), s"mismatch on '$s'")
    }
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(lower(col("text")).as("t")).limit(50).as[String].collect()
    for (d <- docs)
      assert(VocabTokenCount.count(d, idx) == reference(d, vocab))
  }

  test("pieces: concatenation rebuilds the input, length equals count, DF path agrees") {
    val idx = VocabTokenCount.buildIndex(vocab)
    val rnd = new scala.util.Random(7)
    val alphabet = "thabcde ing|z"
    for (_ <- 1 to 200) {
      val s = Seq.fill(rnd.nextInt(40))(alphabet(rnd.nextInt(alphabet.length))).mkString
      val ps = VocabTokenCount.pieces(s, idx)
      assert(ps.mkString("") == s, s"pieces must tile the input: '$s'")
      assert(ps.length.toLong == VocabTokenCount.count(s, idx))
    }
    val viaDf = Seq("thee and the thing").toDF("t")
      .select(VocabTokenCount.vocab_tokenize(col("t"), vocab))
      .as[Seq[String]].head()
    assert(viaDf == VocabTokenCount.pieces("thee and the thing", idx).toSeq)
  }

  test("SQL registration: vocab as trailing string literals") {
    graft.functions.GraftExtensions.installInto(spark)
    val n = spark.sql("SELECT vocab_token_count('ththe and thee', 'the', 'thee', 'th', ' ')")
      .head().getLong(0)
    // th + the -> 2, ' ' -> 1, a,n,d -> 3, ' ' -> 1, thee -> 1
    assert(n == 8L)
    val ps = spark.sql("SELECT vocab_tokenize('thee', 'the', 'thee')")
      .head().getSeq[String](0)
    assert(ps == Seq("thee"))
  }

  test("codegen (DataFrame path) == interpreted kernel") {
    val df = Seq("thee and the thing", "abcdabc", "", "zz the zz").toDF("t")
    val viaDf = df.select(VocabTokenCount.vocab_token_count(col("t"), vocab))
      .as[Long].collect().toSeq
    val idx = VocabTokenCount.buildIndex(vocab)
    val direct = Seq("thee and the thing", "abcdabc", "", "zz the zz")
      .map(VocabTokenCount.count(_, idx))
    assert(viaDf == direct)
  }
}
