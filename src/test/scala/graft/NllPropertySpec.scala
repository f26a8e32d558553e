package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.TextAnalysis

/** Randomized driver-reference differentials for the LM quality scores:
  * corpus-unigram NLL and add-k bigram NLL. Documents come from a small
  * lowercase vocabulary (single spaces), so driver tokenization is a plain
  * split and the corpus statistics are unambiguous.
  */
class NllPropertySpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSession.spark
  import spark.implicits._

  import PropertyTestKit.sampled

  private val vocab = Vector("alpha", "bravo", "charlie", "delta", "echo",
    "foxtrot", "golf", "hotel")

  private val docs: Seq[(Long, String)] = {
    import org.scalacheck.Gen
    val word = Gen.oneOf(vocab)
    Seq.tabulate(25) { i =>
      val n = sampled(Gen.chooseNum(2, 30)) // >= 2 so every doc has a bigram
      (i.toLong, Seq.fill(n)(sampled(word)).mkString(" "))
    }
  }

  private def toks: Map[Long, Seq[String]] =
    docs.map { case (id, t) => id -> t.split(" ").toSeq }.toMap

  test("unigramNll matches the driver corpus-frequency fold") {
    val tk = toks
    val freq = tk.values.flatten.groupBy(identity).view.mapValues(_.size.toDouble).toMap
    val total = tk.values.map(_.size).sum.toDouble
    val got = TextAnalysis.unigramNll(docs.toDF("id", "text"), col("text"), col("id"))
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Double]("nll")).toMap
    assert(got.keySet == tk.keySet)
    tk.foreach { case (id, ws) =>
      val want = ws.map(w => -math.log(freq(w) / total)).sum / ws.size
      assert(math.abs(got(id) - want) < 1e-9, s"unigramNll doc $id: ${got(id)} vs $want")
    }
  }

  test("bigramNll matches the driver add-k fold") {
    val k = 1.0
    val tk = toks
    val bigrams = tk.view.mapValues(_.sliding(2).filter(_.size == 2)
      .map(p => (p(0), p(1))).toSeq).toMap
    val bgFreq = bigrams.values.flatten.groupBy(identity).view.mapValues(_.size.toDouble).toMap
    // context count = occurrences of the token as a bigram FIRST element
    // (not its raw corpus count — final tokens of a doc are no context)
    val ctxFreq = bigrams.values.flatten.groupBy(_._1).view.mapValues(_.size.toDouble).toMap
    val v = tk.values.flatten.toSet.size.toDouble
    val got = TextAnalysis.bigramNll(docs.toDF("id", "text"), col("text"), col("id"), k)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Double]("nll")).toMap
    assert(got.keySet == tk.keySet)
    bigrams.foreach { case (id, bgs) =>
      val want = bgs.map { bg =>
        -math.log((bgFreq(bg) + k) / (ctxFreq(bg._1) + k * v))
      }.sum / bgs.size
      assert(math.abs(got(id) - want) < 1e-9, s"bigramNll doc $id: ${got(id)} vs $want")
    }
  }
}
