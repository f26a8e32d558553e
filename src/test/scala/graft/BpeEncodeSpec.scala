package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.BpeEncode
import graft.ops.Bpe
import graft.PropertyTestKit.sampled

/** Exact merge-order BPE apply specs ([[graft.functions.BpeEncode]], r15 —
  * the train→apply closure). Pins: (1) the min-rank loop == rank-order
  * replay ([[Bpe.applyWord]]) on every TRAINED table — the equivalence the
  * expression's Scaladoc argues; (2) the documented divergence on a
  * non-trained (inconsistent) table; (3) codegen == interpreted through a
  * real execution path; (4) the measured greedy-vs-exact divergence
  * surface ([[Bpe.greedyExactDivergence]]).
  */
class BpeEncodeSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSession.spark

  private def enc(word: String, merges: Seq[(String, String)]): Seq[String] =
    BpeEncode.pieces(word, BpeEncode.buildRanks(merges)).toSeq

  test("end-of-word marker constants stay pinned equal") {
    assert(BpeEncode.EndOfWord == Bpe.EndOfWord)
  }

  test("merge tokens containing U+0000 refuse at construction (pair-key separator)") {
    // a NUL inside a hand-built merge token would alias distinct pair keys
    // (("a\u0000","b") vs ("a","\u0000b")) — the guard refuses up front
    import org.apache.spark.sql.catalyst.expressions.Literal
    val e = intercept[IllegalArgumentException](
      BpeEncode(Literal("x"), Seq("a\u0000" -> "b")))
    assert(e.getMessage.contains("U+0000"))
    intercept[IllegalArgumentException](BpeEncode(Literal("x"), Seq("a" -> "\u0000b")))
  }

  test("hand cases: min-rank order, left-fold, unmergeable tails") {
    val ms = Seq("e" -> "s", "es" -> "t", "est" -> "</w>", "l" -> "o", "lo" -> "w")
    assert(enc("lowest", ms) == Seq("low", "est</w>"))
    assert(enc("low", ms) == Seq("low", "</w>"))
    assert(enc("zzz", ms) == Seq("z", "z", "z", "</w>"))
    assert(enc("", ms) == Seq("</w>"))
    // rank order beats position: (b,c) outranks (a,b), so "abc" is a|bc
    val m2 = Seq("b" -> "c", "a" -> "b")
    assert(enc("abc", m2) == Seq("a", "bc", "</w>"))
    // left-fold on overlaps: "aaa" + (a,a) -> aa|a, then no (aa,a) rank
    assert(enc("aaa", Seq("a" -> "a")) == Seq("aa", "a", "</w>"))
    // astral input: one codepoint = one base symbol
    assert(enc("x😀", Seq.empty) == Seq("x", "😀", "</w>"))
  }

  test("pieces always concatenate back to word + marker") {
    val rnd = new scala.util.Random(11)
    val ms = Seq("a" -> "b", "ab" -> "c", "b" -> "b", "c" -> "</w>", "a" -> "bb")
    for (_ <- 1 to 200) {
      val w = Seq.fill(rnd.nextInt(12))("abcd".charAt(rnd.nextInt(4))).mkString
      assert(enc(w, ms).mkString == w + "</w>", s"on '$w'")
    }
  }

  test("min-rank loop == rank-order replay on trained tables (the equivalence law)") {
    val gen = for {
      n <- org.scalacheck.Gen.choose(1, 40)
      words <- org.scalacheck.Gen.listOfN(n, for {
        len <- org.scalacheck.Gen.choose(1, 8)
        w <- org.scalacheck.Gen.listOfN(len, org.scalacheck.Gen.oneOf('a', 'b', 'c', 'd'))
        c <- org.scalacheck.Gen.choose(1L, 20L)
      } yield (w.mkString, c))
    } yield words.groupBy(_._1).map { case (w, xs) => (w, xs.map(_._2).sum) }.toSeq.sorted
    val rnd = new scala.util.Random(23)
    (1 to 25).foreach { i =>
      val corpus = sampled(gen)
      val local = corpus.map { case (w, c) =>
        (w.codePoints().toArray.map(cp => new String(Character.toChars(cp))) :+ Bpe.EndOfWord, c)
      }.toArray
      val ms = Bpe.trainLocal(local, 12)
      val pairs = Bpe.mergePairs(ms)
      val ranks = BpeEncode.buildRanks(pairs)
      // trained words AND unseen words from the same alphabet
      val probes = corpus.map(_._1) ++
        Seq.fill(20)(Seq.fill(rnd.nextInt(10) + 1)("abcd".charAt(rnd.nextInt(4))).mkString)
      probes.foreach { w =>
        assert(BpeEncode.pieces(w, ranks).toSeq == Bpe.applyWord(w, ms),
          s"iteration $i word='$w' merges=$ms")
      }
    }
  }

  test("documented caveat: an INCONSISTENT table diverges from replay") {
    // (ab,c) ranked before (a,b) cannot come from training — token "ab"
    // would have to exist before its own creation. Min-rank merges it
    // (the production tokenizers' behavior); replay has already passed
    // rank 0 when "ab" finally appears.
    val ms = Seq(Bpe.Merge(0, "ab", "c", "abc", 1L), Bpe.Merge(1, "a", "b", "ab", 1L))
    assert(enc("abc", Bpe.mergePairs(ms)) == Seq("abc", "</w>"))
    assert(Bpe.applyWord("abc", ms) == Seq("ab", "c", "</w>"))
  }

  test("codegen == interpreted through a real execution path") {
    val spark2 = spark
    import spark2.implicits._
    val ms = Seq("e" -> "s", "es" -> "t", "est" -> "</w>", "l" -> "o", "lo" -> "w",
      "t" -> "h", "th" -> "e")
    val rnd = new scala.util.Random(31)
    val words = (Seq("lowest", "the", "low", "", "es", "thethe") ++
      Seq.fill(60)(Seq.fill(rnd.nextInt(10))("lowesth".charAt(rnd.nextInt(7))).mkString) ++
      Seq(null.asInstanceOf[String])).zipWithIndex.map(_.swap)
    val df = words.toDF("i", "w")
    def run(mode: String): Seq[(Int, String)] =
      PropertyTestKit.withExecutedMode(spark, mode) {
        df.select(col("i"), array_join(BpeEncode.bpe_encode(col("w"), ms), "|").as("p"))
          .collect().map(r => (r.getInt(0), if (r.isNullAt(1)) null else r.getString(1)))
          .sortBy(_._1).toSeq
      }
    val reference = words.map { case (i, w) =>
      (i, if (w == null) null else enc(w, ms).mkString("|"))
    }
    assert(run("codegen") == reference)
    assert(run("interpreted") == reference)
  }

  test("greedyExactDivergence counts the classic rank-vs-length split") {
    val spark2 = spark
    import spark2.implicits._
    // trained-consistent: (b,c) at rank 0, (a,b) at rank 1. Exact on "abc"
    // = a|bc; greedy longest-match from the left = ab|c. "bc" and "zzz"
    // agree on both paths.
    val ms = Seq(Bpe.Merge(0, "b", "c", "bc", 9L), Bpe.Merge(1, "a", "b", "ab", 5L))
    val words = Seq("abc", "bc", "zzz").toDF("word")
    val row = Bpe.greedyExactDivergence(words, ms).collect().head
    assert(row.getLong(0) == 3L && row.getLong(1) == 1L)
    assert(math.abs(row.getDouble(2) - 1.0 / 3) < 1e-6)
    // zero-merge table: trivially zero divergence
    val z = Bpe.greedyExactDivergence(words, Nil).collect().head
    assert(z.getLong(0) == 3L && z.getLong(1) == 0L && z.getDouble(2) == 0.0)
    // EMPTY word table + non-empty merges: typed zeros, never NULLs
    // (sum over zero rows is NULL without the coalesce)
    val e = Bpe.greedyExactDivergence(words.filter(col("word") === "nope"), ms)
      .collect().head
    assert(e.getLong(0) == 0L && e.getLong(1) == 0L && e.getDouble(2) == 0.0)
  }

  test("exactTokenCount: one-pass doc counting == explode-and-sum, null-safe") {
    val spark2 = spark
    import spark2.implicits._
    val corpus = Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
    val ms = Bpe.trainLocal(corpus.map { case (w, c) =>
      (w.codePoints().toArray.map(cp => new String(Character.toChars(cp))) :+ Bpe.EndOfWord, c)
    }.toArray, 5)
    val docs = Seq(
      (1L, "the lowest low"),
      (2L, "newest newest widest"),
      (3L, ""),
      (4L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val got = docs.select(col("doc_id"), Bpe.exactTokenCount(col("text"), ms).as("n"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    // independent spelling: explode words, encode each, sum sizes
    val ref = docs.select(col("doc_id"),
        explode(graft.ops.TextAnalysis.tokens(col("text"))).as("w"))
      .select(col("doc_id"), size(Bpe.exactPieces(col("w"), ms)).cast("long").as("k"))
      .groupBy("doc_id").agg(sum("k").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(1L) == ref(1L) && got(2L) == ref(2L))
    assert(got(3L) == 0L) // empty text: zero tokens, not null
    assert(got(4L) == -1L) // null text propagates null
  }

  test("production-vocab scale: train 1k merges on 100k Zipf words, exact-apply via the DF path") {
    // the testdata corpus holds 31 distinct words, so a REAL merge table
    // can't come from it — synthesize a Zipf-ish word table at the scale
    // a production tokenizer trains on (ceiling-bounded), then drive the
    // full train→exact-apply loop end-to-end and report throughput
    val spark2 = spark
    import spark2.implicits._
    val rnd = new scala.util.Random(97)
    val alphabet = "etaoinshrdlcumwf"
    val words = (1 to 100000).map { i =>
      val len = 2 + rnd.nextInt(9)
      val w = Seq.fill(len)(alphabet(rnd.nextInt(alphabet.length))).mkString
      (w, (100000.0 / i).toLong.max(1L)) // Zipf-ish counts
    }.distinct
    val local = words.map { case (w, c) =>
      (w.codePoints().toArray.map(cp => new String(Character.toChars(cp))) :+ Bpe.EndOfWord, c)
    }.toArray
    val t0 = System.nanoTime()
    val ms = Bpe.trainLocal(local, 1000)
    val trainS = (System.nanoTime() - t0) / 1e9
    assert(ms.size == 1000)
    val df = words.map(_._1).toDF("word")
    val t1 = System.nanoTime()
    val n = df.select(Bpe.exactPieces(col("word"), ms).as("p"))
      .agg(sum(size(col("p")))).collect().head.getLong(0)
    val applyS = (System.nanoTime() - t1) / 1e9
    assert(n > words.size) // at least one piece + marker per word
    // spot-exactness at this scale: a sample of words must equal replay
    words.take(50).foreach { case (w, _) =>
      assert(enc(w, Bpe.mergePairs(ms)) == Bpe.applyWord(w, ms))
    }
    info(f"${words.size} distinct words: train(1000 merges)=$trainS%.1f s, " +
      f"exact apply=$applyS%.1f s (${words.size / applyS}%.0f words/s), $n total pieces")
  }

  test("corpus divergence rate at sf0.001: measured, bounded, reported") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val wc = Bpe.wordCounts(docs, "text").cache()
    try {
      val ms = Bpe.train(wc, numMerges = 40)
      val row = Bpe.greedyExactDivergence(wc.select("word"), ms).collect().head
      val (n, d, rate) = (row.getLong(0), row.getLong(1), row.getDouble(2))
      assert(n > 0 && d >= 0 && d <= n && rate >= 0.0 && rate <= 1.0)
      info(f"sf0.001 corpus: $n words, $d diverged, rate=$rate%.6f")
    } finally wc.unpersist()
  }
}
