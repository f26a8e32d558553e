package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Bpe
import graft.PropertyTestKit.sampled

/** BPE trainer specs — replaces the impossible SQL oracle (per-round
  * arg-max over mutated state cannot be a recursive CTE) with three pins:
  * the toy-corpus merge sequence from the published algorithm, a
  * naive-reference differential on random corpora, and distributed-vs-local
  * word-count equivalence.
  */
class BpeSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSession.spark

  /** Naive reference: full pair recount each round, straightforward merge —
    * O(rounds × corpus), no incremental bookkeeping to be wrong in the same
    * way as the production loop.
    */
  private def naiveTrain(words: Seq[(String, Long)], numMerges: Int): Seq[Bpe.Merge] = {
    var state: Seq[(Vector[String], Long)] = words.map { case (w, c) =>
      (w.codePoints().toArray.toVector.map(cp => new String(Character.toChars(cp)))
        :+ Bpe.EndOfWord, c)
    }
    val out = Seq.newBuilder[Bpe.Merge]
    var rank = 0
    var done = false
    while (rank < numMerges && !done) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      state.foreach { case (s, c) =>
        s.sliding(2).foreach { p => if (p.size == 2)
          counts((p(0), p(1))) = counts.getOrElse((p(0), p(1)), 0L) + c }
      }
      if (counts.isEmpty) done = true
      else {
        val (best, c) = counts.toSeq.minBy { case ((l, r), n) => (-n, l, r) }
        out += Bpe.Merge(rank, best._1, best._2, best._1 + best._2, c)
        state = state.map { case (s, n) =>
          val b = Vector.newBuilder[String]
          var i = 0
          while (i < s.length) {
            if (i < s.length - 1 && s(i) == best._1 && s(i + 1) == best._2) {
              b += best._1 + best._2; i += 2
            } else { b += s(i); i += 1 }
          }
          (b.result(), n)
        }
        rank += 1
      }
    }
    out.result()
  }

  private def localWords(words: Seq[(String, Long)]): Array[(Array[String], Long)] =
    words.map { case (w, c) =>
      (w.codePoints().toArray.map(cp => new String(Character.toChars(cp))) :+ Bpe.EndOfWord, c)
    }.toArray

  test("published toy corpus: the known merge sequence") {
    // Sennrich et al. 2016 §3.2 example: {low:5, lower:2, newest:6, widest:3}.
    // Highest pair is (e,s) with count 9 (newest+widest), then (es,t) 9,
    // then (est,</w>) 9, then (l,o) 7 (low+lower), then (lo,w) 7.
    val corpus = Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
    val ms = Bpe.trainLocal(localWords(corpus), 5)
    assert(ms.map(m => (m.left, m.right, m.pairCount)) == Seq(
      ("e", "s", 9L), ("es", "t", 9L), ("est", Bpe.EndOfWord, 9L),
      ("l", "o", 7L), ("lo", "w", 7L)))
    assert(ms.map(_.token) == Seq("es", "est", "est</w>", "lo", "low"))
  }

  test("incremental loop == naive reference on random corpora") {
    val gen = for {
      n <- org.scalacheck.Gen.choose(1, 40)
      words <- org.scalacheck.Gen.listOfN(n, for {
        len <- org.scalacheck.Gen.choose(1, 8)
        w <- org.scalacheck.Gen.listOfN(len, org.scalacheck.Gen.oneOf('a', 'b', 'c', 'd'))
        c <- org.scalacheck.Gen.choose(1L, 20L)
      } yield (w.mkString, c))
    } yield words.groupBy(_._1).map { case (w, xs) => (w, xs.map(_._2).sum) }.toSeq.sorted
    (1 to 30).foreach { i =>
      val corpus = sampled(gen)
      val expected = naiveTrain(corpus, 12)
      val got = Bpe.trainLocal(localWords(corpus), 12)
      assert(got == expected, s"iteration $i corpus=$corpus")
    }
  }

  test("greedy left-fold on repeated symbols matches the reference re-scan") {
    // "aaaa" with merge (a,a): left fold gives [aa, aa, </w>] not [aa, a, a, </w>]
    val ms = Bpe.trainLocal(localWords(Seq(("aaaa", 3L))), 1)
    assert(ms.head.token == "aa" && ms.head.pairCount == 9L)
    assert(Bpe.applyWord("aaaa", ms) == Seq("aa", "aa", Bpe.EndOfWord))
    assert(naiveTrain(Seq(("aaaa", 3L)), 1) == ms)
  }

  test("distributed wordCounts == local counting; train end-to-end; vocab codepoints") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the low lower low"),
      (2L, "newest newest widest the"),
      (3L, "emoji 😀😀 twice"),
      (4L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val wc = Bpe.wordCounts(docs, "text")
    val got = wc.collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got == Map("the" -> 2L, "low" -> 2L, "lower" -> 1L, "newest" -> 2L,
      "widest" -> 1L, "emoji" -> 1L, "twice" -> 1L))
    // NOTE: the tokenizer splits on non-letter/number, so 😀 (So category)
    // is a separator — astral HANDLING is exercised via vocabulary below
    val ms = Bpe.train(wc, numMerges = 3)
    assert(ms.size == 3 && ms.map(_.rank) == Seq(0, 1, 2))
    val vocabDf = Bpe.vocabulary(spark, Seq(("x😀y", 1L)).toDF("word", "n"), Nil)
    val toks = vocabDf.orderBy("id").collect().map(_.getString(1)).toSeq
    assert(toks.contains("😀") && !toks.exists(t => t.length == 1 && Character.isSurrogate(t.charAt(0))),
      s"astral base symbol must stay one codepoint: $toks")
  }

  test("applyVocabulary strips the end-of-word marker for the greedy scan") {
    val corpus = Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
    val ms = Bpe.trainLocal(localWords(corpus), 5)
    val vocab = Bpe.applyVocabulary(ms)
    // "est</w>" -> "est" (dedup with the bare "est" merge), no marker remnants
    assert(vocab.toSet == Set("es", "est", "lo", "low"))
    assert(!vocab.exists(_.contains("</w>")))
    // the native greedy scan accepts it directly
    val spark2 = spark
    import spark2.implicits._
    val out = Seq("lowest").toDF("t")
      .select(graft.functions.VocabTokenCount.vocab_tokenize(org.apache.spark.sql.functions.col("t"), vocab).as("p"))
      .collect().head.getSeq[String](0)
    assert(out == Seq("low", "est"))
  }

  test("ceiling refusal and merge-count exhaustion") {
    import spark.implicits._
    val wc = Seq(("ab", 2L), ("cd", 1L)).toDF("word", "n")
    val e = intercept[IllegalArgumentException](Bpe.train(wc, 5, maxDistinctWords = 1L))
    assert(e.getMessage.contains("ceiling"))
    // asking for more merges than pairs exist: stops cleanly
    val ms = Bpe.train(wc, numMerges = 100)
    assert(ms.nonEmpty && ms.size < 100)
    // counts never increase along rank order
    assert(ms.sliding(2).forall(p => p.size < 2 || p(0).pairCount >= p(1).pairCount))
  }

  test("scale path past the ceiling: refusal -> cappedWordCounts -> train -> exactPieces") {
    // the r15-verdict BPE scale closure: a word table over the driver
    // ceiling refuses loudly; frequency-truncating to the top-K words gets
    // under it; training and exact apply then run green — and on a table
    // whose dropped tail is count-1 singletons with disjoint alphabets, the
    // capped merges EQUAL the full-table merges (the truncation-is-benign
    // claim, checked not asserted)
    import spark.implicits._
    val head = (0 until 40).map(i => (s"w${i}ab", 1000L - i)) // shared (a,b) mass
    val tail = (0 until 30).map(i => (new String(Array(
      (0x4E00 + 2 * i).toChar, (0x4E01 + 2 * i).toChar)), 1L)) // disjoint CJK pairs
    val wc = (head ++ tail).toDF("word", "n")
    val ceiling = 40L
    val e = intercept[IllegalArgumentException](Bpe.train(wc, 5, maxDistinctWords = ceiling))
    assert(e.getMessage.contains("ceiling"))
    val capped = Bpe.cappedWordCounts(wc, ceiling)
    assert(capped.count() == 40)
    val msCapped = Bpe.train(capped, 10, maxDistinctWords = ceiling)
    val msFull = Bpe.train(wc, 10, maxDistinctWords = 2000000L)
    assert(msCapped.nonEmpty)
    assert(msCapped.map(m => (m.left, m.right)) == msFull.map(m => (m.left, m.right)),
      "count-1 disjoint tail must not change the merge sequence")
    // exact apply over the capped table's merges runs green end-to-end
    val pieces = Seq("w3ab").toDF("word")
      .select(Bpe.exactPieces(col("word"), msCapped).as("p"))
      .as[Seq[String]].head()
    assert(pieces.mkString == "w3ab" + Bpe.EndOfWord)
    // cap is deterministic under repartitioning (top-K + lexicographic ties)
    val capped2 = Bpe.cappedWordCounts(wc.repartition(7), ceiling)
    assert(capped.orderBy("word").collect().toSeq ==
      capped2.orderBy("word").collect().toSeq)
  }

  test("determinism: ties break lexicographically, independent of input order") {
    val a = Seq(("xy", 5L), ("pq", 5L), ("mn", 5L))
    val m1 = Bpe.trainLocal(localWords(a), 3)
    val m2 = Bpe.trainLocal(localWords(a.reverse), 3)
    assert(m1 == m2)
    assert(m1.head.left == "m", s"lexicographic first: $m1") // (m,n) before (p,q),(x,y)
  }
}
