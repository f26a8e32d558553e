package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BM25 relevance scoring of a corpus against a fixed term set — the
  * retrieval-side selection primitive (rank documents for a topic, mine
  * nearest-to-query training data, dedup against a benchmark by lexical
  * relevance). The reference reaches this via its TF-IDF processor family
  * (`src/bears/processor/_DataPipeline.py` TFIDF path); BM25 is the
  * saturation-corrected member of that family.
  *
  * Shape at 100 TB: per-term tf is a constant-width map-side projection over
  * staged tokens (terms are literals — no vocabulary shuffle); corpus stats
  * (N, avgdl, per-term document frequency) reduce in ONE aggregate to a
  * single broadcast row; the final score is a fixed-order fold — fully
  * deterministic double arithmetic any SQL engine replays term for term.
  */
object Bm25 {

  /** Lucene-style idf: ln(1 + (N − df + 0.5)/(df + 0.5)) — never negative. */
  private def idf(n: Column, df: Column): Column =
    log(lit(1.0) + (n - df + lit(0.5)) / (df + lit(0.5)))

  /** Adds `out` = BM25(text, terms) with parameters k1, b. */
  def score(docs: DataFrame, text: Column, terms: Seq[String], out: String,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "need at least one query term")
    val staged = docs
      .withColumn("__toks__", TextAnalysis.tokens(text))
      .withColumn("__dl__", size(col("__toks__")).cast("double"))
      .withColumn("__tf__", array(terms.map(t =>
        size(filter(col("__toks__"), x => x === lit(t))).cast("double")): _*))
    val statAggs =
      count(lit(1)).cast("double").as("__N__") +:
      avg(col("__dl__")).as("__avgdl__") +:
      terms.indices.map(i =>
        sum((element_at(col("__tf__"), i + 1) > 0).cast("long"))
          .cast("double").as(s"__df_$i"))
    val stats = staged.agg(statAggs.head, statAggs.tail: _*)
    val scored = staged.crossJoin(broadcast(stats))
    // avgdl == 0 (every doc tokenized empty) would ANSI-throw on dl/avgdl;
    // all dl are then 0 too, so the length ratio is 0 by definition
    val lenRatio = when(col("__avgdl__") > 0.0, col("__dl__") / col("__avgdl__"))
      .otherwise(lit(0.0))
    val norm = lit(k1) * (lit(1 - b) + lit(b) * lenRatio)
    val total = terms.indices.map { i =>
      val tf = element_at(col("__tf__"), i + 1)
      idf(col("__N__"), col(s"__df_$i")) * tf * lit(k1 + 1) / (tf + norm)
    }.reduce(_ + _)
    scored
      .withColumn(out, total)
      .drop(Seq("__toks__", "__dl__", "__tf__", "__N__", "__avgdl__") ++
        terms.indices.map(i => s"__df_$i"): _*)
  }
}
