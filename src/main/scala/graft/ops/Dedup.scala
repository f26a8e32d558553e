package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import TextAnalysis.{hash60, shingles}

/** Deduplication operators for training-data pipelines (parity-plus,
  * SURVEY.md §7 M5b): exact, MinHash+LSH, SimHash, n-gram Jaccard,
  * embedding-cosine. All hash math is the engine-portable 60-bit md5 basis
  * ([[TextAnalysis.hash60]]) so every stage is oracle-verifiable.
  *
  * Scale shape: exact dedup is one hash shuffle on the digest (not the
  * document); MinHash/LSH turns the O(N²) pair space into per-band bucket
  * joins (shuffle keys = (band, bandHash), so only colliding candidates
  * meet); SimHash buckets by prefix. Nothing materializes pairs except
  * within buckets.
  */
object Dedup {

  /** Exact dedup on a normalized digest: keep the smallest `idCol` per
    * digest group. One shuffle on the 60-bit digest; the full text never
    * moves (hash-groupBy pattern).
    */
  def exactDedup(df: DataFrame, textCol: Column, idCol: Column): DataFrame = {
    val digest = TextAnalysis.fingerprint(textCol)
    df.withColumn("__digest__", digest)
      .groupBy(col("__digest__"))
      .agg(min(idCol).as("keep_id"), count(lit(1)).as("dups"))
  }

  /** Surviving-rows form of [[exactDedup]]: keep exactly the min-id row per
    * digest group (semi-join back on the keeper ids — the id set shuffles,
    * never the documents).
    */
  def exactDedupRows(df: DataFrame, textCol: Column, idCol: Column): DataFrame = {
    val keepers = exactDedup(df, textCol, idCol).select(col("keep_id"))
    df.join(keepers, idCol === col("keep_id"), "left_semi")
  }

  /** MinHash signature: H independent hash functions simulated by salting
    * the shingle hash with the function index — `min_j over shingles of
    * hash60(j || ':' || shingle)`. Pure expression, one pass per row.
    */
  def minhashSignature(textCol: Column, k: Int, numHashes: Int): Column =
    minhashFromShingles(shingles(textCol, k), numHashes)

  /** Signature from a precomputed shingles column — stage the shingles as
    * their own projection first (see [[graft.processor.TfIdfVectorization
    * .transformStaged]]: inlined Column references re-evaluate the whole
    * tokenize→shingle subtree once per hash function otherwise).
    */
  def minhashFromShingles(shinglesCol: Column, numHashes: Int): Column = {
    val sigs = (0 until numHashes).map { j =>
      array_min(transform(shinglesCol, s => hash60(concat(lit(s"$j:"), s))))
    }
    array(sigs: _*)
  }

  /** LSH banding: split the signature into `bands` rows of
    * `numHashes/bands`, hash each band — docs sharing any band bucket are
    * candidate near-dups. Returns (bandId, bandHash) rows via posexplode;
    * join candidates on both.
    */
  def lshBands(sigCol: Column, numHashes: Int, bands: Int): Column = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rowsPer = numHashes / bands
    transform(
      sequence(lit(0), lit(bands - 1)),
      b => struct(
        b.as("band"),
        hash60(concat_ws(",", slice(sigCol, b * rowsPer + 1, lit(rowsPer)))).as("band_hash")))
  }

  /** Candidate near-dup pairs via MinHash LSH: explode bands, self-join on
    * (band, band_hash), dedupe pairs. At scale the join shuffles only
    * bucket keys; bucket skew is bounded by band width — EXCEPT on
    * pathological corpora (thousands of byte-identical documents land every
    * band in one bucket, and the within-bucket self-join is quadratic).
    * `maxBucketSize` is that cliff's guard: buckets above the cap are
    * dropped with a logged count before the pair join, bounding work to
    * `buckets × cap²` pairs. Exact duplicates belong to [[exactDedup]]
    * (linear) anyway — LSH is for the NEAR-dup tail, so a cap around
    * 50–500 loses nothing real at 100 TB. Off by default: the oracle query
    * replays the uncapped join.
    */
  def minhashCandidates(df: DataFrame, textCol: Column, idCol: Column,
      k: Int = 3, numHashes: Int = 8, bands: Int = 4,
      maxBucketSize: Option[Long] = None): DataFrame = {
    // ALWAYS persist the banded signatures: the candidate self-join reads
    // this frame on both sides, and uncached each side would recompute the
    // whole tokenize→shingle→minhash pipeline (measured ~2× on the q91
    // profile). The cached rows are (id, band, band_hash) — three scalars,
    // orders of magnitude smaller than the corpus text; MEMORY_AND_DISK
    // spills gracefully at extreme |docs|×bands.
    val withBands = df
      .select(idCol.as("id"), shingles(textCol, k).as("__sh__"))
      .select(col("id"), minhashFromShingles(col("__sh__"), numHashes).as("__sig__"))
      .select(col("id"), explode(lshBands(col("__sig__"), numHashes, bands)).as("b"))
      .select(col("id"), col("b.band").as("band"), col("b.band_hash").as("band_hash"))
      .persist()
    val pruned = maxBucketSize match {
      case None => withBands
      case Some(cap) =>
        val hot = withBands.groupBy(col("band"), col("band_hash"))
          .agg(count(lit(1)).as("__bsz__"))
          .filter(col("__bsz__") > cap)
          .persist()
        val nHot = hot.count()
        if (nHot > 0)
          org.apache.log4j.Logger.getLogger(getClass)
            .warn(s"minhashCandidates: dropping $nHot LSH bucket(s) over cap=$cap " +
              "(pathological duplicate mass — run exactDedup first)")
        withBands.join(hot.select(col("band"), col("band_hash")),
          Seq("band", "band_hash"), "left_anti")
    }
    val l = pruned.as("l")
    val r = pruned.as("r")
    l.join(r, col("l.band") === col("r.band") && col("l.band_hash") === col("r.band_hash") &&
      col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"))
      .distinct()
  }

  /** Exact n-gram Jaccard similarity of two texts (the verification stage
    * after LSH candidates): |A∩B| / |A∪B| over distinct shingles.
    */
  def jaccard(a: Column, b: Column, k: Int): Column =
    jaccardShingles(array_distinct(shingles(a, k)), array_distinct(shingles(b, k)))

  /** Jaccard over precomputed distinct-shingle arrays — compute the arrays
    * once per document BEFORE a pair join, not per pair.
    */
  def jaccardShingles(sa: Column, sb: Column): Column = {
    val inter = size(array_intersect(sa, sb)).cast("double")
    val union = size(array_union(sa, sb)).cast("double")
    when(union === 0, 0.0).otherwise(inter / union)
  }

  /** SimHash over token hashes: bit k of the output is the sign of
    * `sum over tokens of (2*bit_k(hash(token)) - 1)`. Near-dups have small
    * hamming distance ([[hamming]]). `bits` ≤ 60.
    */
  def simhash(textCol: Column, bits: Int = 32): Column = {
    val hashes = transform(TextAnalysis.tokens(textCol), t => hash60(t))
    val bitCols = (0 until bits).map { b =>
      val votes = aggregate(hashes, lit(0L),
        (acc, h) => acc + (shiftright(h, b).bitwiseAND(1) * 2 - 1))
      when(votes > 0, lit(1L) * (1L << b)).otherwise(0L)
    }
    bitCols.reduce(_ + _)
  }

  /** Hamming distance between two simhashes. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b)).cast("long")

  /** Embedding-cosine near-dup pairs: brute-force within hyperplane-LSH
    * buckets (random hyperplanes derived from the portable hash so the
    * bucketing itself is deterministic and verifiable). `planes` sign bits
    * make the bucket key; exact cosine filters within buckets.
    */
  def cosineCandidates(df: DataFrame, vecCol: Column, idCol: Column,
      planes: Int, dim: Int, threshold: Double): DataFrame = {
    val bucket = Similarity.hyperplaneBucket(vecCol, planes, dim)
    // norms precomputed per vector, not per pair (see Similarity.l2norm)
    val tagged = df.select(idCol.as("id"), vecCol.cast("array<double>").as("v"),
      bucket.as("bucket"))
      .withColumn("nrm", Similarity.l2norm(col("v")))
    val l = tagged.as("l"); val r = tagged.as("r")
    l.join(r, col("l.bucket") === col("r.bucket") && col("l.id") < col("r.id"))
      .withColumn("cos", Similarity.dot(col("l.v"), col("r.v")) / col("l.nrm") / col("r.nrm"))
      .filter(col("cos") >= threshold)
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"), round(col("cos"), 4).as("cos"))
  }
}
