package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import TextAnalysis.hash60

/** Approximate-nearest-neighbor over embedding columns (parity-plus,
  * SURVEY.md §7 M5b): brute-force cosine top-k as the exact baseline, and a
  * hyperplane-LSH bucketed variant as the scale path (candidate set shrinks
  * to one bucket; the cross product never materializes globally).
  */
object Similarity {

  /** Cosine similarity of two double arrays — native codegen'd dot kernel,
    * no UDF. Inside joins, precompute [[l2norm]] per side first. A zero
    * vector has no direction: its cosine is NULL (evaluated lazily, so the
    * zero norm never reaches the divide — under Spark 4's default ANSI mode
    * a bare `/0` THROWS, and zero embeddings are ordinary data: padding
    * rows, all-stopword docs).
    */
  def cosine(a: Column, b: Column): Column =
    cosineWithNorms(dot(a, b), sqrt(dot(a, a)), sqrt(dot(b, b)))

  /** The shared zero-norm-safe cosine kernel for pair joins with staged
    * norms: null when either norm is 0 (or null).
    */
  def cosineWithNorms(dotAB: Column, normA: Column, normB: Column): Column =
    when(normA > 0.0 && normB > 0.0, dotAB / normA / normB)

  /** Dot product — [[graft.functions.DotProduct]], a native Catalyst
    * expression: one fused loop in whole-stage codegen instead of the
    * HOF spelling's materialized product array + interpreted fold
    * ([[dotHof]], kept as the differential-testing reference).
    */
  def dot(x: Column, y: Column): Column =
    graft.functions.DotProduct.dot_product(x, y)

  /** The HOF spelling of [[dot]] — semantically identical; exists so specs
    * can differential-test the native kernel against built-in machinery.
    */
  def dotHof(x: Column, y: Column): Column =
    aggregate(zip_with(x, y, (p, q) => p * q), lit(0.0), (acc, v) => acc + v)

  /** L2 norm — precompute this per vector BEFORE any pair join: cosine
    * inside a join otherwise re-aggregates both norms per PAIR (measured 3×
    * on near-dup candidate generation).
    */
  def l2norm(v: Column): Column = sqrt(dot(v, v))

  /** Element-wise mean of an embedding column per group (class centroids /
    * mean pooling for curation and IVF seeding). Distributed as
    * explode → per-(group, dim) partial-agg average → re-assemble sorted —
    * the shuffle carries one row per (group, dim), never whole vectors;
    * no UDF, no driver collection.
    */
  def meanPool(df: DataFrame, groupCols: Seq[String], vec: Column, out: String): DataFrame = {
    val keys = groupCols.map(col)
    df.select(keys :+ posexplode(vec).as(Seq("__dim__", "__v__")): _*)
      .groupBy(keys :+ col("__dim__"): _*)
      .agg(avg(col("__v__")).as("__mean__"))
      .groupBy(keys: _*)
      .agg(array_sort(collect_list(struct(col("__dim__"), col("__mean__")))).as("__entries__"))
      .withColumn(out, transform(col("__entries__"), e => e.getField("__mean__")))
      .drop("__entries__")
  }

  /** Deterministic pseudo-random hyperplane sign: plane p dotted with v,
    * where plane components are ±1 derived from the portable hash of
    * (plane, index). sign bits concatenate into the LSH bucket key.
    *
    * Each plane is a LITERAL ±1 array fed to the native dot kernel — one
    * constant-size expression per plane at ANY dim (the per-component
    * `element_at(v,i)·sign` chain this replaces was `planes × dim` inlined
    * terms: the same Janino method-limit blowup the IVF path had at real
    * nlist×dim). Left-to-right summation keeps the bucket bits identical to
    * the old spelling and the SQL oracle's re-derivation.
    */
  def hyperplaneBucket(vecCol: Column, planes: Int, dim: Int): Column = {
    val v = vecCol.cast("array<double>")
    val bits = (0 until planes).map { p =>
      val plane = typedLit((0 until dim).map(i => if (planeSign(p, i)) 1.0 else -1.0))
      val dotp = graft.functions.DotProduct.dot_product(v, plane)
      when(dotp >= 0, lit(1L) * (1L << p)).otherwise(0L)
    }
    bits.reduce(_ + _)
  }

  /** Plane component sign, computed once on the driver (same value the
    * oracle derives via md5 in SQL): parity of hash60("p:i").
    */
  def planeSign(p: Int, i: Int): Boolean = {
    val md5 = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$p:$i".getBytes("UTF-8"))
    val hex = md5.map("%02x".format(_)).mkString.take(15)
    (java.lang.Long.parseLong(hex, 16) & 1L) == 0L
  }

  /** Symmetric int8 quantization of an embedding (4× storage cut for ANN
    * corpora): per-vector `scale = max|v|/127`, `q_i = round(v_i/scale)`
    * (half-up via `floor(x+0.5)` — the engine-portable rounding), so every
    * code lands in [-127, 127] with no clamp. Dequantize as `q_i · scale`.
    * Pure column algebra — narrow, no UDF; zero vectors quantize to zeros
    * with scale 1.
    */
  def quantizeInt8(vec: Column): Column = {
    val mx = array_max(transform(vec, x => abs(x.cast("double"))))
    val scale = when(mx === 0.0, lit(1.0)).otherwise(mx / lit(127.0))
    struct(
      scale.as("scale"),
      transform(vec, x => floor(x.cast("double") / scale + lit(0.5)).cast("int")).as("q"))
  }

  /** Deterministic Johnson-Lindenstrauss random projection:
    * `out_j = (1/√outDim) · Σ_i v_i · s_{j,i}` with signs `s_{j,i} = ±1`
    * derived from the engine-portable hash ([[planeSign]] — the same
    * driver/executor/oracle parity as hyperplane bucketing). Compresses
    * embeddings before ANN/storage with JL-bounded distance distortion;
    * reproducible on any engine because the "random" matrix is pure hash.
    * The sign matrix ships as ONE literal 2-D array — constant expression
    * size at any dim×outDim (the IVF-centroid lesson) — and the fold runs
    * ascending i, so doubles are bit-identical everywhere.
    */
  def randomProject(vec: Column, dim: Int, outDim: Int): Column = {
    require(dim > 0 && outDim > 0, "dims must be positive")
    val signs = typedLit(Seq.tabulate(outDim)(j => Seq.tabulate(dim)(i =>
      if (planeSign(j, i)) 1.0 else -1.0)))
    val scale = lit(1.0) / sqrt(lit(outDim.toDouble))
    transform(sequence(lit(0), lit(outDim - 1)), j =>
      aggregate(sequence(lit(0), lit(dim - 1)), lit(0.0), (acc, i) =>
        acc + element_at(vec, i + 1).cast("double") *
          element_at(element_at(signs, j + 1), i + 1)) * scale)
  }

  /** Asymmetric int8-quantized cosine top-k: the corpus is stored/scored as
    * [[quantizeInt8]] codes (4× fewer bytes shuffled and cached than fp32 —
    * the storage path for 100 TB ANN corpora), queries stay full-precision.
    * Scoring dequantizes on the fly (`q_i · scale` — exact int→double, so
    * the only error is the original half-scale rounding); otherwise the
    * exact [[bruteForceTopK]] plan. Recall loss is bounded by the
    * quantization error, typically <0.1% at dim ≥ 64.
    */
  def quantizedTopK(queries: DataFrame, corpus: DataFrame,
      qId: String, qVec: String, cId: String, cVec: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val q = queries.withColumn("__qv__", col(qVec).cast("array<double>"))
      .withColumn("__qn__", l2norm(col("__qv__")))
    val c = corpus.withColumn("__qz__", quantizeInt8(col(cVec)))
      .withColumn("__cv__",
        transform(col("__qz__.q"), x => x.cast("double") * col("__qz__.scale")))
      .withColumn("__cn__", l2norm(col("__cv__")))
    val scored = q.crossJoin(c)
      .withColumn("cos", cosineWithNorms(dot(col("__qv__"), col("__cv__")), col("__qn__"), col("__cn__")))
      .filter(col(qId) =!= col(cId))
    val w = Window.partitionBy(col(qId)).orderBy(col("cos").desc, col(cId))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col(qId), col(cId), round(col("cos"), 4).as("cos"), col("rank"))
  }

  /** Brute-force cosine top-k: queries × corpus cross join, per-query heap
    * via window rank. Exact; use for ≤10^5-row query sets or as the
    * verification stage. Corpus side broadcasts when small.
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame,
      qId: String, qVec: String, cId: String, cVec: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val q = queries.withColumn("__qv__", col(qVec).cast("array<double>"))
      .withColumn("__qn__", l2norm(col("__qv__")))
    val c = corpus.withColumn("__cv__", col(cVec).cast("array<double>"))
      .withColumn("__cn__", l2norm(col("__cv__")))
    val scored = q.crossJoin(c)
      .withColumn("cos", cosineWithNorms(dot(col("__qv__"), col("__cv__")), col("__qn__"), col("__cn__")))
      .filter(col(qId) =!= col(cId))
    val w = Window.partitionBy(col(qId)).orderBy(col("cos").desc, col(cId))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col(qId), col(cId), round(col("cos"), 4).as("cos"), col("rank"))
  }

  /** IVF (inverted-file) ANN: partition the corpus into `nlist` Voronoi
    * cells via k-means centroids (fit on a sample — the training cost is
    * O(sample), not O(corpus)); each query probes its `nprobe` nearest
    * cells only. The corpus side shuffles once on cell id; queries join
    * per-cell — the classic IVF trade of recall for a 1/nlist candidate
    * fraction. Complements [[bucketedTopK]] (LSH) as the second scale path.
    */
  def ivfTopK(queries: DataFrame, corpus: DataFrame,
      qId: String, qVec: String, cId: String, cVec: String,
      k: Int, nlist: Int, nprobe: Int, sampleFraction: Double = 1.0,
      seed: Long = 42L): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector

    val train = (if (sampleFraction >= 1.0) corpus else corpus.sample(sampleFraction, seed))
      .select(array_to_vector(col(cVec).cast("array<double>")).as("features"))
    val model = new KMeans().setK(nlist).setSeed(seed).setFeaturesCol("features").fit(train)
    ivfTopKWithCentroids(queries, corpus, qId, qVec, cId, cVec, k, nprobe,
      model.clusterCenters.map(_.toArray.toSeq).toSeq)
  }

  /** IVF core with caller-supplied centroids (the KMeans fit above, or any
    * deterministic seeding — the oracle query derives centroids from fixed
    * corpus rows so DuckDB can replay cell assignment).
    *
    * The centroid table ships as ONE `typedLit` array-of-arrays literal and
    * distances/argmin run through `transform`/`aggregate`/`array_sort` HOFs:
    * expression size is CONSTANT in nlist×dim. (The earlier form inlined
    * `nlist × dim` literal terms into the projection — at a realistic
    * nlist=1024 / dim=768 that is ~800k expression nodes, past Janino's
    * 64KB method limit: codegen falls over exactly when scale arrives.)
    */
  def ivfTopKWithCentroids(queries: DataFrame, corpus: DataFrame,
      qId: String, qVec: String, cId: String, cVec: String,
      k: Int, nprobe: Int, centroids: Seq[Seq[Double]]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def cellRanks(vec: Column): Column = cellRanksExpr(centroids, vec)

    val cb = corpus.withColumn("__v__", col(cVec).cast("array<double>"))
      .withColumn("__cell__", cellRanks(col("__v__")).getItem(0).getField("cell"))
      .withColumn("__cn__", l2norm(col("__v__")))
    val qb = queries.withColumn("__qv__", col(qVec).cast("array<double>"))
      .withColumn("__cell__", explode(transform(
        slice(cellRanks(col("__qv__")), 1, nprobe), _.getField("cell"))))
      .withColumn("__qn__", l2norm(col("__qv__")))

    val scored = qb.join(cb, "__cell__")
      .withColumn("cos", cosineWithNorms(dot(col("__qv__"), col("__v__")), col("__qn__"), col("__cn__")))
      .filter(col(qId) =!= col(cId))
    val w = Window.partitionBy(col(qId)).orderBy(col("cos").desc, col(cId))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col(qId), col(cId), round(col("cos"), 4).as("cos"), col("rank"))
  }

  /** Per-cell squared-L2 ranks against a broadcast centroid table:
    * (distance, cell) structs sorted ascending — ties break toward the
    * lower cell id (oracles mirror with ORDER BY d, cell). The centroids
    * ship as ONE `typedLit` literal; expression size is constant in
    * nlist×dim (see [[ivfTopKWithCentroids]]'s Janino note).
    */
  private def cellRanksExpr(centroids: Seq[Seq[Double]], vec: Column): Column = {
    val ctr = typedLit(centroids)
    val dists = transform(ctr, c =>
      aggregate(zip_with(vec, c, (a, b) => (a - b) * (a - b)),
        lit(0.0), (acc, v) => acc + v))
    array_sort(zip_with(dists, sequence(lit(0), lit(centroids.size - 1)),
      (d, i) => struct(d.as("d"), i.as("cell"))))
  }

  /** SemDeDup-shaped semantic dedup (cluster-then-near-dup, after
    * "SemDeDup: Data-efficient learning at web-scale through semantic
    * deduplication", Abbas et al. 2023): every embedding is assigned to its
    * nearest centroid (the IVF argmin kernel — one broadcast constant, no
    * shuffle), and near-duplicates are sought only WITHIN a cell: a row is
    * dropped when a LOWER-id row in the same cell has cosine ≥ `eps` with
    * it. The all-pairs O(n²) cosine collapses to Σ_c O(n_c²) and the pair
    * join shuffles on the cell key only — the 100 TB shape, with cell
    * population bounded by the clustering granularity (raise nlist as the
    * corpus grows). Deterministic given `centroids`: pass seed-row
    * centroids for oracle replay, or a KMeans fit for the library path.
    * Returns the surviving ids.
    */
  def semanticDedup(emb: DataFrame, idCol: String, vecCol: String,
      centroids: Seq[Seq[Double]], eps: Double): DataFrame = {
    val assigned = emb.select(col(idCol).as("__id__"),
        col(vecCol).cast("array<double>").as("__v__"))
      .withColumn("__cell__",
        cellRanksExpr(centroids, col("__v__")).getItem(0).getField("cell"))
      .withColumn("__n__", l2norm(col("__v__")))
    val l = assigned.as("l"); val r = assigned.as("r")
    val dropped = l.join(r,
        col("l.__cell__") === col("r.__cell__") && col("l.__id__") < col("r.__id__"))
      .filter(cosineWithNorms(dot(col("l.__v__"), col("r.__v__")),
        col("l.__n__"), col("r.__n__")) >= eps)
      .select(col("r.__id__").as("__drop__"))
      .distinct()
    assigned.join(dropped, col("__id__") === col("__drop__"), "left_anti")
      .select(col("__id__").as(idCol))
  }

  /** Bucketed ANN top-k: both sides bucket by [[hyperplaneBucket]]; the join
    * happens per bucket (equi-join on the bucket key → hash shuffle on
    * buckets, not a cross product). Recall < 1 by construction; raise
    * `planes` count or probe multiple buckets for higher recall.
    */
  def bucketedTopK(queries: DataFrame, corpus: DataFrame,
      qId: String, qVec: String, cId: String, cVec: String,
      k: Int, planes: Int, dim: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val qb = queries.withColumn("__bucket__", hyperplaneBucket(col(qVec), planes, dim))
      .withColumn("__qv__", col(qVec).cast("array<double>"))
      .withColumn("__qn__", l2norm(col("__qv__")))
    val cb = corpus.withColumn("__bucket__", hyperplaneBucket(col(cVec), planes, dim))
      .withColumn("__cv__", col(cVec).cast("array<double>"))
      .withColumn("__cn__", l2norm(col("__cv__")))
    val scored = qb.join(cb, "__bucket__")
      .withColumn("cos", cosineWithNorms(dot(col("__qv__"), col("__cv__")), col("__qn__"), col("__cn__")))
      .filter(col(qId) =!= col(cId))
    val w = Window.partitionBy(col(qId)).orderBy(col("cos").desc, col(cId))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col(qId), col(cId), round(col("cos"), 4).as("cos"), col("rank"))
  }
}
