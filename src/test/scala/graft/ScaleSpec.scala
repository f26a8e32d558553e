package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Scale

/** Scale-mechanism specs: salted plans must be result-identical to plain
  * plans, and bucketed joins must plan without shuffle exchanges.
  */
class ScaleSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSession.spark
  import spark.implicits._

  test("saltedAggregate equals plain aggregation on a skewed key") {
    // 90% of rows share one key — the salting target
    val df = ((1 to 900).map(_ => ("hot", 1.0)) ++ (1 to 100).map(i => (s"k$i", 2.0)))
      .toDF("k", "v")
    val plain = df.groupBy("k").agg(sum("v").as("total"), count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    val salted = Scale.saltedAggregate(df, Seq("k"), salts = 8, partials = Map(
      "total" -> (sum(col("v")), (c: org.apache.spark.sql.Column) => sum(c)),
      "n" -> (count(lit(1)), (c: org.apache.spark.sql.Column) => sum(c))))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    assert(salted == plain)
  }

  test("content salt skips MapType columns; all-map frames refuse loudly") {
    // a MapType column in the salt hash fails analysis (Spark disallows
    // hash-on-map) — the salt must hash only the hashable columns and still
    // aggregate correctly
    val df = ((1 to 200).map(_ => ("hot", 1.0)) ++ (1 to 20).map(i => (s"k$i", 2.0)))
      .toDF("k", "v")
      .withColumn("m", map(col("k"), col("v")))
    val plain = df.groupBy("k").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val salted = Scale.saltedAggregate(df, Seq("k"), salts = 4, partials = Map(
      "n" -> (count(lit(1)), (c: org.apache.spark.sql.Column) => sum(c))))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(salted == plain)
    val allMaps = Seq(1).toDF("x").select(map(col("x"), col("x")).as("m"))
    val e = intercept[IllegalArgumentException] {
      Scale.saltedAggregate(allMaps, Seq("m"), salts = 4, partials = Map(
        "n" -> (count(lit(1)), (c: org.apache.spark.sql.Column) => sum(c))))
    }
    assert(e.getMessage.contains("MapType"))
  }

  test("spreadForCompute: spreads under-split file scans, no-ops below the byte gate; fence keeps filters post-exchange") {
    import org.apache.spark.sql.catalyst.plans.logical.{Filter => LFilter, Repartition => LRepartition}
    val dir = java.nio.file.Files.createTempDirectory("spread").toString
    // one ~1.5MB single-file corpus → ONE scan partition on read-back
    spark.range(2000).select(col("id"),
        concat_ws(" ", (0 until 40).map(i => concat(lit(s"tok$i"), col("id"))): _*).as("text"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/docs")
    val docs = spark.read.parquet(s"$dir/docs")
    val spread = Scale.spreadForCompute(docs, fence = Seq("text"))
    assert(spread.rdd.getNumPartitions == spark.sparkContext.defaultParallelism,
      "a >256KB single-partition file scan must spread to the core count")
    assert(spread.count() == 2000)

    // below the byte gate: untouched (identical plan, no exchange)
    spark.range(5).select(col("id"), lit("x").as("text"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/tiny")
    val tiny = spark.read.parquet(s"$dir/tiny")
    assert(Scale.spreadForCompute(tiny) eq tiny, "tiny frames must not pay a shuffle")

    // fence: a filter over a derived-from-text column must stay ABOVE the
    // repartition (unfenced, PushDownPredicates drags it — and the kernel
    // expressions inside it — below the exchange into the scan stage)
    def filterBelowRepartition(df: org.apache.spark.sql.DataFrame): Boolean =
      df.queryExecution.optimizedPlan.collect {
        case r: LRepartition => r.child.collect { case f: LFilter => f }.nonEmpty
      }.exists(identity)
    val fenced = spread.filter(length(col("text")) > 10)
    assert(!filterBelowRepartition(fenced),
      "fenced payload: the filter must evaluate post-exchange")
    val unfenced = Scale.spreadForCompute(docs).filter(length(col("text")) > 10)
    assert(filterBelowRepartition(unfenced),
      "sanity: without the fence the optimizer pushes the filter below the exchange")
    // the barrier is value-identity: fenced and unfenced agree exactly
    assert(fenced.count() == unfenced.count())
  }

  test("saltedJoin equals plain join") {
    val left = ((1 to 500).map(_ => 1) ++ (1 to 50)).map(k => (k, s"l$k")).toDF("k", "lv")
    val right = (1 to 50).map(k => (k, s"r$k")).toDF("k", "rv")
    val plain = left.join(right, "k").collect().map(_.toSeq).toSet
    val salted = Scale.saltedJoin(left, right, Seq("k"), salts = 4)
      .select("k", "lv", "rv").collect().map(_.toSeq).toSet
    assert(salted == plain)
  }

  test("bucketed join plans without shuffle exchanges") {
    val a = (1 to 1000).map(i => (i.toLong, i * 2.0)).toDF("k", "va")
    val b = (1 to 1000).map(i => (i.toLong, i * 3.0)).toDF("k", "vb")
    // a fresh in-memory catalog + a leftover warehouse dir from a prior JVM
    // trips LOCATION_ALREADY_EXISTS; clear both
    Seq("bkt_a", "bkt_b").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = java.nio.file.Paths.get("spark-warehouse", t)
      if (java.nio.file.Files.exists(loc)) {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(loc).iterator().asScala.toSeq.reverse
          .foreach(java.nio.file.Files.deleteIfExists(_))
      }
    }
    Scale.writeBucketed(a, "bkt_a", Seq("k"), buckets = 4)
    Scale.writeBucketed(b, "bkt_b", Seq("k"), buckets = 4)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("bkt_a").join(spark.table("bkt_b"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("ShuffleExchange") && !plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n$plan")
      assert(joined.count() == 1000)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("removeDuplicateSpans and dsirScores are partition-invariant") {
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"), col("lang")).limit(80)
    def spans(df: org.apache.spark.sql.DataFrame) =
      graft.ops.TextAnalysis.removeDuplicateSpans(df, col("doc_id"), col("text"), k = 4)
        .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(2), r.getString(3))).toSeq
    assert(spans(docs.repartition(1)) == spans(docs.repartition(13)),
      "span removal must not depend on the partition layout")
    def dsir(df: org.apache.spark.sql.DataFrame) =
      graft.ops.TextAnalysis.dsirScores(df, col("doc_id"), col("text"),
          df.filter(col("lang") === "en"), col("text"), dim = 128)
        .orderBy("id").collect()
        .map(r => (r.getLong(0), math.round(r.getDouble(1) * 1e6))).toSeq
    assert(dsir(docs.repartition(1)) == dsir(docs.repartition(7)),
      "dsir scores must not depend on the partition layout")
  }

  test("approx percentile lands within its stated rank error at scale-ish cardinality") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // 100k distinct values; accuracy parameter 1000 -> rank error <= 1/1000
    val df = (1 to 100000).toDF("x")
    val approx = df.agg(percentile_approx(col("x"), lit(0.5), lit(1000))).head().getInt(0)
    val trueRank = 50000
    assert(math.abs(approx - trueRank) <= 100000 / 1000 + 1,
      s"approx median $approx outside rank-error bound of true $trueRank")
  }

  test("skewed duplicate mass: guarded LSH candidates stay linear, not quadratic (SKEW_r13 mechanism)") {
    // the make_skew.py pathology at spec scale: 2000 docs, 6% one
    // byte-identical template (exact-dup mass) + 4% template-plus-noise
    // (near-dup mass), rest unique. With exactPrepass + maxBucketSize the
    // candidate count must stay LINEAR in the duplicate mass — the
    // structural fact behind the recorded skew-point wall times (the
    // uncapped clique over the 200-doc template cluster alone would emit
    // ~C(200,2) ≈ 19900 pairs).
    val template = "breaking news update please subscribe to our channel and " +
      "hit the notification bell for more daily content about this developing story"
    val corpus = (0 until 2000).map { i =>
      val text =
        if (i % 100 < 6) template
        else if (i % 100 < 10) s"$template noise$i"
        else s"alpha$i beta$i gamma$i delta$i epsilon$i zeta$i eta$i theta$i iota$i kappa$i"
      (i.toLong, text)
    }.toDF("doc_id", "text")
    val nExact = 2000 * 6 / 100 // 120 identical docs
    val nNear = 2000 * 4 / 100 // 80 near-template docs
    val guarded = graft.ops.Dedup.minhashCandidates(corpus, col("text"), col("doc_id"),
      k = 3, numHashes = 4, bands = 2, maxBucketSize = Some(64L), exactPrepass = true)
    val nPairs = guarded.count()
    // linear bound: the prepass emits (rep, member) CHAINS for the exact
    // mass (nExact-1 edges), the cap drops the flooded near-template
    // buckets, and unique docs contribute at most a few accidental
    // collisions per band — nothing may approach the ~19900-pair clique
    val quadratic = (nExact + nNear).toLong * (nExact + nNear - 1) / 2
    assert(nPairs < quadratic / 10,
      s"$nPairs candidate pairs — duplicate mass went quadratic (clique would be $quadratic)")
    assert(nPairs >= (nExact - 1).toLong,
      s"$nPairs pairs cannot even chain the $nExact identical docs — the prepass lost mass")
    // and the chains keep components whole: all exact-template docs land in
    // ONE component (the guard bounds pairs without splitting the cluster)
    val comps = graft.ops.Components.connectedComponents(
      guarded.select(col("id_a"), col("id_b")), "id_a", "id_b")
    val exactIds = (0 until 2000).filter(_ % 100 < 6).map(_.toLong).toSet
    val exactComps = comps.collect()
      .filter(r => exactIds.contains(r.getAs[Long]("id")))
      .map(_.getAs[Long]("component")).toSet
    assert(exactComps.size == 1,
      s"exact-template docs split across ${exactComps.size} components — member chains broken")
  }
}
