package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{Sampling, TextAnalysis}

/** Randomized invariants and driver differentials for the deterministic
  * hash-sampling family. The id hashes come from the engine ONCE per test
  * (hash60 is a Catalyst expression), then every driver reference replays
  * the documented selection rule over those hashes — so the tests pin the
  * selection wiring, not the hash function (FnvHashSpec and the codegen
  * property spec pin that).
  */
class SamplingPropertySpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSession.spark
  import spark.implicits._

  import PropertyTestKit.sampled

  private val rows: Seq[(String, String)] = {
    import org.scalacheck.Gen
    val dom = Gen.frequency(5 -> Gen.const("web"), 3 -> Gen.const("code"),
      1 -> Gen.const("wiki"), 1 -> Gen.const("books"))
    Seq.tabulate(600)(i => (f"id$i%04d", sampled(dom)))
  }

  private def df = rows.toDF("id", "domain")

  // engine-computed hash per id, reused by every driver reference below
  private lazy val hashes: Map[String, Long] = df
    .select(col("id"), TextAnalysis.hash60(col("id").cast("string")).as("h"))
    .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("stratifiedByHash matches the driver threshold rule and ignores partitioning") {
    val fr = Map("web" -> 0.25, "code" -> 0.6, "wiki" -> 0.0)
    val got = Sampling.stratifiedByHash(df, col("domain"), col("id"), fr, default = 1.0)
      .collect().map(_.getString(0)).toSet
    val want = rows.filter { case (id, d) =>
      val t = (fr.getOrElse(d, 1.0) * 10000).toLong
      math.floorMod(hashes(id), 10000L) < t
    }.map(_._1).toSet
    assert(got == want, "stratified selection diverged from the threshold rule")
    assert(!got.exists(id => rows.toMap.apply(id) == "wiki"), "fraction 0 must drop all")
    assert(rows.collect { case (id, "books") => id }.forall(got), "default 1.0 keeps all")
    val repart = Sampling.stratifiedByHash(df.repartition(13, col("domain")),
        col("domain"), col("id"), fr, default = 1.0)
      .collect().map(_.getString(0)).toSet
    assert(repart == got, "selection changed under repartition")
  }

  test("toMixture matches the driver fraction planning over the same hashes") {
    val weights = Map("web" -> 0.5, "code" -> 0.3, "wiki" -> 0.2)
    val got = Sampling.toMixture(df, col("domain"), col("id"), weights)
      .collect().map(_.getString(0)).toSet
    val counts = rows.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val maxTotal = weights.map { case (d, w) => counts(d).toDouble / w }.min
    val fractions = weights.map { case (d, w) =>
      d -> math.min(1.0, (w * maxTotal) / counts(d))
    }
    val want = rows.filter { case (id, d) =>
      fractions.get(d).exists(f =>
        math.floorMod(hashes(id), 10000L) < (f * 10000).toLong)
    }.map(_._1).toSet
    assert(got == want, "mixture selection diverged")
    // domains absent from weights are dropped entirely
    assert(!got.exists(id => rows.toMap.apply(id) == "books"))
  }

  test("nByHash / nByHashPerGroup return the smallest-hash rows exactly") {
    val n = 37
    val got = Sampling.nByHash(df, col("id"), n).collect().map(_.getString(0)).toSet
    val want = rows.map(_._1).sortBy(id => (hashes(id), id)).take(n).toSet
    assert(got == want, "nByHash selection diverged")
    val per = Sampling.nByHashPerGroup(df, col("domain"), col("id"), 10)
      .collect().map(r => (r.getString(0), r.getString(1)))
    val wantPer = rows.groupBy(_._2).flatMap { case (d, rs) =>
      rs.map(_._1).sortBy(id => (hashes(id), id)).take(10).map(id => (id, d))
    }.toSet
    assert(per.toSet == wantPer, "per-group selection diverged")
  }

  test("kFold and split are total, deterministic partitions with the documented buckets") {
    val k = 5
    val folds = Sampling.kFold(df, col("id"), k)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("fold")).toMap
    assert(folds.keySet == rows.map(_._1).toSet)
    folds.foreach { case (id, f) =>
      assert(f == math.floorMod(hashes(id), k.toLong), s"fold of $id")
    }
    val fr = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val splits = Sampling.split(df, col("id"), fr)
      .collect().map(r => r.getString(0) -> r.getAs[String]("split")).toMap
    assert(splits.keySet == rows.map(_._1).toSet)
    splits.foreach { case (id, s) =>
      val b = math.floorMod(hashes(id), 10000L)
      val want = if (b < 8000) "train" else if (b < 9000) "val" else "test"
      assert(s == want, s"split of $id: $s vs $want (bucket $b)")
    }
  }

  test("weightedNByHash and gumbelTopK: exact n, deterministic, partition-independent") {
    val wdf = df.withColumn("w", (length(col("id")) + pmod(TextAnalysis.hash60(col("id")), lit(5L))).cast("double") + lit(0.5))
    val a = Sampling.weightedNByHash(wdf, col("id"), col("w"), 25)
      .collect().map(_.getString(0)).toSet
    val b = Sampling.weightedNByHash(wdf.repartition(17), col("id"), col("w"), 25)
      .collect().map(_.getString(0)).toSet
    assert(a.size == 25 && a == b, "weighted sample not deterministic")
    val g1 = Sampling.gumbelTopK(wdf, col("id"), log(col("w")), 25)
      .collect().map(_.getString(0)).toSet
    val g2 = Sampling.gumbelTopK(wdf.repartition(17), col("id"), log(col("w")), 25)
      .collect().map(_.getString(0)).toSet
    assert(g1.size == 25 && g1 == g2, "gumbel sample not deterministic")
    // different seeds give a different (equally sized) selection
    val g3 = Sampling.gumbelTopK(wdf, col("id"), log(col("w")), 25, seed = 7L)
      .collect().map(_.getString(0)).toSet
    assert(g3.size == 25 && g3 != g1, "seed must change the draw")
  }
}
