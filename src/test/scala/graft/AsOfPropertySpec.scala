package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{AsOfJoin, Packing}

/** Randomized driver-reference differentials for the as-of join family and
  * the packing layouts. The hand-case specs in OpsSpec pin the documented
  * corners; these generate dense tie/miss-heavy instances (small key and
  * time domains force equal-time collisions and one-sided keys) and check
  * every direction x strictness against an obviously-correct driver fold.
  * Right-side (key, time) pairs are kept DISTINCT — with duplicates the
  * matched row among equal-time right rows is resolved arbitrarily (the
  * pandas contract), so no deterministic reference exists.
  */
class AsOfPropertySpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSession.spark
  import spark.implicits._

  import PropertyTestKit.sampled

  // left rows carry a unique id so Spark results map 1:1 onto the reference
  private val (leftRows, rightRows) = {
    import org.scalacheck.Gen
    val key = Gen.oneOf("k0", "k1", "k2", "k3", "k_left_only", "k_right_only")
    val t = Gen.chooseNum(0L, 30L)
    val lgen = for { k <- key if k != "k_right_only"; lt <- t } yield (k, lt)
    val rgen = for { k <- key if k != "k_left_only"; rt <- t } yield (k, rt)
    val ls = Seq.tabulate(90)(i => { val (k, lt) = sampled(lgen); (k, lt, i.toLong) })
    val rs = Seq.fill(70)(sampled(rgen)).distinct.zipWithIndex
      .map { case ((k, rt), i) => (k, rt, 1000L + i) }
    (ls, rs)
  }

  private def run(f: (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) => org.apache.spark.sql.DataFrame): Map[Long, Option[Long]] = {
    val left = leftRows.toDF("k", "t", "id")
    val right = rightRows.toDF("k", "t", "v")
    f(left, right).collect()
      .map(r => r.getAs[Long]("id") -> (if (r.isNullAt(r.fieldIndex("rv"))) None else Some(r.getAs[Long]("rv"))))
      .toMap
  }

  private def refMatch(pick: (Long, Seq[(Long, Long)]) => Option[Long]): Map[Long, Option[Long]] =
    leftRows.map { case (k, lt, id) =>
      id -> pick(lt, rightRows.collect { case (rk, rt, v) if rk == k => (rt, v) })
    }.toMap

  test("asof backward/forward (strict and inclusive) match the driver reference") {
    for (strict <- Seq(false, true)) {
      val back = run(AsOfJoin.backward(_, _, Seq("k"), "t", "t", Map("v" -> "rv"), strict))
      val refB = refMatch((lt, cands) => {
        val ok = cands.filter(c => if (strict) c._1 < lt else c._1 <= lt)
        if (ok.isEmpty) None else Some(ok.maxBy(_._1)._2)
      })
      assert(back == refB, s"backward strict=$strict diverged from reference")
      val fwd = run(AsOfJoin.forward(_, _, Seq("k"), "t", "t", Map("v" -> "rv"), strict))
      val refF = refMatch((lt, cands) => {
        val ok = cands.filter(c => if (strict) c._1 > lt else c._1 >= lt)
        if (ok.isEmpty) None else Some(ok.minBy(_._1)._2)
      })
      assert(fwd == refF, s"forward strict=$strict diverged from reference")
    }
  }

  test("asof nearest matches the driver reference (distance tie -> backward)") {
    val near = run(AsOfJoin.nearest(_, _, Seq("k"), "t", "t", Map("v" -> "rv")))
    val ref = refMatch((lt, cands) => {
      val b = cands.filter(_._1 <= lt).sortBy(_._1).lastOption
      val f = cands.filter(_._1 >= lt).sortBy(_._1).headOption
      (b, f) match {
        case (None, None) => None
        case (Some(x), None) => Some(x._2)
        case (None, Some(y)) => Some(y._2)
        case (Some(x), Some(y)) =>
          if (lt - x._1 <= y._1 - lt) Some(x._2) else Some(y._2)
      }
    })
    assert(near == ref, "nearest diverged from reference")
  }

  test("asof backwardSalted == backward on the generated instance, all salt widths") {
    for (strict <- Seq(false, true)) {
      val plain = run(AsOfJoin.backward(_, _, Seq("k"), "t", "t", Map("v" -> "rv"), strict))
      for (salts <- Seq(1, 3, 8)) {
        val salted = run(AsOfJoin.backwardSalted(_, _, Seq("k"), "t", "t", Map("v" -> "rv"), strict, salts))
        assert(salted == plain, s"salted(salts=$salts, strict=$strict) != plain backward")
      }
    }
  }

  test("packByTokenBudget bins match a driver cumsum over the same ordering") {
    import org.scalacheck.Gen
    val budget = 64L
    val docs = Seq.tabulate(300)(i =>
      (f"d$i%04d", sampled(Gen.chooseNum(1L, 60L))))
    val out = Packing.packByTokenBudget(docs.toDF("id", "tokens"),
        col("id"), col("tokens"), budget, shards = 4)
      .collect().map(r => (r.getAs[String]("id"), r.getAs[Long]("tokens"),
        r.getAs[Long]("shard"), r.getAs[Long]("bin")))
    // every row survives exactly once with its columns intact
    assert(out.map(r => r._1 -> r._2).sorted.toSeq == docs.sorted)
    // per shard, in id order: bin == floor(exclusive-cumsum / budget)
    out.groupBy(_._3).foreach { case (shard, rows) =>
      var cum = 0L
      rows.sortBy(_._1).foreach { case (id, tokens, _, bin) =>
        assert(bin == cum / budget,
          s"shard $shard id $id: bin $bin != ${cum / budget} (cum $cum)")
        cum += tokens
      }
    }
  }

  test("bucketByLength: batches never cross buckets and only tail batches run short") {
    import org.scalacheck.Gen
    val batchSize = 8
    val docs = Seq.tabulate(300)(i =>
      (f"d$i%04d", sampled(Gen.chooseNum(0L, 300L)))) // 0 exercises the max(len,1) floor
    val out = Packing.bucketByLength(docs.toDF("id", "tokens"),
        col("id"), col("tokens"), batchSize, shards = 3)
      .collect().map(r => (r.getAs[String]("id"), r.getAs[Long]("tokens"),
        r.getAs[Long]("bucket"), r.getAs[Long]("shard"), r.getAs[Long]("batch")))
    assert(out.map(r => r._1 -> r._2).sorted.toSeq == docs.sorted)
    out.foreach { case (id, tokens, bucket, _, _) =>
      val len = math.max(tokens, 1L)
      assert(bucket == 63 - java.lang.Long.numberOfLeadingZeros(len),
        s"$id: bucket $bucket != floor(log2($len))")
    }
    out.groupBy(r => (r._3, r._4)).foreach { case ((bucket, shard), rows) =>
      val sizes = rows.groupBy(_._5).view.mapValues(_.length).toMap
      val maxBatch = sizes.keys.max
      sizes.foreach { case (batch, n) =>
        if (batch < maxBatch)
          assert(n == batchSize, s"bucket $bucket shard $shard batch $batch: $n rows, want $batchSize")
        else assert(n <= batchSize && n > 0)
      }
      assert(sizes.keySet == (0L to maxBatch).toSet, "batch ids must be contiguous from 0")
    }
  }
}
