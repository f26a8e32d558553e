package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, lit}
import org.scalatest.funsuite.AnyFunSuite
import graft.io.{Compress, FileMetadata, Readers, Writers}
import graft.sdf.SDF

/** Edge-semantics properties for binning, hive-partitioned sinks, and the
  * compressed-frame wire format: duplicate-heavy quantile bins against a
  * driver when-chain over independent type-7 bounds; partition VALUES with
  * separators/spaces/unicode surviving the directory encoding round-trip;
  * and hostile strings through gzip/zstd(+base64) with a pinned schema.
  */
class EdgeCasePropertySpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSession.spark
  import spark.implicits._

  import PropertyTestKit.sampled

  test("qcut and cut match the driver when-chain, duplicate-heavy data and nulls") {
    import org.scalacheck.Gen
    // heavy duplication: qcut boundaries collide, buckets must still be
    // deterministic (first-match-wins on the <= chain)
    val data: Seq[Option[Double]] = Seq.fill(200)(sampled(Gen.frequency(
      5 -> Gen.chooseNum(0, 4).map(v => Some(v.toDouble)),
      2 -> Gen.chooseNum(-10.0, 10.0).map(Some(_)),
      1 -> Gen.const(None))))
    val df = data.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("i", "v")
    val q = 4
    val sorted = data.flatten.sorted.toIndexedSeq
    def type7(p: Double): Double = {
      val h = (sorted.length - 1) * p
      sorted(h.floor.toInt) + (h - h.floor) * (sorted(h.ceil.toInt) - sorted(h.floor.toInt))
    }
    val bounds = (1 until q).map(i => type7(i.toDouble / q))
    def chain(x: Double): Int =
      bounds.zipWithIndex.find { case (b, _) => x <= b }.map(_._2).getOrElse(bounds.size)
    val sdf = SDF(df)
    val got = df.select(col("i"), sdf("v").qcut(q).as("b"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getInt(1)))).toMap
    data.zipWithIndex.foreach { case (v, i) =>
      assert(got(i.toLong) == v.map(chain), s"qcut row $i: ${got(i.toLong)} vs ${v.map(chain)}")
    }
    // fixed-bounds cut, boundary values exactly on the bounds
    val cutBounds = Seq(-2.0, 0.0, 0.0, 3.5)  // duplicate bound included
    def cchain(x: Double): Int =
      cutBounds.zipWithIndex.find { case (b, _) => x <= b }.map(_._2).getOrElse(cutBounds.size)
    val gotCut = df.select(col("i"), sdf("v").cut(cutBounds).as("b"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getInt(1)))).toMap
    data.zipWithIndex.foreach { case (v, i) =>
      assert(gotCut(i.toLong) == v.map(cchain), s"cut row $i")
    }
  }

  test("hive-partitioned sink round-trips special-character partition values") {
    import org.scalacheck.Gen
    // partition values land in DIRECTORY NAMES: spaces, separators, =, :,
    // percent-sequences — the writer must escape and the reader restore
    // exactly. Non-ASCII values are excluded: this container's JVM runs a
    // non-UTF-8 locale (sun.jnu.encoding), so the LOCAL filesystem cannot
    // create such paths at all — an environment limit, not engine escaping
    // (HDFS/S3 paths are byte-clean).
    val parts = Vector("plain", "with space", "a=b", "a:b", "a#b", "d%20e", "q'uote")
    val rows = Seq.tabulate(140)(i => (i.toLong, sampled(Gen.oneOf(parts)),
      sampled(Gen.chooseNum(-100.0, 100.0))))
    val dir = java.nio.file.Files.createTempDirectory("part_prop").toString + "/t.parquet"
    Writers.write(rows.toDF("id", "p", "x"), FileMetadata.of(dir), partitionBy = Seq("p"))
    val back = Readers.read(spark, dir)
      .select(col("id").cast("long"), col("p").cast("string"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.foreach { case (id, p, _) =>
      assert(back(id) == p, s"partition value of row $id: ${back(id)} vs $p")
    }
    // pruning still works on an escaped value: one partition dir read
    val pruned = Readers.read(spark, dir).filter(col("p") === "with space")
    val expected = rows.count(_._2 == "with space")
    assert(pruned.count() == expected)
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters"), "filter must reach partition pruning")
  }

  test("compressed-frame wire format round-trips hostile strings, both codecs") {
    import org.scalacheck.Gen
    val hostile = Gen.oneOf("plain", "line\nbreak", "tab\there", "q\"uote",
      "uni \u00e9\u4e2d\u00df", "{\"json\": true}", "back\\slash", "")
    val rows = Seq.tabulate(80)(i =>
      (i.toLong, sampled(hostile), sampled(Gen.chooseNum(-1e6, 1e6))))
    val df = rows.toDF("id", "s", "x")
    for (codec <- Seq("gzip", "zstd")) {
      val bytes = Compress.compress(df, codec)
      val back = Compress.decompress(spark, bytes, Some(df.schema), codec)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
      assert(back == rows.toSet, s"$codec round-trip diverged")
      val b64 = Compress.compressBase64(df, codec)
      val back64 = Compress.decompressBase64(spark, b64, Some(df.schema), codec)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
      assert(back64 == rows.toSet, s"$codec base64 round-trip diverged")
    }
  }
}
