package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.core.{MLSchema, MLType}
import graft.io._

/** I/O metadata specs: storage/format detection (reference
  * `FileMetadata.py:72-147`), schema filtering, compression round-trips.
  */
class IoSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSession.spark
  import spark.implicits._

  test("storage detection by URI scheme") {
    assert(Storage.detect("/data/x.csv") == Storage.Local)
    assert(Storage.detect("s3://bucket/k.parquet") == Storage.S3)
    assert(Storage.detect("s3a://bucket/k.parquet") == Storage.S3)
    assert(Storage.detect("https://host/x.jsonl") == Storage.Url)
  }

  test("format detection: longest matching ending wins; default parquet") {
    assert(Format.detect("x.csv") == Format.Csv)
    assert(Format.detect("x.tsv") == Format.Tsv)
    assert(Format.detect("x.jsonl") == Format.JsonLines)
    assert(Format.detect("x.ndjson") == Format.JsonLines)
    assert(Format.detect("x.json") == Format.Json)
    assert(Format.detect("x.parquet") == Format.Parquet)
    assert(Format.detect("x.pq") == Format.Parquet)
    assert(Format.detect("x.yaml") == Format.Yaml)
    assert(Format.detect("dir/no_ending") == Format.Parquet)
    assert(Format.detect("x.jpg") == Format.Binary)
  }

  test("MLSchema filterDf prunes and tolerates missing; applyTo tags metadata") {
    val df = Seq((1L, "a", 2.0)).toDF("id", "txt", "num")
    val schema = MLSchema(Map(
      "id" -> MLType.Index, "txt" -> MLType.Text, "ghost" -> MLType.Float))
    val filtered = schema.filterDf(df)
    assert(filtered.columns.sorted.toSeq == Seq("id", "txt"))
    intercept[IllegalArgumentException] {
      schema.filterDf(df, allowMissing = false)
    }
    val tagged = schema.applyTo(df)
    assert(MLSchema.fromDf(tagged).fields == Map("id" -> MLType.Index, "txt" -> MLType.Text))
  }

  test("MLSchema.infer assigns roles from name regexes") {
    val s = MLSchema.infer(
      Seq("user_id", "label", "text_body", "score"),
      Seq(".*_id" -> MLType.Index, "label" -> MLType.GroundTruth, "text.*" -> MLType.Text))
    assert(s.fields == Map(
      "user_id" -> MLType.Index, "label" -> MLType.GroundTruth, "text_body" -> MLType.Text))
    assert(s.index == Seq("user_id"))
    assert(s.groundTruths == Seq("label"))
  }

  test("gzip round-trip: driver payload and per-partition payloads") {
    val df = Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma")).toDF("id", "name")
    val back = Compress.decompress(spark, Compress.compress(df), Some(df.schema))
    assert(back.orderBy("id").collect().toSeq == df.orderBy("id").collect().toSeq)
    val parts = Compress.compressPerPartition(df.repartition(2)).collect()
    assert(parts.length == 2)
    val rows = parts.map(Compress.gunzip).flatMap(_.split("\n").filter(_.nonEmpty))
    assert(rows.length == 3)
  }

  test("base64 compression round-trip") {
    val df = Seq((1L, "x")).toDF("id", "v")
    val b64 = Compress.compressBase64(df)
    assert(b64.matches("[A-Za-z0-9+/=]+"))
    val back = Compress.decompressBase64(spark, b64, Some(df.schema))
    assert(back.collect().toSeq == df.collect().toSeq)
  }

  test("writers honor numRows-based chunking") {
    val dir = java.nio.file.Files.createTempDirectory("graft_chunk").toString + "/out.csv"
    val df = spark.range(10).toDF("id")
    Writers.write(df, FileMetadata.of(dir), numRows = Some(3L))
    val files = new java.io.File(dir).listFiles().count(_.getName.endsWith(".csv"))
    assert(files == 4, s"expected ceil(10/3)=4 chunk files, got $files")
  }
}
