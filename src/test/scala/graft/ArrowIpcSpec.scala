package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.io.ArrowIpc

/** Arrow IPC stream round-trip specs — the torch-DataLoader interchange
  * closure. Cross-language compatibility was verified at development time
  * with `pyarrow.ipc.open_stream` on a JVM-written stream (exact values,
  * schema, and batch boundaries); these specs pin the JVM round-trip and
  * the type surface.
  */
class ArrowIpcSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSession.spark

  test("DataLoader-shaped frame round-trips: ids, text, embedding, label, mask") {
    import spark.implicits._
    val df = Seq(
      (1L, "doc one", Seq(0.1f, 0.2f, 0.3f), 0, true, Array[Byte](1, 2)),
      (2L, "emoji 😀", Seq(-1.5f, 0f, 2.25f), 1, false, Array.emptyByteArray),
      (3L, null.asInstanceOf[String], null.asInstanceOf[Seq[Float]], 2, true, null)
    ).toDF("id", "text", "emb", "label", "ok", "payload")
    val out = Files.createTempDirectory("arrow").resolve("feed.arrow").toString
    ArrowIpc.writeStream(df, out, batchRows = 2) // forces a multi-batch stream
    val back = ArrowIpc.readStream(spark, out).orderBy("id")
    assert(back.schema.map(f => (f.name, f.dataType.typeName)).toSeq ==
      df.schema.map(f => (f.name, f.dataType.typeName)).toSeq)
    val rows = back.collect()
    assert(rows.length == 3)
    assert(rows(0).getLong(0) == 1L && rows(0).getString(1) == "doc one")
    assert(rows(0).getSeq[Float](2) == Seq(0.1f, 0.2f, 0.3f))
    assert(rows(1).getString(1) == "emoji 😀" && !rows(1).getBoolean(4))
    assert(rows(2).isNullAt(1) && rows(2).isNullAt(2) && rows(2).isNullAt(5))
    assert(rows(1).getAs[Array[Byte]](5).isEmpty)
  }

  test("double/long embeddings and empty frame") {
    import spark.implicits._
    val df = Seq((1L, Seq(1.5, 2.5), Seq(10L, 20L))).toDF("id", "d", "l")
    val out = Files.createTempDirectory("arrow").resolve("t.arrow").toString
    ArrowIpc.writeStream(df, out)
    val back = ArrowIpc.readStream(spark, out)
    assert(back.collect().head.getSeq[Double](1) == Seq(1.5, 2.5))
    assert(back.collect().head.getSeq[Long](2) == Seq(10L, 20L))

    val empty = df.filter("id < 0")
    val out2 = Files.createTempDirectory("arrow").resolve("e.arrow").toString
    ArrowIpc.writeStream(empty, out2)
    val back2 = ArrowIpc.readStream(spark, out2)
    assert(back2.count() == 0 && back2.columns.toSeq == Seq("id", "d", "l"))
  }

  test("pyarrow-written stream reads back (cross-direction pin)") {
    val path = java.nio.file.Paths.get(
      getClass.getResource("/arrow/py_feed.arrow").toURI).toString
    val df = ArrowIpc.readStream(spark, path)
    val rows = df.collect()
    assert(df.schema.map(_.dataType.typeName) == Seq("long", "array", "string"))
    assert(rows(0).getLong(0) == 1L && rows(0).getSeq[Float](1) == Seq(0.5f, 1.5f))
    assert(rows(1).isNullAt(1) && rows(1).isNullAt(2))
    assert(rows(2).isNullAt(0) && rows(2).getSeq[Float](1).isEmpty &&
      rows(2).getString(2) == "emoji 😀")
  }

  test("unsigned Arrow ints refuse at schema time, not mid-read") {
    val path = java.nio.file.Paths.get(
      getClass.getResource("/arrow/unsigned.arrow").toURI).toString
    val e = intercept[IllegalArgumentException](ArrowIpc.readStream(spark, path))
    assert(e.getMessage.contains("unsigned int64"))
  }

  test("unsupported type refuses loudly") {
    import spark.implicits._
    val df = Seq((1L, Map("k" -> 1))).toDF("id", "m")
    val out = Files.createTempDirectory("arrow").resolve("bad.arrow").toString
    val e = intercept[IllegalArgumentException](ArrowIpc.writeStream(df, out))
    assert(e.getMessage.contains("unsupported"))
  }
}
