package graft.io

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.charset.StandardCharsets
import java.util.zip.{GZIPInputStream, GZIPOutputStream}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Frame wire compression — the reference's `compress()`/`decompress()`
  * (`src/bears/core/frame/ScalableDataFrame.py:336-393, 2057-2086`): rows as
  * minified JSON, gzip'd (level 9), optionally base64. Brotli is out of
  * scope on the JVM stdlib; gzip is the declared codec (the reference
  * supports both).
  *
  * Two regimes:
  *   - [[compress]]: driver-side single payload — the reference's use case
  *     (shipping a small frame over a wire);
  *   - [[compressPerPartition]]: executor-side, one payload per partition —
  *     the form that scales (no driver materialization).
  */
object Compress {

  def gzip(s: String): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val gz = new GZIPOutputStream(bos) { `def`.setLevel(9) }
    gz.write(s.getBytes(StandardCharsets.UTF_8)); gz.close()
    bos.toByteArray
  }

  def gunzip(b: Array[Byte]): String = {
    val in = new GZIPInputStream(new ByteArrayInputStream(b))
    new String(in.readAllBytes(), StandardCharsets.UTF_8)
  }

  /** Whole frame → one gzip'd JSON-lines payload (driver-side). */
  def compress(df: DataFrame): Array[Byte] =
    gzip(df.toJSON.collect().mkString("\n"))

  /** Payload → frame, schema re-inferred from JSON (pass `schema` to pin
    * types exactly, mirroring the reference's layout round-trip).
    */
  def decompress(spark: SparkSession, payload: Array[Byte],
      schema: Option[org.apache.spark.sql.types.StructType] = None): DataFrame = {
    import spark.implicits._
    val lines: Dataset[String] = spark.createDataset(gunzip(payload).split("\n").toSeq)
    schema.fold(spark.read.json(lines))(s => spark.read.schema(s).json(lines))
  }

  /** Optional base64 wrapping (`ScalableDataFrame.py:363, 380` base64
    * flag) for text-safe transport of the gzip payload.
    */
  def compressBase64(df: DataFrame): String =
    java.util.Base64.getEncoder.encodeToString(compress(df))

  def decompressBase64(spark: SparkSession, payload: String,
      schema: Option[org.apache.spark.sql.types.StructType] = None): DataFrame =
    decompress(spark, java.util.Base64.getDecoder.decode(payload), schema)

  /** Executor-side variant: one payload per partition, no driver hop. */
  def compressPerPartition(df: DataFrame): Dataset[Array[Byte]] = {
    import df.sparkSession.implicits._
    df.toJSON.mapPartitions(rows => Iterator.single(gzip(rows.mkString("\n"))))
  }
}
