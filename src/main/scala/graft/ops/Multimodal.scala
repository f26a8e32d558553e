package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (SURVEY.md §1.1 Asset mapping + §7 M5b):
  * image/audio/video as opaque `binary` columns with typed metadata — the
  * Spark-side schema, partitioning and per-partition batch shape are real;
  * the codec kernels (imageio/torchaudio in the reference,
  * `src/bears/reader/asset/image/ImageIOReader.py`,
  * `reader/asset/audio/TorchAudioReader.py`) are STUBBED behind
  * deterministic fakes, since no media libraries exist in this environment.
  *
  * Scale notes baked into the shapes:
  *   - assets travel as `struct(path, data binary, meta map)` so a scan can
  *     prune to `meta` without reading payload bytes (parquet column split);
  *   - decode runs `mapPartitions` (iterator→iterator, no row-set
  *     materialization); repartition by byte-size buckets before decoding to
  *     balance skewed payloads;
  *   - derived features are small fixed-width structs so downstream joins
  *     never carry the payload.
  */
object Multimodal {

  /** `struct(path, data, meta)` — MLType.Image/Audio/Video physical form
    * (`graft.core.MLType.assetStruct`).
    */
  def assetStruct(path: Column, data: Column, meta: Column): Column =
    struct(path.as("path"), data.cast("binary").as("data"), meta.as("meta"))

  /** Ingest a directory of binary files as asset rows — Spark's `binaryFile`
    * source (the reference's storage-dispatched asset readers collapse into
    * this one scan).
    */
  def fromBinaryFiles(spark: SparkSession, dir: String): DataFrame =
    spark.read.format("binaryFile").load(dir)
      .select(assetStruct(col("path"), col("content"),
        map(lit("length"), col("length").cast("string"),
          lit("modified"), col("modificationTime").cast("string"))).as("asset"))

  final case class DecodedImage(
      path: String, width: Int, height: Int, channels: Int, checksum: Long)

  /** Decode stub: a real implementation would invoke an image codec here
    * (per-partition, reusing a decoder instance). The deterministic fake
    * derives shape/checksum from the bytes so tests can assert exact
    * values. The mapPartitions shape — iterator in, iterator out, typed
    * Encoder output — is exactly what a real codec integration uses.
    */
  def decodeImages(assets: DataFrame, assetCol: String): Dataset[DecodedImage] = {
    val spark = assets.sparkSession
    implicit val enc: org.apache.spark.sql.Encoder[DecodedImage] = Encoders.product[DecodedImage]
    val pathIdx = 0; val dataIdx = 1
    assets.select(col(s"$assetCol.path"), col(s"$assetCol.data"))
      .mapPartitions { rows =>
        // ??? real codec init would happen once per partition here
        rows.map { r =>
          val path = r.getString(pathIdx)
          val bytes = r.getAs[Array[Byte]](dataIdx)
          fakeDecode(path, bytes)
        }
      }
  }

  /** STUB kernel — deterministic byte-derived fake of an image decode.
    * Checksum = [[graft.functions.FnvHash64]] (same kernel as the codegen'd
    * Catalyst expression, so relational and typed paths agree).
    */
  private[ops] def fakeDecode(path: String, bytes: Array[Byte]): DecodedImage = {
    val n = if (bytes == null) 0 else bytes.length
    val checksum = if (n == 0) 0L else graft.functions.FnvHash64.hash(bytes)
    DecodedImage(path, width = math.max(1, n % 640), height = math.max(1, (n / 640) % 480 + 1),
      channels = 3, checksum = checksum)
  }

  /** Resize stub: metadata-level transform (a real kernel would rescale
    * pixels per partition); keeps the fixed-width output contract.
    */
  def resize(decoded: Dataset[DecodedImage], w: Int, h: Int): Dataset[DecodedImage] = {
    implicit val enc: org.apache.spark.sql.Encoder[DecodedImage] = Encoders.product[DecodedImage]
    decoded.map(d => d.copy(width = w, height = h))
  }

  /** Frame-sample stub for video payloads: pick every `stride`-th synthetic
    * frame index from a byte-length-derived frame count.
    */
  def frameSampleExpr(dataCol: Column, stride: Int): Column = {
    val frames = greatest(floor(length(dataCol) / 1024.0), lit(1)).cast("int")
    filter(sequence(lit(0), frames - 1), i => i % stride === 0)
  }

  /** Byte-size bucketing for decode load balancing: partition key spreading
    * large payloads across executors (skew guard before `mapPartitions`).
    */
  def sizeBucket(dataCol: Column, buckets: Int): Column =
    pmod(TextAnalysis.hash60(base64(dataCol)), lit(buckets))
}
