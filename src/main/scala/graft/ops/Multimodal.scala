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

  /** Image decode: REAL for PNG/JPEG payloads via the JDK's `javax.imageio`
    * (the reference's `reader/asset/image/ImageIOReader.py` capability, zero
    * extra dependencies); payloads without an image magic number — audio/
    * video (no JVM codec in scope) and opaque bytes — fall back to the
    * deterministic byte-derived fake so the pipeline shape stays testable.
    * mapPartitions: iterator in, iterator out, typed Encoder output; codec
    * setup (disable ImageIO's temp-file disk cache) happens once per
    * partition, exactly where a heavier codec would init.
    */
  def decodeImages(assets: DataFrame, assetCol: String): Dataset[DecodedImage] = {
    val spark = assets.sparkSession
    implicit val enc: org.apache.spark.sql.Encoder[DecodedImage] = Encoders.product[DecodedImage]
    val pathIdx = 0; val dataIdx = 1
    assets.select(col(s"$assetCol.path"), col(s"$assetCol.data"))
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false) // per-partition codec init
        rows.map { r =>
          val path = r.getString(pathIdx)
          val bytes = r.getAs[Array[Byte]](dataIdx)
          realDecode(path, bytes).getOrElse(fakeDecode(path, bytes))
        }
      }
  }

  /** PNG/JPEG decode through `javax.imageio`: shape from the decoded raster,
    * checksum over the source bytes. Returns None when the payload has no
    * image magic number or the codec rejects it.
    */
  private[ops] def realDecode(path: String, bytes: Array[Byte]): Option[DecodedImage] = {
    if (bytes == null || bytes.length < 4) return None
    val isPng = bytes(0) == 0x89.toByte && bytes(1) == 'P'.toByte &&
      bytes(2) == 'N'.toByte && bytes(3) == 'G'.toByte
    val isJpeg = bytes(0) == 0xFF.toByte && bytes(1) == 0xD8.toByte
    if (!isPng && !isJpeg) None
    else
      try {
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
        if (img == null) None
        else Some(DecodedImage(path, img.getWidth, img.getHeight,
          img.getRaster.getNumBands, graft.functions.FnvHash64.hash(bytes)))
      } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** STUB kernel — deterministic byte-derived fake for non-image payloads
    * (audio/video decode has no JVM codec in this environment). Checksum =
    * [[graft.functions.FnvHash64]] (same kernel as the codegen'd Catalyst
    * expression, so relational and typed paths agree).
    */
  private[ops] def fakeDecode(path: String, bytes: Array[Byte]): DecodedImage = {
    val n = if (bytes == null) 0 else bytes.length
    val checksum = if (n == 0) 0L else graft.functions.FnvHash64.hash(bytes)
    DecodedImage(path, width = math.max(1, n % 640), height = math.max(1, (n / 640) % 480 + 1),
      channels = 3, checksum = checksum)
  }

  final case class DecodedAudio(
      path: String, sampleRate: Float, channels: Int, frames: Long,
      durationSec: Double, checksum: Long)

  /** Pluggable compressed-audio codec — the seam that closes the mp3 story
    * (`reader/asset/audio/TorchAudioReader.py` decodes mp3 through
    * torchaudio; no JVM mp3 decoder exists on this classpath, and shipping
    * one is out of dependency scope). A user with compressed corpora plugs a
    * decoder WITHOUT forking, in either of two ways:
    *
    *   1. drop a `javax.sound.sampled.spi` decoder jar (e.g. mp3spi/vorbisspi)
    *      on the executor classpath — [[decodeAudio]] already offers every
    *      non-WAV/AIFF payload to `AudioSystem`, whose ServiceLoader picks
    *      the SPI up with zero code changes; or
    *   2. `Multimodal.registerAudioCodec(...)` a custom [[AudioCodec]]
    *      (any native/JNI decoder); instances must be Serializable — the
    *      registry snapshot is captured into the decode closure at plan
    *      time and ships to executors with it.
    */
  trait AudioCodec extends Serializable {
    /** Cheap claim check (magic bytes / extension) — run before [[decode]]. */
    def accepts(path: String, bytes: Array[Byte]): Boolean
    /** Full decode; None hands the payload to the next codec / the stub. */
    def decode(path: String, bytes: Array[Byte]): Option[DecodedAudio]
  }

  @volatile private var audioCodecs: Seq[AudioCodec] = Nil
  def registerAudioCodec(codec: AudioCodec): Unit =
    synchronized { audioCodecs = audioCodecs :+ codec }
  def clearAudioCodecs(): Unit = synchronized { audioCodecs = Nil }

  /** Audio decode: REAL for WAV/AIFF (PCM) payloads via the JDK's
    * `javax.sound.sampled.AudioSystem` (the reference's
    * `reader/asset/audio/TorchAudioReader.py` capability for uncompressed
    * formats, zero extra dependencies). Compressed payloads route through
    * the [[AudioCodec]] seam: registered codecs first, then an
    * `AudioSystem` SPI attempt (a classpath decoder jar makes mp3/ogg real
    * with no code change), then the deterministic byte-derived stub so the
    * pipeline shape stays testable without any codec. Same mapPartitions
    * batch shape as [[decodeImages]].
    */
  def decodeAudio(assets: DataFrame, assetCol: String): Dataset[DecodedAudio] = {
    implicit val enc: org.apache.spark.sql.Encoder[DecodedAudio] = Encoders.product[DecodedAudio]
    // snapshot at PLAN time: the registry is driver-side state, the decode
    // runs on executors — the captured Seq serializes with the closure
    val plugged = audioCodecs
    assets.select(col(s"$assetCol.path"), col(s"$assetCol.data"))
      .mapPartitions { rows =>
        rows.map { r =>
          val path = r.getString(0)
          val bytes = r.getAs[Array[Byte]](1)
          realDecodeAudio(path, bytes)
            .orElse(plugged.iterator
              .filter(_.accepts(path, bytes)).flatMap(_.decode(path, bytes))
              .nextOption())
            .orElse(spiDecodeAudio(path, bytes))
            .getOrElse(fakeDecodeAudio(path, bytes))
        }
      }
  }

  /** `AudioSystem` attempt for payloads that are NOT WAV/AIFF (those took
    * the magic-gated [[realDecodeAudio]] path): succeeds exactly when a
    * decoder SPI for the format is on the classpath — none ships here, so
    * in this environment it returns None and the stub follows; a deployment
    * that adds mp3spi gets real mp3 metadata through this line. Compressed
    * formats may report unknown frame counts (-1) — normalized to 0.
    */
  private[ops] def spiDecodeAudio(path: String, bytes: Array[Byte]): Option[DecodedAudio] =
    if (bytes == null || bytes.length < 12) None
    else
      try {
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(bytes))
        try {
          val fmt = in.getFormat
          val frames = math.max(0L, in.getFrameLength)
          val dur = if (fmt.getFrameRate > 0 && frames > 0) frames / fmt.getFrameRate.toDouble else 0.0
          Some(DecodedAudio(path, fmt.getSampleRate, fmt.getChannels, frames, dur,
            graft.functions.FnvHash64.hash(bytes)))
        } finally in.close()
      } catch { case scala.util.control.NonFatal(_) => None }

  /** WAV (`RIFF….WAVE`) / AIFF (`FORM….AIFF`) header+frame decode through
    * `AudioSystem`. Reads format metadata and the frame count from the
    * stream header — no full-sample materialization; the checksum covers the
    * source bytes. None when the payload is not an uncompressed audio
    * container the JDK can parse.
    */
  private[ops] def realDecodeAudio(path: String, bytes: Array[Byte]): Option[DecodedAudio] = {
    if (bytes == null || bytes.length < 12) return None
    def tag(off: Int, s: String) = s.indices.forall(i => bytes(off + i) == s(i).toByte)
    val isWav = tag(0, "RIFF") && tag(8, "WAVE")
    val isAiff = tag(0, "FORM") && (tag(8, "AIFF") || tag(8, "AIFC"))
    if (!isWav && !isAiff) None
    else
      try {
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(bytes))
        try {
          val fmt = in.getFormat
          val frames = in.getFrameLength
          val dur = if (fmt.getFrameRate > 0) frames / fmt.getFrameRate.toDouble else 0.0
          Some(DecodedAudio(path, fmt.getSampleRate, fmt.getChannels, frames, dur,
            graft.functions.FnvHash64.hash(bytes)))
        } finally in.close()
      } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** STUB kernel for compressed audio (no JVM codec in this environment):
    * deterministic byte-derived metadata, FnvHash64 checksum — mirrors
    * [[fakeDecode]].
    */
  private[ops] def fakeDecodeAudio(path: String, bytes: Array[Byte]): DecodedAudio = {
    val n = if (bytes == null) 0 else bytes.length
    val checksum = if (n == 0) 0L else graft.functions.FnvHash64.hash(bytes)
    val frames = n.toLong * 4
    DecodedAudio(path, sampleRate = 16000f, channels = 1, frames = frames,
      durationSec = frames / 16000.0, checksum = checksum)
  }

  /** Relabel the TARGET dimensions on decoded-image metadata — no pixel
    * work (named so it cannot be mistaken for a resize: [[resizeImages]] is
    * the real decode→rescale→re-encode kernel). Useful for planning a batch
    * whose downstream consumer does the actual scaling.
    */
  def withTargetDims(decoded: Dataset[DecodedImage], w: Int, h: Int): Dataset[DecodedImage] = {
    implicit val enc: org.apache.spark.sql.Encoder[DecodedImage] = Encoders.product[DecodedImage]
    decoded.map(d => d.copy(width = w, height = h))
  }

  final case class ResizedImage(path: String, data: Array[Byte], width: Int, height: Int)

  /** REAL pixel resize for PNG/JPEG payloads: decode → bilinear rescale on a
    * `java.awt.Graphics2D` raster → re-encode as PNG bytes — the
    * decode/transform/encode kernel shape of the reference's image pipeline
    * (`reader/asset/image/ImageIOReader.py` + PIL resize), JDK-only.
    * Non-image payloads pass through unchanged (data untouched, target dims
    * recorded) so mixed asset columns survive the map. Runs per-partition;
    * pair with [[sizeBucket]] repartitioning when payload sizes are skewed.
    */
  def resizeImages(assets: DataFrame, assetCol: String, w: Int, h: Int): Dataset[ResizedImage] = {
    implicit val enc: org.apache.spark.sql.Encoder[ResizedImage] = Encoders.product[ResizedImage]
    assets.select(col(s"$assetCol.path"), col(s"$assetCol.data"))
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false)
        rows.map { r =>
          val path = r.getString(0)
          val bytes = r.getAs[Array[Byte]](1)
          rescale(bytes, w, h) match {
            case Some(out) => ResizedImage(path, out, w, h)
            case None => ResizedImage(path, bytes, w, h)
          }
        }
      }
  }

  private[ops] def rescale(bytes: Array[Byte], w: Int, h: Int): Option[Array[Byte]] =
    try {
      if (bytes == null) None
      else {
        val src = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
        if (src == null) None
        else {
          val dst = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
          val g = dst.createGraphics()
          g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
          g.drawImage(src, 0, 0, w, h, null)
          g.dispose()
          val out = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(dst, "png", out)
          Some(out.toByteArray)
        }
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  final case class ImageHash(path: String, dhash: Long, real: Boolean)

  /** 64-bit difference hash (dHash) — the standard perceptual fingerprint
    * for image near-dup detection at corpus scale: decode → 9×8 grayscale
    * box-downsample → bit (r·8+c) set iff cell(r,c) < cell(r,c+1).
    * Re-encodes, mild crops and brightness shifts land within a few bits of
    * hamming distance; unrelated images differ in ~32 of 64. REAL for
    * PNG/JPEG via `javax.imageio`; non-image payloads fall back to the
    * md5-derived 60-bit content hash (bit-identical to
    * [[TextAnalysis.hash60]] of the bytes, so an external oracle can replay
    * the fallback path) — `real` records which kernel ran. Same
    * mapPartitions batch shape as [[decodeImages]]; fixed-width output, the
    * payload never travels past this map.
    */
  def imageHashes(assets: DataFrame, assetCol: String): Dataset[ImageHash] = {
    implicit val enc: org.apache.spark.sql.Encoder[ImageHash] = Encoders.product[ImageHash]
    assets.select(col(s"$assetCol.path"), col(s"$assetCol.data"))
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false)
        rows.map { r =>
          val path = r.getString(0)
          val bytes = r.getAs[Array[Byte]](1)
          decodeForHash(bytes) match {
            case Some(img) => ImageHash(path, dHash(img), real = true)
            case None => ImageHash(path, md5Hash60(bytes), real = false)
          }
        }
      }
  }

  private def decodeForHash(bytes: Array[Byte]): Option[java.awt.image.BufferedImage] = {
    if (bytes == null || bytes.length < 4) return None
    val isPng = bytes(0) == 0x89.toByte && bytes(1) == 'P'.toByte
    val isJpeg = bytes(0) == 0xFF.toByte && bytes(1) == 0xD8.toByte
    if (!isPng && !isJpeg) None
    else
      try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes)))
      catch { case scala.util.control.NonFatal(_) => None }
  }

  /** dHash kernel: average luminance over a 9×8 grid of pixel blocks
    * (box downsample — every source pixel contributes, so the hash is
    * stable under resize), then 64 left<right comparisons.
    */
  private[ops] def dHash(img: java.awt.image.BufferedImage): Long = {
    val w = img.getWidth; val h = img.getHeight
    val cells = Array.ofDim[Double](8, 9)
    var r = 0
    while (r < 8) {
      val y0 = r * h / 8; val y1 = math.max(y0 + 1, (r + 1) * h / 8)
      var c = 0
      while (c < 9) {
        val x0 = c * w / 9; val x1 = math.max(x0 + 1, (c + 1) * w / 9)
        var sum = 0.0; var n = 0
        var y = y0
        while (y < y1 && y < h) {
          var x = x0
          while (x < x1 && x < w) {
            val rgb = img.getRGB(x, y)
            sum += 0.299 * ((rgb >> 16) & 0xFF) + 0.587 * ((rgb >> 8) & 0xFF) +
              0.114 * (rgb & 0xFF)
            n += 1; x += 1
          }
          y += 1
        }
        cells(r)(c) = if (n == 0) 0.0 else sum / n
        c += 1
      }
      r += 1
    }
    var bits = 0L; var i = 0
    while (i < 64) {
      val rr = i / 8; val cc = i % 8
      if (cells(rr)(cc) < cells(rr)(cc + 1)) bits |= (1L << i)
      i += 1
    }
    bits
  }

  /** Fallback hash = first 15 hex chars of md5 as a long — the exact JVM
    * twin of the relational [[TextAnalysis.hash60]] (`conv(substring(
    * md5(c),1,15),16,10)`), so the two paths agree bit-for-bit.
    */
  private[ops] def md5Hash60(bytes: Array[Byte]): Long = {
    if (bytes == null || bytes.isEmpty) return 0L
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(bytes).map(b => f"$b%02x").mkString.substring(0, 15)
    java.lang.Long.parseLong(hex, 16)
  }

  /** Near-dup image pairs at hamming ≤ `maxHamming` via band-bucketing (the
    * simhash trick on the 64-bit dHash): split the hash into `bands` equal
    * slices — two hashes within hamming ≤ bands−1 must share at least one
    * identical slice (pigeonhole), so the self-join shuffles only
    * `(band, slice)` keys, never all pairs. Choose `bands > maxHamming` for
    * guaranteed recall; the exact `bit_count(xor)` filter removes band
    * collisions. Input: any frame of (id, hash) — typically
    * [[imageHashes]] output.
    */
  def nearDupImagePairs(hashes: DataFrame, idCol: String, hashCol: String,
      maxHamming: Int, bands: Int = 8): DataFrame = {
    require(bands > 0 && 64 % bands == 0, s"bands must divide 64, got $bands")
    require(bands > maxHamming,
      s"recall guarantee needs bands > maxHamming ($bands <= $maxHamming)")
    val width = 64 / bands
    val mask = if (width == 64) -1L else (1L << width) - 1
    val banded = hashes.select(col(idCol).as("id"), col(hashCol).as("h"))
      .select(col("id"), col("h"), explode(array((0 until bands).map(b =>
        struct(lit(b).as("band"),
          shiftrightunsigned(col("h"), b * width).bitwiseAND(lit(mask)).as("slice"))): _*)).as("bs"))
      .select(col("id"), col("h"), col("bs.band").as("band"), col("bs.slice").as("slice"))
    val l = banded.as("l"); val r = banded.as("r")
    l.join(r,
        col("l.band") === col("r.band") && col("l.slice") === col("r.slice") &&
          col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"),
        bit_count(col("l.h").bitwiseXOR(col("r.h"))).cast("long").as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  final case class ImageStats(
      path: String, width: Int, height: Int, meanR: Double, meanG: Double, meanB: Double)

  /** REAL per-channel feature extraction: mean R/G/B over the decoded raster
    * — the simplest useful image feature (normalization stats, dead-image
    * detection) and the template for heavier kernels (histograms, phashes).
    * Fixed-width output: downstream joins never carry pixels.
    */
  def imageChannelStats(assets: DataFrame, assetCol: String): Dataset[ImageStats] = {
    implicit val enc: org.apache.spark.sql.Encoder[ImageStats] = Encoders.product[ImageStats]
    assets.select(col(s"$assetCol.path"), col(s"$assetCol.data"))
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false)
        rows.flatMap { r =>
          val path = r.getString(0)
          val bytes = r.getAs[Array[Byte]](1)
          try {
            val img = if (bytes == null) null
              else javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
            if (img == null) None
            else {
              var sr = 0L; var sg = 0L; var sb = 0L
              var y = 0
              while (y < img.getHeight) {
                var x = 0
                while (x < img.getWidth) {
                  val rgb = img.getRGB(x, y)
                  sr += (rgb >> 16) & 0xFF; sg += (rgb >> 8) & 0xFF; sb += rgb & 0xFF
                  x += 1
                }
                y += 1
              }
              val n = img.getWidth.toLong * img.getHeight
              Some(ImageStats(path, img.getWidth, img.getHeight,
                sr.toDouble / n, sg.toDouble / n, sb.toDouble / n))
            }
          } catch { case scala.util.control.NonFatal(_) => None }
        }
      }
  }

  final case class DecodedVideo(
      path: String, width: Int, height: Int, frames: Long, fps: Double,
      durationSec: Double, checksum: Long)

  /** Pluggable video codec — the seam that closes the video story the way
    * [[AudioCodec]] closed mp3 (reference: `asset.py:19-149` video assets
    * decode through torchvision/ffmpeg; no JVM video decoder exists on this
    * classpath and shipping one is out of dependency scope — r14
    * verified-absent: zero hits for jcodec / javacv / ffmpeg / humble /
    * xuggle / jaffree / vlcj / JavaFX-media across ivy2, coursier, m2 and
    * /opt/spark/jars, zero egress to fetch one). Unlike audio there is no
    * JDK-built-in SPI analog of `AudioSystem`, so the registry is the ONLY
    * integration point: a deployment drops a decoder jar and registers a
    * codec — `Multimodal.registerVideoCodec(...)` — without forking.
    * Instances must be Serializable: the registry snapshot is captured
    * into the decode closure at plan time and ships to executors with it.
    */
  trait VideoCodec extends Serializable {
    /** Cheap claim check (magic bytes / extension) — run before [[decode]]. */
    def accepts(path: String, bytes: Array[Byte]): Boolean
    /** Full decode; None hands the payload to the next codec / the stub. */
    def decode(path: String, bytes: Array[Byte]): Option[DecodedVideo]
  }

  @volatile private var videoCodecs: Seq[VideoCodec] = Nil
  def registerVideoCodec(codec: VideoCodec): Unit =
    synchronized { videoCodecs = videoCodecs :+ codec }
  def clearVideoCodecs(): Unit = synchronized { videoCodecs = Nil }

  /** Video decode through the [[VideoCodec]] seam: registered codecs first
    * (claim-checked in registration order), then the deterministic
    * byte-derived stub — the pipeline shape (schema, partitioning, batch
    * form) stays real and testable without any codec, exactly the
    * [[decodeAudio]] contract. Null payloads yield the 1-frame placeholder,
    * the same null-in/placeholder-out rule as [[decodeImages]]. The stub's
    * frame count uses the [[frameSampleExpr]] 1024-bytes-per-frame model so
    * the two stub surfaces agree.
    */
  def decodeVideo(assets: DataFrame, assetCol: String): Dataset[DecodedVideo] = {
    implicit val enc: org.apache.spark.sql.Encoder[DecodedVideo] = Encoders.product[DecodedVideo]
    // snapshot at PLAN time: the registry is driver-side state, the decode
    // runs on executors — the captured Seq serializes with the closure
    val plugged = videoCodecs
    assets.select(col(s"$assetCol.path"), col(s"$assetCol.data"))
      .mapPartitions { rows =>
        rows.map { r =>
          val path = r.getString(0)
          val bytes = r.getAs[Array[Byte]](1)
          plugged.iterator
            .filter(_.accepts(path, bytes)).flatMap(_.decode(path, bytes))
            .nextOption()
            .getOrElse(fakeDecodeVideo(path, bytes))
        }
      }
  }

  /** Deterministic stub decode: dimensions/frames derived from the byte
    * length (frames = the [[frameSampleExpr]] 1024-byte model, 24 fps),
    * checksum = FNV over the payload — same construction as the image/audio
    * stubs so composed pipelines stay cross-checkable.
    */
  private[ops] def fakeDecodeVideo(path: String, bytes: Array[Byte]): DecodedVideo = {
    val n = if (bytes == null) 0 else bytes.length
    val frames = math.max(1L, n / 1024L)
    val checksum = if (n == 0) 0L else graft.functions.FnvHash64.hash(bytes)
    DecodedVideo(path, width = math.max(1, n % 640),
      height = math.max(1, (n / 640) % 480 + 1),
      frames = frames, fps = 24.0, durationSec = frames / 24.0,
      checksum = checksum)
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
    * `xxhash64` runs directly over the binary — a partitioning key needs no
    * oracle portability, and md5-of-base64 expanded the full payload into a
    * string for a fraction of the distribution quality per cycle.
    */
  def sizeBucket(dataCol: Column, buckets: Int): Column =
    pmod(xxhash64(dataCol), lit(buckets.toLong))
}
