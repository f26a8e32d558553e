package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

/** The reference's ML-centric type system re-expressed on Spark's type system.
  *
  * bears types columns with `MLType` (reference
  * `src/bears/constants/_MLTypeConstants.py:6-55`): physical-ish data types
  * (BOOL..TENSOR), asset types (IMAGE/AUDIO/VIDEO/PDF) and schema-role tags
  * (INDEX, GROUND_TRUTH, ...). A schema is `Dict[str, MLType]`
  * (`_MLTypeConstants.py:90`), declared by the user or inferred from column
  * names — never from values.
  *
  * On Spark the physical type lives in `StructType`; the MLType rides along as
  * `StructField.metadata` under [[MLType.MetadataKey]], so it survives
  * projections and writes (parquet keeps field metadata).
  */
sealed abstract class MLType(val name: String) {

  /** Default physical Spark type for this MLType (SURVEY.md §1.3 table). */
  def sparkType: DataType = this match {
    case MLType.Bool => BooleanType
    case MLType.Text | MLType.Categorical => StringType
    case MLType.Int | MLType.Index => LongType
    case MLType.Float | MLType.PredictedProbability => DoubleType
    case MLType.Vector | MLType.SparseVector => ArrayType(DoubleType)
    case MLType.Timestamp => TimestampType
    case MLType.Tensor => ArrayType(DoubleType)
    case MLType.Obj => BinaryType
    case MLType.Image | MLType.Audio | MLType.Video | MLType.Pdf =>
      MLType.assetStruct
    case MLType.GroundTruth | MLType.PredictedLabel => StringType
  }

  /** Role tags partition the schema (index/features/ground-truth/predictions,
    * reference `src/bears/util/schema.py:465-653`); they are not physical.
    */
  def isRole: Boolean = this match {
    case MLType.Index | MLType.GroundTruth | MLType.PredictedLabel |
        MLType.PredictedProbability => true
    case _ => false
  }
}

object MLType {
  case object Bool extends MLType("bool")
  case object Text extends MLType("text")
  case object Categorical extends MLType("categorical")
  case object Int extends MLType("int")
  case object Float extends MLType("float")
  case object Vector extends MLType("vector")
  case object SparseVector extends MLType("sparse_vector")
  case object Timestamp extends MLType("timestamp")
  case object Tensor extends MLType("tensor")
  case object Obj extends MLType("object")
  case object Image extends MLType("image")
  case object Audio extends MLType("audio")
  case object Video extends MLType("video")
  case object Pdf extends MLType("pdf")
  case object Index extends MLType("index")
  case object GroundTruth extends MLType("ground_truth")
  case object PredictedLabel extends MLType("predicted_label")
  case object PredictedProbability extends MLType("predicted_probability")

  val MetadataKey = "graft.mltype"

  val values: Seq[MLType] = Seq(
    Bool, Text, Categorical, Int, Float, Vector, SparseVector, Timestamp,
    Tensor, Obj, Image, Audio, Video, Pdf, Index, GroundTruth, PredictedLabel,
    PredictedProbability)

  def fromName(n: String): MLType =
    values.find(_.name == n.toLowerCase).getOrElse(
      throw new IllegalArgumentException(s"unknown MLType: $n"))

  /** Asset columns (image/audio/video/pdf) are an opaque binary payload plus
    * typed metadata — reference `src/bears/core/frame/asset.py:19-149` keeps
    * decoded tensors; at 100 TB we keep bytes and decode lazily in the
    * executor (see `graft.ops.Multimodal`).
    */
  val assetStruct: StructType = StructType(Seq(
    StructField("path", StringType),
    StructField("data", BinaryType),
    StructField("meta", MapType(StringType, StringType))))
}

/** A bears `MLTypeSchema` (column → MLType) with StructType bridging. */
final case class MLSchema(fields: Map[String, MLType]) {

  /** Attach MLType tags to an existing DataFrame's field metadata. */
  def applyTo(df: DataFrame): DataFrame = {
    val cols = df.schema.fields.map { f =>
      fields.get(f.name) match {
        case Some(t) =>
          val md = new MetadataBuilder()
            .withMetadata(f.metadata).putString(MLType.MetadataKey, t.name).build()
          org.apache.spark.sql.functions.col(f.name).as(f.name, md)
        case None => org.apache.spark.sql.functions.col(f.name)
      }
    }
    df.select(cols.toSeq: _*)
  }

  /** Keep only schema columns, tolerating missing ones — the reference's
    * post-read `Schema.filter_df` semantic (`src/bears/util/schema.py:655-681`).
    * The reference defaults `sort_columns=True` and both its post-read and
    * pre-write call sites use that default, so the projection emits columns
    * in SORTED name order; `sortColumns = false` keeps the input frame's
    * column order instead (never `fields.keys` hash order).
    */
  def filterDf(df: DataFrame, allowMissing: Boolean = true,
      sortColumns: Boolean = true): DataFrame = {
    if (!allowMissing) {
      val present = df.columns.toSet
      fields.keys.foreach(c =>
        if (!present.contains(c))
          throw new IllegalArgumentException(s"missing column $c"))
    }
    val kept = df.columns.filter(fields.contains)
    val want = if (sortColumns) kept.sorted else kept
    df.select(want.toSeq.map(org.apache.spark.sql.functions.col): _*)
  }

  def index: Seq[String] = byRole(MLType.Index)
  def groundTruths: Seq[String] = byRole(MLType.GroundTruth)
  private def byRole(t: MLType) =
    fields.collect { case (c, `t`) => c }.toSeq.sorted
}

object MLSchema {

  /** Recover a schema from tagged field metadata. */
  def fromDf(df: DataFrame): MLSchema = MLSchema(
    df.schema.fields.flatMap { f =>
      if (f.metadata.contains(MLType.MetadataKey))
        Some(f.name -> MLType.fromName(f.metadata.getString(MLType.MetadataKey)))
      else None
    }.toMap)

  /** Infer roles from column-name regexes — the reference's `SchemaTemplate`
    * mechanism (`src/bears/util/schema.py:39-463`): patterns over names, never
    * values.
    */
  def infer(columns: Seq[String], patterns: Seq[(String, MLType)]): MLSchema =
    MLSchema(columns.flatMap { c =>
      patterns.collectFirst { case (re, t) if c.matches(re) => c -> t }
    }.toMap)
}
