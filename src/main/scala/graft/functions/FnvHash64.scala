package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** FNV-1a 64-bit hash as a native Catalyst `Expression` with codegen —
  * the custom-operator preference ladder's tier (b) (builder prompt /
  * `spark_guide.md`): when a scalar kernel isn't covered by built-ins
  * (Spark has xxhash64/md5 but no FNV, and the multimodal decode checksum
  * is defined as FNV — `ops.Multimodal.fakeDecode`), a codegen'd Expression
  * keeps the hot path inside whole-stage codegen where a Scala UDF would
  * break the pipeline into iterator calls with boxing.
  *
  * Accepts StringType (hashes UTF-8 bytes) or BinaryType.
  */
case class FnvHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType | BinaryType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"fnv_hash64 requires string or binary input, got $other")
    }

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input match {
      case s: UTF8String => s.getBytes
      case b: Array[Byte] => b
    }
    FnvHash64.hash(bytes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val hasher = FnvHash64.getClass.getName.stripSuffix("$") + "$.MODULE$"
    child.dataType match {
      case StringType =>
        defineCodeGen(ctx, ev, c => s"$hasher.hash($c.getBytes())")
      case _ =>
        defineCodeGen(ctx, ev, c => s"$hasher.hash($c)")
    }
  }

  override protected def withNewChildInternal(newChild: Expression): FnvHash64 =
    copy(child = newChild)

  override def prettyName: String = "fnv_hash64"
}

object FnvHash64 {

  // 0xcbf29ce484222325 — the canonical FNV-1a 64 offset basis
  // 14695981039346656037 (as a signed Long). The previous decimal literal
  // had DROPPED A DIGIT (1469598103934665603), so every hash diverged from
  // published FNV-1a; pinned by the test-vector spec now.
  final val OffsetBasis = 0xcbf29ce484222325L
  final val Prime = 1099511628211L

  /** The scalar kernel (shared by interpreted eval, codegen, and the
    * driver-side `ops.Multimodal.fakeDecode`). The octet is masked to its
    * UNSIGNED value before the XOR — a bare `h ^ bytes(i)` sign-extends any
    * byte ≥ 0x80 and flips the upper 56 state bits, silently diverging from
    * canonical FNV-1a on all non-ASCII/binary input (pinned against
    * published FNV-1a test vectors in FnvHashSpec).
    */
  def hash(bytes: Array[Byte]): Long = {
    var h = OffsetBasis
    var i = 0
    while (i < bytes.length) { h = (h ^ (bytes(i) & 0xffL)) * Prime; i += 1 }
    h
  }

  /** Column-facing constructor (Spark 4 Column↔Expression bridge). */
  def fnv_hash64(c: Column): Column =
    ColumnBridge.column(FnvHash64(ColumnBridge.expression(c)))

  /** Register `fnv_hash64` for SQL use on a session. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "fnv_hash64", exprs => FnvHash64(exprs.head), "scala_udf")
}
