package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}

/** Bloom-filter membership probe as a native Catalyst `Expression`
  * (preference-ladder tier (b), the [[FnvHash64]]/[[VocabTokenCount]]
  * pattern): k Kirsch–Mitzenmacher double-hash probes against a primitive
  * `long[]` bit array held ONCE per plan via `addReferenceObj` — it rides
  * the broadcast task binary to each executor exactly once, instead of a
  * 65k-element `typedLit` array literal evaluated through four
  * `element_at` calls per row. The generated code is one static call on a
  * primitive array: no boxing, no Catalyst array dereference, early-out on
  * the first cleared bit.
  *
  * Probe math is bit-for-bit the [[graft.ops.Bloom]] construction:
  * `h1 = h & (2^30−1)`, `h2 = (h >> 30) | 1`, `pos_i = floorMod(h1 + i·h2,
  * bits)` — so a filter built by the Column-algebra aggregate and probed
  * here agrees exactly (differential spec in FunctionsSpec).
  */
// filterBits is an IndexedSeq, not Array: a case-class Array field compares
// by REFERENCE, so two structurally identical probes (same filter
// deserialized twice, the same probe written twice in one query) would never
// be semanticEquals — defeating subexpression elimination and plan reuse.
// Seq equality is by content; the primitive array the kernel needs is
// materialized once below.
case class BloomMightContain(child: Expression, filterBits: IndexedSeq[Long], k: Int)
    extends UnaryExpression {

  require(filterBits.nonEmpty, "empty filter")
  require(k >= 1 && k <= 16, s"k must be in [1,16], got $k")

  @transient private lazy val bitsArr: Array[Long] = filterBits.toArray

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case LongType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bloom_might_contain requires a long hash input, got $other")
    }

  override protected def nullSafeEval(input: Any): Any =
    BloomMightContain.contains(input.asInstanceOf[Long], bitsArr, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val obj = BloomMightContain.getClass.getName.stripSuffix("$") + "$.MODULE$"
    val arr = ctx.addReferenceObj("bloomBits", bitsArr, "long[]")
    defineCodeGen(ctx, ev, c => s"$obj.contains($c, $arr, $k)")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)

  override def prettyName: String = "bloom_might_contain"
}

object BloomMightContain {

  /** The scalar kernel (shared by interpreted eval and codegen): k probes,
    * early-out on the first miss. Mirrors [[graft.ops.Bloom]]'s Column
    * construction exactly.
    */
  def contains(h: Long, bits: Array[Long], k: Int): Boolean = {
    val m = bits.length * 64L
    val h1 = h & ((1L << 30) - 1)
    val h2 = (h >> 30) | 1L
    var i = 0
    while (i < k) {
      val p = java.lang.Math.floorMod(h1 + i.toLong * h2, m)
      if (((bits((p >>> 6).toInt) >> (p & 63L).toInt) & 1L) == 0L) return false
      i += 1
    }
    true
  }

  /** Column-facing constructor (Spark 4 Column↔Expression bridge). */
  def bloom_might_contain(h: Column, filterBits: Array[Long], k: Int): Column =
    ColumnBridge.column(
      BloomMightContain(ColumnBridge.expression(h), filterBits.toIndexedSeq, k))
}
