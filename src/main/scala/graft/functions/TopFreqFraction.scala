package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StringType}

/** Most-frequent-element fraction of a string array as a native Catalyst
  * `Expression` — the hot kernel of the Gopher repetition signal
  * ([[graft.ops.TextAnalysis.topNgramFractionStaged]]'s fast path). The
  * HOF spelling (array_sort + struct-accumulator `aggregate`) drops out of
  * whole-stage codegen and evaluates the lambda interpreted per element;
  * this expression is one hash-count pass per document inside codegen —
  * O(n) with no sort, no per-element closure, no struct boxing.
  *
  * Semantics match the staged fold exactly (differential spec in
  * FunctionsSpec): null elements group together (`<=>` semantics), empty
  * array → 0.0, else max element frequency / array length.
  */
case class TopFreqFraction(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"top_freq_fraction requires array<string> input, got $other")
    }

  override protected def nullSafeEval(input: Any): Any =
    TopFreqFraction.topFraction(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val obj = TopFreqFraction.getClass.getName.stripSuffix("$") + "$.MODULE$"
    defineCodeGen(ctx, ev, c => s"$obj.topFraction($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): TopFreqFraction =
    copy(child = newChild)

  override def prettyName: String = "top_freq_fraction"
}

object TopFreqFraction {

  /** The scalar kernel (shared by interpreted eval and codegen): one
    * hash-count pass, max count over the document's grams.
    */
  def topFraction(arr: ArrayData): Double = {
    val n = arr.numElements()
    if (n == 0) return 0.0
    val counts = new java.util.HashMap[AnyRef, Array[Int]](Math.max(16, n))
    var best = 0
    var i = 0
    while (i < n) {
      val key: AnyRef = if (arr.isNullAt(i)) null else arr.getUTF8String(i)
      var c = counts.get(key)
      if (c == null) { c = new Array[Int](1); counts.put(key, c) }
      c(0) += 1
      if (c(0) > best) best = c(0)
      i += 1
    }
    best.toDouble / n
  }

  /** Column-facing constructor (Spark 4 Column↔Expression bridge). */
  def top_freq_fraction(c: Column): Column =
    ColumnBridge.column(TopFreqFraction(ColumnBridge.expression(c)))
}
