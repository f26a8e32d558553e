package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Character-distribution Shannon entropy as a native Catalyst `Expression`
  * (preference-ladder tier (b), the [[FnvHash64]]/[[DotProduct]] pattern):
  * the HOF spelling (`ops.TextAnalysis.charEntropyHof`) materializes one
  * single-char string per input character plus a struct per fold step —
  * ~100M allocations over a 100 MB corpus, measured 5× the whole curation
  * pipeline's cost at sf0.1. Here one pass over the UTF8String builds a
  * codepoint histogram and folds `−p·ln p` in ascending codepoint order —
  * the SAME term order as the HOF's sorted-run fold and the SQL oracle's
  * `list_sort(list_distinct(...))` replay (UTF-8 byte order == codepoint
  * order), with the same `cnt.toDouble / n` and `java.lang.Math.log` ops,
  * so all three spellings agree bit-for-bit (CharEntropySpec).
  */
case class CharEntropy(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"char_entropy requires string input, got $other")
    }

  override protected def nullSafeEval(input: Any): Any =
    CharEntropy.entropy(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val obj = CharEntropy.getClass.getName.stripSuffix("$") + "$.MODULE$"
    defineCodeGen(ctx, ev, c => s"$obj.entropy($c.toString())")
  }

  override protected def withNewChildInternal(newChild: Expression): CharEntropy =
    copy(child = newChild)

  override def prettyName: String = "char_entropy"
}

object CharEntropy {

  /** Scalar kernel shared by interpreted eval and codegen. Codepoint
    * iteration (not UTF-16 units) matches Java-regex `split("")`, and the
    * ascending-codepoint fold matches UTF-8 binary sort order, keeping the
    * result bit-identical to the HOF spelling and the DuckDB oracle.
    */
  def entropy(s: String): Double = {
    val counts = new java.util.TreeMap[Integer, Array[Long]]()
    var i = 0
    var n = 0L
    while (i < s.length) {
      val cp = s.codePointAt(i)
      val slot = counts.get(cp)
      if (slot == null) counts.put(cp, Array(1L)) else slot(0) += 1L
      n += 1L
      i += Character.charCount(cp)
    }
    if (n == 0L) return 0.0
    var ent = 0.0
    val it = counts.values().iterator()
    while (it.hasNext) {
      val p = it.next()(0).toDouble / n
      ent -= p * java.lang.Math.log(p)
    }
    ent
  }

  /** Column-facing constructor (Spark 4 Column↔Expression bridge). */
  def char_entropy(c: Column): Column =
    ColumnBridge.column(CharEntropy(ColumnBridge.expression(c)))

  /** Register `char_entropy` for SQL use on a session. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "char_entropy", exprs => CharEntropy(exprs.head), "scala_udf")
}
