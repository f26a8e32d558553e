package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Greedy longest-match vocabulary token count as a native Catalyst
  * `Expression` (preference-ladder tier (b), the
  * [[FnvHash64]]/[[DotProduct]]/[[CharEntropy]] pattern): the
  * tiktoken/WordPiece-style scan — at each position consume the LONGEST
  * vocabulary entry that prefixes the remaining text, or one character when
  * nothing matches — is inherently sequential per document and cannot be
  * spelled with built-in Columns (each step's position depends on the
  * previous match length). A Scala UDF could do it; a native expression
  * does it inside whole-stage codegen with zero per-row closure overhead.
  *
  * The vocabulary is a plan-time constant (the broadcast-literal discipline
  * of the IVF centroids / hyperplane planes): expression size stays O(1) in
  * the plan regardless of vocab size, and the first-char index is built
  * once per executor, not per row. The char unit is the Unicode CODEPOINT:
  * vocab prefix matches compare full strings (codepoint == surrogate-pair
  * equality), and the no-match fallback consumes ONE codepoint — so an
  * astral emoji counts 1 token, matching Python `len(str)` / the reference's
  * tokenizers and DuckDB's `substring`/`length` (the engine-wide char
  * contract, unified round 14).
  *
  * Replayable: the same greedy scan runs as a DuckDB recursive CTE
  * (per-position LATERAL longest-match advance — q198's oracle) and as the
  * independent driver-side reference in FunctionsSpec.
  */
case class VocabTokenCount(child: Expression, vocab: Seq[String])
    extends UnaryExpression {

  require(vocab.nonEmpty && vocab.forall(_.nonEmpty),
    "vocab must be non-empty strings")

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"vocab_token_count requires string input, got $other")
    }

  @transient private lazy val index: java.util.HashMap[Character, Array[String]] =
    VocabTokenCount.buildIndex(vocab)

  override protected def nullSafeEval(input: Any): Any =
    VocabTokenCount.count(input.asInstanceOf[UTF8String].toString, index)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val obj = VocabTokenCount.getClass.getName.stripSuffix("$") + "$.MODULE$"
    val idx = ctx.addReferenceObj("vocabIndex", index,
      "java.util.HashMap<Character, String[]>")
    defineCodeGen(ctx, ev, c => s"$obj.count($c.toString(), $idx)")
  }

  override protected def withNewChildInternal(newChild: Expression): VocabTokenCount =
    copy(child = newChild)

  override def prettyName: String = "vocab_token_count"
}

object VocabTokenCount {

  /** First-char index, candidates longest-first — greedy longest-match is
    * then "first prefix hit wins" per position.
    */
  def buildIndex(vocab: Seq[String]): java.util.HashMap[Character, Array[String]] = {
    val m = new java.util.HashMap[Character, Array[String]]()
    vocab.distinct.groupBy(_.charAt(0)).foreach { case (c, vs) =>
      m.put(c, vs.sortBy(v => (-v.length, v)).toArray)
    }
    m
  }

  /** Scalar kernel shared by interpreted eval and codegen: one forward scan,
    * longest vocab prefix at each position or a single-CODEPOINT fallback
    * (an unmatched astral char consumes its whole surrogate pair and counts
    * one token — the Python-reference char contract).
    */
  def count(s: String, index: java.util.HashMap[Character, Array[String]]): Long = {
    var p = 0
    var n = 0L
    val len = s.length
    while (p < len) {
      var advance = 0
      val cands = index.get(s.charAt(p))
      if (cands != null) {
        var i = 0
        while (advance == 0 && i < cands.length) {
          val c = cands(i)
          if (c.length <= len - p && s.startsWith(c, p)) advance = c.length
          i += 1
        }
      }
      if (advance == 0) advance = Character.charCount(s.codePointAt(p))
      n += 1L
      p += advance
    }
    n
  }

  /** Scalar kernel for [[VocabTokenize]]: the same greedy scan, returning
    * the pieces instead of their count.
    */
  def pieces(s: String, index: java.util.HashMap[Character, Array[String]]): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var p = 0
    val len = s.length
    while (p < len) {
      var piece: String = null
      val cands = index.get(s.charAt(p))
      if (cands != null) {
        var i = 0
        while (piece == null && i < cands.length) {
          val c = cands(i)
          if (c.length <= len - p && s.startsWith(c, p)) piece = c
          i += 1
        }
      }
      if (piece == null) piece = s.substring(p, p + Character.charCount(s.codePointAt(p)))
      out += piece
      p += piece.length
    }
    out.toArray
  }

  /** Column-facing constructor (Spark 4 Column↔Expression bridge). */
  def vocab_token_count(c: Column, vocab: Seq[String]): Column =
    ColumnBridge.column(VocabTokenCount(ColumnBridge.expression(c), vocab))

  def vocab_tokenize(c: Column, vocab: Seq[String]): Column =
    ColumnBridge.column(VocabTokenize(ColumnBridge.expression(c), vocab))
}

/** [[VocabTokenCount]]'s piece-producing sibling: the same greedy
  * longest-match scan, returning the matched pieces (vocab entries or
  * single-char fallbacks) as `array<string>` — the form sequence packing
  * and inspection need. Shares the per-executor first-char index.
  */
case class VocabTokenize(child: Expression, vocab: Seq[String])
    extends UnaryExpression {

  require(vocab.nonEmpty && vocab.forall(_.nonEmpty),
    "vocab must be non-empty strings")

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"vocab_tokenize requires string input, got $other")
    }

  @transient private lazy val index: java.util.HashMap[Character, Array[String]] =
    VocabTokenCount.buildIndex(vocab)

  override protected def nullSafeEval(input: Any): Any = {
    val ps = VocabTokenCount.pieces(input.asInstanceOf[UTF8String].toString, index)
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      ps.map(x => UTF8String.fromString(x): Any))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val obj = VocabTokenize.getClass.getName.stripSuffix("$") + "$.MODULE$"
    val idx = ctx.addReferenceObj("vocabIndex", index,
      "java.util.HashMap<Character, String[]>")
    defineCodeGen(ctx, ev, c => s"$obj.evalArray($c.toString(), $idx)")
  }

  override protected def withNewChildInternal(newChild: Expression): VocabTokenize =
    copy(child = newChild)

  override def prettyName: String = "vocab_tokenize"
}

object VocabTokenize {
  /** Codegen entry point: scan + box into Catalyst array data. */
  def evalArray(s: String,
      index: java.util.HashMap[Character, Array[String]]): org.apache.spark.sql.catalyst.util.ArrayData = {
    val ps = VocabTokenCount.pieces(s, index)
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      ps.map(x => UTF8String.fromString(x): Any))
  }
}
