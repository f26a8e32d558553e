package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** EXACT merge-order BPE application as a native Catalyst `Expression` —
  * the corpus-scale closure of the train→apply loop that
  * [[graft.ops.Bpe]] trains (r14 left apply as a documented greedy
  * longest-match approximation; this is the exact form, preference-ladder
  * tier (b), the [[VocabTokenCount]] pattern).
  *
  * Semantics are the production tokenizer's (the GPT-2 `encoder.bpe()` /
  * HF `tokenizers` shape, itself the efficient form of Sennrich et al.
  * 2016's rank-order replay): split the word into Unicode CODEPOINT base
  * symbols (engine char contract — an astral emoji is ONE symbol) plus the
  * `</w>` end-of-word marker, then repeatedly find the adjacent pair with
  * the LOWEST merge rank and left-fold all its occurrences, until no
  * adjacent pair is mergeable. On a consistently-trained merge table
  * (every merge's constituents are base symbols or tokens created at
  * earlier ranks — what [[graft.ops.Bpe.train]] always produces) this is
  * provably identical to replaying merges in rank order
  * ([[graft.ops.Bpe.applyWord]], the spec differential): a merge at rank r
  * only creates pairs involving its new token, and that token cannot be a
  * constituent of any rank < r, so the min-rank loop visits ranks
  * non-decreasingly — exactly the replay order. On an arbitrary
  * (non-trained) table the two can diverge; this expression implements the
  * min-rank loop, the form every production tokenizer ships.
  *
  * The merge table is a plan-time constant (broadcast-literal discipline):
  * the expression carries the rank-ordered pairs once per plan, and the
  * pair→rank hash index is built lazily once per executor, not per row.
  * Input is ONE pre-tokenized word (the [[graft.ops.TextAnalysis.tokens]]
  * unit — apply after `explode`); output is the exact piece array, with
  * the final piece carrying the `</w>` marker (strip it downstream if
  * feeding a marker-free consumer).
  */
case class BpeEncode(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {

  require(merges.forall { case (l, r) => l.nonEmpty && r.nonEmpty },
    "merge pairs must be non-empty strings")
  // U+0000 is the pair→rank key separator: a hand-built merge token
  // containing it would alias distinct pairs (("a\u0000","b") vs
  // ("a","\u0000b")) silently — refuse at construction like the
  // non-empty guard
  require(merges.forall { case (l, r) =>
    l.indexOf('\u0000') < 0 && r.indexOf('\u0000') < 0 },
    "merge tokens must not contain U+0000 (reserved as the pair-key separator)")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bpe_encode requires string input, got $other")
    }

  @transient private lazy val ranks: java.util.HashMap[String, Integer] =
    BpeEncode.buildRanks(merges)

  override protected def nullSafeEval(input: Any): Any =
    BpeEncode.evalArray(input.asInstanceOf[UTF8String].toString, ranks)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val obj = BpeEncode.getClass.getName.stripSuffix("$") + "$.MODULE$"
    val idx = ctx.addReferenceObj("bpeRanks", ranks,
      "java.util.HashMap<String, Integer>")
    defineCodeGen(ctx, ev, c => s"$obj.evalArray($c.toString(), $idx)")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncode =
    copy(child = newChild)

  override def prettyName: String = "bpe_encode"
}

object BpeEncode {

  /** End-of-word marker — kept identical to [[graft.ops.Bpe.EndOfWord]]
    * (duplicated as a plain literal so this file has no ops→functions
    * dependency cycle; BpeSpec pins the two equal).
    */
  val EndOfWord = "</w>"

  /** Separator for the pair→rank key: U+0000 cannot occur inside a merge
    * token trained from pre-tokenized words (the tokenizer splits on
    * non-letter/number, so control characters never enter a word) — two
    * distinct pairs never collide on one key. A space would NOT be safe:
    * callers can hand-build merges over arbitrary symbols, and ("a ", "b")
    * / ("a", " b") must not alias.
    */
  private val Sep = '\u0000'

  /** Pair→rank index. First-listed rank wins on duplicate pairs (a trained
    * table never repeats a pair; `putIfAbsent` keeps the behavior defined
    * anyway).
    *
    * Size discipline (mirrors the TfIdf vocab ceiling): the merge table
    * rides the plan as ONE `addReferenceObj` per expression — a 32k–100k
    * merge vocabulary is a few MB of driver/executor heap, the production
    * tokenizer shape. Tables far beyond that (millions of merges) belong
    * in a broadcast-join tokenization, not a plan literal; see
    * [[graft.ops.Bpe]]'s `MaxDistinctWords` ceiling for the same
    * refuse-loudly pattern on the training side.
    */
  def buildRanks(merges: Seq[(String, String)]): java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](math.max(16, merges.size * 2))
    merges.iterator.zipWithIndex.foreach { case ((l, r), i) =>
      m.putIfAbsent(l + Sep + r, Integer.valueOf(i))
    }
    m
  }

  /** Scalar kernel shared by interpreted eval and codegen: codepoint split
    * + `</w>`, then the min-rank merge loop. O(len × merges-applied) with
    * tiny constants — words are ~10 symbols; no allocation beyond the
    * symbol buffer.
    */
  def pieces(word: String, ranks: java.util.HashMap[String, Integer]): Array[String] = {
    val syms = scala.collection.mutable.ArrayBuffer.empty[String]
    var p = 0
    while (p < word.length) {
      val n = Character.charCount(word.codePointAt(p))
      syms += word.substring(p, p + n)
      p += n
    }
    syms += EndOfWord
    var done = syms.length < 2
    while (!done) {
      // arg-min rank over adjacent pairs
      var bestRank = Int.MaxValue
      var bestI = -1
      var i = 0
      while (i < syms.length - 1) {
        val r = ranks.get(syms(i) + Sep + syms(i + 1))
        if (r != null && r.intValue() < bestRank) { bestRank = r.intValue(); bestI = i }
        i += 1
      }
      if (bestI < 0) done = true
      else {
        // left-fold ALL occurrences of the chosen pair (no advance after a
        // merge: "a a a" + (a,a) folds to ["aa","a"], the re-scan law the
        // trainer's counter uses — see Bpe.trainLocal)
        val l = syms(bestI); val rgt = syms(bestI + 1); val tok = l + rgt
        var j = 0
        while (j < syms.length - 1) {
          if (syms(j) == l && syms(j + 1) == rgt) { syms(j) = tok; syms.remove(j + 1) }
          else j += 1
        }
        if (syms.length < 2) done = true
      }
    }
    syms.toArray
  }

  /** Codegen entry point: kernel + box into Catalyst array data. */
  def evalArray(word: String,
      ranks: java.util.HashMap[String, Integer]): org.apache.spark.sql.catalyst.util.ArrayData =
    new GenericArrayData(pieces(word, ranks).map(x => UTF8String.fromString(x): Any))

  /** Column-facing constructor (Spark 4 Column↔Expression bridge). */
  def bpe_encode(c: Column, merges: Seq[(String, String)]): Column =
    ColumnBridge.column(BpeEncode(ColumnBridge.expression(c), merges))
}
