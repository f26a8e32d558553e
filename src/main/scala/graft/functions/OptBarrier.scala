package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.DataType

/** Value-identity optimization barrier: evaluates to exactly its child, but
  * reports `deterministic = false`, which is the property every relevant
  * optimizer rule gates on — `PushDownPredicates` will not push a filter
  * through a projection whose fields aren't all deterministic, and
  * `CollapseProject` will not inline one.
  *
  * Why this exists (the q95 discovery, round 12): a repartition inserted to
  * spread COMPUTE-heavy kernels across cores ([[graft.ops.Scale
  * .spreadForCompute]]) is transparent to predicate pushdown — a filter over
  * kernel-derived columns is pushed through both the staging projection AND
  * the `Repartition`, SUBSTITUTING the kernel expressions into the filter
  * condition. Two consequences, both measured on the sf1.0 corpus: the
  * whole kernel stack runs inside the single-task scan stage (the exchange
  * spreads nothing), and the substitution re-evaluates the staged
  * subexpression once per reference (the q95 filter inlined the tokenizer
  * ~12×). Fencing the payload column with this barrier right above the
  * exchange keeps every kernel evaluation post-exchange and the staging
  * projections intact.
  *
  * Trade-off, stated loudly: the same non-determinism blocks pushdown of
  * ALL filters through the fencing projection — including cheap scan-column
  * prunes (`doc_id < 100`). Apply scan-level filters BEFORE the barrier;
  * the barrier is for frames whose remaining work is kernel-bound, where
  * early row pruning is worth less than 32× the compute parallelism.
  *
  * The value path is a pure pass-through in both interpreted and codegen
  * form (same ExprCode, zero added ops at runtime).
  */
case class OptBarrier(child: Expression) extends UnaryExpression {

  override lazy val deterministic: Boolean = false

  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable

  override def eval(input: InternalRow): Any = child.eval(input)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = c.code, isNull = c.isNull, value = c.value)
  }

  override protected def withNewChildInternal(newChild: Expression): OptBarrier =
    copy(child = newChild)

  override def prettyName: String = "opt_barrier"
}

object OptBarrier {
  def barrier(c: Column): Column = ColumnBridge.column(OptBarrier(ColumnBridge.expression(c)))
}
