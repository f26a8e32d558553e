package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, Expression, If, IsNull, Literal, Multiply}
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Exact product aggregate as a Catalyst `DeclarativeAggregate` — the
  * custom-aggregate slot the survey left open (`SCol.prod`'s
  * `exp(sum(log))` form has ~1e-15 relative error and sign/zero
  * bookkeeping; SURVEY.md §2.12 "prod is the only one needing a custom
  * Aggregate"). Declarative = pure expressions, so partial aggregation and
  * whole-stage codegen apply like any built-in; the merge is a null-safe
  * multiply, making it partial-aggregation-correct at any parallelism.
  *
  * Null semantics match SQL aggregates: null inputs are skipped; an
  * all-null/empty group yields null (pandas `prod` of empty is 1.0 — callers
  * wanting that wrap in `coalesce(prod(c), lit(1.0))`).
  */
case class ProductAgg(child: Expression)
    extends DeclarativeAggregate with UnaryLike[Expression] {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "product_exact"

  private lazy val product = AttributeReference("product", DoubleType)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] = product :: Nil

  override lazy val initialValues: Seq[Expression] = Seq(Literal(null, DoubleType))

  override lazy val updateExpressions: Seq[Expression] = {
    val input = child match {
      case e if e.dataType == DoubleType => e
      case e => org.apache.spark.sql.catalyst.expressions.Cast(e, DoubleType)
    }
    Seq(
      If(IsNull(input), product,
        If(IsNull(product), input, Multiply(product, input))))
  }

  override lazy val mergeExpressions: Seq[Expression] = Seq(
    If(IsNull(product.left), product.right,
      If(IsNull(product.right), product.left, Multiply(product.left, product.right))))

  override lazy val evaluateExpression: Expression = product

  override protected def withNewChildInternal(newChild: Expression): ProductAgg =
    copy(child = newChild)
}

object ProductAgg {

  /** Column-facing aggregate: `df.agg(product_exact($"x"))`. */
  def product_exact(c: Column): Column =
    ColumnBridge.column(ProductAgg(ColumnBridge.expression(c)).toAggregateExpression())
}
