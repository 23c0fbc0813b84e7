package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.dsl.expressions._
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, Expression, If, IsNull, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.sql.catalyst.expressions.Cast
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Exact product aggregate — the reference's `cum_prod`
  * (`engineering/utils.py:49-56`) without the `exp(sum(log))`
  * transcendental detour (1-ulp error, positive-only domain).
  *
  * A `DeclarativeAggregate`: update/merge are plain expression trees, so
  * Catalyst plans map-side partial aggregation automatically (products
  * compose: product of partial products is the total product) and the same
  * operator runs in groupBy, window frames, and SQL. Null-skipping like
  * built-in SUM; handles zeros and negatives (log cannot).
  */
case class ProductAgg(childRaw: Expression)
    extends DeclarativeAggregate with UnaryLike[Expression] {

  // accept any numeric input; aggregate in double (like built-in AVG)
  private lazy val input: Expression =
    if (childRaw.dataType == DoubleType) childRaw else Cast(childRaw, DoubleType)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "product_agg"

  private lazy val product = AttributeReference("product", DoubleType)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] = Seq(product)

  override lazy val initialValues: Seq[Expression] = Seq(Literal(null, DoubleType))

  override lazy val updateExpressions: Seq[Expression] = Seq(
    If(IsNull(input), product,
      If(IsNull(product), input, product * input)))

  override lazy val mergeExpressions: Seq[Expression] = Seq(
    If(IsNull(product.right), product.left,
      If(IsNull(product.left), product.right, product.left * product.right)))

  override lazy val evaluateExpression: Expression = product

  override def child: Expression = childRaw
  override protected def withNewChildInternal(newChild: Expression): ProductAgg =
    copy(childRaw = newChild)
}

object ProductAgg {
  /** Column form, aggregate-function wrapped (usable in agg() and over()). */
  def product(c: Column): Column =
    ColumnBridge.column(ProductAgg(ColumnBridge.expression(c)).toAggregateExpression())
}
