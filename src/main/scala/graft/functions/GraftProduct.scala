package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Multiplicative reduction (the reference's `product` groupby/reduce kind,
  * cpp/src/groupby_aggregation.cu:46-88, cpp/src/reduction.cpp:153-161), which
  * Spark's public `functions` surface lacks.
  *
  * Implemented as a Catalyst `DeclarativeAggregate`: the update/merge are pure
  * expressions, so it participates in whole-stage codegen and gets the
  * partial-aggregation (map-side combine) split automatically — exactly the
  * two-phase shape the reference hand-codes for reductions
  * (cpp/src/reduction.cpp:110-146). Nulls are ignored, like Arrow's `product`
  * with skip_nulls; an all-null / empty group yields null.
  */
case class GraftProduct(child: Expression)
    extends DeclarativeAggregate
    with UnaryLike[Expression] {

  override def prettyName: String = "graft_product"
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  private lazy val product = AttributeReference("product", DoubleType)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] = product :: Nil

  override lazy val initialValues: Seq[Expression] =
    Seq(Literal.create(null, DoubleType))

  override lazy val updateExpressions: Seq[Expression] =
    Seq(Coalesce(Seq(Multiply(product, child), product, child)))

  override lazy val mergeExpressions: Seq[Expression] =
    Seq(Coalesce(Seq(Multiply(product.left, product.right), product.left, product.right)))

  override lazy val evaluateExpression: Expression = product

  override protected def withNewChildInternal(newChild: Expression): GraftProduct =
    copy(child = newChild)
}
