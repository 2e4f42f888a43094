package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.call_function

/** Registers graft's custom Catalyst expressions with a session's function
  * registry so they are usable from both the Column API and SQL.
  */
object Registry {

  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_product",
      exprs =>
        GraftProduct(org.apache.spark.sql.catalyst.expressions.Cast(
          exprs.head, org.apache.spark.sql.types.DoubleType)).toAggregateExpression(),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_dot",
      exprs => DotProduct(exprs(0), exprs(1)),
      "built-in")
  }

  /** Codegen'd vector dot product (requires [[register]] on the session). */
  def dot(a: Column, b: Column): Column = call_function("graft_dot", a, b)

  /** Multiplicative aggregate (requires [[register]] on the session). */
  def product(c: Column): Column = call_function("graft_product", c)
}
