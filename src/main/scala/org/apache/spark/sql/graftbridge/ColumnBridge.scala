package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge to Spark's `private[sql]` Column ⇄ Expression conversions.
  *
  * Spark 4 routes the public Column API through ColumnNodes; wrapping a raw
  * Catalyst expression (e.g. a `ScalarSubquery`, which has no public-API
  * form) requires `classic.ExpressionUtils`. Scoping this file under
  * `org.apache.spark.sql` is the established pattern for Spark-extension
  * libraries (Delta, frameless, spark-nlp all ship such shims); everything
  * else in graft goes through the public API or the function registry.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Block until the async listener bus has delivered all queued events —
    * `SparkContext.listenerBus` is `private[spark]`. Probes that read
    * accumulated task metrics from a SparkListener (ScaleProbe's shuffle /
    * bytes-read gates) need a real drain barrier, not a fixed sleep that a
    * slow bus can outlast. Returns false if the bus did not drain in time.
    */
  def waitListenerBusEmpty(
      sc: org.apache.spark.SparkContext, timeoutMs: Long): Boolean =
    try { sc.listenerBus.waitUntilEmpty(timeoutMs); true }
    catch { case _: java.util.concurrent.TimeoutException => false }

  /** Wrap a custom LogicalPlan (e.g. graft's AsOfJoinNode) as a DataFrame —
    * the `Dataset.ofRows` constructor is `private[sql]` in Spark 4.
    */
  def ofRows(
      spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
