package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.{call_function, lit}

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
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_simhash64",
      exprs => SimHash64Expr(exprs.head),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_jaccard_sorted",
      exprs => JaccardSortedExpr(exprs(0), exprs(1)),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_minhash",
      exprs => MinHashSignatureExpr(exprs(0),
        exprs(1).eval().asInstanceOf[Int]),
      "built-in")
  }

  /** Merge-pass Jaccard of two sorted array<long> columns. */
  def jaccardSorted(a: Column, b: Column): Column =
    call_function("graft_jaccard_sorted", a, b)

  /** Native simhash over an array<string> token column. */
  def simhash64(tokens: Column): Column = call_function("graft_simhash64", tokens)

  /** Native minhash signature over an array<string> shingle column. */
  def minhash(shingles: Column, numHashes: Int): Column =
    call_function("graft_minhash", shingles, lit(numHashes))

  /** Codegen'd vector dot product (requires [[register]] on the session). */
  def dot(a: Column, b: Column): Column = call_function("graft_dot", a, b)

  /** Multiplicative aggregate (requires [[register]] on the session). */
  def product(c: Column): Column = call_function("graft_product", c)
}
