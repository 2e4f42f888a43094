package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ad-hoc profiling main used during bench iteration (not part of the library
  * surface): times plan variants with warmup + best-of-3 like Bench.
  */
object Prof {
  def mat(df: DataFrame): Double = {
    val t0 = System.nanoTime(); df.write.mode("overwrite").format("noop").save(); (System.nanoTime()-t0)/1e9
  }
  def best(df: => DataFrame): Double = { mat(df); (1 to 3).map(_ => mat(df)).min }

  def main(args: Array[String]): Unit = {
    val spark = graft.Engine.session(32)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val li = graft.Engine.table(spark, dir, "lineitem")
    val noRound = li.select(col("l_orderkey"), col("l_linenumber"),
      tan(col("l_discount")).as("a"), asin(col("l_discount")).as("b"), acos(col("l_discount")).as("c"),
      atan(col("l_discount")).as("d"), atan2(col("l_discount")+1.0, col("l_tax")+2.0).as("e"),
      (log(col("l_quantity")+1.0)/log(lit(2.0))).as("f"), cbrt(col("l_quantity")).as("g"),
      log2(col("l_quantity")+1.0).as("h"), log10(col("l_quantity")+1.0).as("i"),
      exp(col("l_discount")).as("j"), signum(col("l_quantity")-25.0).as("k"))
    val withRound = li.select(col("l_orderkey"), col("l_linenumber"),
      round(tan(col("l_discount")),6).as("a"), round(asin(col("l_discount")),6).as("b"), round(acos(col("l_discount")),6).as("c"),
      round(atan(col("l_discount")),6).as("d"), round(atan2(col("l_discount")+1.0, col("l_tax")+2.0),6).as("e"),
      round(log(col("l_quantity")+1.0)/log(lit(2.0)),6).as("f"), round(cbrt(col("l_quantity")),6).as("g"),
      round(log2(col("l_quantity")+1.0),6).as("h"), round(log10(col("l_quantity")+1.0),6).as("i"),
      round(exp(col("l_discount")),6).as("j"), signum(col("l_quantity")-25.0).as("k"))
    println(f"noRound proj only: ${best(noRound)}%.3f")
    println(f"withRound proj only: ${best(withRound)}%.3f")
    println(f"noRound + sortAll: ${best(noRound.orderBy(noRound.columns.map(c => col(c).asc_nulls_last):_*))}%.3f")
    println(f"withRound + sortAll: ${best(withRound.orderBy(withRound.columns.map(c => col(c).asc_nulls_last):_*))}%.3f")
    println(f"full q57: ${best(graft.SparkEntry.queries("q57_math_more")(spark, dir))}%.3f")
    spark.stop()
  }
}
