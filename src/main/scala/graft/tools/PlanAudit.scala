package graft.tools

import org.apache.spark.sql.SparkSession

/** Per-query physical-plan summary: exchange / scan / sort / buffering-agg
  * counts for every SparkEntry query (or a filter list as args) — the
  * round-over-round "is this the plan you'd want at 100×?" audit in one
  * table. Run: sbt "runMain graft.tools.PlanAudit [qNN_name ...]"
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = graft.Engine.configure(
      SparkSession.builder().master("local[8]"), 8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.Registry.register(spark)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val names = graft.SparkEntry.queries.keys.toSeq.sorted
      .filter(n => args.isEmpty || args.contains(n))
    for (q <- names) {
      try {
        val plan = graft.SparkEntry.queries(q)(spark, sfDir)
          .queryExecution.executedPlan.toString
        def n(re: String) = re.r.findAllIn(plan).size
        println(f"PLAN $q%-28s exchanges=${n("Exchange")}%2d scans=${n("FileScan|Scan parquet|Scan ExistingRDD")}%2d " +
          f"sorts=${n("\\bSort\\b")}%2d bufferingAggs=${n("ObjectHashAggregate|SortAggregate")}%2d " +
          f"bnlj=${n("BroadcastNestedLoopJoin|CartesianProduct")}%2d")
      } catch {
        case e: Throwable => println(s"PLAN $q FAILED: ${e.getMessage.take(100)}")
      }
    }
    spark.stop()
  }
}
