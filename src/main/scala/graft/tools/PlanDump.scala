package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode

/** Dumps `.explain("formatted")` for the named SparkEntry queries to
  * `<outDir>/<query>_<suffix>.txt` — the round's plan-evidence artifacts
  * (plans/rNN/). Run:
  *   sbt "runMain graft.tools.PlanDump plans/r14 before qNN_name [qMM_name ...]"
  * Incremental/fixture queries run their side effects while the final frame
  * is built; the dumped plan is the query's RETURNED frame (for maintained
  * MVs that is the serving read — the per-batch write plans are internal).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanDump <outDir> <suffix> <query...>")
    val outDir = java.nio.file.Paths.get(args(0))
    java.nio.file.Files.createDirectories(outDir)
    val suffix = args(1)
    val names = args.drop(2)
    val spark = graft.Engine.configure(
      SparkSession.builder().master("local[8]"), 8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.Registry.register(spark)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    // NonFatal only, and a nonzero exit when anything failed: a fatal JVM
    // error (OOM, linkage) must crash the tool, and an evidence run that
    // dumped nothing must not look like a success to the calling script.
    var failed = 0
    for (q <- names) {
      try {
        val df = graft.SparkEntry.queries(q)(spark, sfDir)
        val txt = df.queryExecution.explainString(FormattedMode)
        java.nio.file.Files.writeString(outDir.resolve(s"${q}_$suffix.txt"), txt)
        println(s"PLANDUMP wrote ${q}_$suffix.txt (${txt.length} chars)")
      } catch {
        case scala.util.control.NonFatal(e) =>
          failed += 1
          println(s"PLANDUMP $q FAILED: ${String.valueOf(e.getMessage).take(200)}")
      }
    }
    spark.stop()
    if (failed > 0) sys.exit(1)
  }
}
