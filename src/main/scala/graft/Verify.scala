package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = Engine.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.Registry.register(spark)
    new java.io.File(outDir).mkdirs()
    // local-iteration filter (same contract as Bench): SPARK_GRAFT_ONLY=q57_math_more
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    // Dump queries concurrently: Spark schedules concurrent actions from one
    // session fine, and most of these queries are tiny at sf0.01 — wall time
    // is dominated by per-job overhead, which overlaps. Bounded pool so the
    // heavyweight queries (LSH, ANN) don't all run at once.
    val par = sys.env.getOrElse("SPARK_GRAFT_VERIFY_PAR", "4").toInt
    val pool = java.util.concurrent.Executors.newFixedThreadPool(par)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutor(pool)
    val failed = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val futures = SparkEntry.queries.toSeq
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .map { case (name, fn) =>
        scala.concurrent.Future {
          try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
            .parquet(s"$outDir/$name")
          catch { case e: Throwable =>
            failed.add(name)
            System.err.println(s"[verify] $name failed: ${e.getMessage}")
          }
        }
      }
    scala.concurrent.Await.result(
      scala.concurrent.Future.sequence(futures),
      scala.concurrent.duration.Duration.Inf)
    pool.shutdown()
    // Loud per-round health report: a query missing from the dump is a
    // FAILURE, not a skip (the round-6 events-schema drift silently killed 15
    // queries for two rounds because nothing counted them).
    // key-set diff only meaningful on a full run (a SPARK_GRAFT_ONLY filter
    // legitimately leaves the other dynamic oracles unpopulated)
    val noOracle = if (only.isEmpty)
      SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet else Set.empty[String]
    val danglingOracle = if (only.isEmpty)
      SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet else Set.empty[String]
    if (!failed.isEmpty || noOracle.nonEmpty || danglingOracle.nonEmpty) {
      import scala.jdk.CollectionConverters._
      System.err.println(
        s"[verify] *** ${failed.size} QUERIES THREW: ${failed.asScala.toSeq.sorted.mkString(", ")}")
      if (noOracle.nonEmpty) System.err.println(
        s"[verify] *** ${noOracle.size} queries lack oracleSql: ${noOracle.toSeq.sorted.mkString(", ")}")
      if (danglingOracle.nonEmpty) System.err.println(
        s"[verify] *** ${danglingOracle.size} oracleSql keys lack a query: ${danglingOracle.toSeq.sorted.mkString(", ")}")
    } else if (only.isEmpty)
      System.err.println(s"[verify] OK: all ${SparkEntry.queries.size} queries dumped, oracle keys aligned")
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
