package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Ad-hoc profiling main used during bench iteration (not part of the library
  * surface): times join-benchmark variants with warmup + best-of-N.
  */
object Prof {
  def mat(df: DataFrame): Unit = df.write.mode("overwrite").format("noop").save()
  def time(f: => Unit): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val nrows = 1L << 22
    def run(label: String, extra: Map[String, String]): Unit = {
      val b = graft.Engine.configure(
        SparkSession.builder().master("local[32]"), 32)
        .config("spark.shuffle.compress", "false")
        .config("spark.shuffle.spill.compress", "false")
        .config("spark.local.dir",
          if (new java.io.File("/dev/shm").isDirectory) "/dev/shm" else "/tmp")
      val spark = extra.foldLeft(b) { case (bb, (k, v)) => bb.config(k, v) }.getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      def side(p: String): DataFrame =
        spark.range(nrows).select(
          pmod(col("id") * 2654435761L, lit(nrows)).cast("double").as("key"),
          (col("id") % 97).cast("double").as(p))
      val lhs = side("payload_a").cache(); val rhs = side("payload_b").cache()
      mat(lhs); mat(rhs)
      val joined = lhs.join(rhs, "key")
      mat(joined)
      val outRows = joined.count()
      val secs = (1 to 5).map(_ => time(mat(joined))).min
      val gibs = ((nrows * 4 + outRows * 3) * 8.0) / secs / math.pow(2, 30)
      println(f"JOINVAR $label: best=$secs%.3f s, $gibs%.3f GiB/s")
      spark.stop()
      SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
    }
    run("baseline-smj-32p", Map.empty)
    run("shj", Map("spark.sql.join.preferSortMergeJoin" -> "false"))
    run("64-partitions", Map("spark.sql.shuffle.partitions" -> "64"))
    run("no-aqe", Map("spark.sql.adaptive.enabled" -> "false"))
    run("radix-off-shj", Map(
      "spark.sql.join.preferSortMergeJoin" -> "false",
      "spark.sql.shuffle.partitions" -> "64"))
  }
}
