package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import java.util.concurrent.atomic.LongAdder

/** Runtime I/O audit for one query: actual bytes read (file + cache blocks)
  * and shuffle bytes written, from task metrics — the ground truth that the
  * static plan text can't give under AQE (exchange reuse happens at runtime;
  * `InMemoryRelation.toString` re-prints its child plan, inflating static
  * scan counts). Used to A/B plan shapes, e.g. the q149 persist-vs-rescan
  * decision. Run: sbt "runMain graft.tools.ReuseCheck qNN_name [sfDir]"
  */
object ReuseCheck {
  def main(args: Array[String]): Unit = {
    val spark = graft.Engine.configure(
      SparkSession.builder().master("local[8]"), 8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.Registry.register(spark)
    val read = new LongAdder; val shuf = new LongAdder
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        read.add(t.taskMetrics.inputMetrics.bytesRead)
        shuf.add(t.taskMetrics.shuffleWriteMetrics.bytesWritten)
      }
    })
    val name = if (args.nonEmpty) args(0) else "q149_brand_affinity"
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val df = graft.SparkEntry.queries(name)(spark, sfDir)
    df.write.mode("overwrite").format("noop").save()
    Thread.sleep(1000) // drain listener bus
    println(s"BYTES-READ $name ${read.sum()} SHUFFLE-WRITE ${shuf.sum()}")
    spark.stop()
  }
}
