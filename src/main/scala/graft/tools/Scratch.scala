package graft.tools
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = graft.Engine.session(8)
    val ev = graft.Engine.table(spark, "/root/testdata/sf0.001", "events")
    ev.printSchema()
    ev.show(3, false)
    // also without the legacy flag
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "false")
    try {
      val ev2 = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      ev2.printSchema(); ev2.show(3, false)
    } catch { case e: Throwable => println("native ns read failed: " + e.getMessage.take(300)) }
    spark.stop()
  }
}
