package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Structured Streaming over the `events` table shape (beyond-reference: the
  * reference has no streaming surface, SURVEY §2.9).
  *
  * Design: `readStream` on a parquet directory → watermarked tumbling/sliding
  * window aggregation → sink. State is bounded by the watermark; the same
  * aggregation expressed in batch mode (see `tumblingAggBatch`) is what the
  * correctness oracle checks, per Structured Streaming's batch-equivalence
  * guarantee.
  */
object Events {

  /** events.parquet schema as stored (ts = raw int64 nanoseconds). */
  val rawSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  private def withTs(df: DataFrame): DataFrame =
    df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))

  /** Open the events directory as a stream (file source discovers new files —
    * the local stand-in for a Kafka-style source).
    */
  def readStream(spark: SparkSession, dir: String): DataFrame =
    withTs(spark.readStream.schema(rawSchema).parquet(dir))

  /** Watermarked tumbling-window aggregation (streaming). */
  def tumblingAgg(events: DataFrame, window_ : String = "1 hour", watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("total_value"))
      .select(
        col("window.start").as("wstart"),
        col("event_type"), col("n"), col("total_value"))

  /** Sliding-window aggregation (streaming). */
  def slidingAgg(events: DataFrame, window_ : String = "1 hour", slide: String = "15 minutes",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_, slide), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("wstart"), col("event_type"), col("n"))

  /** The same tumbling aggregation in batch form (oracle-comparable). */
  def tumblingAggBatch(events: DataFrame, window_ : String = "1 hour"): DataFrame =
    events
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("total_value"))
      .select(
        col("window.start").as("wstart"),
        col("event_type"), col("n"), col("total_value"))

  /** Run a streaming query over the static events dir to completion via the
    * memory sink; returns the materialized result (test harness helper).
    */
  def runToMemory(spark: SparkSession, streamed: DataFrame, name: String): DataFrame = {
    val q = streamed.writeStream
      .format("memory")
      .queryName(name)
      .outputMode("complete")
      .start()
    q.processAllAvailable()
    q.stop()
    spark.table(name)
  }
}
