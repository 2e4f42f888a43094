package graft

import graft.streaming.Events

/** Structured Streaming equivalence: the streaming tumbling-window aggregation
  * over the static events dir must equal the batch form (Structured
  * Streaming's batch-equivalence contract).
  */
class StreamingSpec extends SparkSuite {

  /** File-source streams need a directory; stage the single parquet file. */
  private lazy val eventsDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_events").toString
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      java.nio.file.Paths.get(s"$dir/events.parquet"))
    dir
  }

  test("streaming tumbling agg == batch tumbling agg") {
    val streamed = Events.tumblingAgg(
      Events.readStream(spark, eventsDir))
    val got = Events.runToMemory(spark, streamed, "graft_stream_test")
    val expected = Events.tumblingAggBatch(Engine.events(spark, sfDir))
    assert(rows(got).map(_.toString).sorted == rows(expected).map(_.toString).sorted)
    assert(got.count() > 0)
  }

  test("stateful streaming sessionization == batch sessionization") {
    val batch = Events.sessionizeBatch(Engine.events(spark, sfDir))
    val streamed = Events.sessionizeStream(Events.readStream(spark, eventsDir))
    val q = streamed.writeStream.format("memory")
      .queryName("graft_sessions").outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("graft_sessions")
    assert(rows(got).map(_.toString).sorted == rows(batch).map(_.toString).sorted)
    assert(got.count() > 0)
  }

  test("sliding window produces more buckets than tumbling") {
    val slid = Events.runToMemory(spark,
      Events.slidingAgg(Events.readStream(spark, eventsDir)),
      "graft_stream_slide")
    val tumb = Events.tumblingAggBatch(Engine.events(spark, sfDir))
    assert(slid.count() > tumb.count())
  }

  test("streaming dedup drops replayed event_ids") {
    val dup = Events.dedupStream(Events.readStream(spark, eventsDir))
    val q = dup.writeStream.format("memory")
      .queryName("graft_dedup").outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("graft_dedup")
    val expected = Engine.events(spark, sfDir).dropDuplicates("event_id").count()
    assert(got.count() == expected)
  }
}
