package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Ad-hoc phase profiler for the incremental-funnel queries (q301/q304):
  * separates staging IO, per-batch stateful-merge cost (direct
  * applyCurationBatch calls, no streaming), and the Structured Streaming
  * machinery (maintainCuration = checkpointed AvailableNow loop), so bench
  * tail time is attributable before optimizing. Not part of the library
  * surface.
  */
object ProfInc {
  def time[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
  }

  /** Counts jobs/stages/tasks between [[mark]] calls, so each profiled phase
    * also reports its scheduler footprint (a per-batch stateful merge that
    * runs 10 tiny jobs pays ~10 job-submit round trips before any work).
    */
  private class Footprint extends org.apache.spark.scheduler.SparkListener {
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val stages = new java.util.concurrent.atomic.AtomicInteger
    val tasks = new java.util.concurrent.atomic.AtomicInteger
    val sites = new java.util.concurrent.ConcurrentHashMap[String, Integer]
    override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
      jobs.incrementAndGet()
      val site = Option(j.properties.getProperty("callSite.short")).getOrElse("?")
      sites.merge(site, 1, (a, b) => a + b)
    }
    override def onStageCompleted(s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
      stages.incrementAndGet(); tasks.addAndGet(s.stageInfo.numTasks)
    }
    def mark(): (Int, Int, Int) = {
      val r = (jobs.get, stages.get, tasks.get)
      import scala.jdk.CollectionConverters._
      sites.asScala.toSeq.sortBy(-_._2).foreach { case (s, n) =>
        println(s"PROFINC   site $n x $s") }
      sites.clear()
      jobs.set(0); stages.set(0); tasks.set(0); r
    }
  }

  def main(args: Array[String]): Unit = {
    val spark = graft.Engine.session(32)
    val fp = new Footprint
    spark.sparkContext.addSparkListener(fp)
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.Registry.register(spark)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    val docs = graft.Engine.table(spark, sfDir, "documents")
      .select("doc_id", "source", "text")

    // enrich identical in shape to SparkEntry.curationEnrich (inlined: that
    // one is private): norm key + gopher-ish flags + classifier-ish score
    def enrich(bt: DataFrame): DataFrame = {
      val base = bt
        .withColumn("norm_key", md5(lower(col("text"))))
        .withColumn("toks", graft.llm.TextFns.portableTokens(col("text")))
        .withColumn("n_words", size(col("toks")).cast("long"))
        .filter(col("n_words") > 0)
        .withColumn("ok_rules", (col("n_words") >= 50).cast("long"))
      val big = base.select(col("doc_id"), explode(col("toks")).as("w"))
        .groupBy("doc_id").agg(count(lit(1)).as("x"))
      base.join(big, Seq("doc_id"), "left")
        .withColumn("ok_clf", (col("x") % 2 === 0).cast("long"))
        .select("doc_id", "source", "norm_key", "n_words", "ok_rules", "ok_clf")
    }

    for (round <- 1 to 2) {
      // direct batch-mode: 3 applyCurationBatch calls, no streaming
      val w1 = java.nio.file.Files.createTempDirectory("profinc_direct").toString
      val (_, tDirect) = time {
        for (k <- 0 to 2)
          graft.streaming.Incremental.applyCurationBatch(spark,
            enrich(docs.filter(col("doc_id") % 3 === k)), k.toLong,
            s"$w1/state", s"$w1/delta", 16)
        graft.streaming.Incremental.curationReport(spark, s"$w1/delta")
          .collect()
      }
      org.apache.spark.sql.graftbridge.ColumnBridge.waitListenerBusEmpty(spark.sparkContext, 30000)
      val (dj, dst, dtk) = fp.mark()
      // full q301 shape: staging + 2 maintain calls (streaming) + report
      val w2 = java.nio.file.Files.createTempDirectory("profinc_stream").toString
      val (_, tStage) = time {
        for (k <- 0 to 1)
          docs.filter(col("doc_id") % 3 === k).coalesce(1)
            .write.parquet(s"$w2/src/b$k")
      }
      val (_, tM1) = time {
        graft.streaming.Incremental.maintainCuration(spark, s"$w2/src/*",
          s"$w2/state", s"$w2/delta", s"$w2/ck", docs.schema, enrich)
      }
      val (_, tM2) = time {
        docs.filter(col("doc_id") % 3 === 2).coalesce(1)
          .write.parquet(s"$w2/src/b2")
        graft.streaming.Incremental.maintainCuration(spark, s"$w2/src/*",
          s"$w2/state", s"$w2/delta", s"$w2/ck", docs.schema, enrich)
      }
      val (_, tRep) = time {
        graft.streaming.Incremental.curationReport(spark, s"$w2/delta").collect()
      }
      println(f"PROFINC round=$round direct3=${tDirect}%5.2f s | " +
        f"stage=${tStage}%5.2f maintain1=${tM1}%5.2f maintain2=${tM2}%5.2f " +
        f"report=${tRep}%5.2f total=${tStage + tM1 + tM2 + tRep}%5.2f s")
      org.apache.spark.sql.graftbridge.ColumnBridge.waitListenerBusEmpty(spark.sparkContext, 30000)
      val (j, st, tk) = fp.mark()
      println(s"PROFINC round=$round footprint: direct3 jobs=$dj stages=$dst " +
        s"tasks=$dtk | streamed jobs=$j stages=$st tasks=$tk")
    }
    spark.stop()
  }
}
