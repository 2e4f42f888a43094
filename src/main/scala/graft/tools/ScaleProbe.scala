package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scaling probe for the LSH dedup / ANN paths: synthesizes corpora several
  * times larger than the sf0.1 testdata and measures wall time and candidate
  * counts, to show the bucket-join pipelines scale near-linearly (the
  * all-pairs baselines would be quadratic). Run:
  *   sbt "runMain graft.tools.ScaleProbe"
  */
object ScaleProbe {
  def time[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
  }

  /** Synthetic corpus: `n` docs of ~60 words from a Zipf-ish vocab, with 2%
    * planted near-duplicates (one word changed). Deterministic per n.
    */
  def corpus(spark: SparkSession, n: Int): DataFrame = {
    val base = spark.range(n).select(
      col("id").as("doc_id"),
      // 60 pseudo-random vocab picks per doc, multiplicative-hash driven
      concat_ws(" ", (0 until 60).map(i =>
        concat(lit("w"), pmod(xxhash64(col("id"), lit(i)), lit(5000)))): _*).as("text"))
    val dups = base.filter(pmod(col("doc_id"), lit(50)) === 0)
      .select((col("doc_id") + 1000000000L).as("doc_id"),
        concat(col("text"), lit(" extra")).as("text"))
    base.unionAll(dups)
  }

  def main(args: Array[String]): Unit = {
    val spark = graft.Engine.session(32)
    spark.sparkContext.setLogLevel("ERROR")
    for (n <- Seq(5000, 20000, 80000)) {
      val docs = corpus(spark, n).persist()
      val total = docs.count()
      val (pairs, tDedup) = time {
        graft.llm.Dedup.nearDuplicates(docs, "doc_id", "text",
          threshold = 0.8, bands = 16, rowsPerBand = 2).count()
      }
      val (simPairs, tSim) = time {
        graft.llm.Dedup.simhashPairs(docs, "doc_id", "text", maxDist = 3).count()
      }
      println(f"SCALE n=$total%7d  minhash_lsh=${tDedup}%6.1f s (pairs=$pairs)  simhash=${tSim}%6.1f s (pairs=$simPairs)")
      docs.unpersist()
    }
    spark.stop()
  }
}
