package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Keyword retrieval over a document corpus — the "find high-quality seed
  * documents for a topic" step of a training-data pipeline.
  *
  * BM25-shaped scoring with a RATIONAL idf, (N - df + 0.5) / (df + 0.5),
  * instead of the usual log of it. The ranking it induces over a single term
  * is identical (log is monotone); summed scores weight rare terms more
  * steeply than classic BM25, which is fine for a curation filter. The reason:
  * +, -, *, / are correctly-rounded in every IEEE engine, while log may differ
  * in the last ulp between libm implementations — with the rational form the
  * per-term scores are bit-identical in Spark and DuckDB, so the oracle can
  * hash-match. Per-term scores are floor-quantized to integer micros before
  * the final sum so the result is independent of float summation order.
  *
  * Scale shape (100 TB corpus, short query):
  *   - tokenize+explode is row-local; the `isin(queryTerms)` filter runs
  *     BEFORE the shuffle, so only postings for the handful of query terms
  *     ever move — the shuffle is O(matching tokens), not O(corpus tokens).
  *   - document frequencies and corpus stats (N, avgdl) are tiny → broadcast.
  *   - final top-k is TakeOrderedAndProject (per-partition heaps, no global
  *     sort).
  *
  * Reference analogue: rapidsai/legate-dataframe has no retrieval operator;
  * this is part of the beyond-reference LLM-pipeline surface.
  */
object Retrieval {

  /** Top-k documents for a bag-of-words query.
    *
    * Returns (id, score_micros, n_terms_hit) ordered by score desc then id:
    * score_micros is the summed per-term BM25-ish score in integer micros
    * (deterministic across partitionings), n_terms_hit the number of distinct
    * query terms present in the document. Terms absent from the corpus simply
    * contribute nothing (df would be 0).
    */
  def bm25TopK(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      queryTerms: Seq[String],
      k: Int,
      k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    require(k > 0, s"k must be positive: $k")
    // the tokenizer lower-cases, so match terms in the same space
    val terms = queryTerms.map(_.toLowerCase).distinct

    val dls = docs.select(
      col(idCol).as("id"), TextFns.tokens(col(textCol)).as("toks"))
      .select(col("id"), col("toks"), size(col("toks")).as("dl"))

    // Postings for query terms only: the filter sits under the groupBy, so
    // non-matching tokens never shuffle. Materialized once (localCheckpoint —
    // it is tiny: ≤ docs × |terms| rows) because both the scoring join and
    // the document frequencies derive from it; without the cut, Catalyst
    // re-plans the dfreq branch as a SECOND full corpus scan + explode.
    val tf = dls
      .select(col("id"), col("dl"), explode(col("toks")).as("term"))
      .filter(col("term").isin(terms: _*))
      .groupBy("id", "dl", "term")
      .agg(count(lit(1)).as("tf"))
      .localCheckpoint(eager = true)

    // One row per query term present in the corpus; broadcast both.
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val stats = dls.agg(count(lit(1)).as("n_docs"), sum("dl").as("sum_dl"))

    // Arithmetic tree mirrored exactly by the SQL oracle — see oracleSql for
    // q92: every grouping below is reproduced with explicit parentheses.
    val avgdl = col("sum_dl").cast("double") / col("n_docs").cast("double")
    val idf = (col("n_docs").cast("double") - col("df") + lit(0.5)) /
      (col("df") + lit(0.5))
    val denom = col("tf") +
      lit(k1) * (lit(1.0) - lit(b) + (lit(b) * col("dl").cast("double")) / col("avgdl"))
    val scoreTerm = (col("idf") * (col("tf") * lit(k1 + 1.0))) / denom

    tf.join(broadcast(dfreq), "term")
      .crossJoin(broadcast(stats))
      .withColumn("avgdl", avgdl)
      .withColumn("idf", idf)
      .withColumn("score_q", floor(scoreTerm * lit(1e6) + lit(0.5)).cast("long"))
      .groupBy("id")
      .agg(sum("score_q").as("score_micros"), count(lit(1)).as("n_terms_hit"))
      .orderBy(col("score_micros").desc, col("id").asc)
      .limit(k)
  }
}
