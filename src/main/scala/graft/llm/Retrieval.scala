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

  /** Per-document TF-IDF top terms — the "what is this document about"
    * vectorization step (keyword extraction, topic balancing, clustering
    * features).
    *
    * Scoring uses a RATIONAL idf, (N + 1) / (df + 1), for the same reason
    * [[bm25TopK]] does: tf·(N+1) and df+1 are exact integers (< 2^53), and a
    * single IEEE division of exact integers is correctly rounded in every
    * engine, so per-term scores are bit-identical in Spark and DuckDB and the
    * oracle can hash-match. log-idf would only rescale monotonically — the
    * per-document ranking is the classic TF-IDF ranking.
    *
    * Scale shape: one corpus scan builds the (doc, term) counts (partial+final
    * aggregate — the explode never materializes more than a task's tokens);
    * document frequencies reduce that to vocabulary size and broadcast; the
    * per-document top-k is a WindowGroupLimit ranking (map-side partial
    * top-k), never a global sort.
    */
  def tfidfTopTerms(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      k: Int): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    // (doc, term) counts: both the df branch and the scoring branch consume
    // this — cut the plan (it is corpus-vocabulary sized, far smaller than
    // the token stream) so the corpus is tokenized exactly once
    val tf = docs
      .select(col(idCol).as("id"),
        explode(TextFns.portableTokens(col(textCol))).as("term"))
      .groupBy("id", "term").agg(count(lit(1)).as("tf"))
      .localCheckpoint(eager = true)
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val stats = tf.agg(countDistinct(col("id")).as("n_docs"))
    val scored = tf.join(broadcast(dfreq), "term")
      .crossJoin(broadcast(stats))
      .withColumn("score",
        (col("tf") * (col("n_docs") + lit(1L))).cast("double") /
          (col("df") + lit(1L)).cast("double"))
    graft.operators.Sorts.topKPerGroup(
      scored, Seq("id"), Seq(col("score").desc, col("term").asc), k)
      .select("id", "term", "tf", "df", "score")
  }

  /** Exact corpus heavy hitters: terms whose global count exceeds
    * total_tokens / denom — the deterministic two-pass answer to the question
    * Misra-Gries / count-min sketches approximate (boilerplate detection,
    * stop-word discovery, tokenizer-vocabulary seeding).
    *
    * Scale shape: ONE corpus scan into a partial+final count aggregate
    * (shuffle bounded by vocabulary, not token count); the total re-derives
    * from the vocabulary counts (sum of counts == token count), so no second
    * corpus pass; the threshold compare is integer-exact
    * (cnt · denom > total — no division, no float).
    */
  def heavyHitterTerms(
      docs: DataFrame,
      textCol: String,
      denom: Long): DataFrame = {
    require(denom > 1, s"denom must be > 1: $denom")
    val counts = docs
      .select(explode(TextFns.portableTokens(col(textCol))).as("term"))
      .groupBy("term").agg(count(lit(1)).as("cnt"))
      .localCheckpoint(eager = true) // vocabulary-sized; feeds total + filter
    val total = counts.agg(sum("cnt").as("total_tokens"))
    counts.crossJoin(broadcast(total))
      .filter(col("cnt") * lit(denom) > col("total_tokens"))
      .orderBy(col("cnt").desc, col("term").asc)
  }
}
