package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Iterated BPE tokenizer training (Sennrich et al. 2016's merge loop, the
  * corpus-statistics half a tokenizer pipeline distributes): each round finds
  * the corpus-wide most frequent adjacent token pair (ties → lexicographic on
  * (w1, w2)) and SUBSTITUTES it — every greedily-matched occurrence merges
  * into the single token `w1_w2` — before the next round recounts pairs on
  * the rewritten corpus. This extends the single-round q290 primitive with
  * the vocab substitution between rounds that makes it actual training.
  *
  * Determinism: greedy left-to-right matching (the fold below) is a pure
  * row-local function, the winning pair comes from a full count aggregate
  * under a total order, and rounds are synchronous — the learned merge list
  * and the rewritten corpus are a pure function of the input corpus, which
  * is what the cross-engine differential gate and a resumable job need.
  * (Real BPE implementations share this greedy-scan semantics per merge.)
  *
  * Scale shape per round: pair counting is ONE row-local transform + one
  * (w1, w2) keyed partial+final count agg; the winner is a TakeOrdered top-1
  * collected to the driver (one bounded row) and applied as literals; the
  * rewrite is a row-local fold + filter/transform (no shuffle, no join).
  * k rounds = k such passes. Each
  * round's rewritten corpus is cut with an eager localCheckpoint (the
  * iterative-operator discipline of operators/Graph): without it round k's
  * plan re-evaluates round k−1's subtree once per consumer and lineage grows
  * multiplicatively with k.
  */
object Bpe {

  /** Working / output column names [[train]] and [[applyMerges]] claim for
    * themselves: an `idCol` named any of these would silently collide with
    * the internal rewrite columns (the same reserved-name hazard
    * [[graft.operators.Joins.fuzzyJoin]] guards against).
    */
  private val ReservedCols =
    Set("toks", "n", "n_tok0", "w1", "w2", "__graft_ps", "__graft_starts")

  private def requireUsableIdCol(idCol: String): Unit =
    require(!ReservedCols.contains(idCol) && !idCol.matches("r\\d+_pair"),
      s"idCol '$idCol' collides with a Bpe internal/output column " +
        s"(reserved: ${ReservedCols.mkString(", ")}, r<N>_pair)")

  /** One greedy merge round over a (id, toks) frame: returns the frame with
    * `toks` rewritten and a `roundPair` column ("w1 w2") recording the merge
    * learned this round. `n` (token count) is recomputed.
    *
    * The winner is COLLECTED (a bounded 1-row driver read — the loop is
    * already driver-synchronous per round via the checkpoint) and applied
    * as two literals: no broadcast join in the rewrite plan, and the empty
    * case is explicit — a corpus whose every doc has shrunk to one token
    * has NO adjacent pairs, and crossing an EMPTY winner frame on would
    * silently wipe every row. Instead the round is a no-op with a NULL
    * pair column, matching the SQL mirror (whose scalar subquery over the
    * empty top goes NULL and whose left joins keep every doc).
    */
  private def mergeRound(withToks: DataFrame, pairCol: String,
      samplePred: Option[Column] = None): DataFrame = {
    val countBase = samplePred.fold(withToks)(withToks.filter)
    val pairs = countBase.filter(col("n") > 1)
      .select(explode(expr(
        """transform(sequence(0, n - 2), i ->
          |  struct(element_at(toks, i + 1) AS w1,
          |         element_at(toks, i + 2) AS w2))""".stripMargin)).as("pr"))
      .select(col("pr.w1").as("w1"), col("pr.w2").as("w2"))
    val top = pairs.groupBy("w1", "w2").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("w1").asc, col("w2").asc).limit(1)
      .select("w1", "w2").collect()
    if (top.isEmpty)
      return withToks.withColumn(pairCol, lit(null).cast("string"))
    val (w1, w2) = (top(0).getString(0), top(0).getString(1))
    // greedy left-to-right: take match position p iff p is past the last
    // consumed window; collect the taken starts, then rebuild the array —
    // drop the second element of each consumed pair, rename the first
    greedyRewrite(withToks.withColumn("w1", lit(w1)).withColumn("w2", lit(w2)))
      .withColumn(pairCol, concat(col("w1"), lit(" "), col("w2")))
      .drop("w1", "w2")
  }

  /** The greedy substitution itself, over a frame carrying (toks, n, w1, w2):
    * rewrites `toks`/`n` in place. Shared by the training rounds (w1/w2 from
    * the 1-row broadcast winner) and [[applyMerges]] (w1/w2 as literals).
    */
  private def greedyRewrite(withPair: DataFrame): DataFrame =
    withPair
      .withColumn("__graft_ps", expr(
        """CASE WHEN n < 2 THEN CAST(array() AS ARRAY<INT>)
          |ELSE filter(sequence(0, n - 2), i ->
          |  element_at(toks, i + 1) = w1 AND element_at(toks, i + 2) = w2)
          |END""".stripMargin))
      .withColumn("__graft_starts", expr(
        """aggregate(__graft_ps,
          |  named_struct('e', -2, 'st', CAST(array() AS ARRAY<INT>)),
          |  (acc, p) -> IF(p >= acc.e,
          |    named_struct('e', p + 2, 'st', array_append(acc.st, p)), acc)
          |).st""".stripMargin))
      .withColumn("toks", expr(
        """transform(
          |  filter(sequence(0, n - 1), i -> NOT array_contains(__graft_starts, i - 1)),
          |  i -> IF(array_contains(__graft_starts, i),
          |          concat(w1, '_', w2), element_at(toks, i + 1)))""".stripMargin))
      .withColumn("n", size(col("toks")))
      .drop("__graft_ps", "__graft_starts")

  /** Train `rounds` BPE merges over `textCol`, rewriting the corpus between
    * rounds. Returns one row per non-empty document:
    * (idCol, n_tok0, toks, n, r1_pair … r{rounds}_pair) where `toks` is the
    * final rewritten token array and each r*_pair is the merge learned that
    * round as "w1 w2" (constant across rows).
    *
    * PRACTICAL BOUND: each round is driver-synchronous by design (one 1-row
    * top-1 collect + one eager localCheckpoint), so `rounds` beyond ~100 is
    * the wrong tool — a real tokenizer train is k ≈ 30k–50k merges, and the
    * per-round job overhead dominates long before that. The standard
    * mitigation is built in: set `sampleCap` > 0 to learn each round's
    * winning pair from a deterministic hash-sample of about that many
    * documents (the Similarity.trainCentroids sampleCap pattern — pair
    * STATISTICS converge long before corpus size) while the rewrite still
    * applies to every document, so the returned corpus is identical to
    * running [[applyMerges]] (a pure map stage at any scale) with the
    * learned list over the full corpus — an invariant PropertySpec gates.
    * The sample is fixed before round 1 (hash of `idCol` — partition- and
    * arrival-order-independent) so sampling never breaks determinism.
    */
  def train(df: DataFrame, idCol: String, textCol: String, rounds: Int,
      sampleCap: Int = 0): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1: $rounds")
    requireUsableIdCol(idCol)
    var cur = graft.Engine.spread(df)
      .select(col(idCol), TextFns.portableTokens(col(textCol)).as("toks"))
      .withColumn("n", size(col("toks")))
      .filter(col("n") > 0)
      .withColumn("n_tok0", col("n").cast("long"))
    val samplePred = if (sampleCap <= 0) None else {
      val n = cur.count()
      if (n <= sampleCap) None
      else Some(pmod(xxhash64(col(idCol)), lit(math.max(1L, n / sampleCap))) === 0)
    }
    for (r <- 1 to rounds)
      cur = mergeRound(cur, s"r${r}_pair", samplePred).localCheckpoint(true)
    cur
  }

  /** Tokenizer INFERENCE: apply an already-learned merge list to text, in
    * merge order (the other half of [[train]] — train once on the corpus,
    * encode any stream with the fixed list). Each merge is the same greedy
    * row-local rewrite as training, with the pair as a literal — no
    * aggregates, no shuffles: encoding is a pure map stage at any scale,
    * which is why BPE inference parallelizes trivially while training
    * needs the per-round corpus count. Returns (idCol, n_tok0, toks, n).
    */
  def applyMerges(
      df: DataFrame,
      idCol: String,
      textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    requireUsableIdCol(idCol)
    var cur = df
      .select(col(idCol), TextFns.portableTokens(col(textCol)).as("toks"))
      .withColumn("n", size(col("toks")))
      .filter(col("n") > 0)
      .withColumn("n_tok0", col("n").cast("long"))
    for ((w1, w2) <- merges)
      cur = greedyRewrite(
        cur.withColumn("w1", lit(w1)).withColumn("w2", lit(w2)))
        .drop("w1", "w2")
    cur
  }

  /** Adjacent-pair counts of a (…, toks, n) frame — exposed for the
    * PropertySpec invariant (a merged pair with w1 ≠ w2 cannot survive its
    * own round).
    */
  def pairCounts(withToks: DataFrame): DataFrame =
    withToks.filter(col("n") > 1)
      .select(explode(expr(
        """transform(sequence(0, n - 2), i ->
          |  struct(element_at(toks, i + 1) AS w1,
          |         element_at(toks, i + 2) AS w2))""".stripMargin)).as("pr"))
      .groupBy(col("pr.w1").as("w1"), col("pr.w2").as("w2"))
      .agg(count(lit(1)).as("cnt"))
}
