package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph algorithms over plain edge-list DataFrames
  * (beyond-reference, SURVEY §2.9). Complements the large-star/small-star
  * connected components in `llm/Dedup`: CC gives membership, PageRank gives
  * weighted influence — the standard pair for entity graphs (dedup clusters,
  * citation/link authority, seller-buyer importance).
  */
object Graph {

  /** Damped PageRank with a fixed iteration count.
    *
    * Scale shape per iteration: one join of the rank vector onto the edge
    * list (both hash-partitioned on `src`) + one partial+final sum by `dst`
    * — the classic two-shuffle power-iteration step; nothing is ever
    * collected except the DANGLING MASS, a single scalar per iteration
    * (nodes with no out-edges donate their rank uniformly — the standard
    * correction, and a 1-row driver read is bounded at any graph size).
    * Each iteration's rank vector is persisted and the previous one
    * unpersisted, so lineage stays one step deep and memory one vector
    * wide. Determinism: the per-node sum is over doubles, so cross-engine
    * agreement is to FP-associativity (~1e-15 relative); gate outputs round
    * accordingly.
    */
  def pageRank(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      iters: Int,
      damping: Double = 0.85): DataFrame = {
    require(iters >= 1, s"iters must be >= 1: $iters")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .distinct().persist()
    val deg = e.groupBy("src").agg(count(lit(1)).cast("double").as("deg")).persist()
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct().persist()
    val n = nodes.count()
    var ranks = nodes.withColumn("r", lit(1.0 / n)).persist()
    var prev: DataFrame = null
    for (_ <- 1 to iters) {
      val contribs = e.join(ranks, e("src") === ranks("id"))
        .join(deg, "src")
        .select(col("dst").as("id"), (col("r") / col("deg")).as("c"))
        .groupBy("id").agg(sum(col("c")).as("c"))
      // dangling mass rides as a 1-ROW BROADCAST inside the update plan
      // (the q200/q233 scalar shape) instead of a per-iteration .head()
      // collect — ONE Spark action per iteration (the checkpoint) instead
      // of two, and the identical IEEE expression tree (dang/n is still a
      // double divide), so ranks are bit-unchanged.
      val danglingDf = ranks.join(deg, ranks("id") === deg("src"), "left_anti")
        .agg(coalesce(sum(col("r")), lit(0.0)).as("dang"))
      prev = ranks
      // localCheckpoint (eager) rather than persist+count: it MATERIALIZES
      // the vector AND truncates lineage, so the plan stays one iteration
      // deep at any iteration count (persist alone leaves the logical tree
      // growing per iteration — a stack/planning hazard at iters ≫ 10).
      ranks = nodes.join(contribs, Seq("id"), "left")
        .crossJoin(broadcast(danglingDf))
        .select(col("id"),
          (lit((1 - damping) / n) + lit(damping) *
            (coalesce(col("c"), lit(0.0)) + col("dang") / n)).as("r"))
        .localCheckpoint(true)
      prev.unpersist()
    }
    e.unpersist(); deg.unpersist(); nodes.unpersist()
    ranks
  }

  /** Single-source BFS distances over an undirected edge list, up to
    * `maxDepth` hops. The classic frontier expansion: each round joins the
    * CURRENT frontier (nodes first reached last round — not the whole
    * distance table) onto the edge list, one hash shuffle per hop; newly
    * reached nodes get depth d (their true BFS minimum, since every
    * shallower node was already in the table). Lineage is cut per round
    * with an eager localCheckpoint; the loop stops early when a round
    * discovers nothing (all further rounds are then empty too).
    * Unreachable nodes are absent from the result.
    *
    * Depth-cost note: every hop runs ONE driver action (the emptiness probe
    * on the frontier) plus the round's localCheckpoint materialization —
    * per-round overhead is a constant few stage launches, so wall grows
    * linearly in the DIAMETER reached, not in edges. That is the right
    * trade up to maxDepth ≈ tens (social/dedup graphs: diameter ≲ 20); on
    * a deep path-like graph (diameter in the thousands) per-round overhead
    * dominates and the standard fix is hop-doubling (connect u→w when
    * u→v→w — O(log diameter) rounds at the cost of a bigger join), which
    * connectedComponents' large-star/small-star contraction already
    * embodies when only reachability (not distance) is needed.
    */
  def bfsDistances(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      source: Long,
      maxDepth: Int): DataFrame = {
    val fwd = edges.select(col(srcCol).as("u"), col(dstCol).as("v"))
    val e = fwd.union(fwd.select(col("v").as("u"), col("u").as("v")))
      .filter(col("u") =!= col("v")).distinct().persist()
    val spark = edges.sparkSession
    import spark.implicits._
    var dist = Seq((source, 0)).toDF("id", "d").localCheckpoint(true)
    var frontier = dist
    var depth = 0
    while (depth < maxDepth && frontier.limit(1).count() > 0) {
      depth += 1
      val next = frontier.join(e, frontier("id") === e("u"))
        .select(col("v").as("id")).distinct()
        .join(dist, Seq("id"), "left_anti")
        .withColumn("d", lit(depth))
        .localCheckpoint(true)
      dist = dist.union(next).localCheckpoint(true)
      frontier = next
    }
    e.unpersist()
    dist
  }

  /** Synchronous label propagation (community detection) with a fixed
    * iteration count and a DETERMINISTIC tie-break: every node starts
    * labeled with its own id; each round it adopts the label most frequent
    * among its neighbors, ties going to the SMALLEST label. Unlike
    * random-order LPA (GraphFrames' default), the synchronous + min-label
    * rule makes the result a pure function of the edge set — the property
    * the cross-engine gate needs. `edges` is taken as directed "neighbor
    * lists" (pass a symmetrized set for the undirected semantics);
    * neighborless nodes keep their own label.
    *
    * Scale shape per iteration (the PageRank discipline above): one join
    * of the label vector onto the edge list + one (node, label) count agg
    * + one per-node max — two keyed shuffles, nothing collected, lineage
    * cut per round with an eager localCheckpoint. The mode-with-tie-break
    * is a single `min(struct(-cnt, label))` aggregate, not a window, so
    * it stays one partial+final hash agg. The negation lives on the COUNT
    * (a `count()` result, always in [1, rows] — never near Long.MinValue),
    * not on the label, so node ids may be any orderable type (strings
    * included) and no id range is excluded.
    */
  def labelPropagation(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      iters: Int): DataFrame = {
    require(iters >= 1, s"iters must be >= 1: $iters")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .distinct().persist()
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct().persist()
    var labels = nodes.withColumn("lbl", col("id")).localCheckpoint(true)
    for (_ <- 1 to iters)
      labels = lpaRound(e, labels)
    e.unpersist(); nodes.unpersist()
    labels
  }

  /** One synchronous LPA round (shared by the fixed-count and the
    * until-convergence forms so the mode-with-tie-break rule can never
    * diverge between them): every node adopts the most frequent in-neighbor
    * label, ties to the smallest; neighborless nodes keep theirs. Returns
    * the new (id, lbl) vector, lineage cut.
    */
  private def lpaRound(e: DataFrame, labels: DataFrame): DataFrame = {
    val counts = e.join(labels, e("src") === labels("id"))
      .select(col("dst").as("id"), col("lbl"))
      .groupBy("id", "lbl").agg(count(lit(1)).as("cnt"))
    val winners = counts.groupBy("id")
      .agg(min(struct((-col("cnt")).as("negcnt"), col("lbl"))).as("w"))
      .select(col("id"), col("w.lbl").as("new_lbl"))
    labels.join(winners, Seq("id"), "left")
      .select(col("id"), coalesce(col("new_lbl"), col("lbl")).as("lbl"))
      .localCheckpoint(true)
  }

  /** [[labelPropagation]] run UNTIL CONVERGENCE (no label changes) with a
    * `maxIters` safety bound — the form users actually call when they don't
    * know the mixing time up front. Same deterministic synchronous min-label
    * rule per round; after each round one bounded driver action counts
    * changed labels (an anti-join on (id, lbl) — a scalar, like BFS's
    * frontier probe) and the loop stops at 0.
    *
    * `maxIters` is not just a guard against slow mixing: SYNCHRONOUS LPA can
    * oscillate forever between two labelings (the classic bipartite 2-cycle
    * — e.g. a 2-node cycle swaps labels every round), so a fixed-point is
    * not guaranteed to exist and the bound is load-bearing. Returns
    * (labels, itersRun, converged): `converged` false means the bound hit
    * first (oscillation or slow mixing) and `labels` is round-`maxIters`'s
    * labeling, exactly [[labelPropagation]](…, maxIters).
    *
    * Scale shape: identical to the fixed-count form (two keyed shuffles per
    * round, lineage cut per round) plus one count action per round — the
    * same per-round driver barrier BFS/CC already carry.
    */
  def labelPropagationConverged(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      maxIters: Int): (DataFrame, Int, Boolean) = {
    require(maxIters >= 1, s"maxIters must be >= 1: $maxIters")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .distinct().persist()
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct().persist()
    var labels = nodes.withColumn("lbl", col("id")).localCheckpoint(true)
    var iters = 0
    var converged = false
    while (iters < maxIters && !converged) {
      iters += 1
      val next = lpaRound(e, labels)
      converged = next.join(labels, Seq("id", "lbl"), "left_anti")
        .limit(1).count() == 0
      labels = next
    }
    e.unpersist(); nodes.unpersist()
    (labels, iters, converged)
  }
}
