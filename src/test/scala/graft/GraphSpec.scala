package graft

import graft.operators.Graph
import org.apache.spark.sql.functions._

class GraphSpec extends SparkSuite {
  import spark.implicits._

  test("pageRank one iteration matches the closed form on a 3-node graph") {
    // A→B, B→A, C→A; n=3, d=0.85, r0 = 1/3 each:
    //   r1(A) = 0.05 + 0.85·(1/3 + 1/3) = 0.61666…
    //   r1(B) = 0.05 + 0.85·(1/3)       = 0.33333…
    //   r1(C) = 0.05
    val edges = Seq(("A", "B"), ("B", "A"), ("C", "A")).toDF("s", "t")
    val got = Graph.pageRank(edges, "s", "t", iters = 1)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(got("A") - (0.05 + 0.85 * 2.0 / 3)) < 1e-12)
    assert(math.abs(got("B") - (0.05 + 0.85 / 3)) < 1e-12)
    assert(math.abs(got("C") - 0.05) < 1e-12)
  }

  test("pageRank redistributes dangling mass and conserves total rank") {
    // A→B; B has no out-edges (dangling). n=2:
    //   dangling mass = r0(B) = 0.5, spread 0.25 to each
    //   r1(A) = 0.075 + 0.85·(0 + 0.25)   = 0.2875
    //   r1(B) = 0.075 + 0.85·(0.5 + 0.25) = 0.7125
    val edges = Seq(("A", "B")).toDF("s", "t")
    val got = Graph.pageRank(edges, "s", "t", iters = 1)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(got("A") - 0.2875) < 1e-12)
    assert(math.abs(got("B") - 0.7125) < 1e-12)
    // total rank conserved across further iterations
    val r3 = Graph.pageRank(edges, "s", "t", iters = 3)
      .agg(sum("r")).head().getDouble(0)
    assert(math.abs(r3 - 1.0) < 1e-9)
  }

  test("bfsDistances: chain + branch distances, depth cap, unreachable absent") {
    import spark.implicits._
    // 1-2-3-4-5 chain, 2-6 branch, 8-9 disconnected
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (2L, 6L), (8L, 9L))
      .toDF("a", "b")
    val got = Graph.bfsDistances(edges, "a", "b", source = 1L, maxDepth = 8)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got == Map(1L -> 0, 2L -> 1, 3L -> 2, 6L -> 2, 4L -> 3, 5L -> 4))
    // depth cap truncates the frontier; undirected: works from the far end
    val capped = Graph.bfsDistances(edges, "a", "b", source = 5L, maxDepth = 2)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(capped == Map(5L -> 0, 4L -> 1, 3L -> 2))
  }

  test("bfsDistances on a deep chain: exact distances at diameter 30, one round per hop") {
    import spark.implicits._
    // the depth-cost regime the scaladoc documents: a path graph forces one
    // frontier round per hop; distances must stay exact to the full depth
    val chain = (0L until 30L).map(i => (i, i + 1)).toDF("a", "b")
    val got = Graph.bfsDistances(chain, "a", "b", source = 0L, maxDepth = 40)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got == (0L to 30L).map(i => i -> i.toInt).toMap)
  }

  test("labelPropagation: synchronous min-label rounds on a barbell, hand-walked") {
    import spark.implicits._
    // two triangles {1,2,3} and {4,5,6} bridged by 3-4, symmetrized.
    // Hand-walk (label ← most frequent in-neighbor label, tie → smallest):
    //   iter1: 1→2 2→1 3→1 4→3 5→4 6→4
    //   iter2: 1→1 2→1 3→1 4→4 5→3 6→3
    //   iter3: 1→1 2→1 3→1 4→3 5→3 6→3  (two communities)
    val und = Seq((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L), (4L, 6L), (5L, 6L), (3L, 4L))
      .toDF("s", "t")
    val edges = und.union(und.select($"t".as("s"), $"s".as("t")))
    def run(k: Int): Map[Long, Long] =
      Graph.labelPropagation(edges, "s", "t", iters = k)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(run(1) == Map(1L -> 2L, 2L -> 1L, 3L -> 1L, 4L -> 3L, 5L -> 4L, 6L -> 4L))
    assert(run(3) == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 3L, 5L -> 3L, 6L -> 3L))
    // a node with no in-neighbors keeps its own label through the rounds
    val directed = Seq((7L, 1L), (1L, 7L), (9L, 8L)).toDF("s", "t")
    val got = Graph.labelPropagation(directed, "s", "t", iters = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(9L) == 9L && got(8L) == 9L)
  }

  test("labelPropagation accepts string node ids (min-label tie-break is negation-free)") {
    import spark.implicits._
    // triangle with a heavy tie every round: all three see two distinct
    // neighbor labels with count 1 → smallest label (lexicographic) wins
    val und = Seq(("x", "y"), ("y", "z"), ("x", "z")).toDF("s", "t")
    val edges = und.union(und.select($"t".as("s"), $"s".as("t")))
    val got = Graph.labelPropagation(edges, "s", "t", iters = 2)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    // hand-walk — iter1: x sees {"y","z"} (tie) → "y"; y sees {"x","z"} →
    // "x"; z sees {"x","y"} → "x". iter2: x sees {"x","x"} → "x"; y sees
    // {"y","x"} (tie) → "x"; z sees {"y","x"} (tie) → "x".
    assert(got == Map("x" -> "x", "y" -> "x", "z" -> "x"))
  }

  test("labelPropagationConverged: fixed point is invariant under one more round; oscillation hits the bound") {
    import spark.implicits._
    // the barbell converges: converged labels must equal the fixed-count
    // run at itersRun AND at itersRun + 1 (one more round is a no-op)
    val und = Seq((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L), (4L, 6L), (5L, 6L), (3L, 4L))
      .toDF("s", "t")
    val edges = und.union(und.select($"t".as("s"), $"s".as("t")))
    val (labels, iters, converged) =
      Graph.labelPropagationConverged(edges, "s", "t", maxIters = 20)
    assert(converged && iters <= 20)
    val fixed = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val oneMore = Graph.labelPropagation(edges, "s", "t", iters = iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fixed == oneMore)
    val plus1 = Graph.labelPropagation(edges, "s", "t", iters = iters + 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fixed == plus1, "fixed point not invariant under one more round")
    // a 2-node cycle swaps labels every round — synchronous LPA oscillates,
    // so the bound must fire with converged = false
    val cyc = Seq((1L, 2L), (2L, 1L)).toDF("s", "t")
    val (_, ranI, conv) = Graph.labelPropagationConverged(cyc, "s", "t", maxIters = 6)
    assert(!conv && ranI == 6)
  }
}
