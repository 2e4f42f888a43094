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
}
