package graft

import org.apache.spark.sql.functions._
import graft.operators.Joins

/** Join semantics per reference join.hpp:25-46: 5 types, nulls_equal,
  * broadcast variants. Fixtures mirror FIXTURES.md §3 (J1/J3 shapes).
  */
class JoinsSpec extends SparkSuite {
  import spark.implicits._

  // J3: duplicate keys on build side + an unmatched key each side
  private lazy val lhs = Seq(
    (1L, "a1"), (2L, "a2"), (3L, "a3"), (4L, "a4"), (5L, "a5"))
    .toDF("k", "payload_a")
  private lazy val rhs = Seq(
    (1L, "b1"), (1L, "b1x"), (2L, "b2"), (5L, "b5"), (6L, "b6"))
    .toDF("k", "payload_b")

  test("inner join with duplicate build keys") {
    assertSameRows(
      Joins.join(lhs, rhs, Seq("k"), "inner"),
      Seq(
        Seq(1L, "a1", "b1"), Seq(1L, "a1", "b1x"),
        Seq(2L, "a2", "b2"), Seq(5L, "a5", "b5")))
  }

  test("left join keeps unmatched probe rows with nulls") {
    assertSameRows(
      Joins.join(lhs, rhs, Seq("k"), "left"),
      Seq(
        Seq(1L, "a1", "b1"), Seq(1L, "a1", "b1x"), Seq(2L, "a2", "b2"),
        Seq(3L, "a3", null), Seq(4L, "a4", null), Seq(5L, "a5", "b5")))
  }

  test("full join keeps both unmatched sides") {
    val full = Joins.join(lhs, rhs, Seq("k"), "full")
    assert(full.count() == 7) // 4 matches + lhs {3,4} + rhs {6}
    assert(full.filter(col("payload_a").isNull).count() == 1)
    assert(full.filter(col("payload_b").isNull).count() == 2)
  }

  test("semi and anti partition the probe side") {
    assertSameRows(
      Joins.join(lhs, rhs, Seq("k"), "semi"),
      Seq(Seq(1L, "a1"), Seq(2L, "a2"), Seq(5L, "a5")))
    assertSameRows(
      Joins.join(lhs, rhs, Seq("k"), "anti"),
      Seq(Seq(3L, "a3"), Seq(4L, "a4")))
  }

  test("nulls_equal=true matches null keys (reference default, join.hpp:85)") {
    val l = Seq((Some(1L), "a1"), (None, "aN")).toDF("k", "payload_a")
    val r = Seq((Some(1L), "b1"), (None, "bN")).toDF("k", "payload_b")
    // plain equality: null keys never match
    assert(Joins.join(l, r, Seq("k"), "inner").count() == 1)
    // null-safe: null keys match each other
    assertSameRows(
      Joins.join(l, r, Seq("k"), "inner", nullsEqual = true),
      Seq(Seq(1L, "a1", "b1"), Seq(null, "aN", "bN")))
  }

  test("join matrix sweep: {5 types} x {broadcast auto/L/R} x {nullsEqual} x {1,2,4,8 partitions}") {
    // the reference's full join test matrix (python/tests/test_join.py:71-120
    // sweeps type x broadcast x nulls_equal x machine scope): one 2-key
    // fixture with null keys, duplicate keys, and an unmatched row on each
    // side; the canonical result per (type, nullsEqual) must be invariant
    // to broadcast mode and incoming partition count. (FULL cannot
    // broadcast-hash in Spark — the hint is ignored there, which is itself
    // part of the contract: mode never changes results.)
    import graft.operators.Joins.{Auto, BroadcastLeft, BroadcastRight}
    val l0 = Seq((Option(1L), Option("x"), "a1"), (Option(1L), Option("y"), "a2"),
      (Option(2L), Option("x"), "a3"), (Option.empty[Long], Option("x"), "aN1"),
      (Option(3L), Option.empty[String], "aN2"), (Option(9L), Option("z"), "a9"))
      .toDF("k1", "k2", "payload_a")
    val r0 = Seq((Option(1L), Option("x"), "b1"), (Option(1L), Option("x"), "b1x"),
      (Option(2L), Option("x"), "b2"), (Option.empty[Long], Option("x"), "bN1"),
      (Option(3L), Option.empty[String], "bN2"), (Option(8L), Option("w"), "b8"))
      .toDF("k1", "k2", "payload_b")
    val keys = Seq("k1", "k2")
    for (how <- Seq("inner", "left", "full", "semi", "anti");
         ne <- Seq(false, true)) {
      val expected = rows(Joins.join(l0, r0, keys, how, ne)).map(_.toString).sorted
      assert(expected.nonEmpty, s"degenerate fixture for how=$how ne=$ne")
      for (bc <- Seq(Auto, BroadcastLeft, BroadcastRight); np <- Seq(1, 2, 4, 8)) {
        val got = Joins.join(
          l0.repartition(np), r0.repartition(np), keys, how, ne, bc)
        assert(rows(got).map(_.toString).sorted == expected,
          s"join mismatch at how=$how nullsEqual=$ne bcast=$bc partitions=$np")
      }
    }
  }

  test("broadcast hint changes the physical plan, not the result") {
    val auto = Joins.join(lhs, rhs, Seq("k"), "inner")
    val bc = Joins.join(lhs, rhs, Seq("k"), "inner", bcast = Joins.BroadcastRight)
    assert(rows(bc).map(_.toString).sorted == rows(auto).map(_.toString).sorted)
    val plan = bc.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"expected broadcast in plan:\n$plan")
  }

  test("multi-key join, key order != column order (J4 regression)") {
    val l = Seq((1L, 10L, "x"), (2L, 20L, "y")).toDF("a_a", "b_a", "p")
    val r = Seq((10L, 1L, "u"), (20L, 99L, "v")).toDF("a_b", "b_b", "q")
    val j = Joins.joinOn(l, r, col("a_a") === col("b_b") && col("b_a") === col("a_b"))
    assertSameRows(j.select("p", "q"), Seq(Seq("x", "u")))
  }

  test("asofJoin: backward inclusive, ties, null right values, inner vs left") {
    import spark.implicits._
    // trades (left): key, t, label      quotes (right): key, t, px
    val trades = Seq(("a", 10L, "t1"), ("a", 20L, "t2"), ("a", 5L, "t0"),
      ("b", 10L, "t3"), ("c", 10L, "t4")).toDF("k", "t", "label")
    val quotes = Seq(("a", 10L, Some(1.5)), ("a", 15L, Some(2.5)),
      ("b", 3L, None), ("b", 7L, Some(9.0))).toDF("k", "t", "px")
    val inner = Joins.asofJoin(trades, quotes, Seq("k"), "t", "t", Seq("px"))
    assertSameRows(inner.select("k", "t", "label", "px"), Seq(
      Seq("a", 10L, "t1", 1.5),  // inclusive: quote AT t=10 visible
      Seq("a", 20L, "t2", 2.5),  // latest preceding (15), not first (10)
      Seq("b", 10L, "t3", 9.0))) // c and a@5 have no preceding quote
    val left = Joins.asofJoin(trades, quotes, Seq("k"), "t", "t", Seq("px"), how = "left")
    assert(left.count() == 5)
    assertSameRows(left.filter($"label" === "t0").select("k", "px"), Seq(Seq("a", null)))
    // a matched right row whose VALUE is null is still a match (not dropped)
    val nullMatch = Joins.asofJoin(
      Seq(("b", 5L, "x")).toDF("k", "t", "label"), quotes, Seq("k"), "t", "t", Seq("px"))
    assertSameRows(nullMatch.select("k", "t", "label", "px"), Seq(Seq("b", 5L, "x", null)))
  }

  test("asofJoin tolerance: stale matches drop (inner) or null (left)") {
    import spark.implicits._
    val trades = Seq(("a", 6L, "t1"), ("a", 20L, "t2"), ("a", 3L, "t3"))
      .toDF("k", "t", "trade")
    val quotes = Seq(("a", 5L, 1.0), ("a", 1L, 2.0)).toDF("k", "t", "px")
    val tol: (org.apache.spark.sql.Column, org.apache.spark.sql.Column) =>
      org.apache.spark.sql.Column = (l, r) => l - r <= org.apache.spark.sql.functions.lit(3L)
    // t1@6 -> quote@5 (gap 1, keeps), t2@20 -> quote@5 (gap 15, stale),
    // t3@3 -> quote@1 (gap 2, keeps)
    val inner = Joins.asofJoin(trades, quotes, Seq("k"), "t", "t", Seq("px"),
      how = "inner", tolerance = Some(tol))
    assertSameRows(inner.select("trade", "px"), Seq(Seq("t1", 1.0), Seq("t3", 2.0)))
    val left = Joins.asofJoin(trades, quotes, Seq("k"), "t", "t", Seq("px"),
      how = "left", tolerance = Some(tol))
    assertSameRows(left.select("trade", "px"),
      Seq(Seq("t1", 1.0), Seq("t2", null), Seq("t3", 2.0)))
  }

  test("rangeJoin equals the naive range predicate at any bin width") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val rnd = new scala.util.Random(7)
    val left = Seq.tabulate(200)(i =>
      (i.toLong, rnd.nextInt(3), rnd.nextDouble() * 100 - 50)).toDF("lid", "k", "v")
    val right = Seq.tabulate(40) { i =>
      val lo = rnd.nextDouble() * 100 - 50
      (1000L + i, rnd.nextInt(3), lo, lo + rnd.nextDouble() * 20)
    }.toDF("rid", "k", "lo", "hi")
    val naive = left.as("l").join(right.as("r"),
        col("l.k") === col("r.k") &&
          col("l.v") >= col("r.lo") && col("l.v") <= col("r.hi"))
      .select(col("l.lid"), col("l.k"), col("l.v"), col("r.rid"), col("r.lo"), col("r.hi"))
    val expected = rows(naive).map(_.toString).sorted
    for (bw <- Seq(0.5, 7.0, 1000.0)) {
      val got = Joins.rangeJoin(left, right, "v", "lo", "hi", bw, equiKeys = Seq("k"))
      assert(got.columns.toSeq == Seq("lid", "k", "v", "rid", "lo", "hi"))
      assert(rows(got).map(_.toString).sorted == expected, s"mismatch at binWidth=$bw")
    }
    assert(naive.count() > 0)
  }

  test("intervalJoin equals the naive overlap predicate at any bin width") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val rnd = new scala.util.Random(11)
    val left = Seq.tabulate(150) { i =>
      val lo = rnd.nextDouble() * 100 - 50
      (i.toLong, rnd.nextInt(3), lo, lo + rnd.nextDouble() * 15)
    }.toDF("lid", "k", "llo", "lhi")
    val right = Seq.tabulate(40) { i =>
      val lo = rnd.nextDouble() * 100 - 50
      (1000L + i, rnd.nextInt(3), lo, lo + rnd.nextDouble() * 25)
    }.toDF("rid", "k", "rlo", "rhi")
    val naive = left.as("l").join(right.as("r"),
        col("l.k") === col("r.k") &&
          col("l.llo") <= col("r.rhi") && col("r.rlo") <= col("l.lhi"))
      .select(col("l.lid"), col("l.k"), col("l.llo"), col("l.lhi"),
        col("r.rid"), col("r.rlo"), col("r.rhi"))
    val expected = rows(naive).map(_.toString).sorted
    for (bw <- Seq(0.5, 7.0, 1000.0)) {
      val got = Joins.intervalJoin(left, right, "llo", "lhi", "rlo", "rhi",
        bw, equiKeys = Seq("k"))
      assert(got.columns.toSeq ==
        Seq("lid", "k", "llo", "lhi", "rid", "rlo", "rhi"))
      assert(rows(got).map(_.toString).sorted == expected,
        s"mismatch at binWidth=$bw")
    }
    assert(naive.count() > 0)
  }

  test("intervalJoin: touching endpoints match; inverted and null intervals do not") {
    import spark.implicits._
    val left = Seq(
      (1L, Some(0.0), Some(2.0)),  // overlaps r10 ([2,4] touch) and r40
      (2L, Some(9.0), Some(5.0)),  // inverted: no matches
      (3L, None, Some(3.0)),       // null bound: no matches
      (4L, Some(10.0), Some(10.0)) // point interval, inside r30
    ).toDF("lid", "llo", "lhi")
    val right = Seq(
      (10L, Some(2.0), Some(4.0)),
      (20L, Some(8.0), Some(6.0)),  // inverted: never matches
      (30L, Some(9.5), Some(11.0)),
      (40L, Some(-5.0), Some(0.0)), // touches lid=1 at 0
      (50L, None, None)
    ).toDF("rid", "rlo", "rhi")
    assertSameRows(
      Joins.intervalJoin(left, right, "llo", "lhi", "rlo", "rhi", binWidth = 3.0)
        .select("lid", "rid"),
      Seq(Seq(1L, 10L), Seq(1L, 40L), Seq(4L, 30L)))
  }

  test("intervalJoin plans an equi join on the bin key, never a nested loop") {
    import spark.implicits._
    val left = Seq((1L, 0.0, 5.0)).toDF("lid", "llo", "lhi")
    val right = Seq((2L, 3.0, 9.0)).toDF("rid", "rlo", "rhi")
    val plan = Joins.intervalJoin(left, right, "llo", "lhi", "rlo", "rhi", 4.0)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"),
      s"expected a hash/sort-merge join on the bin key, got:\n$plan")
  }

  test("rangeJoin: inclusive boundaries, empty intervals dropped, negative values") {
    import spark.implicits._
    val left = Seq((1L, -2.0), (2L, 0.0), (3L, 2.0), (4L, 5.0)).toDF("lid", "v")
    val right = Seq((10L, -2.0, 2.0), (20L, 3.0, 1.0), (30L, 5.0, 5.0))
      .toDF("rid", "lo", "hi") // (20) is inverted → no matches
    assertSameRows(
      Joins.rangeJoin(left, right, "v", "lo", "hi", binWidth = 2.0).select("lid", "rid"),
      Seq(Seq(1L, 10L), Seq(2L, 10L), Seq(3L, 10L), Seq(4L, 30L)))
  }

  test("asofJoin directions: forward/nearest picks, equal-time inclusive, nearest tolerance gating") {
    import spark.implicits._
    val trades = Seq(("a", 10L, 1L), ("a", 25L, 2L), ("a", 40L, 3L), ("b", 5L, 4L))
      .toDF("k", "t", "tid")
    val quotes = Seq(("a", 10L, 1.0), ("a", 30L, 2.0), ("a", 100L, 3.0), ("b", 1L, 4.0))
      .toDF("k", "t", "px")
    def run(dir: String, how: String = "left",
        tol: Option[(org.apache.spark.sql.Column, org.apache.spark.sql.Column) =>
          org.apache.spark.sql.Column] = None) =
      rows(Joins.asofJoin(trades, quotes, Seq("k"), "t", "t", Seq("px"),
        how = how, tolerance = tol, direction = dir).orderBy("tid"))
        .map(r => (r(2), r(3)))
    // forward: earliest quote at-or-after; trade at t=10 takes the equal-time
    // quote; t=40 jumps to 100; key b has no later quote -> null
    assert(run("forward") ==
      Seq((1L, 1.0), (2L, 2.0), (3L, 3.0), (4L, null)))
    // nearest: t=25 is 15 from quote@10 and 5 from quote@30 -> 2.0;
    // t=40 is 10 from 30 and 60 from 100 -> 2.0; b only has earlier -> 4.0
    assert(run("nearest") ==
      Seq((1L, 1.0), (2L, 2.0), (3L, 2.0), (4L, 4.0)))
    // equidistant tie goes backward: t=20 sits 10 from both 10 and 30
    val mid = Seq(("a", 20L, 9L)).toDF("k", "t", "tid")
    assert(rows(Joins.asofJoin(mid, quotes, Seq("k"), "t", "t", Seq("px"),
      how = "inner", direction = "nearest")).map(_(3)) == Seq(1.0))
    // nearest + tolerance: for t=40, the nearer quote@30 is outside a
    // forward-only tolerance while quote@100 is valid -> the farther valid
    // candidate must win (tolerance gates BEFORE the nearest pick)
    val fwdOnly: (org.apache.spark.sql.Column, org.apache.spark.sql.Column) =>
      org.apache.spark.sql.Column = (l, r) => r >= l
    assert(run("nearest", tol = Some(fwdOnly)) ==
      Seq((1L, 1.0), (2L, 2.0), (3L, 3.0), (4L, null)))
    // inner drops unmatched
    assert(run("forward", how = "inner") ==
      Seq((1L, 1.0), (2L, 2.0), (3L, 3.0)))
    // forward == backward on negated times (the classic reduction)
    val fwd = Joins.asofJoin(trades, quotes, Seq("k"), "t", "t", Seq("px"),
      how = "left", direction = "forward")
    val neg = Joins.asofJoin(
      trades.withColumn("t", -col("t")), quotes.withColumn("t", -col("t")),
      Seq("k"), "t", "t", Seq("px"), how = "left")
      .withColumn("t", -col("t"))
    assert(rows(fwd.orderBy("tid")).map(_.toString) ==
      rows(neg.select(fwd.columns.map(col): _*).orderBy("tid")).map(_.toString))
  }

  test("asofJoinBucketed equals asofJoin (hot key, boundaries, empty buckets, tolerance, keys=Nil)") {
    import spark.implicits._
    import org.apache.spark.sql.Column
    // randomized-but-deterministic fixture: one hot key ("h") with half the
    // rows, times chosen so buckets of width 10 hit boundaries (t % 10 == 0),
    // long empty-bucket gaps on key "c", and a keys-free degenerate case
    def mk(n: Int, keyOf: Int => String, tOf: Int => Long) =
      (0 until n).map(i => (keyOf(i), tOf(i), i.toLong))
    val trades = (mk(60, i => if (i % 2 == 0) "h" else s"k${i % 5}", i => (i * 7L) % 100) ++
      Seq(("c", 95L, 1000L))).toDF("k", "t", "tid")
    val quotes = (mk(40, i => if (i % 2 == 0) "h" else s"k${i % 5}", i => (i * 13L) % 100)
      .map { case (k, t, v) => (k, t, v.toDouble) } ++
      Seq(("c", 2L, -1.0))).toDF("k", "t", "px")
    val bucket: Column => Column = t => floor(t / lit(10L))
    val tol: (Column, Column) => Column = (l, r) => l - r <= lit(25L)
    for (how <- Seq("inner", "left"); useTol <- Seq(false, true)) {
      val tolOpt = if (useTol) Some(tol) else None
      val plain = Joins.asofJoin(trades, quotes, Seq("k"), "t", "t", Seq("px"),
        how = how, tieBreak = Seq("px"), tolerance = tolOpt)
      val bucketed = Joins.asofJoinBucketed(trades, quotes, Seq("k"), "t", "t",
        Seq("px"), bucket, how = how, tieBreak = Seq("px"), tolerance = tolOpt)
      assert(rows(bucketed).map(_.toString).sorted == rows(plain).map(_.toString).sorted,
        s"mismatch at how=$how tolerance=$useTol")
    }
    // keys = Nil: the degenerate single-sequence case the plain form funnels
    // into one task — must still agree
    val plain0 = Joins.asofJoin(trades.drop("k"), quotes.drop("k"), Nil, "t", "t", Seq("px"))
    val bucketed0 = Joins.asofJoinBucketed(trades.drop("k"), quotes.drop("k"), Nil,
      "t", "t", Seq("px"), bucket)
    assert(rows(bucketed0).map(_.toString).sorted == rows(plain0).map(_.toString).sorted)
  }

  test("asofJoinBucketed keeps NULL keys and NULL times like asofJoin") {
    import spark.implicits._
    import org.apache.spark.sql.Column
    // null keys and null times form their own window groups in the plain
    // form; the bucketed variant's carry-in join must be null-safe (<=>) to
    // reproduce that — a USING join would silently drop these rows
    val trades = Seq(
      (Some("a"), Some(10L), 1L), (None, Some(10L), 2L), (None, Some(20L), 3L),
      (Some("a"), None, 4L), (None, None, 5L), (Some("b"), Some(30L), 6L)
    ).toDF("k", "t", "tid")
    val quotes = Seq(
      (Some("a"), Some(5L), 1.5), (None, Some(15L), 2.5), (Some("b"), Some(25L), 3.5)
    ).toDF("k", "t", "px")
    val bucket: Column => Column = t => floor(t / lit(10L))
    for (how <- Seq("inner", "left")) {
      val plain = Joins.asofJoin(trades, quotes, Seq("k"), "t", "t", Seq("px"), how = how)
      val bucketed = Joins.asofJoinBucketed(trades, quotes, Seq("k"), "t", "t",
        Seq("px"), bucket, how = how)
      assert(rows(bucketed).map(_.toString).sorted == rows(plain).map(_.toString).sorted,
        s"null-key/null-time mismatch at how=$how")
      if (how == "left")
        assert(bucketed.count() == trades.count(), "left join must keep every left row")
    }
    // null-key rows DO match null-key right rows (window-partition grouping)
    val inner = Joins.asofJoinBucketed(trades, quotes, Seq("k"), "t", "t",
      Seq("px"), bucket, how = "inner")
    assert(rows(inner.filter($"k".isNull).select($"px")).nonEmpty,
      "null-key trades after a null-key quote must carry its value")
  }

  test("bloomSemiJoin equals plain semi join (unmatched, null, and fp-prone keys)") {
    import spark.implicits._
    val l = Seq((Some(1L), "a1"), (Some(2L), "a2"), (None, "aN"), (Some(9L), "a9"))
      .toDF("k", "payload_a")
    val r = Seq((Some(1L), "b1"), (Some(5L), "b5"), (None, "bN")).toDF("rk", "payload_b")
    // null fact keys may pass the sketch but must not survive the exact join
    assertSameRows(
      Joins.bloomSemiJoin(l, r, "k", "rk", expectedItems = 100),
      Seq(Seq(1L, "a1")))
    // a tiny sketch (high fp rate) must still be exact — fps die in the join
    val fact = (1L to 2000L).map(i => (i, s"p$i")).toDF("k", "payload_a")
    val dim = (1L to 2000L by 7).map(i => (i, "d")).toDF("rk", "payload_b")
    val got = Joins.bloomSemiJoin(fact, dim, "k", "rk", expectedItems = 8)
    val exp = fact.join(dim, fact("k") === dim("rk"), "left_semi")
    assert(rows(got).map(_.toString).sorted == rows(exp).map(_.toString).sorted)
  }

  test("bloomSemiJoin is lazy and plans the sketch as a scalar subquery") {
    import spark.implicits._
    val fact = (1L to 100L).map(i => (i, s"p$i")).toDF("k", "payload_a")
    val dim = Seq((3L, "d")).toDF("rk", "payload_b")
    val df = Joins.bloomSemiJoin(fact, dim, "k", "rk", expectedItems = 16)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), s"no bloom probe in plan:\n$plan")
    assert(plan.toLowerCase.contains("subquery"), s"no scalar subquery in plan:\n$plan")
  }

  test("fuzzyJoin maxDist=1 equals brute force; blocking catches first- and last-char edits") {
    import spark.implicits._
    import org.apache.spark.sql.functions.levenshtein
    val a = Seq((1L, "widget"), (2L, "bolt"), (3L, "ring"), (4L, "x"))
      .toDF("a_key", "a_name")
    val b = Seq(
      (10L, "widget"),  // exact (dist 0)
      (11L, "widgget"), // interior insertion (dist 1)
      (12L, "sidget"),  // FIRST char substituted — only the last-char pass collides
      (13L, "widgex"),  // LAST char substituted — only the first-char pass collides
      (14L, "bolts"),   // trailing insertion
      (15L, "rink"),    // substitution
      (16L, "gadget"),  // dist 3: must not match
      (17L, "y"))       // len-1 substitution: collides on the empty deletion
      .toDF("b_key", "b_name")
    val got = Joins.fuzzyJoin(a, b, "a_name", "b_name", maxDist = 1)
      .select("a_key", "b_key", "dist").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // deletion-neighborhood blocking is exact for every length: brute force
    // over ALL pairs must agree, with no duplicate candidate rows either
    val gotRows = Joins.fuzzyJoin(a, b, "a_name", "b_name", maxDist = 1).count()
    assert(gotRows == got.size, "a pair collided in more than one blocking class")
    val brute = a.crossJoin(b)
      .withColumn("dist", levenshtein($"a_name", $"b_name"))
      .filter($"dist" <= 1)
      .select("a_key", "b_key", "dist").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == brute)
    assert(got.contains((1L, 12L, 1)) && got.contains((1L, 13L, 1)))
    assert(!got.exists(_._2 == 16L))
    assert(got.contains((4L, 17L, 1))) // "x" vs "y" via the empty deletion
    // no cartesian product in the plan — both passes are equi joins
    val plan = Joins.fuzzyJoin(a, b, "a_name", "b_name", maxDist = 1)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Cartesian"), s"cartesian in plan:\n$plan")
  }

  test("salted join equals plain join on skewed keys") {
    import spark.implicits._
    val skewed = (Seq.fill(500)((1L, "hot")) ++ Seq((2L, "a"), (3L, "b")))
      .zipWithIndex.map { case ((k, v), i) => (k, v + i) }.toDF("k", "payload_a")
    val dim = Seq((1L, "one"), (2L, "two"), (4L, "four")).toDF("k", "payload_b")
    val plain = Joins.join(skewed, dim, Seq("k"), "inner")
    val salted = Joins.saltedJoin(skewed, dim, Seq("k"), "inner", saltBuckets = 8)
    assert(rows(salted).map(_.toString).sorted == rows(plain).map(_.toString).sorted)
    val left = Joins.saltedJoin(skewed, dim, Seq("k"), "left", saltBuckets = 8)
    assert(left.count() == skewed.count())
  }

  test("RangeJoinRewrite: naive interval join == brute force; strict bounds; point on either side; empty intervals") {
    import graft.plans.RangeJoinRewrite
    val pts = Seq((1L, 5.0), (2L, 10.0), (3L, 10.5), (4L, -3.0), (5L, 100.0))
      .toDF("pid", "v")
    val ivs = Seq(
      (10L, 5.0, 10.0),   // inclusive hits both boundary points
      (20L, -4.0, -2.5),  // negative range
      (30L, 50.0, 40.0),  // empty interval (lo > hi) — must not match, must not throw
      (40L, 10.4, 10.6)
    ).toDF("iid", "lo", "hi")
    def run(cond: org.apache.spark.sql.Column) = {
      val withRule = pts.join(ivs, cond).select("pid", "iid")
        .as[(Long, Long)].collect().toSet
      withRule
    }
    spark.conf.set(RangeJoinRewrite.BIN_WIDTH_KEY, "4")
    try {
      val inclusive = run(col("v") >= col("lo") && col("v") <= col("hi"))
      assert(inclusive == Set((1L, 10L), (2L, 10L), (4L, 20L), (3L, 40L)), inclusive)
      // strict bounds stay strict (residual keeps the original predicate)
      val strict = run(col("v") > col("lo") && col("v") < col("hi"))
      assert(strict == Set((4L, 20L), (3L, 40L)), strict)
      // point side on the RIGHT of the join
      val flipped = ivs.join(pts, col("v") >= col("lo") && col("v") <= col("hi"))
        .select("pid", "iid").as[(Long, Long)].collect().toSet
      assert(flipped == Set((1L, 10L), (2L, 10L), (4L, 20L), (3L, 40L)), flipped)
      // the rewritten plan is a hash join, not a nested loop
      val plan = pts.join(ivs, col("v") >= col("lo") && col("v") <= col("hi"))
        .queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
        plan.take(2000))
      assert(plan.contains("HashJoin") || plan.contains("SortMergeJoin"), plan.take(2000))
    } finally spark.conf.unset(RangeJoinRewrite.BIN_WIDTH_KEY)
    // rule disabled → same rows (via BNLJ), proving the rewrite changed only the plan
    val off = run(col("v") >= col("lo") && col("v") <= col("hi"))
    assert(off == Set((1L, 10L), (2L, 10L), (4L, 20L), (3L, 40L)), off)
  }

  test("grid radius join == brute-force pairs, including cell-boundary points") {
    import graft.operators.Spatial
    // hash-scattered points plus adversarial fixtures: exact cell corners,
    // pairs straddling a cell boundary at distance == r (inclusive), and a
    // pair just over r
    val scattered = spark.range(200).select(col("id"),
      (pmod(xxhash64(col("id"), lit(1)), lit(1000)) / 100.0).as("x"),
      (pmod(xxhash64(col("id"), lit(2)), lit(1000)) / 100.0).as("y"))
    val edgeCases = Seq(
      (1000L, 0.0, 0.0), (1001L, 0.5, 0.0),   // exactly r apart across a boundary
      (1002L, 2.0, 2.0), (1003L, 2.0, 2.5),   // exactly r apart, corner points
      (1004L, 7.0, 7.0), (1005L, 7.0, 7.5001) // just over r
    ).toDF("id", "x", "y")
    val pts = scattered.unionByName(edgeCases)
    val r = 0.5
    val got = Spatial.radiusJoin(pts, r)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val a = pts.select(col("id").as("ia"), col("x").as("xa"), col("y").as("ya"))
    val b = pts.select(col("id").as("ib"), col("x").as("xb"), col("y").as("yb"))
    val brute = a.crossJoin(b)
      .filter(col("ia") =!= col("ib") &&
        (col("xa") - col("xb")) * (col("xa") - col("xb")) +
        (col("ya") - col("yb")) * (col("ya") - col("yb")) <= lit(r * r))
      .select("ia", "ib").as[(Long, Long)].collect().toSet
    assert(got == brute,
      s"missing=${(brute -- got).take(5)} extra=${(got -- brute).take(5)}")
    assert(got.contains((1000L, 1001L)) && got.contains((1002L, 1003L)))
    assert(!got.contains((1004L, 1005L)))
    // and the plan is a hash join on the cell key, never a nested loop
    val plan = Spatial.radiusJoin(pts, r).queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      plan.take(2000))
  }
}
