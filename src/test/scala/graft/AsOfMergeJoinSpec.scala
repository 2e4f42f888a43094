package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

import graft.operators.Joins
import graft.plans.{AsOfMergeJoin, AsOfMergeJoinExec}

/** The custom physical as-of join (AsOfJoinNode → AsOfJoinStrategy →
  * AsOfMergeJoinExec): semantics identical to the window-composed
  * Joins.asofJoin (backward inclusive), plan shape asserted (one exchange
  * per side, no union/window machinery).
  */
class AsOfMergeJoinSpec extends SparkSuite {
  import spark.implicits._

  // trades/quotes shape: duplicate times, keys missing on either side
  private lazy val trades = Seq(
    (1L, 10L, "t1"), (1L, 20L, "t2"), (1L, 20L, "t2b"), (1L, 5L, "t0"),
    (2L, 15L, "t3"), (3L, 7L, "t4"))
    .toDF("k", "t", "trade")
  // the two rt=20 rows carry the SAME px: the exec absorbs both and the
  // equal-time winner is sort-order-dependent, so distinct values there
  // would make outcomes partitioning-dependent (dedupe ties in real use —
  // q254 does; the window form pins ties via tieBreak instead)
  private lazy val quotes = Seq(
    (1L, 8L, 100.0), (1L, 20L, 101.0), (1L, 20L, 101.0), (1L, 25L, 103.0),
    (2L, 16L, 200.0), (4L, 1L, 400.0))
    .toDF("k", "t", "px")

  test("backward inclusive, last same-time right row wins; inner drops unmatched") {
    val got = AsOfMergeJoin.join(trades, quotes, Seq("k"), "t", "t", Seq("px"))
    assertSameRows(got, Seq(
      Seq(1L, 10L, "t1", 100.0),
      Seq(1L, 20L, "t2", 101.0), // equal-time rows absorbed; same px either way
      Seq(1L, 20L, "t2b", 101.0)))
    // t0 (before first quote), k=2 t=15 (quote at 16), k=3 (no quotes) dropped
  }

  test("left outer keeps unmatched left rows with null values") {
    val got = AsOfMergeJoin.join(trades, quotes, Seq("k"), "t", "t", Seq("px"), how = "left")
    assertSameRows(got, Seq(
      Seq(1L, 5L, "t0", null),
      Seq(1L, 10L, "t1", 100.0),
      Seq(1L, 20L, "t2", 101.0),
      Seq(1L, 20L, "t2b", 101.0),
      Seq(2L, 15L, "t3", null),
      Seq(3L, 7L, "t4", null)))
  }

  test("empty right side: inner empty, left all-null") {
    val noQuotes = quotes.filter(col("k") < 0)
    assert(AsOfMergeJoin.join(trades, noQuotes, Seq("k"), "t", "t", Seq("px")).count() == 0)
    assert(AsOfMergeJoin.join(trades, noQuotes, Seq("k"), "t", "t", Seq("px"), how = "left")
      .filter(col("px").isNull).count() == trades.count())
  }

  test("forward direction: earliest right row at-or-after, cursor not consumed") {
    val got = AsOfMergeJoin.join(trades, quotes, Seq("k"), "t", "t", Seq("px"),
      how = "left", direction = "forward")
    assertSameRows(got, Seq(
      Seq(1L, 5L, "t0", 100.0),   // next quote at 8
      Seq(1L, 10L, "t1", 101.0),  // next quote at 20: first in sort order
      Seq(1L, 20L, "t2", 101.0),  // inclusive: quote AT 20
      Seq(1L, 20L, "t2b", 101.0),
      Seq(2L, 15L, "t3", 200.0),
      Seq(3L, 7L, "t4", null)))
  }

  test("tolerance bounds the match distance in time units") {
    val bwd = AsOfMergeJoin.join(trades, quotes, Seq("k"), "t", "t", Seq("px"),
      how = "left", tolerance = Some(2L))
    // t1@10: last quote at 8, distance 2 → kept; t2@20: quote at 20 → kept
    assertSameRows(bwd, Seq(
      Seq(1L, 5L, "t0", null),
      Seq(1L, 10L, "t1", 100.0),
      Seq(1L, 20L, "t2", 101.0),
      Seq(1L, 20L, "t2b", 101.0),
      Seq(2L, 15L, "t3", null),
      Seq(3L, 7L, "t4", null)))
    val fwd = AsOfMergeJoin.join(trades, quotes, Seq("k"), "t", "t", Seq("px"),
      how = "inner", direction = "forward", tolerance = Some(1L))
    // only matches within +1: t3@15 → quote@16; t2/t2b@20 → quote@20
    assertSameRows(fwd, Seq(
      Seq(1L, 20L, "t2", 101.0),
      Seq(1L, 20L, "t2b", 101.0),
      Seq(2L, 15L, "t3", 200.0)))
  }

  test("null times: match without tolerance (-infinity sorts first), never WITH tolerance") {
    // null right time sorts before every real time, so it is a valid
    // backward candidate when no bound is set; any finite tolerance must
    // reject it (and a null LEFT time too) — the null slot of an UnsafeRow
    // decodes as 0, which would otherwise silently mean "epoch".
    val l = Seq((1L, Some(10L), "a"), (1L, Option.empty[Long], "b")).toDF("k", "t", "trade")
    val r = Seq((1L, Option.empty[Long], 1.0)).toDF("k", "t", "px")
    val free = AsOfMergeJoin.join(l, r, Seq("k"), "t", "t", Seq("px"), how = "left")
    assertSameRows(free, Seq(Seq(1L, 10L, "a", 1.0), Seq(1L, null, "b", 1.0)))
    val bounded = AsOfMergeJoin.join(l, r, Seq("k"), "t", "t", Seq("px"),
      how = "left", tolerance = Some(1000000L))
    assertSameRows(bounded, Seq(Seq(1L, 10L, "a", null), Seq(1L, null, "b", null)))
    val fwd = AsOfMergeJoin.join(l, r, Seq("k"), "t", "t", Seq("px"),
      how = "left", direction = "forward", tolerance = Some(1000000L))
    // forward: the null-time right row sorts before both left rows, so it is
    // not even a forward candidate for t=10; for the null-time LEFT row it
    // is at-or-after, but the tolerance still rejects it
    assertSameRows(fwd, Seq(Seq(1L, 10L, "a", null), Seq(1L, null, "b", null)))
  }

  test("null keys group together (window-partition semantics)") {
    val l = Seq((Option.empty[Long], 10L, "x"), (Some(1L), 10L, "y")).toDF("k", "t", "trade")
    val r = Seq((Option.empty[Long], 5L, 1.0), (Some(1L), 6L, 2.0)).toDF("k", "t", "px")
    val got = AsOfMergeJoin.join(l, r, Seq("k"), "t", "t", Seq("px"))
    assertSameRows(got, Seq(Seq(null, 10L, "x", 1.0), Seq(1L, 10L, "y", 2.0)))
  }

  test("matches the window-composed asofJoin on the events table") {
    val ev = Engine.events(spark, sfDir)
    val clicks = ev.filter(col("event_type") === "click")
      .select("user_id", "ts", "event_id")
    val purchases = ev.filter(col("event_type") === "purchase")
      .groupBy("user_id", "ts").agg(max(col("value")).as("p_value"))
    for (how <- Seq("inner", "left")) {
      val viaExec = AsOfMergeJoin.join(
        clicks, purchases, Seq("user_id"), "ts", "ts", Seq("p_value"), how)
      val viaWindow = Joins.asofJoin(
        clicks, purchases, Seq("user_id"), "ts", "ts", Seq("p_value"), how)
      // both orderings of the same key set
      assert(viaExec.exceptAll(viaWindow).isEmpty && viaWindow.exceptAll(viaExec).isEmpty,
        s"asof exec != window form for how=$how")
    }
  }

  test("plan: AsOfMergeJoinExec with exactly one exchange per side, pruned right scan") {
    val ev = Engine.events(spark, sfDir)
    val clicks = ev.filter(col("event_type") === "click")
      .select("user_id", "ts", "event_id")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select("user_id", "ts", "value")
    val joined = AsOfMergeJoin.join(
      clicks, purchases, Seq("user_id"), "ts", "ts", Seq("value"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfMergeJoin"), s"expected AsOfMergeJoinExec in:\n$plan")
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 2,
      s"expected two exchanges (one per side) in:\n$plan")
    assert(!plan.contains("Window"), s"no window machinery expected in:\n$plan")
    // declared output ordering: a downstream per-key window over the same
    // (key, time) order must not re-exchange — one extra sort at most
    val downstream = joined.withColumn("rn",
      row_number().over(org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("ts")))
    val dPlan = downstream.queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(dPlan).size == 2,
      s"downstream window must reuse the join's partitioning:\n$dPlan")
  }

  test("bucketed co-located sides: the exec plans with ZERO exchanges") {
    // both sides bucketed on the join key: the scans' HashPartitioning
    // satisfies the exec's ClusteredDistribution, so EnsureRequirements
    // inserts no exchange at all — the co-located as-of join a 100 TB
    // trades/quotes layout would pre-bucket for (only the local per-bucket
    // sort remains)
    val ev = Engine.events(spark, sfDir)
    val clicks = ev.filter(col("event_type") === "click")
      .select("user_id", "ts", "event_id")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select("user_id", "ts", "value")
    val pDedup = purchases.groupBy("user_id", "ts").agg(max("value").as("value"))
    try {
      graft.sources.IO.writeBucketed(clicks, "graft_asof_clicks",
        buckets = 8, bucketCols = Seq("user_id"), sortCols = Seq("user_id", "ts"))
      graft.sources.IO.writeBucketed(pDedup, "graft_asof_purchases",
        buckets = 8, bucketCols = Seq("user_id"), sortCols = Seq("user_id", "ts"))
      val joined = AsOfMergeJoin.join(
        spark.table("graft_asof_clicks"), spark.table("graft_asof_purchases"),
        Seq("user_id"), "ts", "ts", Seq("value"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("AsOfMergeJoin"), s"expected the exec in:\n$plan")
      assert(!plan.contains("Exchange"), s"bucketed sides must not exchange:\n$plan")
      // and the co-located plan still produces the window-composed answer
      val viaWindow = graft.operators.Joins.asofJoin(
        clicks, pDedup, Seq("user_id"), "ts", "ts", Seq("value"))
      assert(joined.count() > 0)
      assert(joined.exceptAll(viaWindow).isEmpty &&
        viaWindow.exceptAll(joined).isEmpty)
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_asof_clicks")
      spark.sql("DROP TABLE IF EXISTS graft_asof_purchases")
    }
  }
}
