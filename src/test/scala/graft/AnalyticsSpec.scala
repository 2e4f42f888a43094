package graft

import org.apache.spark.sql.functions._
import graft.operators.Analytics

class AnalyticsSpec extends SparkSuite {
  import spark.implicits._

  test("groupOutliers flags exactly the >3-sigma points per group") {
    // group "a": 10 points at 1.0 plus one extreme point. With the outlier
    // included, sigma is large; hand-check via the same exact-moment math.
    val vals = Seq.fill(30)(10.0) ++ Seq(10.5, 9.5) ++ Seq(1000.0)
    val df = vals.map(("a", _)).toDF("g", "v")
    val out = Analytics.groupOutliers(df, Seq("g"), "v").collect().head
    val n = vals.size
    val mu = vals.sum / n
    val sigma = math.sqrt(vals.map(x => x * x).sum / n - mu * mu)
    val expectedOutliers = vals.count(x => math.abs(x - mu) > 3 * sigma)
    assert(out.getAs[Long]("n") == n)
    assert(out.getAs[Long]("n_outliers") == expectedOutliers)
    assert(math.abs(out.getAs[Double]("mu_r") - mu) < 1e-3)
    assert(math.abs(out.getAs[Double]("sigma_r") - sigma) < 1e-3)
  }

  test("groupOutliers keeps groups independent") {
    val df = (Seq.fill(20)(("a", 5.0)) ++ Seq(("a", 500.0)) ++
      Seq.fill(20)(("b", 5.0))).toDF("g", "v")
    val m = Analytics.groupOutliers(df, Seq("g"), "v").collect()
      .map(r => r.getString(0) -> r.getAs[Long]("n_outliers")).toMap
    assert(m("a") >= 1L)
    assert(m("b") == 0L)
  }

  test("retentionCohorts computes exact week offsets from first event") {
    val us = 1000000L
    val day = 86400L * us
    // user 1 first event Mon 2024-01-01; active day 0, day 6 (week 0) and
    // day 8 (week 1). user 2 first event Thu 2024-01-04 (same cohort week),
    // active day 13 (week 1). user 3 first event Mon 2024-01-08 (next week).
    val base = java.time.Instant.parse("2024-01-01T00:00:00Z").toEpochMilli * 1000L
    def ts(off: Long) = new java.sql.Timestamp((base + off) / 1000L)
    val ev = Seq(
      (1L, ts(0)), (1L, ts(6 * day)), (1L, ts(8 * day)),
      (2L, ts(3 * day)), (2L, ts(3 * day + 13 * day)),
      (3L, ts(7 * day))).toDF("user_id", "ts")
    val got = Analytics.retentionCohorts(ev, "user_id", "ts")
      .orderBy("cohort_us", "week_k").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val w1 = base // cohort week of 2024-01-01 (a Monday)
    val w2 = base + 7 * day
    assert(got == Seq((w1, 0L, 2L), (w1, 1L, 2L), (w2, 0L, 1L)))
  }

  test("joinCardinality predicts the exact inner-join row count and hot key") {
    val l = Seq(1, 1, 1, 2, 3, 3, 9).map(k => (k, "x")).toDF("lk", "pl")
    val r = Seq(1, 1, 2, 3, 4).map(k => (k, "y")).toDF("rk", "pr")
    val row = Analytics.joinCardinality(l, "lk", r, "rk").collect().head
    val actual = l.join(r, col("lk") === col("rk")).count()
    assert(row.getAs[Long]("est_rows") == actual) // 3*2 + 1*1 + 2*1 = 9
    assert(row.getAs[Long]("matched_keys") == 3L)
    assert(row.getAs[Long]("max_key_pairs") == 6L) // key 1: 3*2
  }

  test("joinCardinalityApprox tracks the exact estimate within sketch+uniformity error") {
    val li = Engine.table(spark, sfDir, "lineitem")
    val p = Engine.table(spark, sfDir, "part")
    val exact = Analytics.joinCardinality(li, "l_partkey", p, "p_partkey")
      .collect().head
    val approx = Analytics.joinCardinalityApprox(li, "l_partkey", p, "p_partkey")
      .collect().head
    val estRows = approx.getAs[Long]("est_rows_approx").toDouble
    val exactRows = exact.getAs[Long]("est_rows").toDouble
    assert(math.abs(estRows - exactRows) / exactRows < 0.15,
      s"approx $estRows vs exact $exactRows")
    val mk = approx.getAs[Long]("matched_keys_est").toDouble
    val mkExact = exact.getAs[Long]("matched_keys").toDouble
    assert(math.abs(mk - mkExact) / mkExact < 0.15, s"keys $mk vs $mkExact")
  }

  test("ohlcBars picks open/close by (ts, tiebreak) and buckets exactly") {
    val us = 1000000L
    val hour = 3600L * us
    def ts(u: Long) = new java.sql.Timestamp(u / 1000L)
    val ev = Seq(
      // key 1, hour 0: open=first by ts, close=last; includes a ts TIE at
      // 30min where the higher event_id must win close
      (1L, ts(5 * 60 * us), 3L, 10.0),
      (1L, ts(30 * 60 * us), 1L, 99.0),
      (1L, ts(30 * 60 * us), 2L, 7.0), // tie: event_id 2 > 1 → close=7.0
      // key 1, hour 1: single point
      (1L, ts(hour + 60 * us), 4L, 42.0),
      // key 2, hour 0
      (2L, ts(10 * 60 * us), 5L, -1.0))
      .toDF("user_id", "ts", "event_id", "value")
    val got = Analytics.ohlcBars(ev, Seq("user_id"), "ts", "value",
      "event_id", hour)
      .orderBy("user_id", "bucket_us").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5), r.getLong(6))).toSeq
    assert(got == Seq(
      (1L, 0L, 10.0, 99.0, 7.0, 7.0, 3L),
      (1L, hour, 42.0, 42.0, 42.0, 42.0, 1L),
      (2L, 0L, -1.0, -1.0, -1.0, -1.0, 1L)))
  }

  test("rollingAnomalies flags a spike against its trailing context only") {
    val us = 1000000L
    def ts(i: Long) = new java.sql.Timestamp(i * 60000L) // minute i
    // user 1: steady 10.0 with one 100.0 spike, then steady again — only
    // the spike is anomalous. user 2: two points, never enough spread.
    val ev = ((1 to 8).map(i => (1L, ts(i), i.toLong, 10.0)) ++
      Seq((1L, ts(9), 9L, 100.0)) ++
      (10 to 12).map(i => (1L, ts(i), i.toLong, 10.0)) ++
      Seq((2L, ts(1), 100L, 5.0), (2L, ts(2), 101L, 6.0)))
      .toDF("user_id", "ts", "event_id", "value")
    val got = Analytics.rollingAnomalies(ev, Seq("user_id"), "ts",
      "event_id", "value", 10, 2.0)
      .orderBy("event_id").collect()
      .map(r => r.getLong(1) -> r.getBoolean(3)).toMap
    assert(got(9L)) // the spike
    assert((1L to 8L).forall(i => !got(i)))
    // 10..12: spike still in the trailing window inflates sigma, values sit
    // near the mean — not anomalous; and user 2 is all-false
    assert((10L to 12L).forall(i => !got(i)))
    assert(!got(100L) && !got(101L))
  }

  test("histogram bins over the global range, clamps the max into the last bin") {
    val df = (Seq(("a", 0.0), ("a", 1.0), ("a", 3.999), ("a", 4.0),
      ("b", 2.0))).toDF("g", "v") // range [0,4], 4 bins of width 1
    val got = Analytics.histogram(df, Seq("g"), "v", 4)
      .orderBy("g", "bin").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq(
      ("a", 0L, 1L), ("a", 1L, 1L), ("a", 3L, 2L), // 4.0 clamped into bin 3
      ("b", 2L, 1L)))
  }

  test("histogram degenerate range lands in bin 0") {
    val df = Seq(("a", 7.0), ("a", 7.0)).toDF("g", "v")
    val got = Analytics.histogram(df, Seq("g"), "v", 8).collect()
    assert(got.length == 1 && got.head.getLong(1) == 0L && got.head.getLong(2) == 2L)
  }

  test("cooccurrence counts unordered pairs once and computes lift") {
    // baskets: {A,B}, {A,B}, {A,C}, {B} → n_total=4, nA=3, nB=3, nC=1
    val facts = Seq(
      (1, "A"), (1, "B"), (1, "B"), // dup (1,B) must collapse
      (2, "A"), (2, "B"),
      (3, "A"), (3, "C"),
      (4, "B")).toDF("b", "attr")
    val got = Analytics.cooccurrence(facts, "b", "attr")
      .orderBy("attr_a", "attr_b").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    // lift(A,B) = (2*4)/(3*3) = 0.888889 → 888889
    assert(got.toSeq == Seq(
      ("A", "B", 2L, 888889L),
      ("A", "C", 1L, 1333333L)))
  }

  test("equi-depth histogram: distinct values balance; ties collapse to the left bucket") {
    val even = spark.range(1, 101).toDF("v") // 1..100 distinct
    val gotEven = Analytics.equiDepthHistogram(even, "v", 4)
      .orderBy("bucket").collect().map(r => (r.getInt(0), r.getLong(1)))
    assert(gotEven.toSeq == Seq((0, 25L), (1, 25L), (2, 25L), (3, 25L)))
    // heavy ties: median of {1,1,1,1,2} is 1 → values ≤ 1 all go left
    val ties = Seq(1, 1, 1, 1, 2).toDF("v")
    val gotTies = Analytics.equiDepthHistogram(ties, "v", 2)
      .orderBy("bucket").collect().map(r => (r.getInt(0), r.getLong(1)))
    assert(gotTies.toSeq == Seq((0, 4L), (1, 1L)))
  }

  test("quantileNormalize: hand-computed interpolation, ties, single-row groups") {
    // global sorted values [1,2,3,4]; A=[1,3], B=[2,4]. percent_rank within
    // each group is {0, 1}; h = pr·3 ∈ {0, 3} → both groups map exactly to
    // the global extremes [1, 4] — identical post-normalization, the op's
    // defining property.
    val df = Seq(("a", 1L), ("a", 3L), ("b", 2L), ("b", 4L)).toDF("g", "v")
    val got = Analytics.quantileNormalize(df, "g", "v")
      .orderBy("g", "v").collect().map(r => (r.getString(0), r.getDouble(2)))
    assert(got.toSeq == Seq(("a", 1.0), ("a", 4.0), ("b", 1.0), ("b", 4.0)))

    // interpolation mid-gap: A=[10,20,30] → pr {0, .5, 1}, h over the global
    // sorted [5,10,20,30,40,45] (n=6): h=2.5 → between 20 and 30 → 25
    val df2 = Seq(("a", 10L), ("a", 20L), ("a", 30L),
      ("b", 5L), ("b", 40L), ("c", 45L)).toDF("g", "v")
    val mid = Analytics.quantileNormalize(df2, "g", "v")
      .filter(col("g") === "a" && col("v") === 20L).head.getDouble(2)
    assert(mid == 25.0, s"expected 25.0, got $mid")
    // single-row group c → pr 0 → global minimum
    val single = Analytics.quantileNormalize(df2, "g", "v")
      .filter(col("g") === "c").head.getDouble(2)
    assert(single == 5.0)

    // ties within a group share percent_rank → identical normalized value
    val df3 = Seq(("a", 7L), ("a", 7L), ("a", 9L), ("b", 1L)).toDF("g", "v")
    val ties = Analytics.quantileNormalize(df3, "g", "v")
      .filter(col("v") === 7L).collect().map(_.getDouble(2)).toSeq
    assert(ties.distinct.size == 1)
  }

  test("observed metrics piggyback on the frame's own action and match direct aggs") {
    val li = Engine.table(spark, sfDir, "lineitem")
    val (obsDf, fetch) = Analytics.observed(li,
      "n" -> count(lit(1)),
      "qmax" -> max(col("l_quantity")),
      "nulls" -> sum(when(col("l_returnflag").isNull, 1L).otherwise(0L)))
    obsDf.write.mode("overwrite").format("noop").save()
    val m = fetch()
    assert(m.columns.toSeq == Seq("n", "qmax", "nulls"))
    val row = m.head
    assert(row.getLong(0) == li.count())
    assert(row.getDouble(1) ==
      li.agg(max(col("l_quantity"))).head.getDouble(0))
    assert(row.getLong(2) == 0L)
  }
}
