package graft

import org.apache.spark.sql.functions._
import graft.operators.Aggregates
import graft.operators.Aggregates.AggRequest
import graft.functions.Registry

/** Grouped aggregation + reductions per reference groupby_aggregation.cu:46-88
  * and reduction.cpp:153-161; ddof=0 variance semantics; null keys form a group.
  */
class AggregatesSpec extends SparkSuite {
  import spark.implicits._

  private lazy val df = Seq(
    ("a", Some(1.0)), ("a", Some(2.0)), ("a", None),
    ("b", Some(4.0)), ("b", Some(4.0)), (null, Some(7.0)))
    .toDF("k", "v")

  test("groupby request surface: sum/count/count_all/mean/min/max") {
    val out = Aggregates.groupby(df, Seq("k"), Seq(
      AggRequest("v", "sum", "s"),
      AggRequest("v", "count", "c"),      // valid only
      AggRequest("v", "count_all", "ca"), // rows incl. nulls
      AggRequest("v", "mean", "m"),
      AggRequest("v", "min", "mn"),
      AggRequest("v", "max", "mx")))
    assertSameRows(out, Seq(
      Seq("a", 3.0, 2L, 3L, 1.5, 1.0, 2.0),
      Seq("b", 8.0, 2L, 2L, 4.0, 4.0, 4.0),
      Seq(null, 7.0, 1L, 1L, 7.0, 7.0, 7.0))) // null key = its own group
  }

  test("variance/stddev are population (ddof=0, Arrow semantics)") {
    val out = Aggregates.groupby(df.filter($"k" === "a"), Seq("k"), Seq(
      AggRequest("v", "variance", "var"),
      AggRequest("v", "stddev", "sd")))
    val r = out.collect()(0)
    assert(math.abs(r.getDouble(1) - 0.25) < 1e-12) // var_pop of {1,2} = 0.25
    assert(math.abs(r.getDouble(2) - 0.5) < 1e-12)
  }

  test("custom product aggregate (DeclarativeAggregate) with partial/final split") {
    val out = Aggregates.groupby(df, Seq("k"), Seq(AggRequest("v", "product", "p")))
    assertSameRows(out, Seq(Seq("a", 2.0), Seq("b", 16.0), Seq(null, 7.0)))
    // empty-over-nulls group yields null, matching Arrow skip_nulls
    val allNull = Seq(("x", Option.empty[Double])).toDF("k", "v")
    assert(Aggregates.groupby(allNull, Seq("k"),
      Seq(AggRequest("v", "product", "p"))).collect()(0).isNullAt(1))
  }

  test("product works in SQL via registry") {
    df.createOrReplaceTempView("agg_in")
    val out = spark.sql("SELECT k, graft_product(v) AS p FROM agg_in GROUP BY k")
    assert(out.filter($"k" === "b").collect()(0).getDouble(1) == 16.0)
  }

  test("scalar reduce: two-phase partial/final shape") {
    val out = Aggregates.reduceAll(df, Seq(
      AggRequest("v", "sum", "s"),
      AggRequest("v", "count", "c"),
      AggRequest("v", "mean", "m")))
    assertSameRows(out, Seq(Seq(18.0, 5L, 3.6)))
    // plan must contain partial + final aggregation
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("HashAggregate") || plan.contains("SortAggregate"))
  }

  test("count_distinct and median kinds") {
    val d = Seq(("a", 1.0), ("a", 1.0), ("a", 3.0), ("a", 5.0)).toDF("k", "v")
    val out = Aggregates.groupby(d, Seq("k"), Seq(
      AggRequest("v", "count_distinct", "nd"),
      AggRequest("v", "median", "med"),
      AggRequest("v", "approx_median", "amed")))
    val r = out.collect()(0)
    assert(r.getLong(1) == 3L)
    // exact median interpolates the even-sized group: (1+3)/2 (cudf semantics)
    assert(r.getDouble(2) == 2.0)
    assert(r.getDouble(3) >= 1.0 && r.getDouble(3) <= 3.0)
  }

  test("percentile kinds: exact R-7 interpolation + approx variant") {
    val d = Seq(("a", 10.0), ("a", 20.0), ("a", 30.0), ("a", 40.0)).toDF("k", "v")
    val out = Aggregates.groupby(d, Seq("k"), Seq(
      AggRequest("v", "percentile:0.25", "p25"),
      AggRequest("v", "percentile:0.5", "p50"),
      AggRequest("v", "percentile:0.75", "p75"),
      AggRequest("v", "approx_percentile:0.5", "ap50")))
    val r = out.collect()(0)
    // R-7: pos = p*(n-1) over sorted values, linear interpolation
    assert(r.getDouble(1) == 17.5)
    assert(r.getDouble(2) == 25.0)
    assert(r.getDouble(3) == 32.5)
    assert(r.getDouble(4) >= 20.0 && r.getDouble(4) <= 30.0)
  }

  test("approx_count_distinct kind stays within its rsd on a real column") {
    val li = Engine.table(spark, sfDir, "lineitem")
    val out = Aggregates.groupby(li, Seq("l_returnflag"), Seq(
      AggRequest("l_orderkey", "count_distinct", "exact_nd"),
      AggRequest("l_orderkey", "approx_count_distinct", "approx_nd")))
    out.collect().foreach { r =>
      val exact = r.getLong(1).toDouble
      val approx = r.getLong(2).toDouble
      assert(math.abs(approx - exact) / exact < 0.05,
        s"approx $approx vs exact $exact for ${r.get(0)}")
    }
  }

  test("approximate aggregates track exact values (approximate_median parity)") {
    import org.apache.spark.sql.functions._
    val li = Engine.table(spark, sfDir, "lineitem")
    val r = li.agg(
      approx_count_distinct(col("l_orderkey"), 0.01).as("approx_nd"),
      countDistinct(col("l_orderkey")).as("exact_nd"),
      percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000)).as("approx_med"),
      median(col("l_extendedprice")).as("exact_med")).collect()(0)
    val (and_, end_) = (r.getLong(0).toDouble, r.getLong(1).toDouble)
    assert(math.abs(and_ - end_) / end_ < 0.05, s"approx_count_distinct off: $and_ vs $end_")
    val (amed, emed) = (r.getDouble(2), r.getDouble(3))
    assert(math.abs(amed - emed) / emed < 0.02, s"approx median off: $amed vs $emed")
  }

  test("scalable histogram median/quantiles == built-in buffer aggregates") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // odd + even group sizes, duplicate values, a null value, a NULL KEY
    // group, and an all-null group (median/quantiles must be null, group kept)
    val d = Seq(
      (Some("a"), Some(1.0)), (Some("a"), Some(3.0)), (Some("a"), Some(3.0)),
      (Some("a"), Some(7.0)), // even count with dups → interpolates
      (Some("b"), Some(5.0)), (Some("b"), Some(1.0)), (Some("b"), Some(9.0)),
      (Some("b"), None), // null value ignored, odd live count
      (None, Some(2.0)), (None, Some(4.0)), // null key is its own group
      (Some("z"), None) // all-null group
    ).toDF("k", "v")
    val gotMed = Aggregates.medianExactScalable(d, Seq("k"), Seq("v" -> "med"))
    val expMed = d.groupBy("k").agg(median($"v").as("med"))
    assert(rows(gotMed).map(_.toString).sorted == rows(expMed).map(_.toString).sorted)

    val gotQ = Aggregates.quantilesExactScalable(d, Seq("k"), "v",
      Seq(0.25 -> "p25", 0.5 -> "p50", 0.75 -> "p75"))
    val expQ = d.groupBy("k").agg(
      percentile($"v", lit(0.25)).as("p25"),
      percentile($"v", lit(0.5)).as("p50"),
      percentile($"v", lit(0.75)).as("p75"))
    // compare at 1e-12 (both are exact R-7; arithmetic may differ in the ulp)
    def norm(df: org.apache.spark.sql.DataFrame) =
      rows(df.select($"k", round($"p25" * 1e12), round($"p50" * 1e12), round($"p75" * 1e12)))
        .map(_.toString).sorted
    assert(norm(gotQ) == norm(expQ))
  }

  test("groupby request API routes median_scalable through the histogram plan") {
    import org.apache.spark.sql.functions._
    import Aggregates.AggRequest
    val li = Engine.table(spark, sfDir, "lineitem")
    val got = Aggregates.groupby(li, Seq("l_returnflag"), Seq(
      AggRequest("l_quantity", "sum", "sum_qty"),
      AggRequest("l_quantity", "median_scalable", "med_qty")))
    val exp = li.groupBy("l_returnflag").agg(
      sum($"l_quantity").as("sum_qty"), median($"l_quantity").as("med_qty"))
    assert(got.columns.toSeq == Seq("l_returnflag", "sum_qty", "med_qty"))
    assert(rows(got).map(_.toString).sorted == rows(exp).map(_.toString).sorted)
    assert(!got.queryExecution.executedPlan.toString.toLowerCase.contains("median("),
      "median_scalable must not plan the buffering median aggregate")
    // scalable-median-only requests work too
    val only = Aggregates.groupby(li, Seq("l_returnflag"),
      Seq(AggRequest("l_quantity", "median_scalable", "med_qty")))
    assert(only.columns.toSeq == Seq("l_returnflag", "med_qty"))
    assert(only.count() == 3)
  }

  test("histogram median/quantiles are partition-invariant") {
    import org.apache.spark.sql.functions._
    val li = Engine.table(spark, sfDir, "lineitem")
      .select("l_returnflag", "l_quantity")
    def medAt(p: Int) = rows(Aggregates.medianExactScalable(
      li.repartition(p), Seq("l_returnflag"), Seq("l_quantity" -> "med")))
      .map(_.toString).sorted
    def qAt(p: Int) = rows(Aggregates.quantilesExactScalable(
      li.repartition(p), Seq("l_returnflag"), "l_quantity", Seq(0.25 -> "q1", 0.75 -> "q3")))
      .map(_.toString).sorted
    assert(medAt(1) == medAt(7) && medAt(7) == medAt(32))
    assert(qAt(1) == qAt(7) && qAt(7) == qAt(32))
  }

  test("groupedChecksum: order/partition-invariant, detects any single-row change") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val base = Seq((1L, 10L, "a"), (2L, 20L, "a"), (3L, 30L, "b"), (4L, Long.MinValue, "b"))
      .toDF("id", "x", "g")
    def sums(df: org.apache.spark.sql.DataFrame) =
      rows(Aggregates.groupedChecksum(df,
        Seq("g"), Aggregates.portableRowHash(Seq(col("id"), col("x"))))
        .orderBy("g")).map(_.toString)
    // invariant under row order and partitioning (the sum is commutative)
    assert(sums(base) == sums(base.orderBy(col("x").desc).repartition(7)))
    // one changed value flips its group's checksum, leaves the other group alone
    val tweaked = base.withColumn("x",
      when(col("id") === 2, lit(21L)).otherwise(col("x")))
    val (b, t) = (sums(base), sums(tweaked))
    assert(b.head != t.head && b(1) == t(1))
    // nulls fold as a sentinel distinct from any value, and don't null the hash
    val withNull = Seq((1L, Option.empty[Long], "a")).toDF("id", "x", "g")
    val hn = rows(withNull.select(
      Aggregates.portableRowHash(Seq(col("id"), col("x"))))).head.head
    assert(hn != null)
    val withZero = Seq((1L, Some(0L), "a")).toDF("id", "x", "g")
    val hz = rows(withZero.select(
      Aggregates.portableRowHash(Seq(col("id"), col("x"))))).head.head
    assert(hn != hz, "null must hash differently from 0")
    // negative values (pmod) stay in range and match the arithmetic model
    val P = 2147483647L
    val hneg = rows(base.filter(col("id") === 4).select(
      Aggregates.portableRowHash(Seq(col("id"), col("x"))))).head.head
    val expected = ((7L * 131 + 4L) % P * 131 +
      ((Long.MinValue % P) + P) % P) % P
    assert(hneg == expected)
  }

  test("TopKAgg: partial buffers merge across partitions; ties cut on (v desc, id asc)") {
    import graft.operators.TopKAgg
    import spark.implicits._
    // 1000 rows scattered over 16 partitions, values with deliberate ties
    val df = spark.range(1000).repartition(16)
      .select((col("id") % 7).as("g"), (col("id") % 50).as("v"), col("id").as("k"))
    val top3 = TopKAgg.topK(3)
    val got = df.groupBy("g").agg(top3(col("v"), col("k")).as("tk"))
      .select(col("g"), expr("transform(tk, x -> concat(x.v, ':', x.id))").as("s"))
      .as[(Long, Seq[String])].collect().toMap
    // brute force in Scala: per group sort by (v desc, id asc), take 3
    val brute = (0L until 1000L).map(i => (i % 7, (i % 50, i)))
      .groupBy(_._1).view.mapValues(_.map(_._2)
        .sortBy { case (v, k) => (-v, k) }.take(3)
        .map { case (v, k) => s"$v:$k" }).toMap
    for (g <- 0L until 7L) assert(got(g) == brute(g), s"group $g: ${got(g)} vs ${brute(g)}")
    // k larger than the group returns everything, still ordered
    val small = Seq((1L, 5L, 10L), (1L, 9L, 11L)).toDF("g", "v", "k")
    val all = small.groupBy("g").agg(TopKAgg.topK(5)(col("v"), col("k")).as("tk"))
      .select(expr("transform(tk, x -> concat(x.v, ':', x.id))")).as[Seq[String]].head()
    assert(all == Seq("9:11", "5:10"))
  }
}
