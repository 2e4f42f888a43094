package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dataset-diagnostics / BI-analytics operators (beyond-reference, SURVEY
  * §2.9 "large-scale training-data pipeline" extensions): grouped outlier
  * detection, retention cohorts, pre-join cardinality estimation, and
  * co-occurrence (market-basket) affinity.
  *
  * All four are pure declarative DataFrame compositions — partial+final
  * aggregates, co-partitioned or broadcast joins, no UDFs, no collects — so
  * Catalyst/AQE keep the plans inside whole-stage codegen and re-plan skew at
  * runtime.
  */
object Analytics {

  /** Quantile normalization: map each row's `valueCol` to the GLOBAL
    * distribution's interpolated value (quantile_cont semantics) at the
    * row's percent_rank WITHIN its `groupCol` — after which every group's
    * distribution is identical up to rank, the standard cross-source drift
    * correction (microarray normalization, feature alignment).
    *
    * Scale design: the global CDF is carried as per-DISTINCT-VALUE position
    * intervals (state bounded by value cardinality, the same trick as the
    * scalable exact-median plan) — there is NO corpus-wide row_number; the
    * only unpartitioned window runs over distinct values. The position →
    * value lookup is the binned range join ([[Joins.rangeJoin]]), a plain
    * hash join — never a BNLJ. The global row count rides in as a 1-row
    * broadcast scalar.
    *
    * Determinism: percent_rank depends only on (group, value); h/frac/
    * interpolation are fixed IEEE trees, so output is partition-invariant
    * and engine-reproducible given exact inputs. Returns the input columns
    * plus `norm` (double, unrounded — callers round at their gate).
    */
  def quantileNormalize(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      binWidth: Double = 64): DataFrame = {
    val v = col(valueCol)
    val wv = Window.orderBy(valueCol)
    val dist = df.groupBy(valueCol).agg(count(lit(1)).as("cnt"))
      .select(v.as("gval"),
        (sum("cnt").over(wv) - col("cnt")).as("spos"),
        (sum("cnt").over(wv) - 1).as("epos"))
    val pr = percent_rank().over(Window.partitionBy(groupCol).orderBy(valueCol))
    val scored = df.withColumn("pr", pr)
      .crossJoin(broadcast(df.agg(count(lit(1)).as("n_tot"))))
      .withColumn("h", col("pr") * (col("n_tot") - 1))
      .withColumn("lo", floor(col("h")).cast("long"))
      .withColumn("frac", col("h") - col("lo"))
      .withColumn("hi", least(col("lo") + 1, col("n_tot") - 1))
    val withLo = Joins.rangeJoin(scored,
      dist.select(col("gval").as("v_lo"), col("spos"), col("epos")),
      "lo", "spos", "epos", binWidth).drop("spos", "epos")
    val withHi = Joins.rangeJoin(withLo,
      dist.select(col("gval").as("v_hi"), col("spos"), col("epos")),
      "hi", "spos", "epos", binWidth).drop("spos", "epos")
    withHi.select(df.columns.map(col) :+
      (col("v_lo").cast("double") +
        col("frac") * (col("v_hi") - col("v_lo")).cast("double")).as("norm"): _*)
  }

  /** Zero-extra-pass data profiling via `Dataset.observe`: the metric
    * aggregates are accumulated ON THE SIDE of whatever action the caller
    * drives over the returned frame (a write, a downstream join, …), so at
    * 100 TB the profile costs no second scan — the difference between this
    * and a separate `df.agg(...)` is an entire pass over the input. Returns
    * the observed frame plus a thunk that yields the metrics as a one-row
    * DataFrame once an action has run (Observation.get blocks until then).
    *
    * Restrictions inherited from CollectMetrics: aggregates only, no
    * distinct aggregates — use approx sketches for cardinality.
    */
  def observed(df: DataFrame, metrics: (String, Column)*)
      : (DataFrame, () => DataFrame) = {
    require(metrics.nonEmpty, "observed: at least one metric required")
    val obs = org.apache.spark.sql.Observation()
    val named = metrics.map { case (n, c) => c.as(n) }
    val out = df.observe(obs, named.head, named.tail: _*)
    val spark = df.sparkSession
    val fetch = () => {
      val got = obs.get
      val row = org.apache.spark.sql.Row(metrics.map { case (n, _) => got(n) }: _*)
      val fields = metrics.map { case (n, _) =>
        val dt = got(n) match {
          case _: java.lang.Long | _: java.lang.Integer =>
            org.apache.spark.sql.types.LongType
          case _: java.lang.Double => org.apache.spark.sql.types.DoubleType
          case _: java.math.BigDecimal =>
            org.apache.spark.sql.types.DataTypes.createDecimalType(38, 8)
          case _ => org.apache.spark.sql.types.StringType
        }
        org.apache.spark.sql.types.StructField(n, dt)
      }
      val cast = org.apache.spark.sql.Row(metrics.zip(fields).map {
        case ((n, _), f) => got(n) match {
          case i: java.lang.Integer if f.dataType == org.apache.spark.sql.types.LongType =>
            java.lang.Long.valueOf(i.longValue())
          case v => v
        }
      }: _*)
      spark.createDataFrame(
        java.util.Collections.singletonList(cast),
        org.apache.spark.sql.types.StructType(fields))
    }
    (out, fetch)
  }

  /** Equi-depth (equal-frequency) histogram: interior boundaries from the
    * scale-safe exact-quantile plan ([[Aggregates.quantilesExactScalable]] —
    * counts pass + window, never a single sort-based reducer), then one
    * partial+final count per bucket. The boundary collect is `buckets − 1`
    * doubles — bounded at any input size. Bucket i holds values in
    * (b_i-1, b_i]; rows equal to a boundary go left, nulls are dropped.
    */
  def equiDepthHistogram(df: DataFrame, valueCol: String, buckets: Int): DataFrame = {
    require(buckets >= 2, s"need at least 2 buckets, got $buckets")
    val fracs = (1 until buckets).map(i => (i.toDouble / buckets, s"__graft_b$i"))
    val bRow = Aggregates.quantilesExactScalable(
      df.withColumn("__graft_k", lit(1)), Seq("__graft_k"), valueCol, fracs).head()
    val bs = (1 until buckets).map(i => bRow.getDouble(bRow.fieldIndex(s"__graft_b$i")))
    val bucket = bs.foldLeft(lit(0))((acc, b) =>
      acc + when(col(valueCol).cast("double") > b, 1).otherwise(0))
    df.filter(col(valueCol).isNotNull)
      .groupBy(bucket.as("bucket")).agg(count(lit(1)).as("n"))
  }

  /** Per-group z-score outlier counts with *deterministic* moments: the mean
    * and population stddev are computed from exact decimal sums (the input is
    * fixed-point data, so sum and sum-of-squares are exact in decimal(38,8)),
    * then converted to double once. Every engine computing the same exact
    * sums gets bit-identical mu/sigma and hence an identical outlier set —
    * no FP-associativity boundary flips, which is what makes a count-based
    * oracle comparison safe.
    *
    * Plan: one partial+final aggregate over `groupCols` (exact sums), one
    * broadcast join of the per-group moments (rows = #groups) back onto the
    * fact table, one final count aggregate. Two shuffles total on the same
    * grouping key; the fact table is scanned twice (moments pass + flag
    * pass) — the standard two-pass shape for exact z-scores, and each pass
    * is map-side combined.
    */
  def groupOutliers(df: DataFrame, groupCols: Seq[String], valueCol: String,
      z: Double = 3.0): DataFrame = {
    val v = col(valueCol)
    val gs = groupCols.map(col)
    val moments = df.groupBy(gs: _*).agg(
      count(v).as("n"),
      sum(v.cast("decimal(38,8)")).cast("double").as("s1"),
      sum((v * v).cast("decimal(38,8)")).cast("double").as("s2"))
      .select(gs ++ Seq(
        col("n"),
        (col("s1") / col("n")).as("mu"),
        sqrt(col("s2") / col("n") - (col("s1") / col("n")) * (col("s1") / col("n")))
          .as("sigma")): _*)
    df.join(broadcast(moments), groupCols)
      .groupBy(gs: _*)
      .agg(
        max(col("n")).as("n"),
        sum(when(abs(v - col("mu")) > lit(z) * col("sigma"), 1L).otherwise(0L))
          .as("n_outliers"),
        max(round(col("mu"), 4)).as("mu_r"),
        max(round(col("sigma"), 4)).as("sigma_r"))
  }

  /** Weekly retention cohorts over an event log: cohort = ISO week of each
    * user's first event, k = whole weeks between the first event and each
    * later event (exact int64 floor-division on epoch micros), cell value =
    * distinct active users. The classic product-analytics triangle.
    *
    * Plan: first-event aggregate on `userCol` (partial+final), join back on
    * the SAME key — co-partitioned, so AQE/exchange-reuse keeps it to one
    * shuffle of each side — then a distinct-count aggregate on (cohort, k),
    * which Spark expands to the two-phase exact distinct plan. No window
    * functions, no per-user sort: every step is hash-based and scales
    * linearly with the event count.
    */
  def retentionCohorts(events: DataFrame, userCol: String, tsCol: String)
      : DataFrame = {
    val firsts = events.groupBy(userCol)
      .agg(min(col(tsCol)).as("first_ts"))
    val weekMicros = 7L * 86400L * 1000000L
    events.select(col(userCol), col(tsCol))
      .join(firsts, Seq(userCol))
      .select(
        unix_micros(date_trunc("week", col("first_ts"))).as("cohort_us"),
        expr(s"(unix_micros($tsCol) - unix_micros(first_ts)) div ${weekMicros}L")
          .as("week_k"),
        col(userCol))
      .groupBy("cohort_us", "week_k")
      .agg(countDistinct(col(userCol)).as("users"))
  }

  /** Exact pre-join cardinality estimation — the planner-side "how big will
    * this join be, and is it skewed?" probe, answered WITHOUT running the
    * join: per-key row counts on each side (map-side combined, so the
    * shuffle carries one row per distinct key, not per input row), joined on
    * the distinct keys, then one scalar reduce:
    * est_rows = Σ_k cL(k)·cR(k), matched_keys = #keys on both sides, and
    * max_key_pairs = max_k cL(k)·cR(k) — the hot-key skew indicator that
    * tells you whether to salt before running the real join.
    */
  def joinCardinality(left: DataFrame, leftKey: String,
      right: DataFrame, rightKey: String): DataFrame = {
    val lc = left.groupBy(col(leftKey).as("k")).agg(count(lit(1)).as("cl"))
    val rc = right.groupBy(col(rightKey).as("k")).agg(count(lit(1)).as("cr"))
    lc.join(rc, "k")
      .agg(
        sum(col("cl") * col("cr")).as("est_rows"),
        count(lit(1)).as("matched_keys"),
        max(col("cl") * col("cr")).as("max_key_pairs"))
  }

  /** Rolling (trailing-window) anomaly detection over an event series: per
    * key, each observation is flagged when it sits more than `z` trailing
    * standard deviations from the trailing mean of the last `window`
    * observations (itself included). The time-series cousin of
    * [[groupOutliers]] — local context instead of global moments, so level
    * shifts don't poison the whole key.
    *
    * Determinism across engines: values are quantized to integer cents
    * FIRST, the window carries exact int64 sum / sum-of-squares / count,
    * and mean/sigma are derived from those ints with the identical IEEE
    * expression in the oracle SQL — the flag is bit-deterministic, never a
    * victim of FP summation order. The window frame is ordered by
    * (ts, tiebreak): total order, so the frame contents are unique.
    *
    * Scale: one window pass — shuffle on the key, per-key sort, O(1) state
    * per row (running frame aggregates). No self-join, no collect.
    */
  def rollingAnomalies(df: DataFrame, keyCols: Seq[String], tsCol: String,
      tiebreakCol: String, valueCol: String, window: Int = 10,
      z: Double = 2.0): DataFrame = {
    val cents = floor(col(valueCol) * 100 + 0.5).cast("long")
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol), col(tiebreakCol))
      .rowsBetween(-(window - 1), Window.currentRow)
    val s1 = sum(cents).over(w)
    val s2 = sum(cents * cents).over(w)
    val cnt = count(cents).over(w)
    val mu = s1.cast("double") / cnt
    val sigma = sqrt(greatest(s2.cast("double") / cnt - mu * mu, lit(0.0)))
    df.select(keyCols.map(col) ++ Seq(
      col(tiebreakCol),
      cents.as("cents"),
      (abs(cents.cast("double") - mu) > lit(z) * sigma).as("anom")): _*)
  }

  /** Grouped equal-width histogram (the dashboard binning op): bin values
    * into `bins` buckets over the GLOBAL [min, max] range (global so the
    * buckets align across groups), count per (group, bin). Two passes: a
    * 1-row min/max reduce broadcast back, then one partial+final count agg —
    * no sort, no per-group state. Bin edges are derived from the same two
    * doubles in every engine and the bin index is one deterministic IEEE
    * divide+floor, so counts are oracle-exact. Degenerate range (min==max)
    * puts everything in bin 0.
    */
  def histogram(df: DataFrame, groupCols: Seq[String], valueCol: String,
      bins: Int): DataFrame = {
    val v = col(valueCol)
    val stats = df.agg(min(v).as("lo"), max(v).as("hi"))
    val gs = groupCols.map(col)
    df.crossJoin(broadcast(stats))
      .select(gs :+
        when(col("hi") === col("lo"), 0L)
          .otherwise(least(
            floor((v - col("lo")) / ((col("hi") - col("lo")) / bins)),
            lit(bins - 1)).cast("long"))
          .as("bin"): _*)
      .groupBy(gs :+ col("bin"): _*)
      .agg(count(lit(1)).as("n"))
  }

  /** Sketch-only companion to [[joinCardinality]]: the same "how big will
    * this join be?" estimate from ONE pass per side with O(1) state and NO
    * shuffle at all — each side reduces to (row count, HLL key sketch), the
    * sketches merge via `hll_union`, and under a uniform-frequency
    * assumption est ≈ (nL/dL)·(nR/dR)·|keys∩| with
    * |keys∩| = dL + dR − |keys∪| by inclusion-exclusion. This is the form
    * that works when even the per-key count table of [[joinCardinality]] is
    * too big to shuffle (billions of distinct keys); accuracy is the HLL
    * rsd (~2%) plus the uniformity error — spec-gated against the exact
    * probe rather than a cross-engine oracle because sketch estimates are
    * implementation-specific.
    */
  def joinCardinalityApprox(left: DataFrame, leftKey: String,
      right: DataFrame, rightKey: String): DataFrame = {
    val l = left.agg(count(lit(1)).as("n_l"),
      hll_sketch_agg(col(leftKey)).as("sk_l"))
    val r = right.agg(count(lit(1)).as("n_r"),
      hll_sketch_agg(col(rightKey)).as("sk_r"))
    l.crossJoin(r)
      .select(col("n_l"), col("n_r"),
        hll_sketch_estimate(col("sk_l")).as("d_l"),
        hll_sketch_estimate(col("sk_r")).as("d_r"),
        hll_sketch_estimate(hll_union(col("sk_l"), col("sk_r"))).as("d_u"))
      .select(col("n_l"), col("n_r"), col("d_l"), col("d_r"),
        greatest(col("d_l") + col("d_r") - col("d_u"), lit(0L))
          .as("d_common_est"))
      .select(
        floor(col("n_l").cast("double") / col("d_l")
          * (col("n_r").cast("double") / col("d_r"))
          * col("d_common_est")).cast("long").as("est_rows_approx"),
        col("d_common_est").as("matched_keys_est"))
  }

  /** OHLC time-bar downsampling (the financial/telemetry resample-to-bars
    * op): per key and fixed-width time bucket, the first (open) and last
    * (close) observation plus min/low, max/high and count. One partial+final
    * hash aggregate — `min_by`/`max_by` carry (value, order-key) pairs
    * through the combiner, so there is no per-key sort and no window
    * function anywhere; the plan scales like any grouped agg.
    *
    * Determinism: the order key is struct(ts, tiebreak) — lexicographic
    * struct comparison makes open/close well-defined even with duplicate
    * timestamps per key. open/high/low/close are SELECTIONS of input values
    * (no arithmetic), so cross-engine comparison is bit-exact with no
    * rounding needed. Bucketing assumes non-negative epoch micros (`div`
    * truncates toward zero; for pre-1970 data a floor-div would be needed).
    */
  def ohlcBars(df: DataFrame, keyCols: Seq[String], tsCol: String,
      valCol: String, tiebreakCol: String, barMicros: Long): DataFrame = {
    val v = col(valCol)
    val ord = struct(col(tsCol), col(tiebreakCol))
    df.groupBy(keyCols.map(col) :+
        (expr(s"(unix_micros($tsCol) div ${barMicros}L) * ${barMicros}L")
          .as("bucket_us")): _*)
      .agg(
        min_by(v, ord).as("open"),
        max(v).as("high"),
        min(v).as("low"),
        max_by(v, ord).as("close"),
        count(lit(1)).as("n"))
  }

  /** Brand/category affinity (market-basket co-occurrence with lift): which
    * item attributes are bought together more often than chance. Input is a
    * (basket, item) fact; output one row per unordered attribute pair with
    * the co-occurrence count and lift·1e6 (quantized — lift is one int→double
    * division, deterministic IEEE given identical integer counts).
    *
    * Plan shape and why it scales: ONE scan of the fact table into a
    * `collect_set` per basket (map-side partial collection; state is bounded
    * by the attribute-domain size, e.g. 25 brands — documented buffering
    * aggregate), then every downstream quantity comes from that one pass:
    * pairs are generated row-locally by array `transform` over the sorted
    * set ((#attrs choose 2) per basket, never quadratic in basket size or
    * data size), marginals by exploding the same array, the basket total by
    * a count. A naive self-join formulation scans the fact table 4× and
    * shuffles it twice; this shuffles the fact once. Marginals (#attrs rows)
    * come back via broadcast joins; the output is at most
    * (#attrs choose 2) rows.
    *
    * `baskets` is persisted (MEMORY_AND_DISK): three consumers (pairs,
    * marginals, total) derive from it, and Catalyst's per-branch column
    * pruning specializes each subplan enough that exchange reuse never
    * canonicalizes them equal (measured: 3 full fact re-scans without the
    * persist). The cached relation is one row per basket with a
    * domain-bounded array — orders of magnitude smaller than the fact
    * table, and it spills to disk rather than OOM at scale.
    */
  def cooccurrence(facts: DataFrame, basketCol: String, attrCol: String)
      : DataFrame = {
    val baskets = facts
      .groupBy(col(basketCol).as("b"))
      .agg(sort_array(collect_set(col(attrCol))).as("attrs"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nBaskets = baskets.agg(count(lit(1)).as("n_total"))
    val marg = baskets.select(explode(col("attrs")).as("attr"))
      .groupBy("attr").agg(count(lit(1)).as("n_attr"))
    // all i<j pairs of the sorted set, generated in place: for element i,
    // struct it with each element of the tail slice starting at i+2 (1-based)
    val pairs = baskets.select(explode(expr(
        """flatten(transform(attrs, (x, i) ->
          |  transform(slice(attrs, i + 2, size(attrs)), y ->
          |    struct(x AS attr_a, y AS attr_b))))""".stripMargin)).as("p"))
      .select(col("p.attr_a"), col("p.attr_b"))
      .groupBy("attr_a", "attr_b")
      .agg(count(lit(1)).as("n_ab"))
    pairs
      .join(broadcast(marg.select(col("attr").as("attr_a"), col("n_attr").as("n_a"))), "attr_a")
      .join(broadcast(marg.select(col("attr").as("attr_b"), col("n_attr").as("n_b"))), "attr_b")
      .crossJoin(broadcast(nBaskets))
      .select(col("attr_a"), col("attr_b"), col("n_ab"),
        floor((col("n_ab") * col("n_total")).cast("double")
          / (col("n_a") * col("n_b")).cast("double") * 1e6 + 0.5)
          .cast("long").as("lift_e6"))
  }
}
