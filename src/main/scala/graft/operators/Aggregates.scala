package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Registry

/** Grouped aggregation + scalar reductions with the reference's request surface.
  *
  * Reference (groupby_aggregation.hpp:64-70, cpp/src/groupby_aggregation.cu:46-88):
  * requests are (in_col, kind, out_col) tuples over keys; supported kinds
  * `sum product min max count count_all mean variance stddev median
  * count_distinct`, where variance/stddev are population (ddof=0) and nulls in
  * keys form their own group.
  *
  * Spark-first: one `groupBy(keys).agg(...)` — Catalyst plans the partial/final
  * (map-side combine) split the reference hand-codes via
  * repartition-then-local-aggregate, and AQE handles skewed groups. Spark's
  * groupBy keeps null keys as a group, matching `null_policy::INCLUDE`.
  */
object Aggregates {

  /** One aggregation request, mirroring the reference's request tuple. */
  final case class AggRequest(inCol: String, kind: String, outCol: String)

  /** Map a reference agg kind to a Spark aggregate Column. */
  def aggColumn(kind: String, in: Column): Column = kind match {
    case "sum" => sum(in)
    case "product" => Registry.product(in)
    case "min" => min(in)
    case "max" => max(in)
    case "count" => count(in) // valid (non-null) count
    case "count_all" => count(lit(1)) // rows, incl. null values
    case "mean" => avg(in)
    case "variance" => var_pop(in) // ddof=0, Arrow semantics
    case "stddev" => stddev_pop(in) // ddof=0
    // the reference's median is exact and interpolates even-sized groups
    // (cudf semantics) — Spark's median() matches; the approximate variant
    // stays available under its own kind. Scale note: Spark's median() is a
    // sort-based aggregate (per-group buffer sort, no partial aggregation),
    // a real cost at 100 TB — for exact-at-scale use medianExactScalable
    // (histogram + rank pick, fully combinable; what q19 ships), or
    // "approx_median" (sketch, bounded memory) when even the distinct value
    // domain is too large. (The reference's own CPU path is approximate:
    // groupby_aggregation.cpp:79-93 maps MEDIAN to Arrow approximate_median.)
    case "median" => median(in)
    case "approx_median" => percentile_approx(in, lit(0.5), lit(10000))
    case "count_distinct" => countDistinct(in)
    // beyond-reference: HyperLogLog++ distinct estimate. Exact countDistinct
    // is two aggregation passes (expand + dedup shuffle of every distinct
    // value); HLL is one pass with a fixed-size sketch per group — at 100 TB
    // the difference between "shuffles every distinct key" and "shuffles
    // ~kB per group". rsd 0.01 ≈ 1% error.
    case "approx_count_distinct" => approx_count_distinct(in, rsd = 0.01)
    case "any" => max(in.cast("boolean"))
    case "all" => min(in.cast("boolean"))
    case "first" => first(in, ignoreNulls = false)
    case "last" => last(in, ignoreNulls = false)
    // beyond-reference: exact interpolated percentile (R-7 / quantile_cont
    // semantics, the same definition DuckDB and NumPy use). "percentile:p"
    // e.g. "percentile:0.25". Like exact median this is a sort-based
    // aggregate — at 100 TB prefer "approx_percentile:p" (t-digest sketch,
    // map-side combinable).
    case p if p.startsWith("percentile:") =>
      percentile(in, lit(p.stripPrefix("percentile:").toDouble))
    case p if p.startsWith("approx_percentile:") =>
      percentile_approx(in, lit(p.stripPrefix("approx_percentile:").toDouble), lit(10000))
    case other => throw new IllegalArgumentException(s"unsupported agg kind: $other")
  }

  /** Grouped aggregation: `groupby_aggregation(tbl, keys, requests)`.
    *
    * The `median_scalable` kind routes through [[medianExactScalable]]
    * (exact, histogram plan — the 100 TB form) inside the same request API:
    * plain kinds aggregate in one pass, scalable medians compute in one
    * extra pass, and the two join null-safely on the keys — so a reference
    * user can flip MEDIAN to the scale-safe plan without leaving
    * `groupby_aggregation`. Output columns keep request order (plain kinds
    * first, then scalable medians).
    */
  def groupby(df: DataFrame, keys: Seq[String], requests: Seq[AggRequest]): DataFrame = {
    require(keys.nonEmpty, "at least one key required")
    require(requests.nonEmpty, "at least one aggregation request required")
    val (medScal, plain) = requests.partition(_.kind == "median_scalable")
    val base =
      if (plain.nonEmpty) {
        val aggs = plain.map(r => aggColumn(r.kind, col(r.inCol)).as(r.outCol))
        df.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
      } else df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("__graft_ng"))
        .drop("__graft_ng")
    if (medScal.isEmpty) base
    else {
      val meds = medianExactScalable(df, keys, medScal.map(r => r.inCol -> r.outCol))
      val b = base.as("__graft_b")
      val m = meds.as("__graft_m")
      val cond = keys.map(k => col(s"__graft_b.$k") <=> col(s"__graft_m.$k")).reduce(_ && _)
      b.join(m, cond, "left")
        .select(base.columns.map(n => col(s"__graft_b.$n")) ++
          medScal.map(r => col(s"__graft_m.${r.outCol}")): _*)
    }
  }

  /** Scalar reduction: `reduce(col, kind, initial?)` → single-row DataFrame.
    *
    * The reference implements this as local-reduce → gather partials → final
    * reduce (cpp/src/reduction.cpp:110-146); Spark's `agg` plans exactly that
    * (Partial/Final HashAggregate), including the mean = sum/count decomposition
    * the reference codes by hand (reduction.cpp:285-329).
    */
  def reduce(df: DataFrame, inCol: String, kind: String, outCol: String): DataFrame =
    df.agg(aggColumn(kind, col(inCol)).as(outCol))

  /** Multi-reduction in one pass. */
  def reduceAll(df: DataFrame, requests: Seq[AggRequest]): DataFrame = {
    val aggs = requests.map(r => aggColumn(r.kind, col(r.inCol)).as(r.outCol))
    df.agg(aggs.head, aggs.tail: _*)
  }

  /** Exact grouped median with a SCALE-SAFE plan (value histogram + rank
    * pick). Spark's `median()`/`percentile()` is a sort-based aggregate that
    * buffers every value of a group in one reducer with no partial
    * aggregation — a handful of big groups means a handful of
    * effectively-single-threaded reducers, and an OOM wall at 100 TB. This
    * form decomposes into combinable pieces:
    *
    *   1. `count` per (keys, value) — a partial+final hash aggregate, so the
    *      shuffle carries one row per DISTINCT value per group, map-side
    *      combined (for repeating domains — quantities, prices, scores —
    *      that is orders of magnitude smaller than the row count);
    *   2. a running rank over each group's distinct values — the window
    *      sorts distinct values, not rows, so the per-partition working set
    *      is bounded by the value domain, not the data size;
    *   3. pick the value(s) covering ranks ⌊(n+1)/2⌋ and ⌊n/2⌋+1 and average
    *      them — the same even-count interpolation cudf/DuckDB/Spark use.
    *
    * Nulls are ignored (median semantics); a group whose values are all null
    * gets a null median. Returns one row per distinct key tuple (null keys
    * form their own group, `null_policy::INCLUDE`) with one double column
    * per requested (valueCol -> outCol). Exactness means the DuckDB
    * `median()` oracle still applies — this is the plan shape q19 ships.
    *
    * Worst case (all values distinct — continuous doubles) the shuffle is
    * row-sized, same as any sort, but still partial-agg'd and spill-safe;
    * when even the distinct domain per group is too big, use the
    * `approx_median` kind (t-digest-style sketch, bounded memory).
    */
  def medianExactScalable(
      df: DataFrame,
      keys: Seq[String],
      valueCols: Seq[(String, String)]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(keys.nonEmpty, "at least one key required")
    require(valueCols.nonEmpty, "at least one (valueCol -> outCol) required")
    // ONE scan for every requested column: explode (column-index, value)
    // pairs, histogram per (keys, index), then pivot the picked medians back
    // to columns — an n-column median costs one pass + one count shuffle,
    // not n of each
    val exploded = df.select(keys.map(col) :+ posexplode(
        array(valueCols.map { case (in, _) => col(in).cast("double") }: _*))
      .as(Seq("__graft_i", "__graft_v")): _*)
    val counts = exploded.filter(col("__graft_v").isNotNull)
      .groupBy((keys :+ "__graft_i").map(col) :+ col("__graft_v"): _*)
      .agg(count(lit(1)).as("__graft_c"))
    val byGroup = Window.partitionBy((keys :+ "__graft_i").map(col): _*)
    val ranked = counts
      // running count through each value (values are distinct within a
      // (group, column), so the RANGE default frame equals ROWS) + total
      .withColumn("__graft_cum", sum("__graft_c").over(byGroup.orderBy("__graft_v")))
      .withColumn("__graft_n", sum("__graft_c").over(byGroup))
    // integer div: `/` on longs is double division in Spark SQL
    val rL = call_function("div", col("__graft_n") + 1, lit(2L))
    val rU = call_function("div", col("__graft_n"), lit(2L)) + 1
    val prev = col("__graft_cum") - col("__graft_c")
    def pick(r: Column) =
      max(when(prev < r && r <= col("__graft_cum"), col("__graft_v")))
    val pivotAggs = valueCols.zipWithIndex.map { case ((_, out), i) =>
      max(when(col("__graft_i") === i, col("__graft_med"))).as(out)
    }
    val meds = ranked.groupBy((keys :+ "__graft_i").map(col): _*)
      .agg(((pick(rL) + pick(rU)) / 2).as("__graft_med"))
      .groupBy(keys.map(col): _*)
      .agg(pivotAggs.head, pivotAggs.tail: _*)
    // every group present in df appears in the output, even all-null ones
    val groups = df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("__graft_ng"))
      .drop("__graft_ng")
    val g = groups.as("__graft_g")
    val m = meds.as("__graft_m")
    val cond = keys.map(k => col(s"__graft_g.$k") <=> col(s"__graft_m.$k")).reduce(_ && _)
    g.join(m, cond, "left")
      .select(keys.map(k => col(s"__graft_g.$k")) ++
        valueCols.map { case (_, out) => col(s"__graft_m.$out") }: _*)
  }

  /** Exact grouped percentiles (R-7 / quantile_cont interpolation) in the
    * same scale-safe histogram plan as [[medianExactScalable]] — the
    * built-in `percentile(col, array)` buffers every group's values in one
    * sort-based reducer, the identical 100 TB wall exact median had. All
    * requested fractions come out of ONE counts pass + ONE window over each
    * group's distinct values: for fraction p the target rank is
    * h = (n-1)·p + 1 and the result interpolates the values at ⌊h⌋ and ⌈h⌉.
    * Nulls ignored; all-null groups yield null. Returns one double column
    * per (fraction -> outCol).
    */
  def quantilesExactScalable(
      df: DataFrame,
      keys: Seq[String],
      valueCol: String,
      fractions: Seq[(Double, String)]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(keys.nonEmpty, "at least one key required")
    require(fractions.nonEmpty && fractions.forall { case (p, _) => p >= 0 && p <= 1 },
      "fractions must be in [0, 1]")
    val counts = df.filter(col(valueCol).isNotNull)
      .groupBy(keys.map(col) :+ col(valueCol).cast("double").as("__graft_v"): _*)
      .agg(count(lit(1)).as("__graft_c"))
    val byKeys = Window.partitionBy(keys.map(col): _*)
    val ranked = counts
      .withColumn("__graft_cum", sum("__graft_c").over(byKeys.orderBy("__graft_v")))
      .withColumn("__graft_n", sum("__graft_c").over(byKeys))
    val prev = col("__graft_cum") - col("__graft_c")
    def valueAtRank(r: Column) =
      max(when(prev < r && r <= col("__graft_cum"), col("__graft_v")))
    val aggs = fractions.flatMap { case (p, out) =>
      val h = (col("__graft_n") - 1) * lit(p) + 1
      val rLo = floor(h)
      val rHi = ceil(h)
      Seq(valueAtRank(rLo).as(s"__graft_lo_$out"), valueAtRank(rHi).as(s"__graft_hi_$out"),
        max(h - rLo).as(s"__graft_d_$out")) // h is constant within a group
    }
    val picked = ranked.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
    val outCols = keys.map(col) ++ fractions.map { case (_, out) =>
      (col(s"__graft_lo_$out") +
        col(s"__graft_d_$out") * (col(s"__graft_hi_$out") - col(s"__graft_lo_$out"))).as(out)
    }
    val quantiles = picked.select(outCols: _*)
    // every group present in df appears, even all-null ones
    val groups = df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("__graft_ng"))
      .drop("__graft_ng")
    val g = groups.as("__graft_g")
    val q = quantiles.as("__graft_q")
    val cond = keys.map(k => col(s"__graft_g.$k") <=> col(s"__graft_q.$k")).reduce(_ && _)
    g.join(q, cond, "left")
      .select(keys.map(k => col(s"__graft_g.$k")) ++
        fractions.map { case (_, out) => col(s"__graft_q.$out") }: _*)
  }

  /** Order-independent per-row hash for [[groupedChecksum]], PORTABLE form:
    * the mod-prime polynomial fold the portable fingerprint family uses
    * (h = 7; h = (h·131 + v mod (2³¹−1)) mod (2³¹−1) per column), over
    * int64-castable columns. Every intermediate stays < 2³⁹, so plain int64
    * arithmetic reproduces it bit-exactly in ANY SQL engine — that is the
    * point: both sides of a reconciliation compute it independently. Nulls
    * fold as the sentinel 2³¹−2 (distinct from every `v mod (2³¹−1)`).
    */
  def portableRowHash(cols: Seq[Column]): Column = {
    require(cols.nonEmpty, "need at least one column to hash")
    val P = lit(2147483647L)
    cols.foldLeft(lit(7L): Column)((h, c) =>
      pmod(h * lit(131L) + coalesce(pmod(c.cast("long"), P), lit(2147483646L)), P))
  }

  /** Grouped table checksum for RECONCILIATION: verify that two copies of a
    * table (two clusters, two engines, before/after a migration) hold the
    * same rows WITHOUT moving data — each side computes per-group
    * (checksum, row count) from its local copy and only the tiny checksum
    * tables travel. The row hash is summed mod 10⁶ per group, so the
    * checksum is insensitive to row order and partitioning; with the
    * summands bounded by 10⁶, the running sum stays far under int64 even at
    * 10¹² rows per group — no engine-specific overflow semantics involved.
    *
    * One partial+final hash aggregate — a single shuffle of (keys, partial
    * sum, partial count) per map partition; nothing else moves. Use
    * [[portableRowHash]] as `rowHash` for cross-engine checks, or any
    * stronger Spark-side hash (e.g. `xxhash64`, reduced mod 10⁶) when both
    * sides run Spark. A mismatched group pinpoints where to drill down
    * (re-checksum at finer key granularity), turning a 100 TB diff into a
    * log-depth search.
    */
  def groupedChecksum(
      df: DataFrame,
      keys: Seq[String],
      rowHash: Column): DataFrame = {
    val M = lit(1000000L)
    df.groupBy(keys.map(col): _*)
      .agg(pmod(sum(pmod(rowHash, M)), M).as("checksum"),
        count(lit(1)).as("n_rows"))
  }

}
