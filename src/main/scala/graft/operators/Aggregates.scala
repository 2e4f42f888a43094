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
    // stays available under its own kind. Scale note: exact median is a
    // sort-based aggregate (per-group buffer sort, no partial aggregation),
    // a real cost at 100 TB — route to "approx_median" (t-digest, map-side
    // combinable, bounded memory) unless exact parity is required. (The
    // reference's own CPU path is approximate: groupby_aggregation.cpp:79-93
    // maps MEDIAN to Arrow approximate_median.)
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

  /** Grouped aggregation: `groupby_aggregation(tbl, keys, requests)`. */
  def groupby(df: DataFrame, keys: Seq[String], requests: Seq[AggRequest]): DataFrame = {
    require(keys.nonEmpty, "at least one key required")
    require(requests.nonEmpty, "at least one aggregation request required")
    val aggs = requests.map(r => aggColumn(r.kind, col(r.inCol)).as(r.outCol))
    df.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
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
}
