package graft.operators

import org.apache.spark.sql.DataFrame

/** Distinct / union / slice — the reference's set-like surface (SURVEY §2.6).
  *
  * - `distinct(tbl, keys, high_cardinality)` keeps an arbitrary value for
  *   non-key columns (stream_compaction.cpp:44-96). `dropDuplicates(keys)` has
  *   the same "any row per key" semantics, and Catalyst plans it as
  *   partial+final aggregate — the local-pre-distinct-before-shuffle trick the
  *   reference gates on `high_cardinality` is automatic (and skew-safe under
  *   AQE), so the flag needs no Spark counterpart.
  * - `concatenate` / polars `Union` → `unionAll` (dsl/ir.py:808-831).
  * - `Slice(offset, len)` → `offset(n).limit(m)` (dsl/ir.py:1252-1272). Note
  *   Spark, like any distributed engine, only has a deterministic row order
  *   after a sort; callers slice sorted frames (the reference has the same
  *   caveat across >1 rank).
  */
object SetOps {

  def distinct(df: DataFrame, keys: Seq[String]): DataFrame =
    if (keys.isEmpty) df.dropDuplicates() else df.dropDuplicates(keys)

  /** Explicit plan-level cache node (ldf_polars/dsl/ir.py:632-669): the
    * reference's `Cache(key, value)` evaluates a shared subplan once per
    * query via a cache map — plan-level CSE. Spark's analogue is
    * `persist()`: every consumer of the returned frame reads the
    * materialized blocks instead of recomputing the subtree (Catalyst's
    * CollapseProject would otherwise re-inline shared projections — see the
    * dedup pipelines, which use exactly this). Callers own the lifecycle:
    * `unpersist()` when the consumers are done, as the reference's cache map
    * is dropped at query end.
    */
  def cache(df: DataFrame): DataFrame = df.persist()

  def uncache(df: DataFrame): DataFrame = df.unpersist()

  def union(dfs: Seq[DataFrame]): DataFrame =
    dfs.reduce(_ unionAll _)

  /** Union by column name (reference tables are name-addressed). */
  def unionByName(dfs: Seq[DataFrame]): DataFrame =
    dfs.reduce(_ unionByName _)

  def slice(df: DataFrame, offset: Long, length: Long): DataFrame =
    df.offset(offset.toInt).limit(length.toInt)

  def intersect(a: DataFrame, b: DataFrame): DataFrame = a.intersect(b)
  def exceptAll(a: DataFrame, b: DataFrame): DataFrame = a.exceptAll(b)
}
