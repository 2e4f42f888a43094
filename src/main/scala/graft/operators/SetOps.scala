package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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

  /** Spark's offset/limit take Int; a silent `.toInt` on a Long above
    * Int.MaxValue wraps negative and returns wrong (or empty) results —
    * at the 100 TB design point row positions past 2^31 are plausible, so
    * out-of-range positions fail loudly instead.
    */
  private def toIntExact(v: Long, what: String): Int = {
    require(v >= Int.MinValue && v <= Int.MaxValue,
      s"$what=$v exceeds Int range: Spark's offset/limit are Int-typed; " +
        "slice positions beyond 2^31-1 need a filter on a row-number column instead")
    v.toInt
  }

  def slice(df: DataFrame, offset: Long, length: Long): DataFrame = {
    require(offset >= 0 && length >= 0,
      "slice(offset, length) is non-negative; for python-style negative " +
        "indexing use sliceRange(df, keys, ascending, start, stop)")
    df.offset(toIntExact(offset, "offset")).limit(toIntExact(length, "length"))
  }

  /** Python-style half-open slice `[start, stop)` with NEGATIVE indexing
    * (reference `core/column.hpp:432-439`: `legate::Slice` supports negative
    * values and `Slice::OPEN` — pass `stop = None` for OPEN).
    *
    * Positional slicing needs a row order, so the sort keys come with the
    * call; every case composes from COUNT-FREE top-k plans (no `count()`
    * action, no job just to resolve the end of the table — at 100 TB that
    * pre-count would be a full scan):
    *
    *   - `start ≥ 0, stop ≥ 0` → `offset(start).limit(stop - start)`
    *   - `start < 0` (tail window) → reverse-sort, skip `|stop|` / take
    *     `|start|`, re-sort — both sorts are top-k-sized
    *   - `start ≥ 0, stop < 0` (drop last `|stop|`) → reverse-sort,
    *     `offset(|stop|)`, re-sort, then `offset(start)`
    *
    * The one inherently count-dependent combination (`start < 0, stop ≥ 0`,
    * e.g. `a[-5:10]`) is rejected: resolving it requires the total row
    * count; callers who want it should count explicitly and normalize.
    *
    * Determinism requires `keys` to totally order the frame — with duplicate
    * key tuples the rows at a slice boundary are interchangeable only if
    * bit-identical (same caveat as any positional op on a distributed sort).
    */
  def sliceRange(
      df: DataFrame,
      keys: Seq[String],
      ascending: Seq[Boolean],
      start: Long,
      stop: Option[Long]): DataFrame = {
    require(keys.nonEmpty && keys.length == ascending.length, "keys/ascending mismatch")
    val fwd = Sorts.orderCols(keys, ascending, nullsAtEnd = true)
    val rev = Sorts.orderCols(keys, ascending.map(!_), nullsAtEnd = false)
    def i(v: Long, what: String): Int = toIntExact(v, what)
    (start, stop) match {
      case (s, Some(e)) if s >= 0 && e >= 0 =>
        df.orderBy(fwd: _*).offset(i(s, "start")).limit(i(math.max(0L, e - s), "stop-start"))
      case (s, None) if s >= 0 =>
        df.orderBy(fwd: _*).offset(i(s, "start"))
      case (s, None) if s < 0 => // tail |s|
        df.orderBy(rev: _*).limit(i(-s, "-start")).orderBy(fwd: _*)
      case (s, Some(e)) if s < 0 && e < 0 => // tail |s| minus tail |e|
        df.orderBy(rev: _*).offset(i(-e, "-stop"))
          .limit(i(math.max(0L, -s + e), "stop-start")).orderBy(fwd: _*)
      case (s, Some(e)) if s >= 0 && e < 0 => // drop last |e|, skip first s
        df.orderBy(rev: _*).offset(i(-e, "-stop")).orderBy(fwd: _*).offset(i(s, "start"))
      case (s, e) =>
        throw new IllegalArgumentException(
          s"sliceRange(start=$s, stop=$e): a negative start with a " +
            "non-negative stop needs the total row count; count and normalize first")
    }
  }

  def intersect(a: DataFrame, b: DataFrame): DataFrame = a.intersect(b)
  def exceptAll(a: DataFrame, b: DataFrame): DataFrame = a.exceptAll(b)

  /** Snapshot diff (change-data-capture between two versions of a keyed
    * table): emits one row per key that was INSERTED, DELETED, or UPDATED
    * between `oldDf` and `newDf`, with the new-side values of `compareCols`
    * (null for deletes). Unchanged keys are dropped. The incremental-corpus
    * shape: "what changed since the last crawl" without re-processing the
    * unchanged 99%.
    *
    * Keys must be non-null and unique per snapshot (a snapshot IS a keyed
    * table); value comparison is null-safe (`<=>`), so a value flipping
    * to/from NULL is an update, not a match.
    *
    * Scale shape: one full-outer sort-merge/hash join on the key columns —
    * a single shuffle of each snapshot, no driver-side state. AQE handles
    * skewed keys; at 100 TB both sides would be bucketed on `keys` and the
    * join co-locates with zero mid-plan exchanges (see IO.writeBucketed).
    */
  def snapshotDiff(
      oldDf: DataFrame,
      newDf: DataFrame,
      keys: Seq[String],
      compareCols: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "need at least one key column")
    require(compareCols.nonEmpty, "need at least one compare column")
    val l = oldDf.select((keys ++ compareCols).map(col): _*)
      .withColumn("__graft_old", lit(1))
    val r = newDf.select(
      (keys ++ compareCols).map(c => col(c).as(s"__graft_r_$c")) :+
        lit(1).as("__graft_new"): _*)
    val cond = keys.map(k => col(k) === col(s"__graft_r_$k")).reduce(_ && _)
    val changed = compareCols
      .map(c => !(col(c) <=> col(s"__graft_r_$c"))).reduce(_ || _)
    val op = when(col("__graft_old").isNull, lit("insert"))
      .when(col("__graft_new").isNull, lit("delete"))
      .when(changed, lit("update"))
    l.join(r, cond, "full_outer")
      .withColumn("op", op)
      .filter(col("op").isNotNull)
      .select(
        keys.map(k => coalesce(col(k), col(s"__graft_r_$k")).as(k)) ++
          Seq(col("op")) ++
          compareCols.map(c => col(s"__graft_r_$c").as(s"new_$c")): _*)
  }

  /** Apply a CDC changeset to a snapshot — the inverse of [[snapshotDiff]],
    * i.e. lakehouse `MERGE INTO` re-expressed join-first. `changes` carries
    * full row images (the snapshot's columns) plus an op column
    * (`'I'`/`'U'`/`'D'` — insert/update/delete) and a monotone sequence
    * column ordering multiple changes to the same key: CDC streams arrive
    * out of order after any shuffle, and the winner must be the LAST change
    * per key, not an arbitrary one.
    *
    * Plan: one top-1-per-key ranking window over the changeset
    * ([[graft.operators.Sorts.topKPerGroup]] — `WindowGroupLimit` prunes to
    * one row per key per partition BEFORE its shuffle), then one anti-join
    * of the snapshot against the touched keys plus a union of the surviving
    * insert/update images. The snapshot is scanned exactly once; changesets
    * are normally a small fraction of the snapshot, so the anti-join
    * broadcasts. At 100 TB both sides bucket on `keys`
    * ([[graft.sources.IO.writeBucketed]]) and the merge runs exchange-free —
    * exactly how lakehouse MERGE executes incremental loads.
    *
    * Ties on (key, seq) break toward the op sorting last lexicographically
    * ('U' > 'I' > 'D' — an update outranks a same-sequence delete); real
    * pipelines should make `seqCol` unique per key.
    */
  def applyChanges(
      snapshot: DataFrame,
      changes: DataFrame,
      keys: Seq[String],
      opCol: String,
      seqCol: String): DataFrame = {
    require(keys.nonEmpty, "need at least one key column")
    val dataCols = snapshot.columns.toSeq
    require(!dataCols.contains(opCol) && !dataCols.contains(seqCol),
      s"snapshot must not already contain '$opCol'/'$seqCol'")
    require(changes.columns.toSet == (dataCols ++ Seq(opCol, seqCol)).toSet,
      "changes must carry the snapshot's columns plus op and sequence " +
        s"columns; got ${changes.columns.mkString(",")}")
    val latest = Sorts.topKPerGroup(changes, keys,
      Seq(col(seqCol).desc, col(opCol).desc), 1)
    val kept = snapshot.join(
      latest.select(keys.map(col): _*), keys, "left_anti")
    val upserts = latest.filter(col(opCol) =!= "D").select(dataCols.map(col): _*)
    kept.unionByName(upserts)
  }
}
