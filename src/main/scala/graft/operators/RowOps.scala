package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Row-identity operators (SURVEY §2.2): filter, ternary, null-fill, set
  * membership, sequence. All embarrassingly parallel — no shuffle, and all
  * stay inside whole-stage codegen.
  */
object RowOps {

  /** `apply_boolean_mask(tbl, mask)` — null mask values drop the row
    * (stream_compaction.hpp:59: null → false). Spark's `filter` already treats
    * null predicates as false, so this is a direct mapping.
    */
  def applyBooleanMask(df: DataFrame, mask: Column): DataFrame = df.filter(mask)

  /** `copy_if_else(cond, lhs, rhs)` with scalar broadcast on either side
    * (copying.hpp:74) — `when/otherwise`; literals broadcast implicitly.
    */
  def ifElse(cond: Column, lhs: Column, rhs: Column): Column =
    when(cond, lhs).otherwise(rhs)

  /** `replace_nulls(col, scalar)` (replace.hpp:46) — Arrow `coalesce`. */
  def replaceNulls(c: Column, value: Any): Column = coalesce(c, lit(value))

  /** polars `drop_nulls` (dsl/expressions/unary.py:101-108): drop rows where
    * any of `cols` (or any column at all, if empty) is null. Explicit
    * `isNotNull` filters, NOT `df.na.drop` — Spark's na.drop also discards
    * NaN rows, but polars/Arrow treat NaN as a VALUE, only null as missing
    * (compose with [[maskNans]] to get the NaN-dropping form). Pure filter,
    * pushable to the scan.
    */
  def dropNulls(df: DataFrame, cols: Seq[String] = Nil): DataFrame = {
    val target = if (cols.isEmpty) df.columns.toSeq else cols
    df.filter(target.map(col(_).isNotNull).reduce(_ && _))
  }

  /** polars `mask_nans` (dsl/expressions/unary.py:101-108): NaN → null for a
    * float column (`nanvl` is codegen'd; nulls pass through unchanged).
    */
  def maskNans(c: Column): Column = nanvl(c, lit(null).cast("double"))

  /** `contains(haystack, needles)` (search.hpp:47): membership of each needle in
    * the haystack *column*. The reference broadcasts the haystack to every rank
    * (search.cpp:78); at scale the Spark analogue of a non-literal haystack is a
    * (broadcast) left-semi join, which Catalyst picks automatically when the
    * haystack side is small.
    */
  def isInLiterals(c: Column, values: Seq[Any]): Column = c.isin(values: _*)

  /** Column-vs-column membership as a broadcast semi-join marker column. */
  def isInColumn(df: DataFrame, needle: String, haystack: DataFrame, hayCol: String): DataFrame = {
    val hay = haystack.select(col(hayCol).as("__graft_hay")).distinct()
    df.join(broadcast(hay), col(needle) === col("__graft_hay"), "left")
      .withColumn(s"${needle}_in", col("__graft_hay").isNotNull)
      .drop("__graft_hay")
  }

  /** `sequence(size, init)` (filling.hpp:56) — `spark.range`, which already
    * computes each partition's slice from its offset exactly like
    * `evenly_partition_work` (utils.cpp:243).
    */
  /** `with_row_index` (polars Scan.row_index, ldf_polars dsl/ir.py:340-375):
    * add a 0-based (+`offset`) global index column in `sortCols` order.
    *
    * The reference indexes rows in single-scan order; a distributed scan has
    * no stable order, so the Spark-first contract makes the order EXPLICIT —
    * callers name the (ideally unique) sort key, mirroring polars'
    * `.sort(...).with_row_index()`. Scale path: range-partition on the key,
    * sort within partitions, then `zipWithIndex` — a count-only first pass
    * to size the per-partition offsets, no global single-partition sort, no
    * window over an unpartitioned frame (the classic driver-choke
    * anti-pattern for this op). Index = rank in sort order regardless of
    * where the range boundaries land; ties order arbitrarily within equal
    * keys (document keys should be unique for full determinism).
    */
  def withRowIndex(
      df: DataFrame, name: String, sortCols: Seq[Column],
      offset: Long = 0): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val sorted = df.repartitionByRange(sortCols: _*).sortWithinPartitions(sortCols: _*)
    val schema = StructType(sorted.schema.fields :+ StructField(name, LongType, nullable = false))
    val indexed = sorted.rdd.zipWithIndex().map { case (r, i) =>
      Row.fromSeq(r.toSeq :+ (i + offset))
    }
    sorted.sparkSession.createDataFrame(indexed, schema)
  }

  def sequence(spark: SparkSession, size: Long, init: Long = 0): DataFrame =
    spark.range(init, init + size).toDF("id")

  /** Deterministic split assignment (beyond-reference; every training
    * pipeline needs reproducible train/val/test partitions): each row's
    * integer key is multiplicatively hashed into [0, 1e6) and bucketed by
    * cumulative fraction thresholds. Row-local, no shuffle, no RNG state —
    * the same row lands in the same split on any cluster size or run,
    * unlike `randomSplit` (which is seed- AND partitioning-dependent).
    *
    * `splits` are (label, fraction) pairs; fractions must sum to 1.
    */
  /** Knuth multiplicative hash into [0, 1e6) — the shared bucket function of
    * [[assignSplit]]/[[stratifiedSample]]/[[weightedSample]]/[[packSequences]].
    * The key is reduced mod 1e6 BEFORE the multiply, so the product never
    * exceeds ~2.65e15 and the result is exact integer math for the whole
    * int64 key range (the naive `key * M % n` silently wraps past
    * |key| ≈ 3.5e9 with ANSI off, where engines diverge: Spark wraps, DuckDB
    * errors). Identical values to the naive form wherever it didn't wrap —
    * `(k·M) mod n = ((k mod n)·M) mod n` in exact arithmetic — so any SQL
    * engine reproduces the buckets with `(key % 1000000) * 2654435761 %
    * 1000000` at any key magnitude.
    */
  private def keyBucket(keyCol: Column): Column =
    pmod(pmod(keyCol, lit(1000000L)) * lit(2654435761L), lit(1000000L))

  def assignSplit(keyCol: Column, splits: Seq[(String, Double)]): Column = {
    require(splits.nonEmpty && math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      s"split fractions must sum to 1: $splits")
    val bucket = keyBucket(keyCol)
    val thresholds = splits.map(_._2).scanLeft(0.0)(_ + _).tail
      .map(f => math.round(f * 1000000L))
    splits.zip(thresholds).reverse.foldLeft(lit(null).cast("string")) {
      case (acc, ((label, _), thr)) => when(bucket < thr, label).otherwise(acc)
    }
  }

  /** Deterministic stratified sampling: keep a per-stratum fraction of rows,
    * chosen by the same multiplicative key hash as [[assignSplit]] — so the
    * sample is reproducible on any cluster size, composable with the splits
    * (a row's bucket is fixed), and needs no RNG or per-partition state.
    * Curation use: down-sample over-represented strata (languages, sources)
    * without a shuffle — this is a pure filter, pushed to the scan where the
    * stratum and key columns allow it.
    */
  def stratifiedSample(
      df: DataFrame,
      keyCol: String,
      strataCol: String,
      fractions: Map[String, Double],
      defaultFraction: Double): DataFrame = {
    require((fractions.values ++ Seq(defaultFraction)).forall(f => f >= 0 && f <= 1),
      s"fractions must be in [0,1]: $fractions default=$defaultFraction")
    val bucket = keyBucket(col(keyCol))
    val cutoff = fractions.foldLeft(lit(math.round(defaultFraction * 1000000L))) {
      case (acc, (stratum, f)) =>
        when(col(strataCol) === stratum, lit(math.round(f * 1000000L))).otherwise(acc)
    }
    df.filter(bucket < cutoff)
  }

  /** Deterministic weighted sampling: keep each row with probability equal to
    * its (row-computed) weight, clamped to [0,1] — e.g. sample documents
    * proportional to a quality score. Same multiplicative key hash as
    * [[assignSplit]], so the sample is reproducible on any cluster size and
    * composable with the splits; the per-row cutoff uses floor (not round)
    * so any IEEE engine reproduces the exact keep set. Pure filter — no RNG,
    * no shuffle, pushable when weight and key are scan columns.
    */
  def weightedSample(df: DataFrame, keyCol: String, weight: Column): DataFrame = {
    val bucket = keyBucket(col(keyCol))
    val cutoff = floor(least(greatest(weight, lit(0.0)), lit(1.0)) * lit(1000000.0))
    df.filter(bucket < cutoff)
  }

  /** Deterministic sequence packing for training-batch assembly: documents
    * are concatenated in a deterministic pseudo-shuffled order (the same
    * multiplicative key hash as [[assignSplit]], tie-broken by key) and cut
    * into fixed token-budget sequences; each document is assigned to the
    * sequence where it STARTS (concat-and-cut-with-truncation semantics —
    * the standard pretraining packing contract). Adds `start_offset` (tokens
    * before this doc in its partition's stream) and `seq_id`
    * (start_offset // budget).
    *
    * Scale design: the running offset is a window sum partitioned by
    * `partitionCols` — real pipelines pack per shard (language, source,
    * split), so each partition's prefix sum is independent and parallel; no
    * global total order is ever materialized. Pure integer arithmetic
    * ([[keyBucket]] is overflow-free over the whole int64 key range), so any
    * engine reproduces the exact same packing — PROVIDED `keyCol` is unique
    * within each partition: the stream order is (bucket, key), and duplicate
    * keys in one partition make the order (hence the packing) ambiguous.
    */
  def packSequences(
      df: DataFrame,
      keyCol: String,
      tokenCol: String,
      budget: Long,
      partitionCols: Seq[String]): DataFrame = {
    require(budget > 0, s"token budget must be positive, got $budget")
    require(partitionCols.nonEmpty,
      "packSequences needs >=1 partition column: a zero-partition global " +
        "prefix sum would serialize on one task at corpus scale")
    require(!df.columns.contains("start_offset") && !df.columns.contains("seq_id"),
      "packSequences adds start_offset/seq_id; rename the input's columns first")
    val shuffled = keyBucket(col(keyCol))
    val w = Window.partitionBy(partitionCols.map(col): _*)
      .orderBy(shuffled.asc, col(keyCol).asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("start_offset",
        coalesce(sum(col(tokenCol).cast("long")).over(w), lit(0L)))
      .withColumn("seq_id", call_function("div", col("start_offset"), lit(budget)))
  }

  /** Deterministic negative sampling for contrastive training pairs: for
    * each query row, draw `k` pseudo-random corpus rows ("negatives") —
    * without RNG state, without a cartesian product, and bit-reproducibly
    * on any cluster size (the same overflow-free multiplicative hashing as
    * [[assignSplit]], so any int64 engine replays the exact draw).
    *
    * Mechanics: every corpus row hashes to one of `buckets` buckets; every
    * (query, rank i < k) probe hashes to one bucket too. Probes equi-join
    * their bucket's corpus rows — one hash join, one shuffle on the bucket
    * id — then each (query, i) keeps the single candidate minimizing a
    * (query, i, candidate)-keyed tie-break hash, a partial+final min over a
    * struct, so the per-group candidate set never materializes anywhere.
    * Self-pairs (`cKey == qKey`) are excluded; known positives can be
    * excluded via `positives` — a two-column (query key, candidate key)
    * frame, matched by POSITION (an anti-join), so it works when the query
    * and corpus key columns share a name.
    *
    * Scale rule: pick `buckets ≈ |corpus| / c` for a small constant bucket
    * size c (~50-500). Work is then Θ(|queries|·k·c) join output rows plus
    * one corpus scan — independent of |corpus|·|queries| — and empty-bucket
    * misses are Poisson-negligible for c ≥ ~50. A (query, i) probe into an
    * empty bucket yields no row (k_eff < k), matching sampled-miss
    * semantics rather than inventing a fallback scan.
    *
    * Output: (qKey, neg_rank ∈ [0,k), neg_id).
    */
  def negativeSamples(
      queries: DataFrame,
      corpus: DataFrame,
      qKey: String,
      cKey: String,
      k: Int,
      buckets: Int,
      seed: Long = 0L,
      positives: Option[DataFrame] = None): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    require(buckets > 0, s"buckets must be positive: $buckets")
    require(seed >= 0 && seed < 1000000L, s"seed must be in [0, 1e6): $seed")
    val M = lit(1000000L)
    def mix(parts: Column, modulus: Long): Column =
      pmod(pmod(parts, M) * lit(2654435761L), lit(modulus))
    val cand = corpus.select(col(cKey).as("__graft_cid"))
      .withColumn("__graft_cb",
        mix(pmod(col("__graft_cid"), M) * lit(1000003L) + lit(seed), buckets.toLong))
    val probes = queries.select(col(qKey).as("__graft_qid"))
      .withColumn("neg_rank",
        explode(org.apache.spark.sql.functions.sequence(lit(0), lit(k - 1))))
      .withColumn("__graft_pb",
        mix(pmod(col("__graft_qid"), M) * lit(1000003L) +
          col("neg_rank") * lit(7919L) + lit(seed), buckets.toLong))
    val joined = probes
      .join(cand, col("__graft_pb") === col("__graft_cb"))
      .filter(col("__graft_cid") =!= col("__graft_qid"))
    val masked = positives.fold(joined) { p =>
      require(p.columns.length == 2,
        s"positives must have exactly (queryKey, candidateKey) columns, " +
          s"got ${p.columns.mkString(",")}")
      joined.join(p.toDF("__graft_qid", "__graft_cid"),
        Seq("__graft_qid", "__graft_cid"), "left_anti")
    }
    masked
      .withColumn("__graft_tb",
        mix(pmod(col("__graft_cid"), M) * lit(7919L) +
          pmod(col("__graft_qid"), M) * lit(104729L) + col("neg_rank"), 1000000L))
      .groupBy(col("__graft_qid"), col("neg_rank"))
      .agg(min(struct(col("__graft_tb"), col("__graft_cid"))).as("__graft_m"))
      .select(col("__graft_qid").as(qKey), col("neg_rank"),
        col("__graft_m").getField("__graft_cid").as("neg_id"))
  }
}
