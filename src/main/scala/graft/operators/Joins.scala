package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.broadcast

/** Distributed joins with the reference's surface: 5 join types, multi-key equi
  * joins, null-safe key matching, and explicit broadcast control.
  *
  * Reference semantics (cpp/include/legate_dataframe/join.hpp:25-46,
  * cpp/src/join.cpp:33-53,111-228): INNER/LEFT/FULL/SEMI/ANTI, hash-repartition
  * both sides by key unless one side is broadcast, `nulls_equal` flag makes null
  * keys compare equal.
  *
  * Spark-first design: we declare the join and let Catalyst pick
  * broadcast-hash / shuffled-hash / sort-merge; `BroadcastSide` maps to the
  * `broadcast()` hint (the reference's `BroadcastInput::{LEFT,RIGHT}`), AUTO maps
  * to no hint (Catalyst's `autoBroadcastJoinThreshold` + AQE demotion decide).
  * `nullsEqual=true` maps to `<=>` (`Column.eqNullSafe`) — Catalyst still plans
  * hash joins for null-safe equality, so the scale path is unchanged.
  */
object Joins {

  sealed trait BroadcastSide
  case object Auto extends BroadcastSide
  case object BroadcastLeft extends BroadcastSide
  case object BroadcastRight extends BroadcastSide

  /** Valid Spark join type strings for the reference's five join types. */
  val JoinTypes: Set[String] = Set("inner", "left", "full", "semi", "anti")

  /** Equi-join on equally-named key columns (output keeps one copy of the keys).
    *
    * With `nullsEqual=false` this is plain `join(..., keys, how)`. With
    * `nullsEqual=true` we build `l.k <=> r.k` conditions and coalesce the key
    * columns afterwards so the output shape matches the same-name join
    * (mirrors the reference's coalesced-key output, cpp/src/join.cpp:111-228).
    */
  def join(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      how: String = "inner",
      nullsEqual: Boolean = false,
      bcast: BroadcastSide = Auto): DataFrame = {
    require(JoinTypes.contains(how), s"unsupported join type: $how")
    val (l, r) = bcast match {
      case Auto => (left, right)
      case BroadcastLeft => (broadcast(left), right)
      case BroadcastRight => (left, broadcast(right))
    }
    if (!nullsEqual) l.join(r, keys, sparkHow(how))
    else {
      val cond = keys.map(k => l(k) <=> r(k)).reduce(_ && _)
      val joined = l.join(r, cond, sparkHow(how))
      how match {
        case "semi" | "anti" => joined // right columns are not in the output
        case _ =>
          // keep a single, coalesced copy of each key column, like the
          // same-name join path does
          import org.apache.spark.sql.functions.coalesce
          val keyCols = keys.map(k => coalesce(l(k), r(k)).as(k))
          val lRest = left.columns.filterNot(keys.contains).map(l(_))
          val rRest = right.columns.filterNot(keys.contains).map(r(_))
          joined.select(keyCols ++ lRest ++ rRest: _*)
      }
    }
  }

  /** General-condition join for unequal key names / expressions. */
  def joinOn(
      left: DataFrame,
      right: DataFrame,
      cond: Column,
      how: String = "inner",
      bcast: BroadcastSide = Auto): DataFrame = {
    require(JoinTypes.contains(how), s"unsupported join type: $how")
    val (l, r) = bcast match {
      case Auto => (left, right)
      case BroadcastLeft => (broadcast(left), right)
      case BroadcastRight => (left, broadcast(right))
    }
    l.join(r, cond, sparkHow(how))
  }

  /** Salted join for skewed keys: the big (probe) side gets a deterministic
    * salt in [0, saltBuckets) derived from its non-key columns; the small
    * (build) side is replicated once per salt value. A hot key's rows then
    * spread over `saltBuckets` reducers instead of one. Use when AQE's
    * skew-join splitting isn't available (e.g. forced shuffled-hash) or the
    * skew is extreme; result is identical to `join`.
    */
  def saltedJoin(
      big: DataFrame,
      small: DataFrame,
      keys: Seq[String],
      how: String = "inner",
      saltBuckets: Int = 16): DataFrame = {
    require(how == "inner" || how == "left", "salted join preserves the big side only")
    import org.apache.spark.sql.functions.{col => c, explode, lit, pmod, sequence, xxhash64}
    val nonKey = big.columns.filterNot(keys.contains)
    val saltSrc = if (nonKey.nonEmpty) nonKey.map(c).toSeq else keys.map(c)
    val bigS = big.withColumn("__graft_salt",
      pmod(xxhash64(saltSrc: _*), lit(saltBuckets.toLong)).cast("int"))
    val smallS = small.withColumn("__graft_salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    bigS.join(smallS, keys :+ "__graft_salt", sparkHow(how)).drop("__graft_salt")
  }

  /** As-of join (backward, inclusive): for each left row, attach the value
    * columns of the LATEST right row with the same keys and
    * `rightTime <= leftTime` — the event-alignment primitive (trades joined
    * to most-recent quote, clicks to the last preceding purchase, …).
    *
    * Beyond the reference's surface, but core to time-series/training-data
    * pipelines. Spark has no AsOfJoin operator in the DataFrame API, and a
    * naive range-condition join degenerates to a per-key cross product.
    * Implementation: tag and union both sides, ONE shuffle on the keys,
    * per-partition sort by (time, tag), and `last(value, ignoreNulls)` over
    * the running window carries the most recent right values forward onto
    * left rows. Cost is O(n log n) per partition with no pair blow-up —
    * the shape that survives 100 TB (contrast: pairwise range join is
    * O(left×right) per key).
    *
    * Ties: a right row at exactly leftTime is visible (inclusive). Multiple
    * right rows at the same (keys, time): the last one in `tieBreak` order
    * wins — pass a unique column to make results deterministic.
    *
    * `how` = "inner" (drop left rows with no preceding right row) or "left"
    * (keep them with null values). Forward as-of = negate both time columns.
    *
    * `tolerance` (pandas merge_asof semantics): a predicate on
    * (leftTime, matchedRightTime); when it returns false the match is
    * treated as absent (dropped for "inner", nulled for "left") — e.g.
    * `Some((l, r) => unix_micros(l) - unix_micros(r) <= lit(30L * 60 * 1000000))`
    * keeps only matches within 30 minutes. Evaluated after the window carry,
    * so the single-shuffle plan shape is unchanged.
    *
    * `direction` (pandas merge_asof's three strategies):
    *   - `"backward"` (default): latest right row with rightTime <= leftTime;
    *     among same-(keys, time) right rows the LAST in `tieBreak` order wins.
    *   - `"forward"`: earliest right row with rightTime >= leftTime — the
    *     same one-shuffle plan with the window frame reflected
    *     (`first` over [current, following]); among same-time right rows the
    *     FIRST in `tieBreak` order wins.
    *   - `"nearest"`: whichever of the two candidates is closer in time,
    *     ties to backward (pandas convention). Computes both carries over
    *     the SAME shuffle (the second window only re-sorts locally — no
    *     extra exchange), applies `tolerance` to each candidate BEFORE
    *     choosing (a nearer-but-stale match must not shadow a farther valid
    *     one). Requires a numeric or timestamp time column (distance =
    *     difference of double casts — exact through 2^53, i.e. past
    *     year-2200 epoch micros).
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      valueCols: Seq[String],
      how: String = "inner",
      tieBreak: Seq[String] = Nil,
      tolerance: Option[(Column, Column) => Column] = None,
      direction: String = "backward"): DataFrame = {
    require(how == "inner" || how == "left", s"asofJoin supports inner/left, got: $how")
    require(Set("backward", "forward", "nearest")(direction),
      s"asofJoin direction must be backward/forward/nearest, got: $direction")
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.{abs, col => c, first, last, when}
    val (union, lPayload) =
      asofTagged(left, right, keys, leftTime, rightTime, valueCols)
    // Backward: right rows (tag 0) sort before left rows at equal time →
    // inclusive under the [unboundedPreceding, current] frame. Forward
    // mirrors it: tag DESC puts right rows after left at equal time, frame
    // [current, unboundedFollowing], `first` instead of `last`. The right
    // values travel as ONE struct: non-null marks "a right row exists" even
    // when its value columns are null, so inner-match detection and null
    // value semantics are exact.
    val rvIfRight = when(c("__graft_tag") === 0, asofRvStruct(valueCols))
    def bwdCol = {
      val ord = (Seq(c("__graft_t"), c("__graft_tag")) ++ tieBreak.map(c)): Seq[Column]
      last(rvIfRight, ignoreNulls = true).over(
        Window.partitionBy(keys.map(c): _*).orderBy(ord: _*)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    }
    def fwdCol = {
      val ord = (Seq(c("__graft_t").asc, c("__graft_tag").desc) ++ tieBreak.map(c)): Seq[Column]
      first(rvIfRight, ignoreNulls = true).over(
        Window.partitionBy(keys.map(c): _*).orderBy(ord: _*)
          .rowsBetween(Window.currentRow, Window.unboundedFollowing))
    }
    val carried = direction match {
      case "backward" => union.withColumn("__graft_rv", bwdCol)
      case "forward" => union.withColumn("__graft_rv", fwdCol)
      case "nearest" =>
        val u2 = union
          .withColumn("__graft_b", bwdCol)
          .withColumn("__graft_f", fwdCol)
        // tolerance gates each candidate independently, then the survivor
        // closer to leftTime wins (tie → backward)
        def gated(s: Column) = tolerance.fold(s) { f =>
          when(s.isNotNull && f(c("__graft_t"), s.getField("__graft_rt")), s)
        }
        val b = gated(c("__graft_b"))
        val f = gated(c("__graft_f"))
        def dist(s: Column) =
          abs(c("__graft_t").cast("double") - s.getField("__graft_rt").cast("double"))
        u2.withColumn("__graft_rv",
            when(b.isNull, f).when(f.isNull, b)
              .otherwise(when(dist(b) <= dist(f), b).otherwise(f)))
          .drop("__graft_b", "__graft_f")
    }
    val leftOnly = carried.filter(c("__graft_tag") === 1)
    // nearest already consumed the tolerance; backward/forward apply it in
    // the shared tail
    val tailTol = if (direction == "nearest") None else tolerance
    asofFinish(leftOnly, keys, leftTime, lPayload, valueCols, how, tailTol)
  }

  /** Skew-immune as-of join: identical semantics to [[asofJoin]], different
    * plan shape for HOT KEYS. The plain form partitions the window by the
    * join keys, so one hot key (or `keys = Nil`) funnels every row of that
    * key through a single task — the classic window-skew wall at scale.
    *
    * This variant decomposes the running carry into a segmented scan over
    * TIME BUCKETS (`bucket` must be monotone non-decreasing in the time
    * column, e.g. `t => floor(unix_micros(t) / lit(3600L * 1000000))`):
    *
    *   1. within-bucket carry — window over (keys, bucket): a hot key's rows
    *      spread across as many tasks as it has buckets;
    *   2. per-(keys, bucket) LAST right-row struct — one aggregate row per
    *      bucket — then the carry-in of each bucket via a window over keys
    *      ordered by bucket (one ROW per bucket, so the hot-key partition
    *      holds #buckets rows, not #rows);
    *   3. equi-join the carry-in back on (keys, bucket);
    *      final carry = coalesce(local, carry-in).
    *
    * Three shuffles instead of one — pay it when a key can dominate a
    * partition; ScaleProbe's `asof` section measures the crossover (one key
    * holding 50% of rows).
    */
  def asofJoinBucketed(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      valueCols: Seq[String],
      bucket: Column => Column,
      how: String = "inner",
      tieBreak: Seq[String] = Nil,
      tolerance: Option[(Column, Column) => Column] = None): DataFrame = {
    require(how == "inner" || how == "left",
      s"asofJoinBucketed supports inner/left, got: $how")
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.{coalesce, col => c, last, max, struct, when}
    val (union0, lPayload) =
      asofTagged(left, right, keys, leftTime, rightTime, valueCols)
    val union = union0.withColumn("__graft_b", bucket(c("__graft_t")))
    val grp = (keys :+ "__graft_b").map(c)

    // 1. within-bucket running carry (same ordering as the plain form)
    val ordering = (Seq("__graft_t", "__graft_tag") ++ tieBreak).map(c)
    val wLocal = Window.partitionBy(grp: _*).orderBy(ordering: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = union.withColumn("__graft_rv_local",
      last(when(c("__graft_tag") === 0, asofRvStruct(valueCols)),
        ignoreNulls = true).over(wLocal))

    // 2. last right row per (keys, bucket), ordered by (time, tieBreak) via
    // lexicographic struct max; buckets with only left rows keep a row with
    // a null struct so the carry-in scan below sees every populated bucket
    val ordStruct = struct(
      (Seq(c("__graft_t")) ++ tieBreak.map(c)) :+
        asofRvStruct(valueCols).as("__graft_rv"): _*)
    val bucketLast = union
      .groupBy(grp: _*)
      .agg(max(when(c("__graft_tag") === 0, ordStruct)).as("__graft_ord"))
    val wIn = Window.partitionBy(keys.map(c): _*).orderBy(c("__graft_b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val carryIn = bucketLast
      .withColumn("__graft_rv_in",
        last(c("__graft_ord.__graft_rv"), ignoreNulls = true).over(wIn))
      .drop("__graft_ord")

    // 3. attach carry-in and resolve. NULL-SAFE equality (<=>) on
    // (keys, bucket): a USING join would silently drop left rows whose key
    // or time (⇒ bucket) is null, but window partitioning — the plain
    // asofJoin's carry mechanism — groups nulls like any other value, and
    // the contract here is identical semantics (how="left" keeps null-key
    // left rows, with null carried values).
    val lo = local.as("__graft_lo")
    val ci = carryIn.as("__graft_ci")
    val cond = (keys :+ "__graft_b")
      .map(k => c(s"__graft_lo.$k") <=> c(s"__graft_ci.$k")).reduce(_ && _)
    val carried = lo.join(ci, cond)
      .select(local.columns.map(n => c(s"__graft_lo.$n")) :+
        c("__graft_ci.__graft_rv_in"): _*)
      .withColumn("__graft_rv",
        coalesce(c("__graft_rv_local"), c("__graft_rv_in")))
      .filter(c("__graft_tag") === 1)
    asofFinish(carried, keys, leftTime, lPayload, valueCols, how, tolerance)
  }

  /** Tag-and-union both as-of sides into one layout:
    * (keys…, __graft_t, __graft_tag, left payload…, value cols…).
    * Returns the union and the left payload column names.
    */
  private def asofTagged(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      valueCols: Seq[String]): (DataFrame, Seq[String]) = {
    import org.apache.spark.sql.functions.{col => c, lit}
    val lCols = left.columns.toSeq
    require(!lCols.contains("__graft_tag"), "column name __graft_tag is reserved")
    val lPayload = lCols.filterNot(keys.contains).filterNot(_ == leftTime)
    val taggedLeft = left.select(
      keys.map(c) ++ Seq(c(leftTime).as("__graft_t"), lit(1).as("__graft_tag")) ++
        lPayload.map(c) ++ valueCols.map(v => lit(null).cast(right.schema(v).dataType).as(v)): _*)
    val taggedRight = right.select(
      keys.map(c) ++ Seq(c(rightTime).as("__graft_t"), lit(0).as("__graft_tag")) ++
        lPayload.map(p => lit(null).cast(left.schema(p).dataType).as(p)) ++ valueCols.map(c): _*)
    (taggedLeft.unionByName(taggedRight), lPayload)
  }

  /** The carried right-row struct: its own time first (so a tolerance
    * predicate can see it after the carry), then the value columns.
    */
  private def asofRvStruct(valueCols: Seq[String]): Column = {
    import org.apache.spark.sql.functions.{col => c, struct}
    struct(c("__graft_t").as("__graft_rt") +: valueCols.map(c): _*)
  }

  /** Shared as-of tail: tolerance check, output projection, inner filter. */
  private def asofFinish(
      carried: DataFrame,
      keys: Seq[String],
      leftTime: String,
      lPayload: Seq[String],
      valueCols: Seq[String],
      how: String,
      tolerance: Option[(Column, Column) => Column]): DataFrame = {
    import org.apache.spark.sql.functions.{col => c, lit, when}
    val matched = tolerance.foldLeft(c("__graft_rv").isNotNull) {
      case (base, f) => base && f(c("__graft_t"), c("__graft_rv.__graft_rt"))
    }
    val out = carried
      .select(keys.map(c) ++ Seq(c("__graft_t").as(leftTime)) ++ lPayload.map(c) ++
        valueCols.map(v =>
          when(matched, c(s"__graft_rv.$v")).otherwise(lit(null)).as(v)) :+
        matched.as("__graft_m"): _*)
    val res =
      if (how == "left") out
      else out.filter(c("__graft_m"))
    res.drop("__graft_m")
  }

  /** Binned range join: inner-join left rows whose `leftVal` lies in the
    * (inclusive) interval [`lo`, `hi`] of a right row, with optional extra
    * equi-keys (present under the same name on both sides).
    *
    * A naive range predicate plans as BroadcastNestedLoopJoin / cartesian —
    * O(|L|·|R|) and a non-starter at scale. Here each right interval is
    * exploded onto the fixed-width bins it overlaps and each left row onto
    * the single bin containing its value, turning the range predicate into
    * an EQUI-join on (equiKeys…, bin) that Catalyst plans as a hash or
    * sort-merge join — one shuffle on the bin key — followed by the exact
    * interval filter. Each matching pair meets in exactly one bin (the
    * left row's), so no dedup pass is needed.
    *
    * `binWidth` trades replication for selectivity: a right row is
    * replicated ⌈span/binWidth⌉+1 times, a bin holds values within binWidth
    * of each other. Set it near the typical interval width (replication
    * ≈ 2×); the per-bucket row counts stay bounded for non-degenerate value
    * distributions, and AQE's skew-join split handles hot bins.
    *
    * Output: all left columns, then right columns minus the shared equi-keys.
    */
  def rangeJoin(
      left: DataFrame,
      right: DataFrame,
      leftVal: String,
      lo: String,
      hi: String,
      binWidth: Double,
      equiKeys: Seq[String] = Nil): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive: $binWidth")
    import org.apache.spark.sql.functions.{col => c, explode, floor, lit, sequence}
    val binCol = "__graft_bin"
    require(!left.columns.contains(binCol) && !right.columns.contains(binCol),
      s"column name $binCol is reserved")
    val lb = left.withColumn(binCol, floor(c(leftVal) / binWidth).cast("long")).as("l")
    val rb = right
      .filter(c(lo) <= c(hi))
      .withColumn(binCol, explode(sequence(
        floor(c(lo) / binWidth).cast("long"), floor(c(hi) / binWidth).cast("long"), lit(1L))))
      .as("r")
    val keyCond = (equiKeys :+ binCol).map(k => c(s"l.$k") === c(s"r.$k"))
    val rangeCond = c(s"l.$leftVal") >= c(s"r.$lo") && c(s"l.$leftVal") <= c(s"r.$hi")
    val rightKeep = right.columns.filterNot(equiKeys.contains)
    lb.join(rb, (keyCond :+ rangeCond).reduce(_ && _), "inner")
      .select(left.columns.map(n => c(s"l.$n")) ++ rightKeep.map(n => c(s"r.$n")): _*)
  }

  /** Interval-overlap join: inner-join left rows whose interval
    * [`lLo`, `lHi`] overlaps a right row's interval [`rLo`, `rHi`]
    * (inclusive bounds, overlap iff `lLo <= rHi && rLo <= lHi`), with
    * optional extra equi-keys (same name on both sides).
    *
    * The two-sided sibling of [[rangeJoin]] (point-in-interval): both sides
    * carry intervals, so BOTH explode onto the fixed-width bins their
    * interval covers and meet on an EQUI-join over (equiKeys…, bin) — a
    * plain hash/sort-merge shuffle, never a nested-loop/cartesian plan.
    * Unlike the point case, an overlapping pair shares EVERY bin their
    * intervals jointly cover, so a naive bin-join would duplicate it; a
    * distinct pass afterwards would be a second full shuffle. Instead each
    * pair is kept only in the bin containing `greatest(lLo, rLo)` — the
    * overlap's start, which by definition lies in both intervals, so both
    * sides are guaranteed to have exploded onto that bin and every
    * overlapping pair survives in exactly one bin. No dedup shuffle.
    *
    * `binWidth` trades replication for bucket selectivity exactly as in
    * [[rangeJoin]]: a row is replicated ⌈span/binWidth⌉+1 times; set it
    * near the typical interval span. Skewed bins fall to AQE's skew split.
    *
    * Output: all left columns, then right columns minus the shared
    * equi-keys. Rows with null bounds or inverted intervals (lo > hi)
    * produce no matches, matching the SQL overlap predicate's semantics.
    */
  def intervalJoin(
      left: DataFrame,
      right: DataFrame,
      lLo: String,
      lHi: String,
      rLo: String,
      rHi: String,
      binWidth: Double,
      equiKeys: Seq[String] = Nil): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive: $binWidth")
    import org.apache.spark.sql.functions.{col => c, explode, floor, greatest, lit, sequence}
    val binCol = "__graft_bin"
    require(!left.columns.contains(binCol) && !right.columns.contains(binCol),
      s"column name $binCol is reserved")
    require(Seq(lLo, lHi).forall(n => !right.columns.contains(n)) &&
      Seq(rLo, rHi).forall(n => !left.columns.contains(n)),
      "interval bound column names must not collide across sides")
    def bins(df: DataFrame, lo: String, hi: String) =
      df.filter(c(lo).isNotNull && c(hi).isNotNull && c(lo) <= c(hi))
        .withColumn(binCol, explode(sequence(
          floor(c(lo) / binWidth).cast("long"),
          floor(c(hi) / binWidth).cast("long"), lit(1L))))
    val lb = bins(left, lLo, lHi).as("l")
    val rb = bins(right, rLo, rHi).as("r")
    val keyCond = (equiKeys :+ binCol).map(k => c(s"l.$k") === c(s"r.$k"))
    val overlap = c(s"l.$lLo") <= c(s"r.$rHi") && c(s"r.$rLo") <= c(s"l.$lHi")
    val meetOnce = c(s"l.$binCol") ===
      floor(greatest(c(s"l.$lLo"), c(s"r.$rLo")) / binWidth).cast("long")
    val rightKeep = right.columns.filterNot(equiKeys.contains)
    lb.join(rb, (keyCond :+ overlap :+ meetOnce).reduce(_ && _), "inner")
      .select(left.columns.map(n => c(s"l.$n")) ++ rightKeep.map(n => c(s"r.$n")): _*)
  }

  private def sparkHow(how: String): String = how match {
    case "full" => "full_outer"
    case "semi" => "left_semi"
    case "anti" => "left_anti"
    case other => other
  }

  /** Bloom-filter-pruned semi join: `fact SEMI JOIN dim ON factKey = dimKey`,
    * with a distributed Bloom filter of the dim keys applied to the fact side
    * BEFORE the join's shuffle.
    *
    * This is the manual form of Spark's runtime row-level filtering
    * (`spark.sql.optimizer.runtime.bloomFilter.*`), exposed as an operator so
    * the pruning is guaranteed rather than cost-model-dependent: at 100 TB the
    * fact-side shuffle dominates a selective semi join, and a ~1 MiB sketch
    * that drops non-matching rows at the scan cuts that shuffle by the key
    * selectivity (false positives only pass rows the exact join then drops,
    * so the result is exactly the plain semi join).
    *
    * Fully lazy: the filter is a scalar subquery over
    * `dim.select(bloom_filter_agg(xxhash64(dimKey)))` — one partial+final
    * aggregate producing a single binary sketch, evaluated by Spark's subquery
    * machinery at execution time (no driver action at build time). Null fact
    * keys may pass the sketch (xxhash64 hashes them to the seed) but never
    * survive the exact null-rejecting semi join, matching plain-join
    * semantics.
    *
    * `expectedItems` sizes the sketch (bits = expectedItems × 8, capped at
    * 64 Mi): size it at the dim-side distinct-key estimate; oversizing only
    * costs sketch bytes, undersizing only false-positive rate (never
    * correctness).
    */
  def bloomSemiJoin(
      fact: DataFrame,
      dim: DataFrame,
      factKey: String,
      dimKey: String,
      expectedItems: Long = 1000000L): DataFrame = {
    require(expectedItems > 0, s"expectedItems must be positive: $expectedItems")
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, ScalarSubquery, XxHash64}
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val numBits = math.min(expectedItems * 8L, 1L << 26)
    val bloomAgg = new BloomFilterAggregate(
      XxHash64(Seq(ColumnBridge.expression(dim(dimKey))), 42L),
      Literal(expectedItems), Literal(numBits)).toAggregateExpression()
    val bloomPlan = dim.select(ColumnBridge.column(bloomAgg).as("__graft_bloom"))
      .queryExecution.analyzed
    val mightContain = ColumnBridge.column(BloomFilterMightContain(
      ScalarSubquery(bloomPlan),
      XxHash64(Seq(ColumnBridge.expression(fact(factKey))), 42L)))
    fact.filter(mightContain)
      .join(dim, fact(factKey) === dim(dimKey), "left_semi")
  }

  /** Blocked fuzzy (edit-distance) join for entity resolution: pairs whose
    * string keys are within `maxDist` Levenshtein edits.
    *
    * Scale shape: NEVER a cross join. For `maxDist = 1` (the common entity-
    * resolution setting) the blocking is the SymSpell / FastSS deletion-
    * neighborhood scheme, split into three DISJOINT equi joins that each
    * collide a true pair exactly once — so there is no Levenshtein verify,
    * no pair dedup, and no false candidates at all:
    *   - J0 equal strings (dist 0): plain equi join on the string;
    *   - J1 substitution (same length, differ at exactly one position):
    *     deleting position i from both sides equalizes them iff i is the
    *     differing position, so both sides explode positional deletion keys
    *     (pos, delete-at-pos) and equi-join — a pair collides at exactly its
    *     one differing position;
    *   - J2 single insert/delete (length differs by 1): the shorter string
    *     IS a deletion of the longer, so the longer side explodes its
    *     DISTINCT deletion strings and equi-joins the shorter side's string
    *     (distinct: a run of equal chars yields the same deletion string
    *     for several positions — deduped per row, not per pair).
    * Exact for ALL string lengths ("x" vs "y" collides on the empty
    * deletion); q144's oracle brute-forces every pair in DuckDB and the
    * blocked result must match. The explode factor is len+1 keys per row;
    * candidate volume is output-sized, not block²-sized — first-char style
    * blocking collapses on low-entropy vocabularies (measured 36 s → ~2 s
    * at 20k parts sharing ~hundreds of names).
    *
    * For `maxDist >= 2`: two heuristic passes (same first char; same last
    * char) + thresholded-Levenshtein verify — the standard recall/cost
    * blocking trade (deeper deletion neighborhoods would stay exact but
    * cost O(len^maxDist) keys per row). Column names must be disjoint
    * across sides; output = left ++ right columns + `dist`.
    */
  def fuzzyJoin(
      lhs: DataFrame,
      rhs: DataFrame,
      leftCol: String,
      rightCol: String,
      maxDist: Int = 1): DataFrame = {
    import org.apache.spark.sql.functions._
    require(maxDist >= 0, s"maxDist must be >= 0: $maxDist")
    // internal column names follow the __graft_ convention; guard against
    // caller columns that would collide with them (or with the `dist`
    // output) — checked BEFORE the maxDist == 0 early return so the
    // exact-match path can't silently overwrite a caller's `dist` either
    val reserved = Seq("__graft_l", "__graft_r", "__graft_blk", "dist")
    val inUse = (lhs.columns ++ rhs.columns).toSet
    require(reserved.forall(n => !inUse.contains(n)),
      s"fuzzyJoin reserves column names ${reserved.mkString(", ")}; " +
        s"rename the conflicting input column(s): ${reserved.filter(inUse.contains).mkString(", ")}")
    val l = col(leftCol); val r = col(rightCol)
    if (maxDist == 0)
      return lhs.join(rhs, l === r).withColumn("dist", lit(0))
    // All pair matching runs on DISTINCT strings: real catalogs repeat
    // values heavily (part names repeat ~300× at sf0.1), so the
    // deletion-neighborhood explode and the pair join shrink by the
    // repetition factor; original rows re-attach by one equi join per
    // side at the end (row multiplicity n·m per matched value pair is
    // reproduced by those joins, identical to matching the raw rows).
    val ln = lhs.select(l.as("__graft_l")).distinct()
    val rn = rhs.select(r.as("__graft_r")).distinct()
    val lv = col("__graft_l"); val rv = col("__graft_r")
    val pairs: DataFrame = if (maxDist == 1) {
      val blk = "__graft_blk"
      // delete the i-th (1-based) character
      def delAt(c: Column, i: Column): Column =
        concat(c.substr(lit(1), i - 1), c.substr(i + 1, length(c)))
      // (position, deletion) keys; the length >= 1 pre-filter keeps the
      // 1..length sequence from descending
      def posKeys(c: Column): Column =
        transform(sequence(lit(1), length(c)),
          i => struct(i.as("pos"), delAt(c, i).as("k")))
      def delStrings(c: Column): Column =
        array_distinct(transform(sequence(lit(1), length(c)), i => delAt(c, i)))
      val j0 = ln.join(rn, lv === rv).withColumn("dist", lit(0))
      val j1 = ln.filter(length(lv) >= 1).withColumn(blk, explode(posKeys(lv)))
        .join(rn.filter(length(rv) >= 1).withColumn(blk, explode(posKeys(rv))), Seq(blk))
        .filter(length(lv) === length(rv) && lv =!= rv)
        .drop(blk).withColumn("dist", lit(1))
      val j2a = ln.filter(length(lv) >= 1).withColumn(blk, explode(delStrings(lv)))
        .join(rn.withColumn(blk, rv), Seq(blk))
        .drop(blk).withColumn("dist", lit(1))
      val j2b = ln.withColumn(blk, lv)
        .join(rn.filter(length(rv) >= 1).withColumn(blk, explode(delStrings(rv))), Seq(blk))
        .drop(blk).withColumn("dist", lit(1))
      j0.unionByName(j1).unionByName(j2a).unionByName(j2b)
    } else {
      val blk = "__graft_blk"
      def pass(f: Column => Column): DataFrame =
        ln.withColumn(blk, f(lv))
          .join(rn.withColumn(blk, f(rv)), Seq(blk))
          .drop(blk)
          .filter(abs(length(lv) - length(rv)) <= maxDist)
          .withColumn("dist", levenshtein(lv, rv, maxDist))
          .filter(col("dist") >= 0) // thresholded form returns -1 past maxDist
      pass(c => substring(c, 1, 1))
        .unionByName(pass(c => substring(c, -1, 1)))
        .distinct()
    }
    lhs.join(pairs, l === lv).join(rhs, rv === r)
      .select(lhs.columns.map(col) ++ rhs.columns.map(col) :+ col("dist"): _*)
  }
}
