package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Row type for stateful sessionization (top-level: Catalyst's encoder
  * codegen needs public access). Instant keeps the full microsecond
  * precision of TimestampType (j.sql.Timestamp.getTime truncates to ms).
  */
case class SessEvent(user_id: Long, ts: java.time.Instant, event_id: Long)

/** Per-user open-session state carried across micro-batches: the one session
  * that may still grow (micros), plus the id the NEXT closed session gets.
  */
case class SessState(start: Long, end: Long, n: Long, nextId: Long)

/** Input/output rows for the transformWithState running-total processor
  * (top-level for Catalyst encoder codegen, like SessEvent).
  */
case class RtEvent(user_id: Long, event_id: Long, value: Double)
case class RtOut(user_id: Long, event_id: Long, running_cents: Long)

/** Input/output/state rows for the streaming TWAP processor (top-level for
  * Catalyst encoder codegen). State is the user's LAST seen sample — one
  * (epoch-micros, cents) pair, bounded regardless of stream length.
  */
case class TwEvent(user_id: Long, event_id: Long, us: Long, value: Double)
case class TwState(us: Long, qv: Long)
case class TwOut(user_id: Long, event_id: Long, gap_s: Long, w_cents: Long)

/** Streaming TWAP intervals: each arriving event CLOSES the interval opened
  * by the user's previous event, emitting (Δt seconds, prev-value·Δt) in
  * exact integers — downstream Σw/Σgap is the time-weighted average (the
  * live face of q227). Rows within a micro-batch fold in (us, event_id)
  * order, so any batch slicing that respects event-time order reproduces
  * the batch lag-window twin exactly.
  */
class TwapProcessor
    extends org.apache.spark.sql.streaming.StatefulProcessor[Long, TwEvent, TwOut] {
  import org.apache.spark.sql.streaming.{OutputMode, TimeMode, TimerValues, TTLConfig, ValueState}
  import org.apache.spark.sql.Encoders

  @transient private var last: ValueState[TwState] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    last = getHandle.getValueState[TwState]("last", Encoders.product[TwState], TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[TwEvent],
      timerValues: TimerValues): Iterator[TwOut] = {
    var st = if (last.exists()) Option(last.get()) else None
    val out = rows.toArray.sortBy(e => (e.us, e.event_id)).flatMap { e =>
      val qv = math.floor(e.value * 100 + 0.5).toLong
      val emitted = st.map { p =>
        val gapS = math.floorDiv(e.us - p.us, 1000000L)
        TwOut(key, e.event_id, gapS, p.qv * gapS)
      }
      st = Some(TwState(e.us, qv))
      emitted
    }
    st.foreach(last.update)
    out.iterator
  }
}

/** Input/output/state rows for the SESSIONIZED streaming TWAP processor
  * (top-level for Catalyst encoder codegen). State per user is one
  * (last micros, last cents, open session ordinal) triple — bounded
  * regardless of stream length or session count.
  */
case class StwEvent(user_id: Long, event_id: Long, us: Long, value: Double)
case class StwState(us: Long, qv: Long, sess: Long)
case class StwOut(user_id: Long, event_id: Long, session_id: Long,
    gap_s: Long, w_cents: Long)

/** Sessionized streaming TWAP: like [[TwapProcessor]], each event closes the
  * interval opened by the user's previous event — but an event more than
  * `gapUs` after its predecessor starts a NEW session instead (emitting
  * nothing: the inter-session gap is dead time, not exposure), and every
  * emitted interval carries its session ordinal. Downstream
  * Σw/Σgap per (user, session) is the per-session time-weighted average —
  * the composition of the q142 sessionization and q227 TWAP families in one
  * O(1)-state stateful operator. Integer arithmetic and (us, event_id) fold
  * order make stream == batch exact for any time-ordered batch slicing.
  */
class SessTwapProcessor(gapUs: Long)
    extends org.apache.spark.sql.streaming.StatefulProcessor[Long, StwEvent, StwOut] {
  import org.apache.spark.sql.streaming.{OutputMode, TimeMode, TimerValues, TTLConfig, ValueState}
  import org.apache.spark.sql.Encoders

  @transient private var last: ValueState[StwState] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    last = getHandle.getValueState[StwState]("last", Encoders.product[StwState], TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[StwEvent],
      timerValues: TimerValues): Iterator[StwOut] = {
    var st = if (last.exists()) Option(last.get()) else None
    val out = rows.toArray.sortBy(e => (e.us, e.event_id)).flatMap { e =>
      val qv = math.floor(e.value * 100 + 0.5).toLong
      val emitted = st match {
        case Some(p) if e.us - p.us <= gapUs =>
          val gapS = math.floorDiv(e.us - p.us, 1000000L)
          st = Some(StwState(e.us, qv, p.sess))
          Some(StwOut(key, e.event_id, p.sess, gapS, p.qv * gapS))
        case Some(p) => // gap exceeded: open the next session, emit nothing
          st = Some(StwState(e.us, qv, p.sess + 1))
          None
        case None =>
          st = Some(StwState(e.us, qv, 0L))
          None
      }
      emitted
    }
    st.foreach(last.update)
    out.iterator
  }
}

case class PdEvent(user_id: Long, event_id: Long, us: Long, value: Double)
case class PdOut(user_id: Long, event_id: Long, cents: Long, peak_cents: Long,
    drop_cents: Long)

/** Streaming per-user running price peak + drawdown from peak (the live,
  * per-key face of the q255 drawdown family): one ValueState[Long] holding
  * the lifetime max cents. Integer max/subtract only, folded in
  * (us, event_id) order, so stream == batch for any event-time-ordered
  * micro-batch slicing.
  */
class PeakDropProcessor
    extends org.apache.spark.sql.streaming.StatefulProcessor[Long, PdEvent, PdOut] {
  import org.apache.spark.sql.streaming.{OutputMode, TimeMode, TimerValues, TTLConfig, ValueState}
  import org.apache.spark.sql.Encoders

  @transient private var peak: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    peak = getHandle.getValueState[Long]("peak", Encoders.scalaLong, TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[PdEvent],
      timerValues: TimerValues): Iterator[PdOut] = {
    var p = if (peak.exists()) peak.get() else Long.MinValue
    val out = rows.toArray.sortBy(e => (e.us, e.event_id)).map { e =>
      val cents = math.floor(e.value * 100 + 0.5).toLong
      p = math.max(p, cents)
      PdOut(key, e.event_id, cents, p, p - cents)
    }
    peak.update(p)
    out.iterator
  }
}

/** `StatefulProcessor` keeping one ValueState[Long] per user: the lifetime
  * total in integer cents. Rows within a micro-batch are folded in event_id
  * order, so any batch slicing that respects event_id order reproduces the
  * batch cumulative sum exactly (integer addition — no FP order effects).
  */
class RunningTotalProcessor
    extends org.apache.spark.sql.streaming.StatefulProcessor[Long, RtEvent, RtOut] {
  import org.apache.spark.sql.streaming.{OutputMode, TimeMode, TimerValues, TTLConfig, ValueState}
  import org.apache.spark.sql.Encoders

  @transient private var total: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    total = getHandle.getValueState[Long]("total", Encoders.scalaLong, TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[RtEvent],
      timerValues: TimerValues): Iterator[RtOut] = {
    var acc = if (total.exists()) total.get() else 0L
    val out = rows.toArray.sortBy(_.event_id).map { e =>
      acc += math.floor(e.value * 100 + 0.5).toLong
      RtOut(key, e.event_id, acc)
    }
    total.update(acc)
    out.iterator
  }
}

/** Structured Streaming over the `events` table shape (beyond-reference: the
  * reference has no streaming surface, SURVEY §2.9).
  *
  * Design: `readStream` on a parquet directory → watermarked tumbling/sliding
  * window aggregation → sink. State is bounded by the watermark; the same
  * aggregation expressed in batch mode (see `tumblingAggBatch`) is what the
  * correctness oracle checks, per Structured Streaming's batch-equivalence
  * guarantee.
  */
object Events {

  /** events.parquet schema as stored: ts = timestamp[us] without timezone
    * (TIMESTAMP_NTZ). Earlier testdata rounds stored raw int64 nanoseconds —
    * `withTs` normalizes either physical type, so a stream over old-format
    * files still works by swapping `ts` to LongType here.
    */
  val rawSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampNTZType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Normalize `ts` to session-zone TimestampType from whatever physical type
    * the source delivered (int64 epoch-ns, TIMESTAMP_NTZ, or already
    * TimestampType) — same detection as `Engine.events`; the session zone is
    * UTC so the NTZ cast is value-preserving.
    */
  def withTs(df: DataFrame): DataFrame = df.schema("ts").dataType match {
    case LongType => df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    case TimestampType => df
    case _ => df.withColumn("ts", col("ts").cast(TimestampType))
  }

  /** Open the events directory as a stream (file source discovers new files —
    * the local stand-in for a Kafka-style source).
    */
  def readStream(spark: SparkSession, dir: String,
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val r = spark.readStream.schema(rawSchema)
    val r2 = maxFilesPerTrigger.fold(r)(n => r.option("maxFilesPerTrigger", n))
    withTs(r2.parquet(dir))
  }

  /** Watermarked tumbling-window aggregation (streaming). */
  def tumblingAgg(events: DataFrame, window_ : String = "1 hour", watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("total_value"))
      .select(
        col("window.start").as("wstart"),
        col("event_type"), col("n"), col("total_value"))

  /** Sliding-window aggregation (streaming). */
  def slidingAgg(events: DataFrame, window_ : String = "1 hour", slide: String = "15 minutes",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_, slide), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("wstart"), col("event_type"), col("n"))

  /** The same tumbling aggregation in batch form (oracle-comparable). */
  def tumblingAggBatch(events: DataFrame, window_ : String = "1 hour"): DataFrame =
    events
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("total_value"))
      .select(
        col("window.start").as("wstart"),
        col("event_type"), col("n"), col("total_value"))

  /** Batch sessionization: gap-based sessions per user (gap > `gapMinutes`
    * starts a new session). lag + cumulative-sum windows — the standard
    * columnar sessionize, one shuffle on user_id.
    */
  def sessionizeBatch(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val newSess = when(
      unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(byUser))
        > gapMinutes * 60000000L, 1).otherwise(0)
    events
      .withColumn("new_sess", coalesce(newSess, lit(0)))
      .withColumn("session_id", sum(col("new_sess"))
        .over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "session_id")
      .agg(
        count(lit(1)).as("n_events"),
        min(col("ts")).as("sess_start"),
        max(col("ts")).as("sess_end"))
  }


  /** Streaming sessionization with explicit state
    * (`flatMapGroupsWithState`) — the custom-state path of SURVEY §2.9.
    *
    * The open (possibly still growing) session per user lives in GroupState
    * across micro-batches; a session is EMITTED only once closed — either a
    * newer event opened the next session, or the event-time watermark passed
    * `sess_end + gap` (event-time timeout). Session ids are therefore stable
    * across any micro-batch slicing of the input, matching sessionizeBatch on
    * the emitted (closed) prefix. Admissible late events (above the
    * watermark but out of arrival order) are interval-merged against the
    * open session: one within gap of the open session extends it (lowering
    * `sess_start` if it precedes it), one more than gap earlier forms its
    * own earlier session. Events below the watermark are dropped by the
    * watermark filter, and a session already emitted as closed cannot be
    * reopened by a late event — the standard streaming approximations; keep
    * `watermark >= gap` so a timeout can never close a session that an
    * admissible late event could still extend.
    */
  def sessionizeStream(events: DataFrame, gapMinutes: Int = 30,
      watermark: String = "2 hours"): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = events.sparkSession
    import spark.implicits._
    val gapUs = gapMinutes * 60000000L
    val gapMs = gapMinutes * 60000L
    def micros(i: java.time.Instant): Long =
      i.getEpochSecond * 1000000L + i.getNano / 1000L
    def inst(us: Long): java.time.Instant =
      java.time.Instant.ofEpochSecond(us / 1000000L, (us % 1000000L) * 1000L)

    val typed = events.withWatermark("ts", watermark)
      .select(col("user_id"), col("ts"), col("event_id")).as[SessEvent]
    typed
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (userId: Long, rows: Iterator[SessEvent], state: GroupState[SessState]) => {
          def emit(id: Long, s: (Long, Long, Long)) =
            (userId, id, s._3, inst(s._1), inst(s._2))
          if (state.hasTimedOut) {
            // watermark passed open.end + gap: the open session can no longer
            // grow — close and emit it
            val s = state.get
            state.remove()
            Iterator.single(emit(s.nextId, (s.start, s.end, s.n)))
          } else {
            // fold this batch's events (sorted by event time) into sessions
            var batch: List[(Long, Long, Long)] = Nil
            val sorted = rows.toSeq.sortBy(e => (micros(e.ts), e.event_id))
            for (e <- sorted) {
              val t = micros(e.ts)
              batch match {
                case (s, end, n) :: rest if t - end <= gapUs =>
                  batch = (s, math.max(end, t), n + 1) :: rest
                case _ =>
                  batch = (t, t, 1L) :: batch
              }
            }
            // Merge with the open session carried from prior batches as an
            // INTERVAL merge on start-sorted sessions (chain when the gap
            // between neighbours is <= gap). An admissible late event that
            // precedes the open session therefore forms/extends its own
            // earlier session instead of being folded into the open one, and
            // an event landing within gap BEFORE the open session's start
            // lowers sess_start — matching what sessionizeBatch would do
            // with the same events.
            val seeded = state.getOption.map(s => (s.start, s.end, s.n)).toList
            val firstId = state.getOption.map(_.nextId).getOrElse(0L)
            val ordered = (seeded ++ batch.reverse).sortBy(_._1)
              .foldLeft(List.empty[(Long, Long, Long)]) {
                case ((s, e, n) :: acc, (s2, e2, n2)) if s2 - e <= gapUs =>
                  (math.min(s, s2), math.max(e, e2), n + n2) :: acc
                case (acc, sess) => sess :: acc
              }
              .reverse // oldest first
            val closed = ordered.dropRight(1)
            val open @ (_, openEnd, _) = ordered.last
            val timeoutMs = openEnd / 1000L + gapMs
            val wm = state.getCurrentWatermarkMs()
            // strict <: Spark's own event-time timeout fires only when the
            // watermark has strictly passed the timestamp, and an event AT
            // the watermark is still admissible (could extend the session)
            if (timeoutMs < wm) {
              // the "open" session is already unreachable by admissible events
              state.remove()
              (closed :+ open).zipWithIndex.iterator
                .map { case (s, i) => emit(firstId + i, s) }
            } else {
              state.update(SessState(open._1, open._2, open._3,
                firstId + closed.length))
              state.setTimeoutTimestamp(timeoutMs)
              closed.zipWithIndex.iterator
                .map { case (s, i) => emit(firstId + i, s) }
            }
          }
        })
      .toDF("user_id", "session_id", "n_events", "sess_start", "sess_end")
  }

  /** Stream-stream interval join (attribution): each click joins the same
    * user's purchases within `windowMinutes` BEFORE it. Both sides are
    * watermarked and the join condition carries the time bound, so Spark
    * retains only `watermark + window` of state per side — the bounded-state
    * shape that scales to unbounded streams (an unbounded-condition
    * stream-stream join would grow state forever).
    */
  def clickPurchaseJoin(events: DataFrame, windowMinutes: Int = 60,
      watermark: String = "2 hours"): DataFrame =
    intervalJoin(events, windowMinutes, Some(watermark), "inner")

  /** Batch twin of `clickPurchaseJoin` (oracle-comparable: equi-join on user
    * + time-range filter — one shuffle, same result as the streaming form).
    */
  def clickPurchaseJoinBatch(events: DataFrame, windowMinutes: Int = 60): DataFrame =
    intervalJoin(events, windowMinutes, None, "inner")

  /** Stream-stream LEFT OUTER interval join: like [[clickPurchaseJoin]] but
    * a click with no purchase in its window is KEPT, with null purchase
    * columns. In streaming, the null row for an unmatched click is emitted
    * only once the watermark passes `click_ts + window` — the earliest point
    * at which state can prove no matching purchase can still arrive (Spark's
    * outer-join-with-watermark contract). State stays bounded by
    * `watermark + window` per side, exactly as in the inner form — outer
    * semantics change WHEN unmatched rows flush, not how much state is held.
    */
  def clickPurchaseJoinOuter(events: DataFrame, windowMinutes: Int = 60,
      watermark: String = "2 hours"): DataFrame =
    intervalJoin(events, windowMinutes, Some(watermark), "leftOuter")

  /** Batch twin of [[clickPurchaseJoinOuter]] (oracle-comparable). */
  def clickPurchaseJoinOuterBatch(events: DataFrame, windowMinutes: Int = 60): DataFrame =
    intervalJoin(events, windowMinutes, None, "leftOuter")

  /** FULL OUTER stream-stream interval join: unmatched clicks AND unmatched
    * purchases are both kept (null columns on the absent side). An unmatched
    * click flushes once the watermark passes `click_ts + window` (as in the
    * left-outer form); an unmatched purchase flushes once the CLICK-side
    * watermark passes `p_ts + window` — the latest click that could still
    * match it. Same `watermark + window` state bound as the inner form.
    */
  def clickPurchaseJoinFull(events: DataFrame, windowMinutes: Int = 60,
      watermark: String = "2 hours"): DataFrame =
    intervalJoin(events, windowMinutes, Some(watermark), "fullOuter")

  /** Batch twin of [[clickPurchaseJoinFull]] (oracle-comparable). */
  def clickPurchaseJoinFullBatch(events: DataFrame, windowMinutes: Int = 60): DataFrame =
    intervalJoin(events, windowMinutes, None, "fullOuter")

  /** Shared shape of the attribution joins: clicks (left) against the same
    * user's purchases within `windowMinutes` BEFORE each click. `watermark`
    * present = streaming form (both sides watermarked so the join condition
    * bounds state); absent = batch twin on the identical plan.
    */
  private def intervalJoin(events: DataFrame, windowMinutes: Int,
      watermark: Option[String], joinType: String): DataFrame = {
    def wm(df: DataFrame, tsCol: String): DataFrame =
      watermark.fold(df)(w => df.withWatermark(tsCol, w))
    val clicks = wm(events.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("click_ts"),
        col("event_id").as("click_id")), "click_ts")
    val purchases = wm(events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("value").as("p_value")), "p_ts")
    clicks.join(purchases,
      col("user_id") === col("p_user") &&
        col("p_ts") <= col("click_ts") &&
        col("p_ts") >= col("click_ts") - expr(s"INTERVAL $windowMinutes MINUTES"),
      joinType)
      // coalesce is the identity for inner/left rows (p_user == user_id when
      // matched); it only matters for full-outer purchase-only rows, where
      // the click side is all-null
      .select(coalesce(col("user_id"), col("p_user")).as("user_id"),
        col("click_id"), col("click_ts"), col("p_ts"), col("p_value"))
  }

  /** Sessionization via Spark's built-in `session_window` (gap-based session
    * aggregation) — the declarative alternative to the explicit-state
    * `sessionizeStream`, usable in batch AND streaming. Returns the same
    * (user_id, n_events, sess_start, sess_end) shape as `sessionizeBatch`
    * minus the running session_id (the built-in doesn't number sessions).
    */
  def sessionizeWindow(events: DataFrame, gapMinutes: Int = 30): DataFrame =
    events
      .groupBy(col("user_id"), session_window(col("ts"), s"$gapMinutes minutes"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts")).as("sess_start"), max(col("ts")).as("sess_end"))
      .select("user_id", "n_events", "sess_start", "sess_end")

  /** Streaming exact dedup on event_id with watermark-bounded state — the
    * streaming face of the dedup operator family (drops replayed events).
    */
  def dedupStream(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** Batch twin of [[dedupStream]] (the oracle-gated face, q113 — same
    * pattern as clickPurchaseJoinBatch/q80): exact dedup on event_id,
    * planned as a partial+final aggregate. At-least-once replays are exact
    * row copies, so "keep one arbitrary row per id" is deterministic — the
    * survivor is bit-identical whichever copy it is (the same argument the
    * streaming form relies on).
    */
  def dedupBatch(events: DataFrame): DataFrame =
    events.dropDuplicates("event_id")

  /** Stream-static enrichment: join a (possibly unbounded) event stream to a
    * small static dimension table and aggregate per dimension attribute —
    * the canonical "enrich the firehose with reference data" shape. The dim
    * side is explicitly broadcast: each micro-batch (or each task, in batch
    * mode) probes an in-memory copy, so the stream side NEVER shuffles for
    * the join — the only shuffle is the final per-segment aggregate, whose
    * cardinality is the dimension attribute's. Works identically as a batch
    * plan and a streaming plan (stream-static joins need no watermark: the
    * static side is complete by definition).
    *
    * `sumDecimals`: the money-ish `value` sum goes through DECIMAL(18,2)
    * (exact, addition-order-independent) and back to double, per the
    * project-wide determinism rule.
    */
  def enrichedSegmentStats(
      events: DataFrame,
      dim: DataFrame,
      eventKey: String,
      dimKey: String,
      segmentCol: String): DataFrame =
    events.join(broadcast(dim), col(eventKey) === col(dimKey), "inner")
      .groupBy(col(segmentCol))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))

  /** Per-user running totals via `transformWithState` (Spark 4's arbitrary
    * stateful processing API — typed per-key state primitives over the
    * RocksDB state store; the successor to flatMapGroupsWithState used by
    * `sessionizeStream`). Each event emits the user's lifetime total
    * INCLUDING that event, in integer cents (floor-quantized once per
    * event), so stream == batch exactly with no floating-point order
    * sensitivity. State per key is ONE long — bounded regardless of stream
    * length; at cluster scale the processor shuffles once on user_id and the
    * RocksDB store spills past memory.
    *
    * Requires `spark.sql.streaming.stateStore.providerClass` =
    * RocksDBStateStoreProvider for the streaming form (set per-query in the
    * caller); the batch twin `runningTotalsBatch` needs nothing special.
    */
  def runningTotalsStream(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("user_id"), col("event_id"), col("value")).as[RtEvent]
      .groupByKey(_.user_id)
      .transformWithState(new RunningTotalProcessor,
        TimeMode.None(), OutputMode.Append())
      .toDF()
  }

  /** Streaming TWAP intervals via [[TwapProcessor]] (transformWithState,
    * RocksDB provider required — set by the caller like
    * [[runningTotalsStream]]). Each event closes its predecessor's interval;
    * Σ w_cents / Σ gap_s downstream is the live time-weighted average, and
    * the per-interval rows equal [[twapBatch]] exactly (integer arithmetic,
    * event-time fold order).
    */
  def twapStream(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("us"), col("value")).as[TwEvent]
      .groupByKey(_.user_id)
      .transformWithState(new TwapProcessor,
        TimeMode.None(), OutputMode.Append())
      .toDF()
  }

  /** Sessionized streaming TWAP intervals via [[SessTwapProcessor]]
    * (transformWithState, RocksDB provider required — set by the caller
    * like [[runningTotalsStream]]).
    */
  def sessTwapStream(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("us"), col("value")).as[StwEvent]
      .groupByKey(_.user_id)
      .transformWithState(new SessTwapProcessor(gapMinutes * 60000000L),
        TimeMode.None(), OutputMode.Append())
      .toDF()
  }

  /** Batch twin of [[sessTwapStream]]: lag windows assign each event its
    * predecessor's (time, cents), a cumulative new-session count numbers the
    * sessions from 0, and only within-session rows survive (an event that
    * opens a session closes no interval).
    */
  def sessTwapBatch(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val gapUs = gapMinutes * 60000000L
    val w = Window.partitionBy("user_id").orderBy("us", "event_id")
    events.select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("us"),
        floor(col("value") * 100 + 0.5).cast("long").as("qv"))
      .select(col("user_id"), col("event_id"), col("us"),
        lag(col("us"), 1).over(w).as("prev_us"),
        lag(col("qv"), 1).over(w).as("prev_qv"))
      .withColumn("new_sess", when(col("prev_us").isNull ||
        col("us") - col("prev_us") > gapUs, 1L).otherwise(0L))
      .withColumn("session_id", sum(col("new_sess")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)) - 1L)
      .filter(col("new_sess") === 0L)
      .select(col("user_id"), col("event_id"), col("session_id"),
        floor((col("us") - col("prev_us")) / 1000000.0).cast("long").as("gap_s"),
        (col("prev_qv") *
          floor((col("us") - col("prev_us")) / 1000000.0).cast("long")).as("w_cents"))
  }

  /** Streaming per-user peak/drawdown (see [[PeakDropProcessor]]). */
  def peakDropStream(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    val spark = events.sparkSession
    import spark.implicits._
    events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("us"), col("value")).as[PdEvent]
      .groupByKey(_.user_id)
      .transformWithState(new PeakDropProcessor,
        TimeMode.None(), OutputMode.Append())
      .toDF()
  }

  /** Batch twin of [[peakDropStream]]: a running-max window per user. */
  def peakDropBatch(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id")
      .orderBy(col("us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("us"),
        floor(col("value") * 100 + 0.5).cast("long").as("cents"))
      .withColumn("peak_cents", max(col("cents")).over(w))
      .withColumn("drop_cents", col("peak_cents") - col("cents"))
      .drop("us")
  }

  /** Batch twin of [[twapStream]]: one lag window per user in (ts, event_id)
    * order — the q227 TWAP decomposition attributed to the closing event.
    */
  def twapBatch(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("us", "event_id")
    events.select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("us"),
        floor(col("value") * 100 + 0.5).cast("long").as("qv"))
      .select(col("user_id"), col("event_id"),
        floor((col("us") - lag(col("us"), 1).over(w)) / 1000000.0)
          .cast("long").as("gap_s"),
        lag(col("qv"), 1).over(w).as("prev_qv"))
      .filter(col("gap_s").isNotNull)
      .select(col("user_id"), col("event_id"), col("gap_s"),
        (col("prev_qv") * col("gap_s")).as("w_cents"))
  }

  /** Batch twin of [[runningTotalsStream]]: a cumulative window sum over the
    * same integer-cents quantization, ordered by event_id within user.
    */
  def runningTotalsBatch(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events.select(col("user_id"), col("event_id"),
      sum(floor(col("value") * 100 + 0.5).cast("long")).over(w).as("running_cents"))
  }

  /** Streaming OHLC bars: the live face of `Analytics.ohlcBars` — per-key
    * tumbling-window open/high/low/close as a watermarked streaming
    * aggregate. `min_by`/`max_by` are ordinary declarative aggregates, so
    * the state per (user, window) is a constant five values; the watermark
    * bounds how many windows stay open. Bucket output matches the batch
    * form's epoch-micros bucketing (tumbling windows are epoch-aligned).
    */
  def ohlcStream(events: DataFrame, bar: String = "1 hour",
      watermark: String = "2 hours"): DataFrame = {
    val ord = struct(col("ts"), col("event_id"))
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), bar), col("user_id"))
      .agg(
        min_by(col("value"), ord).as("open"),
        max(col("value")).as("high"),
        min(col("value")).as("low"),
        max_by(col("value"), ord).as("close"),
        count(lit(1)).as("n"))
      .select(col("user_id"),
        unix_micros(col("window.start")).as("bucket_us"),
        col("open"), col("high"), col("low"), col("close"), col("n"))
  }

  /** Exactly-once checkpointed parquet sink: the streaming write path with
    * end-to-end recovery semantics. The file sink commits each micro-batch
    * to the `_spark_metadata` transaction log; a reader of `outDir` sees
    * ONLY committed files, and on restart from `checkpointDir` the source
    * resumes after the last committed batch — already-processed input files
    * are never re-emitted, partially-written output files are never visible.
    * Together: exactly-once from source offsets to sink contents across
    * arbitrary kill/restart, with no sink-side dedup needed.
    *
    * `Trigger.AvailableNow` drains everything currently in the source then
    * stops — the batch-boundary-preserving way to run a stream to quiescence
    * (unlike a `processAllAvailable` + `stop`, it also works for a fresh
    * process that only has the checkpoint).
    */
  def toParquetSink(streamed: DataFrame, outDir: String, checkpointDir: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    streamed.writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()

  /** End-to-end exactly-once demonstration over the static events table:
    * stage half the events, run the checkpointed sink to quiescence, stage
    * the rest (with the first half still listed in the source directory),
    * RESTART the query from the checkpoint alone, and read back the sink.
    * The first half must appear exactly once — the restart must neither
    * re-emit it (source offset replay) nor lose the tail. Returns the
    * committed sink contents quantized to integer cents.
    */
  def exactlyOnceReplay(spark: SparkSession, events: DataFrame,
      workDir: String): DataFrame = {
    val src = s"$workDir/src"; val out = s"$workDir/out"; val ck = s"$workDir/ck"
    val proj = events.select(col("event_id"), col("user_id"),
      floor(col("value") * 100 + 0.5).cast("long").as("cents"))
    val half1 = proj.filter(col("event_id") % 2 === 0)
    val half2 = proj.filter(col("event_id") % 2 =!= 0)
    half1.write.mode("overwrite").parquet(s"$src/h1")
    def run(): Unit = {
      val st = spark.readStream.schema(proj.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(s"$src/*")
      toParquetSink(st, out, ck).awaitTermination()
    }
    run() // first process: commits half1, then "dies"
    half2.write.mode("overwrite").parquet(s"$src/h2")
    run() // restart from checkpoint: must emit ONLY half2
    spark.read.parquet(out)
  }

  /** Run a streaming query over the static events dir to completion via the
    * memory sink; returns the materialized result (test harness helper).
    */
  def runToMemory(spark: SparkSession, streamed: DataFrame, name: String): DataFrame = {
    val q = streamed.writeStream
      .format("memory")
      .queryName(name)
      .outputMode("complete")
      .start()
    q.processAllAvailable()
    q.stop()
    spark.table(name)
  }
}
