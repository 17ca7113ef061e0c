package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode,
  StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Event-stream analytics (brief §streaming: watermarks + windowed aggs,
  * custom state via [mapG|flatMapG]roupsWithState).
  *
  * The aggregation definitions are ENGINE-AGNOSTIC: each takes a DataFrame
  * that may be a batch relation or a `readStream` relation — Spark plans the
  * same declarative agg either way (incremental with state eviction under a
  * watermark in streaming; a plain hash/sort agg in batch). The specs
  * exploit that: the streaming answer over a drained AvailableNow/memory
  * stream must equal the batch answer on the same rows, and the watermark
  * path must drop late rows exactly.
  *
  * Scale: windowed counts are two-phase (partial per task, merge keyed by
  * (window, type)); session windows shuffle once by user; state store size
  * is bounded by the watermark horizon — the properties that carry a
  * 100 TB/day event feed.
  */
object EventStream {

  /** Tumbling event-time window × event_type counts. With a streaming input
    * and `delay`, state for windows older than the watermark is evicted and
    * later-arriving rows are dropped (exactly the semantics the spec pins). */
  def windowedTypeCounts(events: DataFrame, windowDur: String = "1 hour",
      delay: Option[String] = None): DataFrame = {
    val src = delay.fold(events)(d => events.withWatermark("ts", d))
    src.groupBy(window(col("ts"), windowDur).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("w.start").as("w_start"), col("event_type"), col("n_events"))
  }

  /** Exactly-once event dedup on the stream: `dropDuplicatesWithinWatermark`
    * keys state by `event_id` and EVICTS each key once the watermark passes
    * its event time + delay — the state store stays bounded by the
    * watermark horizon instead of growing with the full event history
    * (a plain streaming dropDuplicates key set never shrinks: at a
    * 100 TB/day feed that is an unbounded state store). A duplicate
    * arriving within the horizon is suppressed; one arriving after its
    * key's eviction would re-emit, which is the documented at-least-once
    * trade every bounded-state dedup makes — size `delay` to the
    * producer's real redelivery window. Batch inputs take the plain
    * `dropDuplicates` (no watermark semantics to bound). */
  def dedupedEvents(events: DataFrame, delay: String = "30 minutes"): DataFrame =
    if (events.isStreaming)
      events.withWatermark("ts", delay).dropDuplicatesWithinWatermark("event_id")
    else events.dropDuplicates("event_id")

  /** One row per (user, gap-merged event-time session) via the native
    * `session_window` aggregation. This layer is streamable in append mode
    * (single stateful operator: sessions finalize when the watermark passes
    * their close). Equivalent to the lag-based `ev_sessions` boundary
    * definition whenever no two consecutive events of a user are exactly
    * `gap` apart (the oracle pins this on the test corpus). */
  def sessionWindows(events: DataFrame, gap: String = "30 minutes",
      delay: Option[String] = None): DataFrame = {
    val src = delay.fold(events)(d => events.withWatermark("ts", d))
    src.groupBy(session_window(col("ts"), gap).as("sw"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("sw.start").as("s_start"),
        col("sw.end").as("s_end"), col("n_events"))
  }

  /** Batch composition: per-user session totals from [[sessionWindows]].
    * (A second non-windowed aggregation — batch-only; a streaming consumer
    * aggregates the append-mode session rows downstream.) */
  def sessionCounts(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    sessionWindows(events, gap)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_sessions"), sum("n_events").as("n_events"))

  /** Stream-stream interval join: each purchase matched to the same user's
    * views within the `beforeSec` seconds at or before it — the streaming
    * form of `RangeJoin.band` / `ev_range_join` (batch parity spec-locked).
    *
    * Both sides carry watermarks and the join condition bounds BOTH
    * event-time columns, which is what lets Spark run an unbounded
    * stream-stream join with bounded state: a buffered view is evictable
    * once the purchase-side watermark passes `v_ts + beforeSec`, and a
    * buffered purchase once the view-side watermark passes `p_ts`. Without
    * the time bound the state store would grow forever.
    *
    * (Batch inputs plan the same join as a plain equi-key + range filter;
    * the BANDED batch operator `RangeJoin.band` remains the 100 TB batch
    * path — streaming state eviction already bounds the hot-key damage
    * here, banding is about batch shuffle topology.) */
  def intervalJoin(purchases: DataFrame, views: DataFrame,
      beforeSec: Long = 3600, delay: String = "10 minutes"): DataFrame = {
    val p = purchases
      .select(col("user_id"), col("ts").as("p_ts"), col("event_id").as("purchase_id"))
      .withWatermark("p_ts", delay)
    val v = views
      .select(col("user_id").as("v_uid"), col("ts").as("v_ts"), col("event_id").as("view_id"))
      .withWatermark("v_ts", delay)
    p.join(v, col("user_id") === col("v_uid") &&
        col("v_ts") <= col("p_ts") &&
        col("v_ts") >= col("p_ts") - expr(s"INTERVAL $beforeSec SECONDS"))
      .select(col("purchase_id"), col("view_id"))
  }

  /** Custom state: running per-user event count that survives across
    * micro-batches (mapGroupsWithState, update mode). Emits the new total
    * for every user seen in the batch. */
  def runningUserCounts(events: Dataset[(Long, java.sql.Timestamp)])(
      implicit spark: SparkSession): Dataset[(Long, Long)] = {
    import spark.implicits._
    events.groupByKey(_._1)
      .mapGroupsWithState[Long, (Long, Long)](GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[(Long, java.sql.Timestamp)], state: GroupState[Long]) =>
          val total = state.getOption.getOrElse(0L) + rows.size
          state.update(total)
          (user, total)
      }
  }

  /** Update-mode sink mode for [[runningUserCounts]]. */
  val updateMode: OutputMode = OutputMode.Update()

  /** [[runningUserCounts]] on the Spark 4 arbitrary-state API
    * (`transformWithState` + `StatefulProcessor`): typed named state
    * variables, timer support, per-state TTL, RocksDB-backed store — the
    * modern replacement for mapGroupsWithState and the API new state
    * operators should target (the spec pins cross-micro-batch parity with
    * the mapGroupsWithState formulation). */
  class RunningCountProcessor extends StatefulProcessor[Long, (Long, java.sql.Timestamp), (Long, Long)] {
    @transient private var count: ValueState[Long] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      count = getHandle.getValueState[Long]("count",
        org.apache.spark.sql.Encoders.scalaLong, TTLConfig.NONE)
    override def handleInputRows(key: Long, rows: Iterator[(Long, java.sql.Timestamp)],
        timers: TimerValues): Iterator[(Long, Long)] = {
      val total = (if (count.exists()) count.get() else 0L) + rows.size
      count.update(total)
      Iterator((key, total))
    }
  }

  def runningUserCountsTws(events: Dataset[(Long, java.sql.Timestamp)])(
      implicit spark: SparkSession): Dataset[(Long, Long)] = {
    import spark.implicits._
    events.groupByKey(_._1)
      .transformWithState(new RunningCountProcessor, TimeMode.None(), OutputMode.Update())
  }

  /** Streaming per-group heavy hitters — the Misra–Gries sketch as live
    * state ([[graft.functions.MisraGriesAgg]]'s guarantee, continuously):
    * each group key holds a ≤ `k`-entry (item, weight) map; every
    * micro-batch folds its rows in (hit +1 / free slot / decrement-all)
    * and emits the group's CURRENT candidate set (update mode). The MG
    * invariant — any item with true count > n/(k+1) is present — holds at
    * every emission regardless of arrival order, so a downstream exact
    * count over the candidates makes the output exact, exactly like the
    * batch operator. State is O(k) per group forever — the bounded-state
    * discipline every streaming operator here follows.
    *
    * CONSUMER CONTRACT (r7 advice fix): emissions are ADDITIVE CANDIDATE
    * EVIDENCE only. Items evicted by the decrement step are NOT retracted
    * (update mode emits the current set; no weight-0 tombstones), so a
    * sink keyed on (group, item) retains rows whose weights the MG
    * guarantee no longer covers. Treat the LATEST emission per group as
    * the live candidate set, or re-verify any materialized union with
    * exact counts — the same verification step the MG bound requires
    * anyway before trusting a candidate as a true heavy hitter. */
  class HeavyHittersProcessor(k: Int)
      extends StatefulProcessor[String, (String, String), (String, String, Long)] {
    @transient private var sketch: ValueState[Map[String, Long]] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      sketch = getHandle.getValueState[Map[String, Long]]("sketch",
        org.apache.spark.sql.Encoders.kryo[Map[String, Long]], TTLConfig.NONE)
    override def handleInputRows(key: String, rows: Iterator[(String, String)],
        timers: TimerValues): Iterator[(String, String, Long)] = {
      var m = if (sketch.exists()) sketch.get() else Map.empty[String, Long]
      rows.foreach { case (_, item) =>
        m.get(item) match {
          case Some(c) => m = m.updated(item, c + 1)
          case None if m.size < k => m = m.updated(item, 1L)
          case None =>
            m = m.iterator.map { case (i, c) => (i, c - 1) }
              .filter(_._2 > 0).toMap
        }
      }
      sketch.update(m)
      m.iterator.map { case (item, w) => (key, item, w) }
    }
  }

  /** Live heavy-hitter candidates per group over a (group, item) stream. */
  def heavyHitters(events: Dataset[(String, String)], k: Int)(
      implicit spark: SparkSession): Dataset[(String, String, Long)] = {
    import spark.implicits._
    events.groupByKey(_._1)
      .transformWithState(new HeavyHittersProcessor(k), TimeMode.None(), OutputMode.Update())
  }

  final case class SessionAcc(startMs: Long, endMs: Long, n: Long)
  final case class ClosedSession(user_id: Long, s_start: java.sql.Timestamp,
      s_end: java.sql.Timestamp, n_events: Long)

  /** Custom-state sessionizer via `flatMapGroupsWithState` + event-time
    * timeout: buffers each user's open gap-separated sessions in state and
    * EMITS a session exactly once, when the watermark passes its close
    * (last event + gap). The native `session_window` covers the plain
    * count; this is the path for sessions needing custom payloads or
    * merge logic the windowed aggregation cannot express — and it
    * exercises timeout-driven state eviction (state for a user is dropped
    * entirely once every session closes).
    *
    * Semantics vs `session_window`: identical grouping (ms granularity
    * here); a closed row's `s_end` is the LAST EVENT time, where
    * session_window's `end` is last event + gap (spec maps one onto the
    * other exactly).
    */
  def closedSessions(events: Dataset[(Long, java.sql.Timestamp)], gapSec: Long = 1800,
      delay: String = "10 minutes")(implicit spark: SparkSession): Dataset[ClosedSession] = {
    import spark.implicits._
    val gapMs = gapSec * 1000L
    events.toDF("user_id", "ts").withWatermark("ts", delay)
      .as[(Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[List[SessionAcc], ClosedSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) { (user, rows, state) =>
        // merge buffered open sessions with the batch's events (sorted
        // fold — handles out-of-order arrivals inside the watermark)
        val pts = (state.getOption.getOrElse(Nil).map(s => (s.startMs, s.endMs, s.n)) ++
          rows.map(r => (r._2.getTime, r._2.getTime, 1L))).sortBy(p => (p._1, p._2))
        val merged = pts.foldLeft(List.empty[SessionAcc]) { (acc, p) =>
          acc match {
            case h :: t if p._1 <= h.endMs + gapMs =>
              SessionAcc(h.startMs, math.max(h.endMs, p._2), h.n + p._3) :: t
            case _ => SessionAcc(p._1, p._2, p._3) :: acc
          }
        }.reverse
        val wm = state.getCurrentWatermarkMs()
        val (closed, open) = merged.partition(s => s.endMs + gapMs <= wm)
        if (open.isEmpty) state.remove()
        else {
          state.update(open)
          // earliest possible close; guaranteed > watermark by the
          // partition above, as setTimeoutTimestamp requires
          state.setTimeoutTimestamp(open.map(_.endMs).min + gapMs)
        }
        closed.iterator.map(s => ClosedSession(user,
          new java.sql.Timestamp(s.startMs), new java.sql.Timestamp(s.endMs), s.n))
      }
  }
}
