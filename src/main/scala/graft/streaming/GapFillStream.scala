package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming gap-fill — the batch hourly resample + forward fill
  * ([[graft.queries.EventFold]] `evt_gapfill`) in continuous form
  * (VERDICT r12 Next #7): per user, every hour from the first to the
  * last event hour gets exactly one row — hours with events carry their
  * count and last-by-event-id value, empty hours carry n_events = 0 and
  * the forward-filled value.
  *
  * Scale shape: one keyed-state shuffle; state per user is CONSTANT
  * (the open hour's running aggregate + the forward-fill carry + one
  * registered event-time timer), never a buffer of events or hours —
  * the dense grid is EMITTED, not stored. Closed hours stream out
  * eagerly when a later-hour event arrives (gap rows synthesized in the
  * same pass); the final open hour closes on WATERMARK: the processor
  * registers an event-time timer at the hour's end, and when the
  * watermark passes it the row emits — so a user who goes quiet still
  * gets their last hour, and no hour ever emits twice. Hours after a
  * user's last event emit nothing, exactly the batch grid's
  * `sequence(min_hour, max_hour)` bounds.
  *
  * In-order contract (the twin convention): each user's events arrive
  * in non-decreasing event-time order. Within-batch disorder below the
  * open hour fails fast like SlidingAgg; an event for an hour the
  * watermark already closed never double-emits — Spark's late-row
  * filter drops it BEFORE the processor (any closed hour h has
  * hourEnd ≤ watermark, so every hour-h straggler is sub-watermark by
  * construction; GapFillStreamSpec pins the drop). The `require` on the
  * closed-grid branch is defense-in-depth for non-watermarked callers.
  *
  * Values are exact integer cents (the batch operator's DECIMAL(18,2)
  * in integer form); `vFillCents / 100.0` reproduces the batch `v_fill`
  * DOUBLE bit-for-bit (both are the correctly-rounded quotient).
  */
object GapFillStream {

  val HourUs: Long = 3600L * 1000000L

  /** `ts` duplicates `tsUs` as a TIMESTAMP solely so the caller can set
    * a watermark on it (Spark requires a timestamp column); `tsUs` stays
    * the authoritative µs value for hour arithmetic. */
  case class GapEvent(userId: Long, eventId: Long, tsUs: Long, cents: Long,
      ts: java.sql.Timestamp)
  case class GapRow(userId: Long, hour: Long, nEvents: Long, vFillCents: Long)

  private val NoHour = Long.MinValue
  private case class GapState(openHour: Long, n: Long, lastVc: Long,
      lastEid: Long, prevEmitted: Long, carryVc: Long, timerMs: Long)

  private class GapFillProcessor(evictAfterHours: Long)
      extends StatefulProcessor[Long, GapEvent, GapRow] {
    @transient private var state: ValueState[GapState] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[GapState]("gapfill",
        Encoders.product[GapState], TTLConfig.NONE)

    private def load(): GapState =
      if (state.exists()) state.get()
      else GapState(NoHour, 0L, 0L, Long.MinValue, NoHour, 0L, -1L)

    override def handleInputRows(key: Long, rows: Iterator[GapEvent],
        timerValues: TimerValues): Iterator[GapRow] = {
      var s = load()
      val out = Vector.newBuilder[GapRow]
      rows.toArray.sortBy(e => (e.tsUs, e.eventId)).foreach { e =>
        val h = java.lang.Math.floorDiv(e.tsUs, HourUs)
        if (s.openHour == NoHour && s.prevEmitted == NoHour) {
          // first event ever for this user: open its hour
          s = s.copy(openHour = h, n = 1L, lastVc = e.cents, lastEid = e.eventId)
        } else if (s.openHour != NoHour) {
          require(h >= s.openHour,
            s"out-of-order event for user $key: hour $h < open hour ${s.openHour}")
          if (h == s.openHour) {
            val takeV = e.eventId > s.lastEid
            s = s.copy(n = s.n + 1L,
              lastVc = if (takeV) e.cents else s.lastVc,
              lastEid = math.max(s.lastEid, e.eventId))
          } else {
            // close the open hour, synthesize the gap rows, open h
            out += GapRow(key, s.openHour, s.n, s.lastVc)
            var g = s.openHour + 1
            while (g < h) { out += GapRow(key, g, 0L, s.lastVc); g += 1 }
            s = s.copy(openHour = h, n = 1L, lastVc = e.cents,
              lastEid = e.eventId, prevEmitted = h - 1, carryVc = s.lastVc)
          }
        } else {
          // the watermark timer closed the last hour; only later hours
          // may arrive (an already-closed hour would double-emit)
          require(h > s.prevEmitted,
            s"late event for user $key: hour $h <= watermark-closed ${s.prevEmitted}")
          var g = s.prevEmitted + 1
          while (g < h) { out += GapRow(key, g, 0L, s.carryVc); g += 1 }
          s = s.copy(openHour = h, n = 1L, lastVc = e.cents,
            lastEid = e.eventId, prevEmitted = h - 1)
        }
      }
      // (re-)arm the close timer for the open hour's end
      if (s.openHour != NoHour) {
        val endMs = (s.openHour + 1) * HourUs / 1000L
        if (s.timerMs != endMs) {
          if (s.timerMs >= 0) getHandle.deleteTimer(s.timerMs)
          getHandle.registerTimer(endMs)
          s = s.copy(timerMs = endMs)
        }
      }
      state.update(s)
      out.result().iterator
    }

    override def handleExpiredTimer(key: Long, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[GapRow] = {
      val s = load()
      if (s.openHour != NoHour &&
          expiredTimerInfo.getExpiryTimeInMs >= (s.openHour + 1) * HourUs / 1000L) {
        val row = GapRow(key, s.openHour, s.n, s.lastVc)
        state.update(s.copy(openHour = NoHour, n = 0L, lastEid = Long.MinValue,
          prevEmitted = s.openHour, carryVc = s.lastVc, timerMs = -1L))
        // event-time EVICTION (VERDICT r13 Missing #2): a processing-time
        // TTL is illegal in TimeMode.EventTime, so retention rides the
        // same timer machinery — arm a second timer `evictAfterHours`
        // past the close; if the user stays quiet until it fires, the
        // carry state drops and the key restarts as first-seen
        if (evictAfterHours > 0L)
          getHandle.registerTimer(
            (s.openHour + 1L + evictAfterHours) * HourUs / 1000L)
        Iterator.single(row)
      } else if (s.openHour == NoHour && evictAfterHours > 0L &&
          s.prevEmitted != NoHour &&
          expiredTimerInfo.getExpiryTimeInMs >=
            (s.prevEmitted + 1L + evictAfterHours) * HourUs / 1000L) {
        // idle past the horizon: evict. A stale eviction timer from an
        // OLDER close (user active again since) fails the expiry check
        // above and falls through to the no-op branch; an eviction
        // timer firing while an hour is open hits the guard too.
        state.clear()
        Iterator.empty
      } else Iterator.empty
    }
  }

  /** Dense hourly grid per user over a watermarked event stream. The
    * input MUST carry a watermark on `ts` (event-time timers require
    * it); lateness beyond the watermark fails fast per the contract.
    *
    * `evictAfterHours` (default 0 = retain forever, the parity
    * contract): a user quiet for that many hours after their last
    * timer-closed hour has their carry state EVICTED by an event-time
    * timer — the watermark clock, since a processing-time TTL is
    * illegal in this time mode. The retained-horizon answer is
    * unchanged; a user returning after the horizon restarts as
    * first-seen (no forward-filled gap rows bridge the eviction) —
    * StateTtlSpec pins both halves. */
  def gapFill(events: Dataset[GapEvent],
      evictAfterHours: Long = 0L): Dataset[GapRow] = {
    val spark: SparkSession = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.userId).transformWithState(
      new GapFillProcessor(evictAfterHours),
      TimeMode.EventTime(), OutputMode.Append())
  }
}
