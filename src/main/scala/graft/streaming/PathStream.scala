package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming per-user event-path extraction — the batch lag-window
  * trigram mining under `evt_top_paths`
  * ([[graft.queries.EventFold.topPathTrigramsOf]]) in continuous form:
  * every arriving event COMPLETES the 3-step path (t₋₂, t₋₁, t) for
  * its user and emits it as it happens. Downstream, the live top-k is
  * [[HeavyHitterStream]]'s job (SpaceSaving summaries keyed by the
  * path) — this twin is the stateful extraction that feeds it, the
  * part a batch window cannot run on an unbounded stream.
  *
  * Scale shape: one keyed-state shuffle (`transformWithState`, the
  * projector-processor API); state per user is the last TWO event
  * types plus the in-order guard — constant per key, so state is
  * bounded by the live user population at any event volume. Under the
  * in-order contract (ascending event_id per user, in-batch rows
  * sorted here, violations fail fast — the twin convention) the fold
  * IS the lag-window semantics: when an event is processed, the two
  * strictly-preceding events have already shifted into the state.
  * PathStreamSpec pins row-for-row parity with the batch trigram frame
  * on chunked feeds; StreamRestartSpec pins that a (t₋₂, t₋₁) pair
  * recovered from a checkpoint completes a post-restart trigram.
  *
  * `ttl` (default NONE = retain forever, the parity contract): a
  * user's path state not refreshed within the duration is evicted,
  * after which the journey restarts cold — two events re-prime before
  * the next emission (the [[StateTtl]] retention trade).
  */
object PathStream {

  case class PathEvent(userId: Long, eventId: Long, eventType: String)
  case class Trigram(userId: Long, eventId: Long,
      t1: String, t2: String, t3: String)

  private val Unset = Long.MinValue
  private case class PathState(p1: String, p2: String, nSeen: Long,
      lastEid: Long)

  private class PathProcessor(ttl: TTLConfig)
      extends StatefulProcessor[Long, PathEvent, Trigram] {
    @transient private var state: ValueState[PathState] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[PathState]("path",
        Encoders.product[PathState], ttl)

    override def handleInputRows(key: Long, rows: Iterator[PathEvent],
        timerValues: TimerValues): Iterator[Trigram] = {
      var s = if (state.exists()) state.get() else PathState("", "", 0L, Unset)
      val out = scala.collection.mutable.ArrayBuffer.empty[Trigram]
      rows.toArray.sortBy(_.eventId).foreach { e =>
        require(e.eventId > s.lastEid,
          s"out-of-order event for user $key: ${e.eventId} <= seen ${s.lastEid}")
        if (s.nSeen >= 2L)
          out += Trigram(key, e.eventId, s.p1, s.p2, e.eventType)
        s = PathState(s.p2, e.eventType, s.nSeen + 1L, e.eventId)
      }
      state.update(s)
      out.iterator
    }
  }

  /** One trigram row per path-completing event, as it arrives. Works on
    * a stream (cross-batch journey state) and, via the same call, on a
    * batch Dataset (single "batch" = the whole input ≡ the batch
    * lag-window frame). */
  def trigrams(events: Dataset[PathEvent],
      ttl: TTLConfig = TTLConfig.NONE): Dataset[Trigram] = {
    val spark: SparkSession = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.userId).transformWithState(
      new PathProcessor(ttl), StateTtl.timeMode(ttl), OutputMode.Append())
  }
}
