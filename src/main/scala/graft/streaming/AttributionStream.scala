package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming last-touch conversion attribution — the batch window carry
  * ([[graft.queries.EventFold]] `evt_attribution`) in continuous form:
  * every arriving `purchase` credits the user's most recent PRECEDING
  * `click`/`view` within the 7-day lookback ("none" when cold), emitted
  * as one credit row per conversion as it happens — the shape a live
  * marketing dashboard consumes, where the batch query's
  * unbounded-preceding window cannot run because the stream never ends.
  *
  * Scale shape: one keyed-state shuffle (`transformWithState`, the
  * projector-processor API); state per user is ONE (ts, type) touch
  * pair plus the in-order guard — constant per key, so state is bounded
  * by the live user population at any event volume. The batch twin
  * carries the same information as a running `last(..., ignoreNulls)`
  * window column; under the in-order contract (ascending
  * (ts_us, event_id) per user, in-batch rows sorted here, violations
  * fail fast — the twin convention) the fold IS the window semantics:
  * when a purchase is processed, every strictly-preceding touch has
  * already replaced the state, including a same-timestamp touch with a
  * smaller event id. AttributionStreamSpec pins per-purchase parity
  * with [[graft.queries.EventFold.attributionCreditsOf]] on chunked
  * feeds; StreamRestartSpec pins that a touch recovered from a
  * checkpoint still credits a post-restart purchase.
  *
  * `ttl` (default NONE = retain forever, the parity contract): a
  * user's touch state not refreshed within the duration is evicted,
  * after which an in-lookback purchase would read "none" — sound only
  * when the TTL comfortably exceeds the 7-day lookback (the
  * [[StateTtl]] retention trade).
  */
object AttributionStream {

  case class TouchEvent(userId: Long, eventId: Long, tsUs: Long,
      eventType: String, valueCents: Long)
  case class Credit(userId: Long, eventId: Long, tsUs: Long,
      touchType: String, valueCents: Long)

  val LookbackUs: Long = 7L * 86400L * 1000000L

  private val Unset = Long.MinValue
  private case class TouchState(touchTs: Long, touchTy: String,
      lastTs: Long, lastEid: Long)

  private class AttributionProcessor(ttl: TTLConfig)
      extends StatefulProcessor[Long, TouchEvent, Credit] {
    @transient private var state: ValueState[TouchState] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[TouchState]("touch",
        Encoders.product[TouchState], ttl)

    override def handleInputRows(key: Long, rows: Iterator[TouchEvent],
        timerValues: TimerValues): Iterator[Credit] = {
      var s = if (state.exists()) state.get()
        else TouchState(Unset, "", Unset, Unset)
      val out = scala.collection.mutable.ArrayBuffer.empty[Credit]
      rows.toArray.sortBy(e => (e.tsUs, e.eventId)).foreach { e =>
        require(e.tsUs > s.lastTs || (e.tsUs == s.lastTs && e.eventId > s.lastEid),
          s"out-of-order event for user $key: (${e.tsUs}, ${e.eventId}) <= " +
            s"seen (${s.lastTs}, ${s.lastEid})")
        e.eventType match {
          case "purchase" =>
            val ty =
              if (s.touchTs != Unset && e.tsUs - s.touchTs <= LookbackUs) s.touchTy
              else "none"
            out += Credit(key, e.eventId, e.tsUs, ty, e.valueCents)
          case "click" | "view" =>
            s = s.copy(touchTs = e.tsUs, touchTy = e.eventType)
          case _ => () // other event types neither touch nor convert
        }
        s = s.copy(lastTs = e.tsUs, lastEid = e.eventId)
      }
      state.update(s)
      out.iterator
    }
  }

  /** One credit row per purchase, as it arrives. Works on a stream
    * (cross-batch touch state) and, via the same call, on a batch
    * Dataset (single "batch" = the whole input). */
  def credits(events: Dataset[TouchEvent],
      ttl: TTLConfig = TTLConfig.NONE): Dataset[Credit] = {
    val spark: SparkSession = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.userId).transformWithState(
      new AttributionProcessor(ttl), StateTtl.timeMode(ttl), OutputMode.Append())
  }
}
