package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming conversion funnel — the batch three-stage ordered funnel
  * ([[graft.queries.EventFold]] `evt_funnel`) in continuous form
  * (VERDICT r12 Missing #2): per user, the first signup, the first view
  * strictly after that signup, the first purchase strictly after that
  * view, folded incrementally as events arrive.
  *
  * Scale shape: one keyed-state shuffle (`transformWithState`, the same
  * Spark 4 API as the projector's CDC processors); state per user is
  * FOUR longs (the three stage min-ids + the in-order guard), so a
  * billion users cost ~32 GB of state store spread across executors —
  * the per-key-constant-state regime where streaming funnels stay
  * viable at ingest volume indefinitely.
  *
  * In-order contract (the twin convention): each user's events arrive
  * in ascending event_id order across micro-batches (in-batch rows are
  * sorted here). Under that contract the greedy fold IS the batch
  * semantics: when a view arrives, any smaller-id signup has already
  * been folded, so "first view after the FIRST signup" reduces to
  * "first view while signup set and view unset" — FunnelStreamSpec pins
  * the equivalence against `funnelOf` on chunked feeds. Violations fail
  * fast (the SlidingAgg ADVICE class) instead of silently diverging.
  *
  * Emission: one row per TOUCHED user per micro-batch carrying the
  * post-batch funnel (Append mode; the fields only ever move unset→set,
  * so the latest row per user is the current funnel — a sink upsert
  * keyed on user_id collapses the history exactly like the CDC
  * processors' last-DML-wins).
  */
object FunnelStream {

  case class FunnelEvent(userId: Long, eventId: Long, eventType: String)
  case class FunnelRow(userId: Long, signupId: Option[Long],
      viewId: Option[Long], purchaseId: Option[Long], stage: Int)

  /** -1 = unset (driver event ids are non-negative). */
  private val Unset = -1L
  private case class FunnelState(signupId: Long, viewId: Long,
      purchaseId: Long, lastEid: Long)

  private class FunnelProcessor(ttl: TTLConfig)
      extends StatefulProcessor[Long, FunnelEvent, FunnelRow] {
    @transient private var state: ValueState[FunnelState] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[FunnelState]("funnel",
        Encoders.product[FunnelState], ttl)

    override def handleInputRows(key: Long, rows: Iterator[FunnelEvent],
        timerValues: TimerValues): Iterator[FunnelRow] = {
      val known = state.exists()
      val init =
        if (known) state.get() else FunnelState(Unset, Unset, Unset, Unset)
      val fin = rows.toArray.sortBy(_.eventId).foldLeft(init) { (s, e) =>
        require(e.eventId > s.lastEid,
          s"out-of-order event for user $key: id ${e.eventId} <= seen ${s.lastEid}")
        val s2 = e.eventType match {
          case "signup" if s.signupId == Unset => s.copy(signupId = e.eventId)
          case "view" if s.signupId != Unset && s.viewId == Unset =>
            s.copy(viewId = e.eventId) // id > signupId by the in-order contract
          case "purchase" if s.viewId != Unset && s.purchaseId == Unset =>
            s.copy(purchaseId = e.eventId)
          case _ => s
        }
        s2.copy(lastEid = e.eventId)
      }
      state.update(fin)
      // first sighting always emits (stage-0 users are part of the batch
      // contract); afterwards only a stage-field change does
      if (!known || (fin.signupId, fin.viewId, fin.purchaseId) !=
          ((init.signupId, init.viewId, init.purchaseId))) {
        val stage =
          if (fin.purchaseId != Unset) 3
          else if (fin.viewId != Unset) 2
          else if (fin.signupId != Unset) 1
          else 0
        def opt(v: Long): Option[Long] = if (v == Unset) None else Some(v)
        Iterator.single(FunnelRow(key, opt(fin.signupId), opt(fin.viewId),
          opt(fin.purchaseId), stage))
      } else Iterator.empty
    }
  }

  /** Incremental funnel over an event stream (or, via the same call, a
    * batch Dataset). */
  def funnel(events: Dataset[FunnelEvent],
      ttl: TTLConfig = TTLConfig.NONE): Dataset[FunnelRow] = {
    val spark: SparkSession = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.userId).transformWithState(new FunnelProcessor(ttl),
      StateTtl.timeMode(ttl), OutputMode.Append())
  }
}
