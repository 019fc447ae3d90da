package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming per-key admission control — the batch rate limiter
  * ([[graft.queries.EventFold]] `evt_rate_limit`) in continuous form:
  * admit at most `max` events per key, in global-sequence order, across
  * micro-batch boundaries. The quota/throttling primitive of a deployed
  * ingest layer (per-source daily caps, abuse ceilings), where the batch
  * window rewrite cannot run because the stream never ends.
  *
  * Scale shape: one keyed-state shuffle (`transformWithState`, the same
  * Spark 4 API the projector's CDC processors use — `Processors.scala`);
  * state is ONE counter per key, not the admitted rows, so state size is
  * bounded by the live key population regardless of event volume. Within
  * a micro-batch, rows are applied in ascending `seq` order (the
  * engine's total-order contract, `Worker.cs:32,42`-style), which makes
  * the admitted set identical to the batch operator's
  * `row_number() <= max` for any chunking of an in-order feed —
  * RateLimitedSpec pins exactly that parity.
  */
object RateLimited {

  /** One input event: `key` is the admission scope (e.g. "user:day"),
    * `seq` the global order, admitted rows keep both plus the 1-based
    * admission index. */
  case class AdmitEvent(key: String, seq: Long)
  case class Admitted(key: String, seq: Long, rn: Int)

  private class RateLimitProcessor(max: Int, ttl: TTLConfig)
      extends StatefulProcessor[String, AdmitEvent, Admitted] {
    @transient private var nAdmitted: ValueState[Int] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      nAdmitted = getHandle.getValueState[Int]("n", Encoders.scalaInt, ttl)
    override def handleInputRows(key: String, rows: Iterator[AdmitEvent],
        timerValues: TimerValues): Iterator[Admitted] = {
      var n = if (nAdmitted.exists()) nAdmitted.get() else 0
      // Admission applies in seq order inside the batch — same in-order
      // rule as the projector's LwwProcessor — so chunking never reorders
      // admission. Only the `max − n` SMALLEST seqs can be admitted, so a
      // bounded max-heap of that size replaces the full per-key sort
      // (ADVICE r10): O(batch) time, O(max) memory — a hot key's entire
      // micro-batch is never materialized in executor memory.
      val remaining = max - n
      if (remaining <= 0) {
        rows.foreach(_ => ()) // drain: the iterator contract is consume-all
        Iterator.empty
      } else {
        val heap = scala.collection.mutable.PriorityQueue.empty[Long](Ordering.Long)
        rows.foreach { e =>
          if (heap.size < remaining) heap.enqueue(e.seq)
          else if (e.seq < heap.head) { heap.dequeue(); heap.enqueue(e.seq); () }
        }
        // dequeueAll yields descending for a max-heap; reverse → seq order
        val out = heap.dequeueAll.reverse.map { s: Long => n += 1; Admitted(key, s, n) }
        nAdmitted.update(n)
        out.iterator
      }
    }
  }

  /** Admit the first `max` events per key in `seq` order. Works on a
    * stream (cross-batch counter state) and, via the same call, on a
    * batch Dataset (single "batch" = the whole input).
    *
    * `ttl` (default NONE = retain forever, the parity contract): a
    * key's admission counter not refreshed within the duration is
    * evicted, after which the key's quota RESETS — the retention
    * trade documented on [[StateTtl]]. */
  def admitFirst(events: Dataset[AdmitEvent], max: Int,
      ttl: TTLConfig = TTLConfig.NONE): Dataset[Admitted] = {
    val spark: SparkSession = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.key).transformWithState(new RateLimitProcessor(max, ttl),
      StateTtl.timeMode(ttl), OutputMode.Append())
  }
}
