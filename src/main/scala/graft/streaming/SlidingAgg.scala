package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{ListState, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues}

/** Streaming trailing-window rolling aggregate — the batch RANGE-frame
  * operator ([[graft.queries.EventFold]] `evt_sliding_agg`) in continuous
  * form (VERDICT r10 #7: sessions/rate-limit/dedup/interval-join all had
  * streaming twins; the moving-feature primitive did not). Per key and
  * per event: the count and exact value-sum (integer cents) of that key's
  * events whose event time falls in the trailing `spanUs` window,
  * INCLUSIVE of same-timestamp peers — identical to the batch
  * `rangeBetween(-(span-1), currentRow)` frame.
  *
  * Scale shape: one keyed-state shuffle (`transformWithState`, the same
  * Spark 4 API the projector's CDC processors use); state per key is a
  * time-ordered buffer of (ts, cents) pairs EVICTED at window span — the
  * newest event's ts minus `spanUs` — so state is bounded by span ×
  * per-key arrival rate, never by history. Entries append in event-time
  * order (the in-order feed contract every twin shares, `Worker.cs:32`
  * -style), so eviction is a prefix drop and the stored list never
  * re-sorts.
  *
  * In-order contract (SlidingAggStreamSpec pins it): the feed is globally
  * ts-ordered and a micro-batch boundary never splits a same-timestamp
  * peer group — the batch frame lets equal-ts events see EACH OTHER, so
  * an event emitted before its peer arrived could never match the batch
  * answer under a peer-splitting chunking.
  */
object SlidingAgg {

  /** One event: `cents` carries the value as exact integer cents (the
    * batch operator's DECIMAL(18,2) sum in integer form). */
  case class SlideEvent(key: String, eventId: Long, tsUs: Long, cents: Long)
  case class SlideAgg(key: String, eventId: Long, n: Long, sumCents: Long)
  private case class BufEntry(tsUs: Long, cents: Long, eventId: Long)

  private class SlidingProcessor(spanUs: Long, ttl: TTLConfig,
      acceptEqualTs: Boolean)
      extends StatefulProcessor[String, SlideEvent, SlideAgg] {
    @transient private var buf: ListState[BufEntry] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      buf = getHandle.getListState[BufEntry]("buf",
        Encoders.product[BufEntry], ttl)

    override def handleInputRows(key: String, rows: Iterator[SlideEvent],
        timerValues: TimerValues): Iterator[SlideAgg] = {
      // Stored entries are ts-ordered (in-order feed); in-batch rows sort
      // by (ts, eventId) so peer groups process together. NOTE the
      // in-batch buffering assumption (the RateLimited ADVICE class):
      // unlike the rate limiter — whose output is quota-bounded, so it
      // now keeps only a max-heap — this operator emits one row PER
      // input row, so a key's micro-batch must materialize here anyway;
      // memory per key per batch is O(batch rows + span-window), the
      // same order as its own output.
      val window = scala.collection.mutable.ArrayDeque.empty[BufEntry]
      if (buf.exists()) buf.get().foreach(window.append)
      val out = Vector.newBuilder[SlideAgg]
      val batch = rows.toArray.sortBy(e => (e.tsUs, e.eventId))
      // in-order feed contract: every stored entry's ts < the incoming
      // batch's min ts, or emission silently diverges from the batch
      // RANGE-frame answer — fail fast on violation instead (ADVICE r11).
      // STRICT > by default: an incoming ts EQUAL to the stored max is a
      // cross-batch peer split (the stored peers at that ts were already
      // emitted without seeing the newcomer), exactly the divergence the
      // guard exists to catch (ADVICE r12). With `acceptEqualTs` the
      // split is ACCEPTED instead (VERDICT r13 #9, for feeds that
      // legitimately chunk inside a peer group): the stored peers at the
      // boundary ts RE-EMIT with the recomputed aggregate, so a
      // last-write-wins consumer keyed on (key, eventId) converges to
      // the exact batch RANGE-frame answer.
      require(window.isEmpty || batch.isEmpty ||
        (if (acceptEqualTs) batch(0).tsUs >= window.last.tsUs
         else batch(0).tsUs > window.last.tsUs),
        s"out-of-order micro-batch for key $key: incoming min ts ${batch(0).tsUs} " +
          s"<= stored max ts ${window.last.tsUs} (equal ts across batches splits a peer group)")
      val reEmit: Seq[Long] =
        if (acceptEqualTs && window.nonEmpty && batch.nonEmpty &&
            batch(0).tsUs == window.last.tsUs)
          window.filter(_.tsUs == batch(0).tsUs).map(_.eventId).toSeq
        else Seq.empty
      var first = true
      var i = 0
      while (i < batch.length) {
        // peer group: every event sharing this ts enters the window FIRST
        // (RANGE-frame peers include each other), then all emit together
        val t = batch(i).tsUs
        var j = i
        while (j < batch.length && batch(j).tsUs == t) {
          window.append(BufEntry(t, batch(j).cents, batch(j).eventId))
          j += 1
        }
        while (window.nonEmpty && window.head.tsUs <= t - spanUs)
          window.removeHead()
        val n = window.length.toLong
        val s = window.foldLeft(0L)(_ + _.cents)
        // corrected rows for the previously-emitted boundary peers: they
        // now see the newcomers, so their (n, sum) is this group's
        if (first) { reEmit.foreach(eid => out += SlideAgg(key, eid, n, s)); first = false }
        while (i < j) { out += SlideAgg(key, batch(i).eventId, n, s); i += 1 }
      }
      buf.clear()
      if (window.nonEmpty) buf.appendList(window.toArray)
      out.result().iterator
    }
  }

  /** Rolling (count, sum-of-cents) over the trailing `spanUs` per key.
    * Works on a stream (buffer state crosses micro-batches) and, via the
    * same call, on a batch Dataset. */
  def rolling(events: Dataset[SlideEvent], spanUs: Long,
      ttl: TTLConfig = TTLConfig.NONE,
      acceptEqualTs: Boolean = false): Dataset[SlideAgg] = {
    val spark: SparkSession = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.key).transformWithState(
      new SlidingProcessor(spanUs, ttl, acceptEqualTs),
      StateTtl.timeMode(ttl), OutputMode.Append())
  }
}
