package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

import graft.functions.SpaceSavingBuffer

/** Streaming heavy hitters — the batch [[graft.functions.SpaceSavingAgg]]
  * in continuous form: per group (event type / tenant / topic), a
  * bounded SpaceSaving summary of the arriving key stream, with the
  * group's current top-k re-emitted after every batch that touches it —
  * the live "top users right now" feed a dashboard consumes, where the
  * batch aggregate would re-scan history forever.
  *
  * The state per group is the summary's WIRE BYTES
  * ([[SpaceSavingBuffer.toBytes]]) — the exact format the batch
  * aggregate ships between its map-side partials, so the state store
  * holds ≤ capacity counters per group no matter how many events or
  * distinct keys flow through: state is bounded by
  * |groups| · capacity · 24 B, never by the stream. Unlike the fold
  * twins there is NO in-order contract — counting is order-independent
  * in the exact regime (distinct ≤ capacity ⇒ exact counts, err 0,
  * same answer for ANY chunking/arrival order, pinned against the
  * batch aggregate in HeavyHitterStreamSpec), and under eviction
  * pressure the SpaceSaving guarantees (never undercounts,
  * est − err ≤ true) hold for any prefix the stream has seen.
  *
  * `ttl` (default NONE = retain forever, the parity contract): a
  * group's summary not refreshed within the duration is evicted and
  * its counts restart from zero — the standard windowed-heavy-hitter
  * retention trade.
  */
object HeavyHitterStream {

  case class KeyedEvent(group: String, key: Long)

  /** `nSeen` = events absorbed by the group's summary so far — strictly
    * monotone per group, so a consumer (and the parity spec) identifies
    * the group's LATEST emission as the one with maximal nSeen. */
  case class TopK(group: String, key: Long, cnt: Long, err: Long,
      rank: Int, nSeen: Long)

  private class HHProcessor(capacity: Int, k: Int, ttl: TTLConfig)
      extends StatefulProcessor[String, KeyedEvent, TopK] {
    @transient private var state: ValueState[Array[Byte]] = _
    @transient private var nState: ValueState[Long] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      state = getHandle.getValueState[Array[Byte]]("sketch", Encoders.BINARY, ttl)
      nState = getHandle.getValueState[Long]("n", Encoders.scalaLong, ttl)
    }

    override def handleInputRows(group: String, rows: Iterator[KeyedEvent],
        timerValues: TimerValues): Iterator[TopK] = {
      val buf = if (state.exists()) SpaceSavingBuffer.fromBytes(state.get())
        else new SpaceSavingBuffer(capacity)
      var n = if (nState.exists()) nState.get() else 0L
      rows.foreach { e => buf.add(e.key); n += 1L }
      state.update(SpaceSavingBuffer.toBytes(buf))
      nState.update(n)
      buf.sorted().take(k).zipWithIndex.iterator.map { case ((key, c, e), i) =>
        TopK(group, key, c, e, i + 1, n)
      }
    }
  }

  /** Current top-k per touched group, re-emitted each batch. Works on a
    * stream (cross-batch summaries) and, via the same call, on a batch
    * Dataset (single "batch" = the whole input ≡ the batch aggregate). */
  def topK(events: Dataset[KeyedEvent], capacity: Int, k: Int,
      ttl: TTLConfig = TTLConfig.NONE): Dataset[TopK] = {
    val spark: SparkSession = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.group).transformWithState(
      new HHProcessor(capacity, k, ttl), StateTtl.timeMode(ttl), OutputMode.Append())
  }
}
