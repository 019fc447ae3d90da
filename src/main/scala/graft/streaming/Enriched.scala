package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Watermarked stream-stream interval join — the event-enrichment shape
  * (each fact joined to every matching event from a second stream within
  * a bounded event-time span). This is Spark's native stream-stream join:
  * both sides carry a watermark, and the range condition bounds the
  * right-side event time relative to the left's in BOTH directions, so
  * the state store evicts a buffered row as soon as the other side's
  * watermark passes its reach — state is bounded by span × arrival rate,
  * never by stream history.
  *
  * Scale shape: one shuffle per side on `user_id` (co-partitioned state
  * store), no sort; at 1000 executors each partition buffers only its
  * own keys' last `span` of rows. The SAME function executes as a plain
  * batch interval join when handed batch frames (`withWatermark` is a
  * no-op in batch), which is what [[graft.streaming.EnrichedSpec]] pins
  * the streamed answer against.
  */
object Enriched {

  /** Facts (`ts_us, user_id, fact_id`) enriched with every context row
    * (`ts_us, user_id, ctx_id, value`) for the same user whose event
    * time falls in `[fact.ts - spanUs, fact.ts]`. Inner join: facts with
    * no in-span context are dropped (the left-outer streaming variant
    * needs both watermarks to advance past the fact before emitting the
    * null row — same state bound, deferred emission).
    */
  def intervalJoin(facts: DataFrame, context: DataFrame, spanUs: Long,
      factLateness: String = "0 seconds",
      ctxLateness: String = "0 seconds"): DataFrame = {
    val f = facts
      .select(timestamp_micros(col("ts_us")).as("f_ts"), col("user_id"),
        col("fact_id"))
      .withWatermark("f_ts", factLateness)
    val c = context
      .select(timestamp_micros(col("ts_us")).as("c_ts"),
        col("user_id").as("c_user_id"), col("ctx_id"), col("value"))
      .withWatermark("c_ts", ctxLateness)
    f.join(c,
        col("user_id") === col("c_user_id") &&
          col("c_ts") >= col("f_ts") - expr(s"INTERVAL $spanUs MICROSECOND") &&
          col("c_ts") <= col("f_ts"))
      .select(col("user_id"), col("fact_id"),
        unix_micros(col("f_ts")).as("fact_ts_us"),
        col("ctx_id"), unix_micros(col("c_ts")).as("ctx_ts_us"), col("value"))
  }
}
