package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-time windowed aggregation with a watermark — the Structured
  * Streaming shape for out-of-order telemetry. The projector's own event
  * log is totally ordered by `seq` and deliberately uses NO watermark
  * (SURVEY.md §2.9: the log is the truth, not an event-time stream); this
  * operator serves the telemetry/pipeline side of the engine, e.g.
  * per-window event rates over the `events` table.
  *
  * Scale shape: the aggregation state is bounded by the watermark —
  * windows older than (max observed event time − `lateness`) finalize and
  * evict, and rows arriving later than that are dropped. State is keyed
  * by (window, event_type), shuffle-partitioned — no global ordering,
  * no unbounded growth.
  *
  * Works identically over a batch frame (windows close immediately) and a
  * streaming one (append mode emits a window once the watermark passes
  * its end).
  */
object Windowed {

  /** (window_start, window_end, event_type, n) counts per `width` window
    * of event time, tolerating `lateness` of disorder. Input needs
    * `ts_us` (microseconds, e.g. [[graft.Tables.events]]) and
    * `event_type`. */
  def eventCounts(events: DataFrame, width: String = "1 minute",
      lateness: String = "2 minutes"): DataFrame =
    events.select(timestamp_micros(col("ts_us")).as("ts"), col("event_type"))
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), width), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"), col("event_type"), col("n"))
}
