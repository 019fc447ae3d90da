package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Gap-based session windows via Spark's native `session_window` — the
  * merging-window Structured Streaming shape for user-activity
  * sessionization (the streaming counterpart of the batch lag+cumsum
  * sessionizer in `queries.EventFold.sessionAgg`).
  *
  * Scale shape: state is one in-flight session per (user, session) key,
  * merged as rows arrive and EVICTED once the watermark passes the
  * session's close (last event + gap) — bounded by active users, not by
  * history. No global sort: `session_window` plans as a hash aggregate
  * keyed by (user, window) with merge-on-overlap, shuffle-partitioned by
  * user.
  *
  * Works identically over a batch frame (every session closes
  * immediately) and a streaming one (append mode emits a session once
  * the watermark passes lastTs + gap).
  */
object Sessionized {

  /** One row per closed (user, session): µs-epoch session bounds, event
    * count and exact decimal value sum. Input needs `ts_us`
    * (microseconds, e.g. [[graft.Tables.events]]), `user_id` and
    * `value`. Spark's session end is lastTs + gap — the oracle mirrors
    * `epoch_us(max(ts)) + gap`. */
  def userSessions(events: DataFrame, gap: String = "30 minutes",
      lateness: String = "0 seconds"): DataFrame =
    events.select(timestamp_micros(col("ts_us")).as("ts"), col("user_id"), col("value"))
      .withWatermark("ts", lateness)
      .groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(col("user_id"),
        unix_micros(col("session_window.start")).as("session_start_us"),
        unix_micros(col("session_window.end")).as("session_end_us"),
        col("n_events"), col("sum_value"))
}
