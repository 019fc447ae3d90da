package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming exact deduplication — the pipeline's exact-dedup operator
  * ([[graft.queries.Pipeline]] `dedup_exact`) in continuous form, for
  * ingest feeds where duplicate documents arrive across micro-batches.
  *
  * Scale shape: `dropDuplicatesWithinWatermark` keeps one state row per
  * key only until the watermark passes the key's last-seen event time,
  * so state is bounded by (arrival rate × lateness window) instead of
  * the full corpus — the property that makes streaming dedup viable at
  * ingest volume. Exact corpus-wide dedup stays a batch concern (hash
  * aggregate over the store); this operator removes the
  * within-window duplicates a redelivering ingest layer produces
  * (at-least-once sources, retried uploads). Keyed-state shuffle on the
  * fingerprint, no ordering requirement, append output.
  */
object DedupStream {

  /** First occurrence per fingerprint within the watermark window.
    * Input needs an event-time column `tsCol` (TIMESTAMP) and a
    * content-fingerprint column; every other column rides along with the
    * kept first row.
    */
  def firstPerFingerprint(docs: DataFrame, tsCol: String,
      fingerprintCol: String, lateness: String = "10 minutes"): DataFrame =
    docs.withWatermark(tsCol, lateness)
      .dropDuplicatesWithinWatermark(fingerprintCol)

  /** Convenience over raw text: fingerprint with the pipeline's
    * normalizing hash ([[graft.pipeline.Text.fingerprint]]) then dedup. */
  def firstPerText(docs: DataFrame, tsCol: String, textCol: String,
      lateness: String = "10 minutes"): DataFrame =
    firstPerFingerprint(
      docs.withColumn("fingerprint", graft.pipeline.Text.fingerprint(col(textCol))),
      tsCol, "fingerprint", lateness)
}
