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

  /** Streaming twin of the batch paragraph dedup
    * ([[graft.queries.Pipeline]] `dedup_paragraph`): incoming documents
    * explode row-locally into the SAME non-overlapping `width`-token
    * grid (identical chunk-count arithmetic, so batch and stream agree
    * on every paragraph boundary), and the first arrival of each
    * paragraph md5 survives across micro-batches. State carries one row
    * per DISTINCT paragraph hash still inside the watermark window —
    * boilerplate repeated across the feed hits existing state and drops
    * without growing it. Output: one row per kept paragraph occurrence
    * (`para_idx`, `para_md5`, `n_tokens` + every input column). */
  def firstParagraphs(docs: DataFrame, tsCol: String, textCol: String,
      width: Int = 20, lateness: String = "10 minutes"): DataFrame = {
    require(width >= 1, "width must be >= 1")
    // reserved output/intermediate names — fail fast instead of silently
    // clobbering caller columns (the Urls.withCanonical ADVICE class)
    val clash = docs.columns.toSet
      .intersect(Set("__toks", "__nc", "para_idx", "n_tokens", "para_md5"))
    require(clash.isEmpty,
      s"firstParagraphs reserves column names ${clash.mkString(", ")} — rename them on the input")
    val toks = docs.withColumn("__toks", split(trim(col(textCol)), "\\s+"))
      .withColumn("__nc",
        when(size(col("__toks")) <= width, lit(1))
          .otherwise(expr(s"1 + ((size(__toks) - $width + ${width - 1}) DIV $width)")))
    val chunk = slice(col("__toks"), col("para_idx") * width + 1, lit(width))
    val paras = toks
      .withColumn("para_idx", explode(sequence(lit(0), col("__nc") - 1)))
      .withColumn("para_idx", col("para_idx").cast("int"))
      .withColumn("n_tokens", size(chunk).cast("bigint"))
      .withColumn("para_md5", md5(concat_ws(" ", chunk)))
      .drop("__toks", "__nc")
    firstPerFingerprint(paras, tsCol, "para_md5", lateness)
  }
}
