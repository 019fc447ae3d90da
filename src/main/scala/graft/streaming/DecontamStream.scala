package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming decontamination — the batch exact-substring contamination
  * check ([[graft.queries.Pipeline]] `contamination_substring`) at
  * ingest time: every arriving document's W-token windows are checked
  * against a STATIC eval-set probe frame, so contaminated documents are
  * flagged before they ever land in the corpus.
  *
  * Scale shape: this is the canonical STREAM-STATIC join — the probe
  * side is a bounded, pre-hashed static frame (an eval set's shingles:
  * thousands to millions of rows) joined per micro-batch without any
  * stream-side state; the stream side explodes row-locally. The probe
  * join is SIZE-GATED (the `minhashVerified` pattern): under the cap it
  * is pinned `broadcast(probe)` — relying on `autoBroadcastJoinThreshold`
  * would silently flip to a shuffled join past 10 MB and re-shuffle
  * EVERY micro-batch on the window hash; above the cap the shuffled
  * stream-static equi-join is the documented fallback (an eval set that
  * big is itself a corpus). The gate is decided once at plan-build time
  * with one count on the static side. Window dedup needs NO streaming
  * state either:
  * a document arrives whole in one row, so `array_distinct` before the
  * explode reproduces the batch op's (doc, window) distinct exactly.
  *
  * The per-doc rollup runs as an UPDATE-mode streaming aggregation (one
  * state row per in-flight document). Because each doc is atomic in one
  * input row, every doc's aggregate is complete after its own
  * micro-batch — production sinks consume the update stream (or run the
  * same rollup in foreachBatch) and the state can be TTL'd aggressively;
  * the parity spec reads the final table.
  */
object DecontamStream {

  /** Probe rows a pinned broadcast will accept before the plan falls back
    * to a shuffled stream-static join: ~64 B/row (short shingle string +
    * 8-byte hash) ⇒ ≈ 64 MB build side at the cap — comfortably inside
    * executor memory, far past `autoBroadcastJoinThreshold`'s 10 MB. */
  val MaxBroadcastProbeRows = 1000000L

  /** Per-document window/hit counts for streaming `docs` against the
    * static `probe` (columns `pw` + `ph = xxhash64(pw)`, distinct on
    * `pw` — build it with [[probeOf]]). Returns
    * (doc_id, n_windows, n_hits, contaminated) as an aggregation the
    * caller writes in Update or Complete mode.
    *
    * `maxBroadcastProbe` gates the pinned `broadcast(probe)` (one count
    * on the static side at plan-build time); above it the join is the
    * documented shuffled fallback (tests force it with 0). */
  def flaggedCounts(docs: DataFrame, docIdCol: String, textCol: String,
      probe: DataFrame, w: Int = 4,
      maxBroadcastProbe: Long = MaxBroadcastProbeRows): DataFrame = {
    val windows = docs.select(col(docIdCol).as("doc_id"),
        explode(array_distinct(graft.pipeline.Text.shingles(col(textCol), w))).as("w"))
      .withColumn("h", xxhash64(col("w")))
    val probeSide =
      if (probe.count() <= maxBroadcastProbe) broadcast(probe) else probe
    windows.join(probeSide, col("h") === col("ph") && col("w") === col("pw"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_windows"), count(col("pw")).as("n_hits"))
      .withColumn("contaminated", when(col("n_hits") > 0, 1).otherwise(0))
  }

  /** Static probe frame from an eval set's text column: distinct
    * W-token windows, pre-hashed with the same xxhash64 the stream side
    * joins on. */
  def probeOf(evalDocs: DataFrame, textCol: String, w: Int = 4): DataFrame =
    evalDocs.select(explode(graft.pipeline.Text.shingles(col(textCol), w)).as("pw"))
      .distinct()
      .withColumn("ph", xxhash64(col("pw")))

  /** The split-bucket rule shared bit-for-bit with the batch
    * [[graft.queries.Pipeline.contaminationSplit]] /
    * `pipeline_split` contract: overflow-guarded Knuth bucket of the
    * doc id, <800 train / <900 val / else test. */
  def splitOf(docId: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val bucket = pmod(graft.queries.Pipeline.knuthHash(docId), lit(1000L))
    when(bucket < 800, "train").when(bucket < 900, "val").otherwise("test")
  }

  /** Static TRAIN-window probe for [[splitFlaggedCounts]]: the train
    * slice of a corpus snapshot (by [[splitOf]]'s bucket rule) reduced
    * to its distinct pre-hashed windows — the batch query's `trainW`
    * frame, built once at deploy time. */
  def trainProbeOf(corpus: DataFrame, docIdCol: String, textCol: String,
      w: Int = 4): DataFrame =
    corpus.filter(splitOf(col(docIdCol)) === "train")
      .select(explode(graft.pipeline.Text.shingles(col(textCol), w)).as("pw"))
      .distinct()
      .withColumn("ph", xxhash64(col("pw")))

  /** TRAIN→EVAL leakage at INGEST (VERDICT r13 Next #8) — the streaming
    * twin of the batch `contamination_split`: each arriving document is
    * assigned its split by the SAME Knuth bucket rule; train docs pass
    * through unflagged territory (they are the probe's own population —
    * filtered out here), and every val/test doc's distinct windows probe
    * the static train-window frame. Same stream-static shape, same
    * size-gated broadcast, and NO keyed streaming state beyond the
    * per-doc rollup — a doc arrives whole in one row, so row-local
    * `array_distinct` reproduces the batch (doc, window) distinct.
    *
    * Returns (doc_id, split, n_windows, n_hits, contaminated) for eval
    * docs only, as an Update/Complete-mode aggregation like
    * [[flaggedCounts]]. */
  def splitFlaggedCounts(docs: DataFrame, docIdCol: String, textCol: String,
      trainProbe: DataFrame, w: Int = 4,
      maxBroadcastProbe: Long = MaxBroadcastProbeRows): DataFrame = {
    val windows = docs
      .select(col(docIdCol).as("doc_id"), splitOf(col(docIdCol)).as("split"),
        explode(array_distinct(graft.pipeline.Text.shingles(col(textCol), w))).as("w"))
      .filter(col("split") =!= "train")
      .withColumn("h", xxhash64(col("w")))
    val probeSide =
      if (trainProbe.count() <= maxBroadcastProbe) broadcast(trainProbe)
      else trainProbe
    windows.join(probeSide, col("h") === col("ph") && col("w") === col("pw"), "left")
      .groupBy(col("doc_id"), col("split"))
      .agg(count(lit(1)).as("n_windows"), count(col("pw")).as("n_hits"))
      .withColumn("contaminated", when(col("n_hits") > 0, 1).otherwise(0))
  }
}
