package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads ride as opaque
  * BINARY columns with typed metadata structs; decode / feature-extract /
  * resize / frame-sample are per-row transforms over the binary payload.
  *
  * The actual media codecs are NOT available in this environment, so the
  * decode step is a clearly-marked deterministic STUB (metadata derived
  * from the bytes themselves); everything around it — schema, batch shape,
  * partition sizing, the pure-column fast path — is real. In production
  * the stub body is replaced by a codec call inside the same
  * `mapPartitions`/UDF signature (batch-amortized, arrow-friendly), with
  * identical schema and distribution properties.
  *
  * Scale notes: media blobs dominate row size — partition sizing must key
  * off `spark.sql.files.maxPartitionBytes`, and metadata-only queries must
  * never read the blob column (columnar pruning does this for free when
  * the blob is a separate top-level column — never nest blobs inside a
  * struct that metadata queries touch).
  */
object Multimodal {

  /** Media metadata schema produced by decode. */
  val MetaDdl = "STRUCT<byte_len: BIGINT, format: STRING, width: INT, height: INT, n_frames: INT>"

  /** STUB decode: deterministic pseudo-metadata from the payload bytes.
    * Replace body with a real codec probe in production; the signature,
    * null handling, and output schema are the contract. Pure column
    * expressions — stays in whole-stage codegen.
    */
  def decodeStub(blob: Column): Column = {
    val len = length(blob).cast("bigint")
    // "format" from the first byte, "dimensions" from stable byte hashes —
    // deterministic stand-ins for codec-probed values
    val first = when(len > 0, ascii(substring(blob.cast("string"), 1, 1))).otherwise(lit(0))
    val h = abs(xxhash64(blob))
    struct(
      len.as("byte_len"),
      when(len === 0, "empty")
        .when(pmod(first, lit(3)) === 0, "img").when(pmod(first, lit(3)) === 1, "aud")
        .otherwise(lit("vid")).as("format"),
      (pmod(h, lit(640)) + 1).cast("int").as("width"),
      (pmod(h, lit(480)) + 1).cast("int").as("height"),
      (pmod(h, lit(30)) + 1).cast("int").as("n_frames"))
  }

  /** STUB resize: new metadata after a bounded-box resize (aspect-preserving
    * integer math; the blob itself would be re-encoded in production). */
  def resizeMeta(meta: Column, maxW: Int, maxH: Int): Column = {
    val w = meta.getField("width")
    val hh = meta.getField("height")
    // integer scale in per-mille to stay exact/deterministic
    val scaleW = when(w > maxW, lit(maxW) * 1000 / w).otherwise(lit(1000))
    val scaleH = when(hh > maxH, lit(maxH) * 1000 / hh).otherwise(lit(1000))
    val s = least(scaleW, scaleH)
    struct(meta.getField("byte_len").as("byte_len"), meta.getField("format").as("format"),
      (w * s / 1000).cast("int").as("width"), (hh * s / 1000).cast("int").as("height"),
      meta.getField("n_frames").as("n_frames"))
  }

  /** Frame-sample plan: every `stride`-th frame index (1-based), capped. */
  def sampleFrameIdx(meta: Column, stride: Int, maxFrames: Int): Column =
    slice(sequence(lit(1), meta.getField("n_frames"), lit(stride)), 1, maxFrames)

  /** Attach a binary payload + decoded metadata to a DataFrame column of
    * text/bytes (the driver test tables carry no real media, so payloads
    * are the utf-8 bytes of a source column — the plumbing under test). */
  def withMedia(df: DataFrame, srcCol: String): DataFrame = {
    val blob = encode(col(srcCol), "utf-8")
    df.withColumn("media_blob", blob)
      .withColumn("media_meta", decodeStub(col("media_blob")))
  }
}
