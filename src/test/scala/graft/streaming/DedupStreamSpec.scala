package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Streaming dedup: first occurrence per fingerprint survives, duplicates
  * within the watermark window are dropped across micro-batches, and the
  * watermark bounds the dedup state (a duplicate arriving after the key's
  * state expired passes — the documented bounded-state trade).
  */
class DedupStreamSpec extends SparkTestBase {
  import spark.implicits._

  test("cross-batch duplicates drop; state expires past the watermark") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val out = DedupStream.firstPerText(
      input.toDF().toDF("sec", "text").withColumn("ts", timestamp_seconds(col("sec"))),
      "ts", "text", lateness = "1 minute")

    val q = out.writeStream.format("memory").queryName("dedup_stream")
      .outputMode(OutputMode.Append()).start()
    try {
      // batch 1: two distinct docs + an in-batch duplicate
      input.addData((10L, "alpha"), (11L, "beta"), (12L, "alpha"))
      q.processAllAvailable()
      // batch 2: a cross-batch duplicate (inside the window) and a row far
      // ahead that advances the watermark past alpha's state (300-60=240s)
      input.addData((20L, "alpha"), (300L, "gamma"))
      q.processAllAvailable()
      // batch 3: alpha again — its dedup state expired at the watermark,
      // so this occurrence legitimately passes through
      input.addData((310L, "alpha"))
      q.processAllAvailable()

      val got = spark.table("dedup_stream")
        .select(col("sec"), col("text")).collect()
        .map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
      assert(got === Seq((10L, "alpha"), (11L, "beta"), (300L, "gamma"), (310L, "alpha")))
    } finally {
      q.stop()
      spark.sql("DROP VIEW IF EXISTS dedup_stream")
      ()
    }
  }

  test("paragraph twin matches the batch grid's first-occurrence set on an in-order feed") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // 6 docs sharing paragraph content within AND across docs; width=3
    // tokens so several grid cells repeat. ONE doc per micro-batch in
    // doc_id order -> stream first-arrival == batch (doc_id, para_idx)
    // first-occurrence deterministically (within a single micro-batch,
    // which duplicate survives is partition-order-dependent — the
    // documented arbitrary-winner caveat of in-batch ties).
    val mk = (i: Long, t: String) => (100L + i, i, t)
    val docs = Seq(
      mk(0, "a b c d e f"),            // paras: "a b c", "d e f"
      mk(1, "a b c x y z"),            // "a b c" dup, "x y z" new
      mk(2, "d e f d e f"),            // both cells dup of doc0 para1
      mk(3, "q r"),                    // short doc: one 2-token para
      mk(4, "x y z q r"),              // cells "x y z" (dup), "q r" (dup of doc3)
      mk(5, "a b c d e f"))            // fully duplicate doc
    val batches = docs.map(Seq(_))

    val input = MemoryStream[(Long, Long, String)]
    val out = DedupStream.firstParagraphs(
      input.toDF().toDF("sec", "doc_id", "text")
        .withColumn("ts", timestamp_seconds(col("sec"))),
      "ts", "text", width = 3, lateness = "10 minutes")
    val q = out.writeStream.format("memory").queryName("para_stream")
      .outputMode(OutputMode.Append()).start()
    try {
      batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
      val got = spark.table("para_stream")
        .select(col("doc_id"), col("para_idx"), col("para_md5")).collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).sorted.toSeq

      // batch oracle: same grid, first occurrence by (doc_id, para_idx)
      import org.apache.spark.sql.expressions.Window
      val batchParas = graft.queries.Pipeline.chunkingOf(
        docs.toDF("sec", "doc_id", "text"), width = 3, stride = 3)
      val w = Window.partitionBy(col("chunk_md5")).orderBy(col("doc_id"), col("chunk_id"))
      val expected = batchParas.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("doc_id"), col("chunk_id"), col("chunk_md5")).collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).sorted.toSeq
      assert(got === expected)
      assert(got.map(_._3).distinct.size === got.size) // one row per distinct paragraph
    } finally {
      q.stop()
      spark.sql("DROP VIEW IF EXISTS para_stream")
      ()
    }
  }
}
