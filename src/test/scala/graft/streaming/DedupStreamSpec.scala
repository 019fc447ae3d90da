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
}
