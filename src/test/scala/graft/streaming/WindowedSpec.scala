package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Watermarked event-time windows: append mode emits a window only after
  * the watermark passes its end, and rows later than the watermark are
  * DROPPED — the state-bounding contract that keeps a streaming
  * aggregation finite at any volume.
  */
class WindowedSpec extends SparkTestBase {
  import spark.implicits._

  test("windowed counts finalize at the watermark; late rows are dropped") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val counts = Windowed.eventCounts(
      input.toDF().toDF("ts_us", "event_type"), width = "1 minute", lateness = "2 minutes")

    val q = counts.writeStream.format("memory").queryName("win_counts")
      .outputMode(OutputMode.Append()).start()
    try {
      def us(sec: Long) = sec * 1000000L
      // batch 1: two rows in window [0,60), one in [60,120), one far ahead
      // at t=400s that advances the watermark to 400-120 = 280s
      input.addData((us(10), "click"), (us(20), "click"), (us(70), "click"), (us(400), "click"))
      q.processAllAvailable()
      // batch 2: a LATE row for [0,60) — far behind the 280s watermark
      input.addData((us(30), "click"))
      q.processAllAvailable()

      val rows = spark.table("win_counts")
        .select($"window_start".cast("long"), $"n").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      // [0,60) finalized with the two ON-TIME rows; the late third dropped
      assert(rows.get(0L) === Some(2L), s"window [0,60): $rows")
      // [60,120) finalized with one row
      assert(rows.get(60L) === Some(1L), s"window [60,120): $rows")
      // the t=400s window's end (420s) is past the watermark - not emitted
      assert(!rows.contains(360L), s"unfinalized window emitted: $rows")
    } finally {
      q.stop()
      spark.sql("DROP VIEW IF EXISTS win_counts")
      ()
    }
  }
}
