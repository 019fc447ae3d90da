package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** [[PathStream]] ≡ the batch lag-window trigram frame
  * ([[graft.queries.EventFold.topPathTrigramsOf]]) row for row, for any
  * chunking of an in-order feed — every emitted trigram carries the
  * completing event's id, so parity is on exact rows, not a multiset
  * summary. Cold journeys re-prime (no emission until the third
  * event); out-of-order input fails fast (the twin convention). */
class PathStreamSpec extends SparkTestBase {
  import spark.implicits._

  private val providerKey = "spark.sql.streaming.stateStore.providerClass"
  private val rocks =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  private def withRocks[A](body: => A): A = {
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey, rocks)
    try body finally {
      prev match {
        case Some(p) => spark.conf.set(providerKey, p)
        case None => spark.conf.unset(providerKey)
      }
    }
  }

  private def batchTrigrams(evs: Seq[PathStream.PathEvent]): Set[(Long, Long, String, String, String)] =
    graft.queries.EventFold.topPathTrigramsOf(
      evs.map(e => (e.userId, e.eventId, e.eventType))
        .toDF("user_id", "event_id", "event_type"))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getString(2), r.getString(3), r.getString(4)))
      .toSet

  private def streamTrigrams(batches: Seq[Seq[PathStream.PathEvent]]): Set[(Long, Long, String, String, String)] = {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[PathStream.PathEvent]
    val q = PathStream.trigrams(input.toDS())
      .writeStream.format("memory").queryName("path_stream")
      .outputMode(OutputMode.Append()).start()
    try {
      batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
      spark.table("path_stream")
        .select(col("userId"), col("eventId"), col("t1"), col("t2"), col("t3"))
        .collect().map(r => (r.getLong(0), r.getLong(1),
          r.getString(2), r.getString(3), r.getString(4)))
        .toSet
    } finally {
      q.stop()
      spark.sql("DROP VIEW IF EXISTS path_stream")
      ()
    }
  }

  test("chunked streaming equals the batch lag-window frame on random journeys") { withRocks {
    val rnd = new scala.util.Random(71)
    val types = Seq("click", "view", "purchase", "signup", "error")
    val evs = (1L to 300L).map { i =>
      PathStream.PathEvent(rnd.nextInt(7).toLong, i, types(rnd.nextInt(types.size)))
    }
    val expected = batchTrigrams(evs)
    assert(expected.nonEmpty)
    // one batch, per-event chunks, and ragged chunks — all identical
    assert(streamTrigrams(Seq(evs)) === expected)
    assert(streamTrigrams(evs.map(Seq(_))) === expected)
    assert(streamTrigrams(evs.grouped(41).toSeq) === expected)
  } }

  test("journeys shorter than 3 events emit nothing; the third event emits") { withRocks {
    import PathStream.PathEvent
    val evs = Seq(PathEvent(1L, 1L, "a"), PathEvent(1L, 2L, "b"),
      PathEvent(2L, 3L, "x"), PathEvent(1L, 4L, "c"))
    val got = streamTrigrams(evs.map(Seq(_)))
    assert(got === Set((1L, 4L, "a", "b", "c")))
  } }

  test("out-of-order input fails fast instead of silently re-windowing") { withRocks {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[PathStream.PathEvent]
    val q = PathStream.trigrams(input.toDS())
      .writeStream.format("memory").queryName("path_stream_ooo")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(PathStream.PathEvent(1L, 10L, "a"))
      q.processAllAvailable()
      input.addData(PathStream.PathEvent(1L, 9L, "b")) // id regresses
      val e = intercept[Exception] { q.processAllAvailable() }
      val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
        .map(t => Option(t.getMessage).getOrElse("")).mkString("\n")
      assert(msgs.contains("out-of-order"), s"expected the in-order guard, got: $msgs")
    } finally {
      q.stop()
      spark.sql("DROP VIEW IF EXISTS path_stream_ooo")
      ()
    }
  } }
}
