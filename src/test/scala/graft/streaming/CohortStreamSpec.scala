package graft.streaming

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** [[CohortStream]] ≡ the batch retention triangle on the same events
  * fed across micro-batches in ts order: the per-user (cohort_week,
  * week) hit stream, rolled up, must equal `cohortRetention`'s
  * (cohort_week, week_offset, n_users) exactly, with each hit emitted
  * exactly once; an out-of-order feed fails fast. */
class CohortStreamSpec extends SparkTestBase {
  import spark.implicits._

  private val providerKey = "spark.sql.streaming.stateStore.providerClass"
  private val rocks =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  test("streamed week hits roll up to the batch retention triangle") {
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey, rocks)
    try {
      val dir = "/root/testdata/sf0.001"
      val expected = graft.queries.EventFold.cohortRetention(spark, dir)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

      val feed = Tables.events(spark, dir)
        .select(col("user_id"), col("ts_us"))
        .orderBy(col("ts_us"), col("user_id"))
        .collect()
        .map(r => CohortStream.CohortEvent(r.getLong(0), r.getLong(1)))
      val n = feed.length
      val chunks = Seq(feed.slice(0, n / 3), feed.slice(n / 3, 2 * n / 3),
        feed.slice(2 * n / 3, n)).map(_.toSeq)

      implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val input = MemoryStream[CohortStream.CohortEvent]
      val q = CohortStream.weekHits(input.toDS())
        .writeStream.format("memory").queryName("cohort_stream")
        .outputMode(OutputMode.Append()).start()
      try {
        chunks.foreach { c => input.addData(c); q.processAllAvailable() }
        val hits = spark.table("cohort_stream").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        // exactly-once per (user, week): duplicates would double-count users
        assert(hits.distinct.length === hits.length)
        val got = hits.groupBy(h => (h._2, h._3 - h._2))
          .map { case ((cw, off), rs) => (cw, off, rs.length.toLong) }.toSet
        assert(got === expected)
      } finally {
        q.stop()
        spark.sql("DROP VIEW IF EXISTS cohort_stream")
        ()
      }
    } finally {
      prev match {
        case Some(p) => spark.conf.set(providerKey, p)
        case None => spark.conf.unset(providerKey)
      }
    }
  }

  test("an out-of-order feed fails fast instead of double-counting a week") {
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey, rocks)
    try {
      implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val wk = CohortStream.WeekUs
      val input = MemoryStream[CohortStream.CohortEvent]
      val q = CohortStream.weekHits(input.toDS())
        .writeStream.format("memory").queryName("cohort_stream_ooo")
        .outputMode(OutputMode.Append()).start()
      try {
        input.addData(Seq(CohortStream.CohortEvent(5L, 3L * wk)))
        q.processAllAvailable()
        input.addData(Seq(CohortStream.CohortEvent(5L, 1L * wk)))
        val e = intercept[Exception] { q.processAllAvailable() }
        val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
          .map(t => Option(t.getMessage).getOrElse("")).mkString("\n")
        assert(msgs.contains("out-of-order event"))
      } finally {
        q.stop()
        spark.sql("DROP VIEW IF EXISTS cohort_stream_ooo")
        ()
      }
    } finally {
      prev match {
        case Some(p) => spark.conf.set(providerKey, p)
        case None => spark.conf.unset(providerKey)
      }
    }
  }
}
