package graft.streaming

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** [[FunnelStream]] ≡ the batch `funnelOf` on the same events fed across
  * micro-batches in event-id order — the greedy keyed-state fold must
  * reproduce the batch window semantics (first signup, first view after
  * it, first purchase after that) under any chunking that respects the
  * in-order contract, and an out-of-order feed must fail fast. */
class FunnelStreamSpec extends SparkTestBase {
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

  private type Funnel = (Long, Option[Long], Option[Long], Option[Long], Int)
  private def optLong(v: Any): Option[Long] =
    Option(v).map(_.asInstanceOf[Long])

  test("streamed funnel equals the batch funnel on chunked in-order feeds") {
    withRocks {
      val dir = "/root/testdata/sf0.001"
      // corpus + synthetic users guaranteeing every stage occurs AND the
      // strict-after rules bite (u5's purchase id 30 precedes its
      // qualifying view, so only the LAST purchase converts)
      val synthetic = Seq(
        (9000001L, 21L, "view"),
        (9000002L, 22L, "signup"),
        (9000003L, 23L, "signup"), (9000003L, 24L, "view"),
        (9000004L, 25L, "signup"), (9000004L, 26L, "view"), (9000004L, 27L, "purchase"),
        (9000005L, 28L, "view"), (9000005L, 29L, "signup"), (9000005L, 30L, "purchase"),
        (9000005L, 31L, "view"), (9000005L, 32L, "purchase"))
        .toDF("user_id", "event_id", "event_type")
      val maxCorpusId = Tables.events(spark, dir).agg(max(col("event_id"))).head.getLong(0)
      val ev = Tables.events(spark, dir)
        .select(col("event_id"), col("user_id"), col("event_type"))
        .unionByName(synthetic
          .select((col("event_id") + maxCorpusId).as("event_id"),
            col("user_id"), col("event_type")))
      val batch: Set[Funnel] = graft.queries.EventFold.funnelOf(ev)
        .select(col("user_id"), col("signup_id"), col("view_id"),
          col("purchase_id"), col("stage"))
        .collect()
        .map(r => (r.getLong(0), optLong(r.get(1)), optLong(r.get(2)),
          optLong(r.get(3)), r.getInt(4)))
        .toSet

      val feed = ev.orderBy(col("event_id")).collect()
        .map(r => FunnelStream.FunnelEvent(r.getLong(1), r.getLong(0), r.getString(2)))
      // 4 chunks of the globally id-ordered feed — per-user in-order under
      // any such split
      val n = feed.length
      val chunks = Seq(feed.slice(0, n / 4), feed.slice(n / 4, n / 2),
        feed.slice(n / 2, 3 * n / 4), feed.slice(3 * n / 4, n))

      implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val input = MemoryStream[FunnelStream.FunnelEvent]
      val q = FunnelStream.funnel(input.toDS())
        .writeStream.format("memory").queryName("funnel_stream")
        .outputMode(OutputMode.Append()).start()
      try {
        chunks.foreach { c => input.addData(c.toIndexedSeq); q.processAllAvailable() }
        val rows = spark.table("funnel_stream").collect().map { r =>
          (r.getLong(0), optLong(r.get(1)), optLong(r.get(2)),
            optLong(r.get(3)), r.getInt(4))
        }
        // fields only move unset→set, so the most-advanced row per user is
        // that user's final funnel
        val got = rows.groupBy(_._1).map { case (_, rs) =>
          rs.maxBy(t => (t._5, t._2.getOrElse(-1L), t._3.getOrElse(-1L),
            t._4.getOrElse(-1L)))
        }.toSet
        assert(got.size === batch.size)
        assert(got === batch)
        // fixture sanity: all four stages occur, and u5 converted on its
        // LAST purchase only (the strict-after rule)
        assert(Set(0, 1, 2, 3).subsetOf(batch.map(_._5)))
        val u5 = batch.find(_._1 == 9000005L).get
        assert(u5._4 === Some(maxCorpusId + 32L) && u5._5 === 3)
      } finally {
        q.stop()
        spark.sql("DROP VIEW IF EXISTS funnel_stream")
        ()
      }
    }
  }

  test("an out-of-order feed fails fast instead of silently diverging") {
    withRocks {
      implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val input = MemoryStream[FunnelStream.FunnelEvent]
      val q = FunnelStream.funnel(input.toDS())
        .writeStream.format("memory").queryName("funnel_stream_ooo")
        .outputMode(OutputMode.Append()).start()
      try {
        input.addData(Seq(FunnelStream.FunnelEvent(7L, 10L, "signup")))
        q.processAllAvailable()
        input.addData(Seq(FunnelStream.FunnelEvent(7L, 5L, "view")))
        val e = intercept[Exception] { q.processAllAvailable() }
        val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
          .map(t => Option(t.getMessage).getOrElse("")).mkString("\n")
        assert(msgs.contains("out-of-order event"))
      } finally {
        q.stop()
        spark.sql("DROP VIEW IF EXISTS funnel_stream_ooo")
        ()
      }
    }
  }
}
