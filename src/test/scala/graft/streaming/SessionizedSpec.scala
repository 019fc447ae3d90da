package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Gap-based session windows ([[Sessionized.userSessions]]): events
  * within the gap merge into one session, an event at EXACTLY lastTs+gap
  * still MERGES (Spark merges sessions on `start <= prevEnd` — touch
  * counts; the oracle's lag predicate must therefore be strict `>`), an
  * event one µs past the gap opens a new session, and in append mode a
  * session is emitted only after the watermark passes its close — the
  * state-eviction contract that bounds streaming sessionization at any
  * volume.
  */
class SessionizedSpec extends SparkTestBase {
  import spark.implicits._

  private def us(sec: Long) = sec * 1000000L

  test("batch: gap merge, exact-gap touch merges, gap+1µs splits, end = lastTs + gap") {
    // user 1: events at 0s, 10s (merge), then 10s + 30min EXACTLY (touch →
    // still merges); user 2: one event; user 3: second event 1 µs past the
    // gap → splits
    val df = Seq(
      (us(0), 1L, 1.0), (us(10), 1L, 2.0), (us(10 + 1800), 1L, 4.0),
      (us(5), 2L, 8.0),
      (us(0), 3L, 1.0), (us(1800) + 1L, 3L, 2.0)
    ).toDF("ts_us", "user_id", "value")
    val out = Sessionized.userSessions(df, gap = "30 minutes")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
      .toSet
    assert(out === Set(
      (1L, us(0), us(1810) + us(1800), 3L, 7.0),
      (2L, us(5), us(5) + us(1800), 1L, 8.0),
      (3L, us(0), us(1800), 1L, 1.0),
      (3L, us(1800) + 1L, us(3600) + 1L, 1L, 2.0)), s"sessions: $out")
  }

  test("scalacheck parity with the naive gap-split sessionizer (strict-> split rule)") {
    // random per-user µs timelines on a coarse grid so exact-gap touches
    // occur; model: sort, split when gap > gapUs (STRICT — touch merges)
    val gapUs = 60L * 1000000L
    val evGen = org.scalacheck.Gen.zip(
      org.scalacheck.Gen.choose(1L, 5L), org.scalacheck.Gen.choose(0L, 20L))
    val evs = org.scalacheck.Gen.listOfN(400, evGen).sample.get
      .map { case (u, slot) => (slot * gapUs / 2, u, 1.0) }.distinct
    val got = Sessionized.userSessions(
        evs.toDF("ts_us", "user_id", "value"), gap = "60 seconds")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
      .toSet
    val expected = evs.groupBy(_._2).flatMap { case (u, rows) =>
      val ts = rows.map(_._1).sorted
      val sessions = ts.tail.foldLeft(List(List(ts.head))) { (acc, t) =>
        if (t - acc.head.head > gapUs) List(t) :: acc
        else (t :: acc.head) :: acc.tail
      }
      sessions.map(s => (u, s.min, s.max + gapUs, s.size.toLong, s.size.toDouble))
    }.toSet
    assert(got === expected)
  }

  test("streaming: a session is emitted once the watermark passes its close") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, Long, Double)]
    val sessions = Sessionized.userSessions(
      input.toDF().toDF("ts_us", "user_id", "value"),
      gap = "30 seconds", lateness = "10 seconds")

    val q = sessions.writeStream.format("memory").queryName("user_sessions")
      .outputMode(OutputMode.Append()).start()
    try {
      // batch 1: a two-event session for user 1 closing at 40s, and a far-
      // ahead row at t=500s that advances the watermark to 490s — past the
      // close, so the first session finalizes and its state evicts
      input.addData((us(0), 1L, 1.0), (us(10), 1L, 2.0), (us(500), 2L, 9.0))
      q.processAllAvailable()
      val rows = spark.table("user_sessions")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet
      assert(rows === Set((1L, us(0), 2L)), s"finalized sessions: $rows")
      // user 2's session (closes 530s) is still open — not emitted
      assert(!rows.exists(_._1 == 2L), s"unfinalized session emitted: $rows")
    } finally {
      q.stop()
      spark.sql("DROP VIEW IF EXISTS user_sessions")
      ()
    }
  }
}
