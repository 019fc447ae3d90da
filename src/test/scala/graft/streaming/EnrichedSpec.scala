package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Stream-stream interval join ([[Enriched.intervalJoin]]): the batch
  * answer is the ground truth (naive pair model), the exact span
  * boundaries are inclusive on both ends, users never cross-match, and
  * the STREAMED execution of the same function over chunked input
  * reproduces the batch answer row-for-row while the two-sided time
  * constraint keeps join state bounded (buffered rows are evicted once
  * the opposite watermark passes their reach).
  */
class EnrichedSpec extends SparkTestBase {
  import spark.implicits._

  private val spanUs = 10L * 1000000L // 10 s

  private def factsDf(rows: Seq[(Long, Long, Long)]) =
    rows.toDF("ts_us", "user_id", "fact_id")
  private def ctxDf(rows: Seq[(Long, Long, Long, Double)]) =
    rows.toDF("ts_us", "user_id", "ctx_id", "value")

  /** Naive model: every (fact, ctx) pair, same user, ctx in
    * [fact.ts - span, fact.ts]. */
  private def model(facts: Seq[(Long, Long, Long)],
      ctx: Seq[(Long, Long, Long, Double)]): Set[(Long, Long, Long, Long, Long, Double)] =
    (for {
      (fts, fu, fid) <- facts
      (cts, cu, cid, v) <- ctx
      if fu == cu && cts >= fts - spanUs && cts <= fts
    } yield (fu, fid, fts, cid, cts, v)).toSet

  private def collectOut(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4), r.getDouble(5))).toSet

  test("batch: inclusive span bounds, per-user isolation, multi-match fan-out") {
    val s = spanUs
    val facts = Seq((s, 1L, 100L), (s, 2L, 200L), (3 * s, 1L, 101L))
    val ctx = Seq(
      (0L, 1L, 10L, 1.0),          // exactly fact.ts - span → included
      (s, 1L, 11L, 2.0),           // exactly fact.ts → included
      (1L, 1L, 12L, 3.0),          // in span
      (s + 1L, 1L, 13L, 4.0),      // 1 µs after fact 100 → only fact 101? (3s span check)
      (0L, 2L, 20L, 5.0),          // user 2
      (2 * s - 1L, 3L, 30L, 6.0))  // user with no facts
    val got = collectOut(Enriched.intervalJoin(factsDf(facts), ctxDf(ctx), s))
    assert(got === model(facts, ctx), s"got $got")
    // the boundary rows really are present
    assert(got.contains((1L, 100L, s, 10L, 0L, 1.0)))
    assert(got.contains((1L, 100L, s, 11L, s, 2.0)))
    assert(!got.exists(t => t._2 == 100L && t._4 == 13L))
  }

  test("randomized batch parity with the naive pair model") {
    val gen = new scala.util.Random(42)
    val facts = Seq.tabulate(60)(i =>
      (gen.nextInt(40).toLong * spanUs / 4, gen.nextInt(4).toLong + 1, 1000L + i))
    val ctx = Seq.tabulate(80)(i =>
      (gen.nextInt(40).toLong * spanUs / 4, gen.nextInt(4).toLong + 1, 2000L + i,
        (i % 7).toDouble))
    val got = collectOut(Enriched.intervalJoin(factsDf(facts), ctxDf(ctx), spanUs))
    assert(got === model(facts, ctx))
  }

  test("streaming chunked execution matches batch; join state is evicted") {
    implicit val ctxSql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val fIn = MemoryStream[(Long, Long, Long)]
    val cIn = MemoryStream[(Long, Long, Long, Double)]
    val joined = Enriched.intervalJoin(
      fIn.toDF().toDF("ts_us", "user_id", "fact_id"),
      cIn.toDF().toDF("ts_us", "user_id", "ctx_id", "value"), spanUs)
    val q = joined.writeStream.format("memory").queryName("enriched_out").start()
    try {
      // chunk 1: t ∈ [0, 3 span); chunk 2 strictly later per side (event
      // time nondecreasing per source, so 0 s lateness drops nothing) but
      // fact 102 still reaches BACK into chunk-1 context via buffered state
      val f1 = Seq((spanUs, 1L, 100L), (2 * spanUs, 2L, 101L))
      val c1 = Seq((1L, 1L, 10L, 1.0), (spanUs, 1L, 11L, 2.0),
        (2 * spanUs - 2L, 2L, 20L, 3.0), (3 * spanUs - 1L, 1L, 12L, 4.0))
      fIn.addData(f1); cIn.addData(c1); q.processAllAvailable()
      val f2 = Seq((3 * spanUs, 1L, 102L))
      val c2 = Seq((3 * spanUs, 1L, 13L, 5.0))
      fIn.addData(f2); cIn.addData(c2); q.processAllAvailable()
      // far-future chunk 3: both watermarks jump 100 spans ahead, so every
      // earlier buffered row is beyond both sides' reach and must leave
      // the state store (the bounded-state contract)
      val f3 = Seq((103 * spanUs, 9L, 900L))
      val c3 = Seq((103 * spanUs, 9L, 90L, 9.0))
      fIn.addData(f3); cIn.addData(c3); q.processAllAvailable()
      fIn.addData(Seq((104 * spanUs, 9L, 901L)))
      cIn.addData(Seq((104 * spanUs, 9L, 91L, 9.5))); q.processAllAvailable()

      val streamed = collectOut(spark.table("enriched_out"))
      val batch = collectOut(Enriched.intervalJoin(
        factsDf(f1 ++ f2 ++ f3 ++ Seq((104 * spanUs, 9L, 901L))),
        ctxDf(c1 ++ c2 ++ c3 ++ Seq((104 * spanUs, 9L, 91L, 9.5))), spanUs))
      assert(streamed === batch, s"streamed $streamed\nbatch $batch")

      val state = q.recentProgress.reverse.find(_.stateOperators.nonEmpty)
        .map(_.stateOperators(0).numRowsTotal)
      assert(state.exists(_ <= 4),
        s"join state not evicted after watermark advance: $state")
    } finally q.stop()
  }
}
