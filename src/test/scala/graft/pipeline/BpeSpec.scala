package graft.pipeline

import graft.SparkTestBase

/** [[graft.queries.Pipeline.bpeMerges]] invariants the oracle cannot
  * express: the argmax sequence is deterministic across runs, and the
  * winning pair count never increases round-over-round (merging the
  * most frequent pair can only create pairs bounded by its own count
  * and can only shrink the others — the classic BPE monotonicity). */
class BpeSpec extends SparkTestBase {
  private val dir = "/root/testdata/sf0.001"

  test("merge sequence is deterministic and max pair count is non-increasing") {
    def run() = graft.queries.Pipeline.bpeMerges(spark, dir, rounds = 4)
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq
    val a = run()
    assert(a.size === 4)
    assert(a === run(), "BPE merges must be deterministic across runs")
    val counts = a.sortBy(_._1).map(_._4)
    assert(counts.zip(counts.tail).forall { case (x, y) => x >= y },
      s"winning pair counts must be non-increasing: $counts")
    // merge rules are distinct: the merged symbol replaces its pair, so
    // the same (a, b) can never win twice
    assert(a.map(t => (t._2, t._3)).distinct.size === 4)
  }
}
