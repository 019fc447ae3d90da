package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class BloomPruneSpec extends SparkTestBase {

  private def facts = {
    import spark.implicits._
    (1L to 2000L).map(i => (i, i % 100)).toDF("fk", "payload")
  }
  private def dims = {
    import spark.implicits._
    // selective dimension: 20 of the 2000 fact keys
    (1L to 20L).map(i => i * 97).toDF("dk")
  }

  test("pruned semi join returns exactly the plain semi join") {
    val pruned = BloomPrune.semiJoin(facts, dims, "fk", "dk", expectedItems = 1000)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val plain = facts.join(dims, col("fk") === col("dk"), "left_semi")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(pruned.nonEmpty && (pruned.toSeq === plain.toSeq))
  }

  test("prefilter admits every true match and prunes most non-matches") {
    val bloom = BloomPrune.buildFilter(dims, "dk", expectedItems = 1000, fpp = 0.01)
    val admitted = BloomPrune.prefilter(facts, "fk", bloom)
      .select(col("fk")).collect().map(_.getLong(0)).toSet
    val trueKeys = dims.collect().map(_.getLong(0)).toSet
    assert(trueKeys.subsetOf(admitted), "bloom must never drop a true match")
    // 1% fpp over ~1980 non-matching keys -> ~20 expected false positives;
    // 10x headroom keeps the assertion load-proof while still proving the
    // prefilter drops the overwhelming majority of the fact side
    assert(admitted.size <= trueKeys.size + 200,
      s"prefilter admitted ${admitted.size} of 2000 (20 true)")
  }
}
