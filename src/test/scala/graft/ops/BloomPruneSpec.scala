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

  test("string keys probe via the string hash path (no silent long-cast pruning)") {
    import spark.implicits._
    val f = (1 to 500).map(i => s"key-$i").toDF("fk")
    val d = (1 to 10).map(i => s"key-${i * 31}").toDF("dk")
    val pruned = BloomPrune.semiJoin(f, d, "fk", "dk", expectedItems = 1000)
      .collect().map(_.getString(0)).sorted
    assert(pruned.toSeq === (1 to 10).map(i => s"key-${i * 31}").sorted)
  }

  test("unsupported probe key types are rejected at plan time") {
    import spark.implicits._
    // the build side rejects doubles itself (bloom_filter_agg type check);
    // the probe side must too — a double fact key silently cast to long
    // would hash differently than any build path
    val f = Seq(1.5, 2.5).toDF("fk")
    val bloom = BloomPrune.buildFilter(dims, "dk", 100)
    val e = intercept[IllegalArgumentException] {
      BloomPrune.prefilter(f, "fk", bloom)
    }
    assert(e.getMessage.contains("bloom prefilter supports"))
  }

  test("string probe binary path ≡ mightContainString, incl. non-ASCII") {
    import spark.implicits._
    // the codegen probe calls mightContainBinary(utf8.getBytes); pin its
    // equivalence to the build side's putString hashing on multi-byte data
    val keys = Seq("héllo", "日本語", "emoji-🙂", "plain", "ßpecial")
    val d = keys.toDF("dk")
    val bloom = BloomPrune.buildFilter(d, "dk", 100)
    keys.foreach(k => assert(bloom.mightContainString(k), s"build missing $k"))
    val probeSet = (keys ++ Seq("absent-ascii", "absénte", "中文不在")).toDF("fk")
    val admitted = BloomPrune.prefilter(probeSet, "fk", bloom)
      .collect().map(_.getString(0)).toSet
    assert(keys.toSet.subsetOf(admitted),
      s"binary probe path dropped a true member: $admitted")
    // expression semantics mirror mightContainString exactly, member or not
    probeSet.collect().map(_.getString(0)).foreach { k =>
      assert(admitted.contains(k) === bloom.mightContainString(k), k)
    }
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
