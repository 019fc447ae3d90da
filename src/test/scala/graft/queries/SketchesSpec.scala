package graft.queries

import graft.SparkTestBase

/** Pins the tie-robust rank contract of the quantile sketch query
  * (self-review r10): `approx_percentile` returns an ELEMENT of the data;
  * under heavy ties its max-rank can overshoot the target by the full tie
  * mass, so the contract must test the rank INTERVAL, not the max rank.
  */
class SketchesSpec extends SparkTestBase {
  import spark.implicits._

  test("rank contract holds on a column with 20% tie mass at the median") {
    // 4000 distinct low values, 1000 copies of one mid value (20% tie
    // mass spanning the 0.5 quantile), 0 high — a max-rank contract
    // (count <= approx) would read rank 5000/5000 = 1.0 for q=0.5
    val vals = (1 to 4000).map(_.toDouble / 10000.0) ++ Seq.fill(1000)(0.9)
    val out = Sketches.quantilesContractOf(vals.toDF("value"))
      .collect().map(r => (r.getDouble(0), r.getBoolean(2))).toMap
    assert(out(0.5) === true, s"median rank contract under ties: $out")
    assert(out.forall(_._2), s"all rank contracts: $out")
  }

  test("rank contract holds on an all-distinct column") {
    val vals = (1 to 5000).map(_.toDouble)
    val out = Sketches.quantilesContractOf(vals.toDF("value"))
      .collect().map(r => (r.getDouble(0), r.getBoolean(2))).toMap
    assert(out.forall(_._2), s"all rank contracts: $out")
  }

  // deterministic zipf-ish skew: key k appears ~N/k times
  private def skewedKeys(nKeys: Int, scale: Int): Seq[Long] =
    (1 to nKeys).flatMap(k => Seq.fill(scale / k)(k.toLong))

  test("spacesaving exact regime: counts exact, err 0, partitioning-independent") {
    val keys = skewedKeys(40, 400)
    val truth = keys.groupBy(identity).map { case (k, g) => k -> g.size.toLong }
    Seq(1, 7, 32).foreach { parts =>
      val df = keys.toDF("user_id").repartition(parts)
      val got = Sketches.spaceSavingContractOf(df, capacity = 64, k = 10)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      val expected = truth.toSeq.sortBy { case (k, c) => (-c, k) }.take(10)
        .map { case (k, c) => (k, c, 0L) }
      assert(got.toSeq === expected, s"parts=$parts")
    }
  }

  test("spacesaving guarantees under eviction pressure: never undercounts, err bounds, floor coverage") {
    val keys = skewedKeys(200, 2000) // 200 distinct, capacity 16 → heavy eviction
    val truth = keys.groupBy(identity).map { case (k, g) => k -> g.size.toLong }
    val n = keys.size.toLong
    Seq(1, 13).foreach { parts =>
      val df = keys.toDF("user_id").repartition(parts)
      val got = Sketches.spaceSavingContractOf(df, capacity = 16, k = 16)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      got.foreach { case (k, est, err) =>
        val t = truth.getOrElse(k, 0L)
        assert(est >= t, s"parts=$parts key $k: est $est < true $t")
        assert(est - err <= t, s"parts=$parts key $k: est-err ${est - err} > true $t")
      }
      // classic single-stream guarantee: every key heavier than N/capacity
      // is tracked (single partition — the merge bound is the est/err pair)
      if (parts == 1) {
        val tracked = got.map(_._1).toSet
        truth.filter(_._2 > n / 16).keys.foreach { k =>
          assert(tracked(k), s"heavy key $k (${truth(k)} > ${n / 16}) not tracked")
        }
      }
    }
  }

  test("grouped rank contract holds per group, incl. a group with tie mass") {
    // group A: the global spec's 20%-tie-mass column; group B: all
    // distinct — per-group contracts must not leak across groups
    val a = ((1 to 4000).map(_.toDouble / 10000.0) ++ Seq.fill(1000)(0.9)).map(("A", _))
    val b = (1 to 3000).map(i => ("B", i.toDouble))
    val out = Sketches.quantilesGroupedContractOf((a ++ b).toDF("event_type", "value"))
      .collect().map(r => ((r.getString(0), r.getDouble(1)), r.getBoolean(3))).toMap
    assert(out.size === 4)
    assert(out.forall(_._2), s"per-group rank contracts: $out")
  }

  test("count-min contract holds on a skewed key column (incl. singletons)") {
    // 5000 copies of one hot key + 500 singletons: min-of-counters must
    // never undercount any of them (the hard theorem cms_ok gates)
    val keys = Seq.fill(5000)("hot") ++ (1 to 500).map(i => s"k$i")
    val out = Sketches.cmsContractOf(keys.toDF("k"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getBoolean(2)))
    assert(out.length === 501)
    assert(out.forall(_._3), s"cms contract rows: ${out.filterNot(_._3).take(5).toSeq}")
    assert(out.find(_._1 == "hot").exists(_._2 == 5000L))
    // the PROBABILISTIC ε·N overcount bound lives here on fixed data, not
    // in the hashed driver output (ADVICE r10: gating a 1−δ event in the
    // correctness gate can flip spuriously on a dataset/seed change)
    val sketch = keys.toDF("k").stat
      .countMinSketch("k", eps = 0.001, confidence = 0.99, seed = 42)
    val bound = math.ceil(0.001 * sketch.totalCount()).toLong
    val exact = keys.groupBy(identity).view.mapValues(_.size.toLong)
    exact.foreach { case (k, n) =>
      assert(sketch.estimateCount(k) <= n + bound,
        s"ε·N overcount bound violated for $k: ${sketch.estimateCount(k)} > $n + $bound")
    }
  }
}
