package graft.ops

import graft.SparkTestBase
import org.scalacheck.Gen

class RangeJoinSpec extends SparkTestBase {

  private def leftDf(rows: Seq[(String, Long, String)]) = {
    import spark.implicits._
    rows.toDF("k", "ord", "lpay")
  }
  private def rightDf(rows: Seq[(String, Long, Double)]) = {
    import spark.implicits._
    rows.toDF("k", "rord", "rval")
  }

  test("emits exactly the pairs inside the half-open backward window") {
    val l = leftDf(Seq(("a", 10L, "x")))
    val r = rightDf(Seq(
      ("a", 5L, 1.0),   // 10 - 5 = 5 -> inside (ord - 5, ord]? 5 > 10-5=5 is false -> OUT
      ("a", 6L, 2.0),   // inside
      ("a", 10L, 3.0),  // inclusive upper bound -> inside
      ("a", 11L, 4.0),  // after -> out
      ("b", 9L, 5.0)))  // wrong key -> out
    val got = RangeJoin.bandedBackward(l, r, Seq("k"), "ord", "rord", before = 5L)
      .collect().map(x => (x.getLong(3), x.getDouble(4))).toSet
    assert(got === Set((6L, 2.0), (10L, 3.0)))
  }

  test("pairs straddling a bucket boundary are produced exactly once") {
    // band width 5: left at ord=12 (bucket 2) must see right at ord=9
    // (bucket 1, replicated to 2) and right at ord=10 (bucket 2) once each
    val l = leftDf(Seq(("a", 12L, "x")))
    val r = rightDf(Seq(("a", 9L, 1.0), ("a", 10L, 2.0)))
    val got = RangeJoin.bandedBackward(l, r, Seq("k"), "ord", "rord", before = 5L)
      .collect().map(x => (x.getLong(3), x.getDouble(4))).toSeq.sorted
    assert(got === Seq((9L, 1.0), (10L, 2.0)))
  }

  test("ordinates above 2^53 bucket exactly (no double-division drift)") {
    val base = (1L << 60) + 12345L
    val l = leftDf(Seq(("a", base, "x")))
    val r = rightDf(Seq(
      ("a", base - 2L, 1.0),  // inside (base-5, base]
      ("a", base - 7L, 2.0))) // outside
    val got = RangeJoin.bandedBackward(l, r, Seq("k"), "ord", "rord", before = 5L)
      .collect().map(x => (x.getLong(3), x.getDouble(4))).toSet
    assert(got === Set((base - 2L, 1.0)))
  }

  test("scalacheck parity with the naive inequality join (4 band widths x 15 cases)") {
    val keyGen = Gen.oneOf("a", "b")
    val caseGen = Gen.zip(
      Gen.listOfN(15, Gen.zip(keyGen, Gen.choose(0L, 30L))),
      Gen.listOfN(15, Gen.zip(keyGen, Gen.choose(0L, 30L))))
    for (b <- Seq(1L, 3L, 5L, 12L)) {
      // cases folded into the key space -> one operator run per width
      val cases = Gen.listOfN(15, caseGen).sample.get
      val ls = cases.zipWithIndex.flatMap { case ((l, _), ci) =>
        l.zipWithIndex.map { case ((k, o), i) => (s"$ci:$k", o, s"l$ci-$i") } }
      val rs = cases.zipWithIndex.flatMap { case ((_, r), ci) =>
        r.zipWithIndex.map { case ((k, o), i) => (s"$ci:$k", o, ci * 1000 + i.toDouble) } }
      val got = RangeJoin.bandedBackward(leftDf(ls), rightDf(rs), Seq("k"), "ord", "rord", b)
        .collect().map(x => (x.getString(0), x.getLong(1), x.getString(2),
          x.getLong(3), x.getDouble(4)))
      // multiset compare: duplicate left/right rows must multiply, and no
      // pair may be emitted twice by the band replication
      val expected = for {
        (lk, lo, lp) <- ls
        (rk, ro, rv) <- rs
        if lk == rk && ro > lo - b && ro <= lo
      } yield (lk, lo, lp, ro, rv)
      assert(got.groupBy(identity).view.mapValues(_.size).toMap ===
        expected.groupBy(identity).view.mapValues(_.size).toMap, s"band width $b")
    }
  }
}
