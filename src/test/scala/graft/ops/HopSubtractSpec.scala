package graft.ops

import graft.SparkTestBase
import org.scalacheck.Prop.forAll
import org.scalacheck.{Gen, Test => SCTest}

/** hopSubtract against hand-built cases derived from the reference's edge
  * behaviors (`ProjektorState.cs:178-221`) plus ScalaCheck invariants
  * (SURVEY.md §5.1-2), and native-Expression ↔ Scala-scan parity.
  */
class HopSubtractSpec extends SparkTestBase {

  private def sub(walk: Seq[String], hops: (String, String)*): Seq[String] =
    HopSubtract.subtract(walk, hops.map(_._1), hops.map(_._2))

  test("null/empty hops → walk verbatim") {
    assert(HopSubtract.subtract(Seq("a", "b"), null, null) === Seq("a", "b"))
    assert(sub(Seq("a", "b")) === Seq("a", "b"))
  }

  test("hop mid-walk: from dropped, interior skipped, to kept") {
    assert(sub(Seq("a", "b", "c", "d", "e"), ("b", "d")) === Seq("a", "d", "e"))
  }

  test("hop at walk start") {
    assert(sub(Seq("a", "b", "c"), ("a", "c")) === Seq("c"))
  }

  test("hop reaching walk end keeps the end node") {
    assert(sub(Seq("a", "b", "c"), ("b", "c")) === Seq("a", "c"))
  }

  test("toNode absent → skip to end of walk") {
    assert(sub(Seq("a", "b", "c", "d"), ("b", "zz")) === Seq("a"))
  }

  test("fromNode never matches → hop stays queued, blocks later hops") {
    // first hop never pops, so the second hop is never reached (stack order)
    assert(sub(Seq("a", "b", "c"), ("zz", "c"), ("b", "c")) === Seq("a", "b", "c"))
  }

  test("two hops in sequence; to-node of first can start the second") {
    assert(sub(Seq("a", "b", "c", "d", "e"), ("b", "c"), ("c", "e")) === Seq("a", "e"))
  }

  test("hop from == to: drops only the from element (to found at once? no — search starts past it)") {
    // from matches at b; search for to=b starting at c — not found until... e.g.
    // walk a,b,c: to=b never found after → skip to end
    assert(sub(Seq("a", "b", "c"), ("b", "b")) === Seq("a"))
  }

  test("duplicate from nodes: only first occurrence pops the hop") {
    assert(sub(Seq("a", "b", "c", "b", "d"), ("b", "c")) === Seq("a", "c", "b", "d"))
  }

  test("scalacheck: native Catalyst expression agrees with the Scala scan") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, expr}
    val elems = Gen.oneOf("a", "b", "c", "d", "e")
    val caseGen = Gen.zip(Gen.listOf(elems), Gen.listOf(Gen.zip(elems, elems)))
    val cases = Gen.listOfN(60, caseGen).sample.get
    val df = cases.zipWithIndex.map { case ((walk, hops), i) =>
      (i, walk, hops.map(_._1), hops.map(_._2))
    }.toDF("i", "walk", "from", "to")
    val hopsCol = expr("zip_with(from, to, (f, t) -> named_struct('fromNodeId', f, 'toNodeId', t))")
    val out = df.select(col("i"),
        graft.functions.HopSubtractExpr.hopSubtract(col("walk"), hopsCol).as("native"))
      .collect().map(r => r.getInt(0) -> r.getSeq[String](1)).toMap
    cases.zipWithIndex.foreach { case ((walk, hops), i) =>
      val expected = HopSubtract.subtract(walk, hops.map(_._1), hops.map(_._2))
      assert(out(i) === expected, s"case $i walk=$walk hops=$hops")
    }
  }

  test("scalacheck: output is a subsequence of the walk; empty hops = identity") {
    val elems = Gen.oneOf("a", "b", "c", "d", "e", "f")
    val walkGen = Gen.listOf(elems)
    val hopsGen = Gen.listOf(Gen.zip(elems, elems))
    val prop = forAll(walkGen, hopsGen) { (walk, hops) =>
      val out = HopSubtract.subtract(walk, hops.map(_._1), hops.map(_._2))
      // subsequence check
      val it = walk.iterator
      out.forall(o => it.contains(o)) &&
        HopSubtract.subtract(walk, Nil, Nil) == walk
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }
}
