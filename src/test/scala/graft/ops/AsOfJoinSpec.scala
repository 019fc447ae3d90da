package graft.ops

import graft.SparkTestBase
import org.scalacheck.Gen

class AsOfJoinSpec extends SparkTestBase {

  private def leftDf(rows: Seq[(String, Long, String)]) = {
    import spark.implicits._
    rows.toDF("k", "ord", "lpay")
  }
  private def rightDf(rows: Seq[(String, Long, Double)]) = {
    import spark.implicits._
    rows.toDF("k", "rord", "rval")
  }

  test("attaches the latest right row at or before each left ordinate") {
    val l = leftDf(Seq(("a", 5L, "x"), ("a", 10L, "y"), ("b", 1L, "z")))
    val r = rightDf(Seq(("a", 5L, 1.0), ("a", 7L, 2.0), ("a", 11L, 3.0), ("b", 9L, 4.0)))
    val out = AsOfJoin.asofBackward(l, r, Seq("k"), "ord", "rord")
      .orderBy("k", "ord")
      .collect()
      .map(x => (x.getString(0), x.getLong(1), x.getString(2),
        Option(x.get(3)).map(_.asInstanceOf[Long]), Option(x.get(4)).map(_.asInstanceOf[Double])))
    // ord=5 matches rord=5 (inclusive); ord=10 matches rord=7 (11 is
    // after); b@1 has no right row yet -> nulls
    assert(out.toSeq === Seq(
      ("a", 5L, "x", Some(5L), Some(1.0)),
      ("a", 10L, "y", Some(7L), Some(2.0)),
      ("b", 1L, "z", None, None)))
  }

  test("empty right side yields all-null payloads, keeps every left row") {
    val l = leftDf(Seq(("a", 5L, "x"), ("b", 6L, "y")))
    val r = rightDf(Nil)
    val out = AsOfJoin.asofBackward(l, r, Seq("k"), "ord", "rord").collect()
    assert(out.length === 2)
    assert(out.forall(row => row.isNullAt(3) && row.isNullAt(4)))
  }

  test("right ties on (key, ord) resolve deterministically (greatest payload hash)") {
    import org.apache.spark.sql.functions._
    val l = leftDf(Seq(("a", 5L, "x")))
    val r = rightDf(Seq(("a", 5L, 1.0), ("a", 5L, 9.0), ("a", 5L, 3.0)))
    // the documented rule: greatest xxhash64 of the payload struct wins
    val expected = r.select(struct(col("rord"), col("rval")).as("p"))
      .withColumn("h", xxhash64(col("p")))
      .orderBy(col("h").desc).limit(1)
      .select(col("p").getField("rval")).collect().head.getDouble(0)
    val out = AsOfJoin.asofBackward(l, r, Seq("k"), "ord", "rord").collect()
    assert(out.head.getDouble(4) === expected)
    // stable under a different physical layout of the right side
    val out2 = AsOfJoin.asofBackward(l, r.repartition(7), Seq("k"), "ord", "rord").collect()
    assert(out2.head.getDouble(4) === expected)
  }

  test("map-typed payloads skip the struct tie-break instead of failing analysis") {
    import spark.implicits._
    val l = leftDf(Seq(("a", 5L, "x")))
    val r = Seq(("a", 3L, Map("m" -> "v")))
      .toDF("k", "rord", "attrs")
    val out = AsOfJoin.asofBackward(l, r, Seq("k"), "ord", "rord").collect()
    assert(out.head.getLong(3) === 3L)
    assert(out.head.getMap[String, String](4).get("m").contains("v"))
  }

  test("scalacheck parity with the naive per-row max lookup (40 random cases)") {
    // cases are folded into the key space ("<case>:<key>") so ONE operator
    // run covers all of them; the naive model runs per case
    val keyGen = Gen.oneOf("a", "b", "c")
    val caseGen = Gen.zip(
      Gen.listOfN(20, Gen.zip(keyGen, Gen.choose(0L, 40L))),
      Gen.listOfN(20, Gen.zip(keyGen, Gen.choose(0L, 40L))))
    val cases = Gen.listOfN(40, caseGen).sample.get
    val ls = cases.zipWithIndex.flatMap { case ((l, _), ci) =>
      l.zipWithIndex.map { case ((k, o), i) => (s"$ci:$k", o, s"l$ci-$i") } }
    // unique right ordinates per (case, key) — the documented determinism
    // precondition — via distinct on (key, ord) before payload assignment
    val rs = cases.zipWithIndex.flatMap { case ((_, r), ci) =>
      r.map { case (k, o) => (s"$ci:$k", o) }.distinct
        .zipWithIndex.map { case ((k, o), i) => (k, o, ci * 1000 + i.toDouble) } }
    val got = AsOfJoin.asofBackward(leftDf(ls), rightDf(rs), Seq("k"), "ord", "rord")
      .collect()
      .map(x => (x.getString(0), x.getLong(1), x.getString(2),
        if (x.isNullAt(3)) None else Some((x.getLong(3), x.getDouble(4)))))
    val byKey = rs.groupBy(_._1)
    val expected = ls.map { case (k, o, p) =>
      val m = byKey.getOrElse(k, Nil).filter(_._2 <= o)
      (k, o, p, if (m.isEmpty) None else Some(m.maxBy(_._2)).map(r => (r._2, r._3)))
    }
    // left payloads are unique -> multisets compare as sets
    assert(got.toSet === expected.toSet)
    assert(got.length === ls.length)
  }
}
