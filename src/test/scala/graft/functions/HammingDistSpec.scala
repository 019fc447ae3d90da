package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalacheck.Gen

/** Edge-case pins + model parity for the native Hamming-distance
  * expression (the binary-ANN kernel): zero-padding on ragged word
  * arrays (NOT the dot/jaccard min-length convention — extra set bits
  * must count), null arrays, and a ScalaCheck parity sweep against
  * java.lang.Long.bitCount. The DataFrame path exercises doGenCode
  * (test sessions run whole-stage codegen); the oracle suite pins the
  * end-to-end semantics against DuckDB.
  */
class HammingDistSpec extends SparkTestBase {
  import spark.implicits._

  private def hd(a: Seq[Long], b: Seq[Long]): java.lang.Long = {
    val df = Seq((a, b)).toDF("a", "b")
      .select(HammingDistExpr.hammingDist(col("a"), col("b")).as("d"))
    val r = df.head()
    if (r.isNullAt(0)) null else Long.box(r.getLong(0))
  }

  test("xor popcount over equal-length words") {
    assert(hd(Seq(0L), Seq(0L)) === 0L)
    assert(hd(Seq(-1L), Seq(0L)) === 64L)
    assert(hd(Seq(5L), Seq(3L)) === 2L) // 101 ^ 011 = 110
    assert(hd(Seq(1L, -1L), Seq(0L, 0L)) === 65L)
  }

  test("ragged inputs zero-pad the shorter side (extra set bits count)") {
    assert(hd(Seq(0L, -1L), Seq(0L)) === 64L)
    assert(hd(Seq(7L), Seq(7L, 1L, 2L)) === 2L)
    assert(hd(Seq.empty, Seq(15L)) === 4L)
    assert(hd(Seq.empty, Seq.empty) === 0L)
  }

  test("null array input yields null (binary null-safe contract)") {
    val df = Seq((Some(Seq(1L)), Option.empty[Seq[Long]])).toDF("a", "b")
      .select(HammingDistExpr.hammingDist(col("a"), col("b")).as("d"))
    assert(df.head().isNullAt(0))
  }

  test("parity with the bitCount model on random word arrays (one batched job)") {
    val words = Gen.containerOf[Seq, Long](Gen.chooseNum(Long.MinValue, Long.MaxValue))
    val cases = Gen.listOfN(120, Gen.zip(words, words)).sample.get
    val got = cases.zipWithIndex.map { case ((a, b), i) => (i, a, b) }
      .toDF("i", "a", "b")
      .select(col("i"), HammingDistExpr.hammingDist(col("a"), col("b")).as("d"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    cases.zipWithIndex.foreach { case ((a, b), i) =>
      val n = math.max(a.length, b.length)
      val expect = (0 until n).map { j =>
        java.lang.Long.bitCount(
          a.applyOrElse(j, (_: Int) => 0L) ^ b.applyOrElse(j, (_: Int) => 0L)).toLong
      }.sum
      assert(got(i) === expect, s"case $i: a=$a b=$b")
    }
  }
}
