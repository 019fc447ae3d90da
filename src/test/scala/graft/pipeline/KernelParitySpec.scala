package graft.pipeline

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalacheck.Gen

/** Pins the r7 primitive kernels to their readable expression forms.
  *
  * [[Dedup.jaccardSorted]] (sorted-merge walk over doc-level hashed sets)
  * and [[Dedup.simhash]] (JIT'd sign-vote loop) replaced all-expression
  * formulations for performance (see their scaladocs). These properties
  * assert value equality against the expression forms on generated
  * shingle arrays — the kernels' speed must never cost correctness. */
class KernelParitySpec extends SparkTestBase {

  import spark.implicits._

  private val shingleGen: Gen[List[String]] = Gen.choose(0, 40).flatMap { n =>
    Gen.listOfN(n, Gen.oneOf(
      Gen.alphaNumStr.map(_.take(8)),
      Gen.oneOf("a b", "b c", "c d", "ø12 x", "漢字 漢", "", " ")))
  }

  test("jaccardSorted over sortedHashSet equals expression-form set jaccard") {
    val cases = Gen.listOfN(80, Gen.zip(shingleGen, shingleGen)).sample.get
    val df = cases.zipWithIndex.map { case ((a, b), i) => (i, a, b) }
      .toDF("i", "a", "b")
      .select(col("i"),
        Dedup.jaccardSorted(Dedup.sortedHashSet(col("a")),
          Dedup.sortedHashSet(col("b"))).as("fast"),
        Dedup.jaccard(col("a"), col("b")).as("slow"))
    df.collect().foreach { r =>
      assert(math.abs(r.getDouble(1) - r.getDouble(2)) < 1e-12,
        s"jaccard mismatch on case ${r.getInt(0)} (${cases(r.getInt(0))}): " +
          s"fast=${r.getDouble(1)} slow=${r.getDouble(2)}")
    }
  }

  test("simhash kernel equals the per-bit expression formulation") {
    // the readable (and formerly shipped) form: 64 aggregate() sign-votes
    def expressionSimhash(shingleArr: org.apache.spark.sql.Column) = {
      val hashes = transform(shingleArr, s => xxhash64(lit(7919), s))
      val bitCols = (0 until 64).map { i =>
        val votes = aggregate(hashes, lit(0),
          (acc, v) => acc + when(shiftright(v, i).bitwiseAND(1) === 1, 1).otherwise(-1))
        when(votes > 0, shiftleft(lit(1L), i)).otherwise(lit(0L))
      }
      bitCols.reduce((x, y) => x.bitwiseOR(y))
    }
    val cases = Gen.listOfN(40, shingleGen).sample.get
    val df = cases.zipWithIndex.map { case (a, i) => (i, a) }.toDF("i", "a")
      .select(col("i"), Dedup.simhash(col("a")).as("fast"),
        expressionSimhash(col("a")).as("slow"))
    df.collect().foreach { r =>
      assert(r.getLong(1) === r.getLong(2),
        s"simhash mismatch on case ${r.getInt(0)} (${cases(r.getInt(0))}): " +
          s"fast=${r.getLong(1)} slow=${r.getLong(2)}")
    }
  }
}
