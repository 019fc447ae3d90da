package graft.pipeline

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Pins [[Vectors.binaryCodes]] and [[Vectors.hammingTopK]] against a
  * naive driver model: sign-threshold bits (q_d·n > Σ_d over the
  * floor(x·1000) quantization), word packing, and the (hamming ASC,
  * neighbor ASC) ranking — plus the fail-fast contracts (empty table,
  * ragged vectors) and the >64-dim multi-word path the 64-dim corpus
  * never exercises. */
class BinaryCodesSpec extends SparkTestBase {

  import spark.implicits._

  private def model(vecs: Map[Long, Seq[Float]]): Map[Long, Seq[Long]] = {
    val dims = vecs.head._2.length
    val n = vecs.size.toLong
    val q = vecs.map { case (id, v) =>
      id -> v.map(x => math.floor(x.toDouble * 1000.0).toLong)
    }
    val sums = (0 until dims).map(d => q.valuesIterator.map(_(d)).sum)
    q.map { case (id, v) =>
      val words = new Array[Long]((dims + 63) / 64)
      (0 until dims).foreach { d =>
        if (v(d) * n > sums(d)) words(d >> 6) |= 1L << (d & 63)
      }
      id -> words.toSeq
    }
  }

  private def df(vecs: Map[Long, Seq[Float]]) =
    vecs.toSeq.toDF("vec_id", "embedding")

  test("codes match the sign-threshold model, including a 70-dim two-word corpus") {
    for (dims <- Seq(3, 64, 70)) {
      val vecs = (0L until 9L).map { i =>
        i -> Seq.tabulate(dims)(d =>
          (math.sin(i * 31 + d * 7) * 2.0).toFloat)
      }.toMap
      val got = Vectors.binaryCodes(df(vecs))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap
      assert(got === model(vecs), s"dims=$dims")
      assert(got.head._2.length === (dims + 63) / 64)
    }
  }

  test("a dimension exactly at its mean reads 0 (strictly-greater contract)") {
    // all rows identical in dim 0 → q·n == Σ for every row → bit 0 clear
    val vecs = Map(0L -> Seq(0.5f, 1.0f), 1L -> Seq(0.5f, -1.0f))
    val got = Vectors.binaryCodes(df(vecs))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).head).toMap
    assert(got(0L) === 2L) // only dim 1's above-mean bit
    assert(got(1L) === 0L)
  }

  test("hammingTopK ranks (hamming ASC, neighbor ASC) per the model") {
    val vecs = (0L until 12L).map { i =>
      i -> Seq.tabulate(64)(d => (math.cos(i * 17 + d * 3) * 1.5).toFloat)
    }.toMap
    val codes = model(vecs)
    val expect = vecs.keys.filter(_ % 4 == 0).toSeq.sorted.flatMap { qid =>
      val ranked = vecs.keys.filter(_ != qid).toSeq
        .map { c =>
          val h = codes(qid).zip(codes(c))
            .map { case (x, y) => java.lang.Long.bitCount(x ^ y).toLong }.sum
          (h, c)
        }.sorted.take(3)
      ranked.zipWithIndex.map { case ((h, c), r) => (qid, c, h, r + 1) }
    }
    val got = Vectors.hammingTopK(Vectors.binaryCodes(df(vecs)), q => q % 4 === 0, 3)
      .orderBy(col("query_id"), col("rank"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    assert(got.toSeq === expect)
  }

  test("empty table and ragged vectors fail fast") {
    val empty = Seq.empty[(Long, Seq[Float])].toDF("vec_id", "embedding")
    val e1 = intercept[IllegalArgumentException](Vectors.binaryCodes(empty))
    assert(e1.getMessage.contains("empty"))
    val ragged = Seq((0L, Seq(1.0f, 2.0f)), (1L, Seq(1.0f)))
      .toDF("vec_id", "embedding")
    val e2 = intercept[Exception](Vectors.binaryCodes(ragged).collect())
    assert(e2.getMessage.contains("ragged"))
  }
}
