package graft.queries

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** [[Pipeline.semDedupK]] / [[Pipeline.semDedupKept]]: the adaptive-k
  * regime above the oracle gate (VERDICT r13 #2). The k = 8 bench
  * contract is oracle-checked by the driver; THIS spec proves the part
  * the oracle can't see — that on a corpus where a pinned k = 8 would
  * do O(n²/8) pair work, the derived k keeps the cluster-bounded pair
  * join at O(n·C), and the kept set still equals a naive per-cluster
  * min-id dominance over the operator's own assignments. */
class SemDedupSpec extends SparkTestBase {
  import spark.implicits._

  test("semDedupK derivation: pinned floor, n/C growth, flat-k cap") {
    assert(Pipeline.semDedupK(1L) === 8)
    assert(Pipeline.semDedupK(8L * 4096L) === 8)
    assert(Pipeline.semDedupK(8L * 4096L + 1L) === 9)
    assert(Pipeline.semDedupK(100L * 4096L) === 100)
    assert(Pipeline.semDedupK(Long.MaxValue / 4L) === (1 << 16))
    assert(Pipeline.semDedupK(1024L, targetClusterSize = 64L) === 16)
  }

  // 4096 vectors in 64 tight, well-separated 4-D blobs; ids interleave
  // blobs (id % 64) so neither id order nor the hash-sample seeding is
  // correlated with geometry. Deterministic fixture, deterministic
  // algorithm → exact assertions, no flake.
  private val n = 4096
  private val targetC = 64L
  private lazy val points: Seq[(Long, Seq[Float])] = {
    val rnd = new scala.util.Random(7)
    (0 until n).map { i =>
      val blob = i % 64
      // centers on an 8×8 grid spaced 0.4 apart (small enough that the
      // quantized self-dot stays under checkedNormQ's 290M overflow
      // guard), noise σ≈0.005
      val cx = (blob % 8) * 0.4 - 1.4
      val cy = (blob / 8) * 0.4 - 1.4
      (i.toLong, Seq(
        (cx + rnd.nextGaussian() * 0.005).toFloat,
        (cy + rnd.nextGaussian() * 0.005).toFloat,
        (cx * 0.5 + rnd.nextGaussian() * 0.005).toFloat,
        (cy * 0.5 + rnd.nextGaussian() * 0.005).toFloat))
    }
  }

  test("adaptive k bounds pair work at O(n·C) where k=8 would explode, kept set exact") {
    val df = points.toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))
    val k = Pipeline.semDedupK(n.toLong, targetClusterSize = targetC)
    assert(k === 64, "fixture must land in the adaptive regime")

    val got = Pipeline.semDedupKept(df, "vec_id", "embedding", k, seeding = "hashids")
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getInt(2)))).toMap
    assert(got.size === n)

    // pair-work bound: Σ C(sz, 2) over the operator's own clusters must
    // stay O(n·C), far below the pinned-k=8 mass C(n,2)/8-ish
    val sizes = got.values.groupBy(_._1).map(_._2.size.toLong)
    val pairMass = sizes.map(s => s * (s - 1) / 2).sum
    val pinnedK8Mass = n.toLong * (n.toLong - 1) / 2 / 8
    assert(pairMass <= n.toLong * targetC,
      s"pair mass $pairMass exceeds n*C = ${n * targetC}")
    assert(pairMass * 4 < pinnedK8Mass,
      s"pair mass $pairMass not meaningfully below the k=8 mass $pinnedK8Mass")

    // kept-set exactness: naive min-id dominance per cluster over the
    // same quantized vectors and the operator's own assignments
    val q = points.map { case (id, v) =>
      id -> v.map(x => math.floor(x.toDouble * 1000.0).toLong).toArray
    }.toMap
    def dot(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => x * y }.sum
    val byCluster = got.toSeq.groupBy(_._2._1)
    byCluster.foreach { case (_, members) =>
      val ids = members.map(_._1).sorted
      ids.foreach { b =>
        val nb = dot(q(b), q(b))
        val dup = ids.exists { a =>
          a < b && {
            val d = dot(q(a), q(b))
            d > 0 && d * d * 100L >= dot(q(a), q(a)) * nb * 64L
          }
        }
        assert(got(b)._2 === (if (dup) 0 else 1),
          s"kept flag mismatch for vec $b")
      }
    }
    // and the fixture actually dedups: tight blobs make same-cluster
    // neighbors pass the cosine ≥ 0.8 gate
    assert(got.values.count(_._2 == 0) > n / 2,
      "fixture should mark most blob members as near-duplicates")
  }
}
