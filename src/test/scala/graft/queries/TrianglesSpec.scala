package graft.queries

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** [[Graphs.triangleCounts]]: the degree-oriented enumeration must
  * count EXACTLY what the naive per-node triangle definition counts on
  * random graphs — including dense ones where degree ties are the rule,
  * since a broken (degree, id) total order double-counts a triangle
  * whose corners tie, and a wrong closing-edge direction zero-counts
  * it. The driver oracle pins the fixed corpus; this spec pins the
  * algorithm across graph shapes the corpus doesn't contain. */
class TrianglesSpec extends SparkTestBase {
  import spark.implicits._

  private def naive(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val adj = edges.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toSet }
    val es = edges.toSet
    val nodes = adj.keys.toSeq.sorted
    val counts = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    for {
      (a, b) <- es
      c <- adj(a) if c > b && es.contains((b, c))
    } {
      counts(a) += 1; counts(b) += 1; counts(c) += 1
    }
    counts.toMap
  }

  private def run(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Graphs.triangleCounts(edges.toDF("u", "v"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("random sparse graphs: oriented counts equal the naive enumeration") {
    val rnd = new scala.util.Random(17)
    for (trial <- 1 to 5) {
      val n = 20 + trial * 10
      val edges = (for {
        a <- 0L until n
        b <- (a + 1) until n
        if rnd.nextInt(10) < 2
      } yield (a, b)).toSeq
      assert(run(edges) === naive(edges), s"trial $trial (n=$n)")
    }
  }

  test("dense graph with maximal degree ties (complete K8): C(7,2) per node") {
    val edges = for { a <- 0L until 8L; b <- (a + 1) until 8L } yield (a, b)
    val got = run(edges.toSeq)
    // every node of K8 sits in C(7,2) = 21 triangles; ALL degrees tie,
    // so only the id tiebreak orders the orientation
    assert(got === (0L until 8L).map(_ -> 21L).toMap)
  }

  test("above the degree-broadcast gate the shuffled fallback counts identically (VERDICT r14 #8)") {
    val rnd = new scala.util.Random(23)
    val edges = (for {
      a <- 0L until 40L
      b <- (a + 1) until 40L
      if rnd.nextInt(10) < 3
    } yield (a, b)).toSeq
    // cap 0 forces every degree attachment through the shuffled path
    val shuffled = Graphs.triangleCounts(edges.toDF("u", "v"), maxBroadcastNodes = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(shuffled === naive(edges))
    assert(shuffled === run(edges))
  }

  test("triangle-free and star graphs count zero") {
    // 6-cycle: no triangles
    val cycle = (0L until 6L).map(i => (math.min(i, (i + 1) % 6), math.max(i, (i + 1) % 6)))
      .distinct
    assert(run(cycle) === Map.empty)
    // star: hub with 10 leaves — the hub's high degree must not fabricate wedge closures
    val star = (1L to 10L).map(i => (0L, i))
    assert(run(star) === Map.empty)
  }
}
