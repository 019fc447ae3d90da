package graft.ops

import graft.SparkTestBase

/** [[Graph.kHopLevels]]: BFS levels on a hand graph (shortest hop wins
  * when multiple paths exist, k truncates, disconnected nodes absent,
  * multi-source frontiers don't interfere) and randomized parity with a
  * naive driver-side BFS. */
class GraphSpec extends SparkTestBase {
  import spark.implicits._

  private def run(edges: Seq[(String, String)], sources: Seq[String], k: Int) =
    Graph.kHopLevels(
        edges.toDF("a", "b"),
        sources.toDF("src"), k)
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet

  test("levels, shortest-path tie, k truncation, isolation") {
    // a->b->c->d->e chain plus shortcut a->c: c is level 1? no — edges
    // are directed; shortcut means c reached at hop 1, d at 2, e at 3
    val edges = Seq("a" -> "b", "b" -> "c", "c" -> "d", "d" -> "e", "a" -> "c",
      "x" -> "y")
    val got = run(edges, Seq("a"), 3)
    assert(got === Set(("a", "a", 0), ("a", "b", 1), ("a", "c", 1),
      ("a", "d", 2), ("a", "e", 3)))
    // k=2 truncates e; multi-source: x explores its own component only
    val got2 = run(edges, Seq("a", "x"), 2)
    assert(got2 === Set(("a", "a", 0), ("a", "b", 1), ("a", "c", 1),
      ("a", "d", 2), ("x", "x", 0), ("x", "y", 1)))
  }

  test("cycles terminate: visited anti-join stops re-expansion") {
    val edges = Seq("a" -> "b", "b" -> "a", "b" -> "c", "c" -> "a")
    assert(run(edges, Seq("a"), 4) ===
      Set(("a", "a", 0), ("a", "b", 1), ("a", "c", 2)))
  }

  test("randomized parity with naive driver-side BFS") {
    val rnd = new scala.util.Random(19)
    val n = 40
    val edges = Seq.fill(120)((s"n${rnd.nextInt(n)}", s"n${rnd.nextInt(n)}"))
      .filter(e => e._1 != e._2).distinct
    val adj = edges.groupBy(_._1).map { case (k, v) => (k, v.map(_._2)) }
    val sources = Seq("n0", "n7", "n13")
    val k = 3
    val expected = sources.flatMap { s =>
      var levels = Map(s -> 0)
      var frontier = Set(s)
      for (h <- 1 to k) {
        frontier = frontier.flatMap(u => adj.getOrElse(u, Nil))
          .filterNot(levels.contains)
        levels ++= frontier.map(_ -> h)
      }
      levels.map { case (node, hop) => (s, node, hop) }
    }.toSet
    assert(run(edges, sources, k) === expected)
  }
}
