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

  private def runConverged(edges: Seq[(String, String)], sources: Seq[String],
      maxK: Int, every: Int = 4) =
    Graph.kHopLevelsConverged(
        edges.toDF("a", "b"),
        sources.toDF("src"), maxK, checkpointEvery = every)
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet

  // chain n0->n1->...->n19 ⊕ disjoint 6-clique c0..c5 (VERDICT r10 #3)
  private val chainCliqueEdges: Seq[(String, String)] = {
    val chain = (0 until 19).map(i => (s"n$i", s"n${i + 1}"))
    val clique = for {
      i <- 0 until 6; j <- 0 until 6 if i != j
    } yield (s"c$i", s"c$j")
    chain ++ clique
  }

  /** Naive driver-side BFS — the independent model for large-k cases.
    * (Comparing against the UNROLLED kHopLevels at k=16 is exactly what
    * the converged variant exists to avoid: the 16-deep self-joined plan
    * sends the analyzer's relation-dedup into minutes of rewrite work.) */
  private def naiveBfs(edges: Seq[(String, String)], sources: Seq[String],
      k: Int): Set[(String, String, Int)] = {
    val adj = edges.groupBy(_._1).map { case (u, v) => (u, v.map(_._2)) }
    sources.flatMap { s =>
      var levels = Map(s -> 0)
      var frontier = Set(s)
      var h = 1
      while (h <= k && frontier.nonEmpty) {
        frontier = frontier.flatMap(u => adj.getOrElse(u, Nil))
          .filterNot(levels.contains)
        levels ++= frontier.map(_ -> h)
        h += 1
      }
      levels.map { case (node, hop) => (s, node, hop) }
    }.toSet
  }

  test("converged BFS at k=16 on chain ⊕ clique matches naive BFS levels") {
    val sources = Seq("n0", "c0")
    assert(runConverged(chainCliqueEdges, sources, 16) ===
      naiveBfs(chainCliqueEdges, sources, 16))
  }

  test("converged BFS early-stops on frontier exhaustion at huge maxK") {
    // chain depth 19, clique depth 1: with maxK=1000 the loop must stop
    // at level 20 (empty frontier), not run 1000 joins — the test
    // completing in seconds IS the early-stop evidence, and the result
    // must be the full reachability closure
    val expected =
      (0 to 19).map(i => ("n0", s"n$i", i)).toSet ++
        Set(("c0", "c0", 0)) ++ (1 to 5).map(i => ("c0", s"c$i", 1)).toSet
    assert(runConverged(chainCliqueEdges, Seq("n0", "c0"), 1000) === expected)
  }

  test("converged BFS plan depth stays bounded by the checkpoint interval") {
    import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
    def depth(p: LogicalPlan): Int =
      if (p.children.isEmpty) 1 else 1 + p.children.map(depth).max
    def planDepthAt(maxK: Int): Int = {
      val out = Graph.kHopLevelsConverged(
        chainCliqueEdges.toDF("a", "b"),
        Seq("n0").toDF("src"), maxK, checkpointEvery = 4)
      depth(out.queryExecution.optimizedPlan)
    }
    val d8 = planDepthAt(8)
    val d19 = planDepthAt(1000) // converges at depth 19
    // 11 more BFS levels must not add ~11 joins of depth to the plan:
    // every 4th level re-roots `visited` onto a flat LogicalRDD
    assert(d19 <= d8 + 4,
      s"plan depth grew with graph diameter: k=8 -> $d8, k=19 -> $d19")
  }

  test("releasable converged BFS frees every checkpoint block on release()") {
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val (levels, release) = Graph.kHopLevelsConvergedReleasable(
      chainCliqueEdges.toDF("a", "b"), Seq("n0", "c0").toDF("src"), 1000)
    val n = levels.count()
    assert(n === 26) // 20 chain + 6 clique
    assert((spark.sparkContext.getPersistentRDDs.keySet -- before).nonEmpty,
      "the loop should have checkpointed at least one frame")
    release()
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty, s"release() left blocks cached: $leaked")
  }

  test("randomized parity between converged and unrolled BFS at small k") {
    val rnd = new scala.util.Random(23)
    val edges = Seq.fill(150)((s"m${rnd.nextInt(35)}", s"m${rnd.nextInt(35)}"))
      .filter(e => e._1 != e._2).distinct
    val sources = Seq("m0", "m5", "m11")
    val unrolled = run(edges, sources, 3) // graph_khop's k
    assert(runConverged(edges, sources, 3, every = 2) === unrolled)
    assert(naiveBfs(edges, sources, 3) === unrolled)
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

  // ---- msBfsLevelCounts (r15): the bitmask MS-BFS count contract ----

  private def maskCounts(edges: Seq[(String, String)], sources: Seq[String],
      maxK: Int, cap: Int = 4096): Option[Set[(String, Int, Long)]] =
    Graph.msBfsLevelCounts(edges.toDF("a", "b"), sources.toDF("src"), maxK, cap)
      .map(_.collect().map(r =>
        (r.getString(0), r.getInt(1), r.getLong(2))).toSet)

  private def pairCounts(edges: Seq[(String, String)], sources: Seq[String],
      maxK: Int): Set[(String, Int, Long)] =
    naiveBfs(edges, sources, maxK).groupBy(p => (p._1, p._3))
      .map { case ((s, h), g) => (s, h, g.size.toLong) }.toSet

  test("mask MS-BFS counts match naive BFS on chain ⊕ clique") {
    val sources = Seq("n0", "c0")
    assert(maskCounts(chainCliqueEdges, sources, 32) ===
      Some(pairCounts(chainCliqueEdges, sources, 32)))
  }

  test("mask MS-BFS counts match naive BFS on random graphs incl. >64 sources") {
    val rnd = new scala.util.Random(41)
    // 70 sources forces a 2-word mask — the word-boundary arithmetic is
    // where a broken layout silently merges or drops sources
    val n = 90
    val edges = Seq.fill(400)((s"v${rnd.nextInt(n)}", s"v${rnd.nextInt(n)}"))
      .filter(e => e._1 != e._2).distinct
    val sources = (0 until 70).map(i => s"v$i")
    assert(maskCounts(edges, sources, 32) ===
      Some(pairCounts(edges, sources, 32)))
  }

  test("mask MS-BFS gates: zero sources and over-cap return None; maxK truncates") {
    assert(maskCounts(chainCliqueEdges, Nil, 32) === None)
    assert(maskCounts(chainCliqueEdges, Seq("n0", "c0"), 32, cap = 1) === None)
    // maxK truncation must match the pair semantics (no hops past maxK)
    assert(maskCounts(chainCliqueEdges, Seq("n0"), 3) ===
      Some(pairCounts(chainCliqueEdges, Seq("n0"), 3)))
  }

  test("mask MS-BFS 2-level chunks: odd maxK and every mid-chunk convergence parity (r16)") {
    // directed chains of diameter 3..6 sweep convergence across both chunk
    // positions (diameter even → last new bits land in the chunk's SECOND
    // level fb; odd → in fa with fb empty), and maxK 1..7 sweeps the
    // odd-maxK trailing single level and both truncation parities — the
    // exact boundaries the chunked loop could get wrong
    for (len <- 3 to 6; maxK <- 1 to 7) {
      val chain = (0 until len).map(i => (s"p$i", s"p${i + 1}"))
      assert(maskCounts(chain, Seq("p0", "p1"), maxK) ===
        Some(pairCounts(chain, Seq("p0", "p1"), maxK)),
        s"chain len=$len maxK=$maxK")
    }
  }

  private def driverCounts(edges: Seq[(String, String)], sources: Seq[String],
      maxK: Int, cap: Long = 1000000L): Option[Set[(String, Int, Long)]] =
    Graph.driverBfsLevelCounts(edges.toDF("a", "b"), sources.toDF("src"), maxK, cap)
      .map(_.collect().map(r =>
        (r.getString(0), r.getInt(1), r.getLong(2))).toSet)

  test("driver BFS tier: parity with naive BFS, edge cap gates to None (r16)") {
    assert(driverCounts(chainCliqueEdges, Seq("n0", "c0"), 32) ===
      Some(pairCounts(chainCliqueEdges, Seq("n0", "c0"), 32)))
    // maxK truncation + odd bounds
    for (maxK <- Seq(1, 2, 3, 7))
      assert(driverCounts(chainCliqueEdges, Seq("n0"), maxK) ===
        Some(pairCounts(chainCliqueEdges, Seq("n0"), maxK)), s"maxK=$maxK")
    // above the cap the driver tier must refuse (the distributed paths own it)
    assert(driverCounts(chainCliqueEdges, Seq("n0"), 32, cap = 3L) === None)
    // random-graph parity, the msBfs test's graph through the driver tier
    val rnd = new scala.util.Random(41)
    val n = 90
    val edges = Seq.fill(400)((s"v${rnd.nextInt(n)}", s"v${rnd.nextInt(n)}"))
      .filter(e => e._1 != e._2).distinct
    val sources = (0 until 70).map(i => s"v$i")
    assert(driverCounts(edges, sources, 32) ===
      Some(pairCounts(edges, sources, 32)))
  }

  test("mask MS-BFS releases every checkpoint block before returning") {
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val got = maskCounts(chainCliqueEdges, Seq("n0", "c0"), 1000)
    assert(got.isDefined && got.get.nonEmpty)
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty, s"msBfsLevelCounts left blocks cached: $leaked")
  }
}
