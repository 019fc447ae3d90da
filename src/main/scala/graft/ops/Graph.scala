package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative frontier BFS over an edge list — the distributed graph
  * traversal primitive (multi-source k-hop reachability with shortest-hop
  * levels). The reference engine walks its span/node network imperatively
  * one trace at a time (`Projects/.../ProjektorState.cs` hop scans); the
  * Spark-native form is level-synchronous BFS: each hop is ONE shuffle
  * join of the current frontier against the edge list, so a 1000-executor
  * cluster advances every source's frontier in the same three jobs.
  *
  * Scale shape:
  *   - per level: `frontier ⋈ edges` shuffles on the node key only — the
  *     edge list is never replicated per source; all sources share the
  *     same join;
  *   - the frontier is deduped per level ((src, node) distinct) and
  *     anti-joined against the visited set, so its size is bounded by
  *     |sources| × |V| regardless of path multiplicity — without the
  *     anti-join a dense graph re-expands already-settled nodes
  *     exponentially in k;
  *   - levels are BFS-minimal by construction (a node enters `visited`
  *     the first level it is reachable), which is what the recursive-CTE
  *     oracle's `min(hop)` computes over all walks;
  *   - `k` is a fixed small constant here so the unrolled plan stays
  *     shallow; a large-k production variant would `localCheckpoint` the
  *     frontier every few levels to cut lineage, exactly like iterative
  *     MLlib/GraphFrames loops.
  */
object Graph {

  /** Multi-source k-hop BFS levels.
    *
    * @param edges   directed edge list with columns (a, b); pass both
    *                directions for undirected reachability
    * @param sources one column `src` of start nodes (same id domain as a/b)
    * @return (src, node, hop) — every node reachable from `src` in ≤ k
    *         hops, with `hop` = its BFS level (shortest hop distance)
    */
  def kHopLevels(edges: DataFrame, sources: DataFrame, k: Int): DataFrame = {
    val e = edges.select(col("a"), col("b"))
    var visited = sources.select(col("src"), col("src").as("node"),
      lit(0).as("hop"))
    var frontier = visited.select("src", "node")
    for (h <- 1 to k) {
      // explicit aliases: from level 2 on, frontier and the edge list
      // share scan lineage and bare column refs trip the ambiguous-
      // self-join check
      val next = frontier.alias("f")
        .join(e.alias("ed"), col("f.node") === col("ed.a"))
        .select(col("f.src"), col("ed.b").as("node"))
        .distinct()
        .join(visited.select("src", "node"), Seq("src", "node"), "left_anti")
      visited = visited.unionByName(next.withColumn("hop", lit(h)))
      frontier = next
    }
    visited
  }
}
