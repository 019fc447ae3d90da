package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.Graph

/** Graph-traversal contract queries (driver oracle: recursive CTE).
  *
  * The graph is the sparse part↔supplier bipartite relation induced by
  * low-quantity lineitems (`l_quantity <= 3`, ~6% of lines): node ids are
  * `p<partkey>` / `s<suppkey>`, edges run both directions. Sources are
  * every 50th part. The contract pins level-synchronous BFS
  * ([[graft.ops.Graph.kHopLevels]]) against DuckDB's `WITH RECURSIVE` +
  * `min(hop)` — two independent traversal algorithms that must agree on
  * every (source, level) population count.
  */
object Graphs {

  /** Node ids are LONG-encoded for the traversal — `p<k>` → 2k,
    * `s<k>` → 2k+1 (lossless: the even/odd bit is the p/s tag). The BFS
    * shuffles, distincts and anti-joins then all run on fixed-width
    * 8-byte keys instead of variable-length UTF8 strings — measurably
    * smaller exchanges and cheaper hash/compare in every level join
    * (8.8 → 6.9 s on the closure at sf0.1). [[decodeSrc]] restores the
    * string form on the bounded rollup output only. */
  private def graph(spark: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val li = Tables.lineitem(spark, dir)
      .filter(col("l_quantity") <= 3)
      .select((col("l_partkey") * 2).as("a"), (col("l_suppkey") * 2 + 1).as("b"))
    // undirected: both directions, deduped once (one shuffle on the pair)
    val edges = li.unionByName(li.select(col("b").as("a"), col("a").as("b")))
      .distinct()
    val sources = Tables.part(spark, dir)
      .filter(col("p_partkey") % 50 === 0)
      .select((col("p_partkey") * 2).as("src"))
    (edges, sources)
  }

  /** Long-encoded source id back to the `p<partkey>` contract string
    * (sources are parts, so the tag bit is always even; integral `div`
    * keeps the decode exact). */
  private def decodeSrc(name: String): org.apache.spark.sql.Column =
    concat(lit("p"), expr(s"$name div 2").cast("string"))

  /** graph_khop: nodes first reached at each BFS level ≤ 3, per source.
    * Stays on the unrolled single-action pair BFS: the mask MS-BFS that
    * pays off for the converged closure (reach_conv) was MEASURED SLOWER
    * here (1.55 → 2.17 s at sf0.1) — at depth 3 its per-level
    * checkpoint + emptiness probe overhead exceeds the pair volume it
    * saves. */
  def kHop(spark: SparkSession, dir: String): DataFrame = {
    val (edges, sources) = graph(spark, dir)
    // r16: the same driver-BFS tier as reach_conv (edge list within the
    // bounded 1M-row cap → one collect + in-memory BFS; above it, the
    // unrolled single-action pair BFS — the documented scale path).
    // GraphSpec pins count parity across the tiers.
    val counts = Graph.driverBfsLevelCounts(edges, sources, maxK = 3)
      .getOrElse {
        Graph.kHopLevels(edges, sources, 3)
          .groupBy(col("src"), col("hop"))
          .agg(count(lit(1)).as("n_nodes"))
      }
    counts
      .select(decodeSrc("src").as("src"), col("hop"), col("n_nodes"))
      .orderBy(col("src"), col("hop"))
  }

  /** graph_reach_conv: FULL reachability closure per source — the
    * unknown-depth traversal [[Graph.kHopLevelsConvergedReleasable]]
    * drives to convergence (empty frontier), maxK far above any real
    * diameter (this graph's is ~6; the loop stops there, not at 32). One
    * shuffle join + one emptiness probe per actual level; lineage cut
    * every 4 levels. The per-(source, level) rollup — bounded by
    * |sources| × (diameter + 1) rows — is consumed EAGERLY so every
    * checkpoint block releases before return (CacheHygieneSpec pins it);
    * like sketch_cms, the timed cost sits at DataFrame construction by
    * design. The oracle recurses the same closure with the SAME hop bound
    * (32 — ADVICE r11: a mismatched pair would silently diverge on any
    * path longer than the smaller bound), so both sides terminate at the
    * identical frontier. */
  def reachConverged(spark: SparkSession, dir: String): DataFrame = {
    val (edges, _) = graph(spark, dir)
    // every 500th part: multi-source CLOSURE work is inherently
    // |sources| × |component| — the full %50 source set spends ~10× the
    // wall-clock exercising the identical operator shape
    val sources = Tables.part(spark, dir)
      .filter(col("p_partkey") % 500 === 0)
      .select((col("p_partkey") * 2).as("src"))
    // r16: three size-gated tiers, cheapest first (the connectedComponents
    // hybrid doctrine). (1) Edge list within the 1M-row driver cap — one
    // bounded collect + in-memory BFS (the distributed loop's per-level
    // scheduling floor measured ~0.3–0.5 s PER CHUNK on KB-scale frontier
    // frames; the whole driver traversal is milliseconds). (2) Above the
    // cap but within the 4096-source mask width: bitmask MS-BFS (r15 —
    // one row per node, |sources| bits of state, ~20× less per-level join
    // volume than pairs). (3) Else the (src, node) pair loop. Identical
    // counts on every path (GraphSpec pins the parity incl. the gates).
    val rows0 = Graph.driverBfsLevelCounts(edges, sources, maxK = 32)
      .orElse(Graph.msBfsLevelCounts(edges, sources, maxK = 32)).getOrElse {
      val (levels, release) =
        Graph.kHopLevelsConvergedReleasable(edges, sources, maxK = 32)
      try {
        val rows = levels.groupBy(col("src"), col("hop"))
          .agg(count(lit(1)).as("n_nodes"))
        // bounded: |sources| × (diameter + 1)
        spark.createDataFrame(
          java.util.Arrays.asList(rows.collect(): _*), rows.schema)
      } finally release()
    }
    val rows = rows0
      .select(decodeSrc("src").as("src"), col("hop"), col("n_nodes"))
      .orderBy(col("src"), col("hop"))
    spark.createDataFrame(java.util.Arrays.asList(rows.collect(): _*), rows.schema)
  }

  /** graph_triangles: per-node triangle counts over the co-supply
    * graph — suppliers are adjacent when they supply a common
    * low-quantity part (the unipartite projection of the [[graph]]
    * relation; the bipartite graph itself is triangle-free by
    * construction). Triangle participation is the local clustering
    * signal community detection and fraud scoring start from.
    *
    * Scale shape: the standard DEGREE ORIENTATION bound — every edge
    * orients from its lexicographically-smaller (degree, id) endpoint,
    * so each triangle is enumerated exactly once from its
    * lowest-degree corner and wedge work is Σ out-deg² = O(m^{3/2})
    * instead of the naive Σ deg² that a hub node explodes (the oracle
    * runs the orientation-free a<b<c 3-join — orientation must be
    * invisible to the answer). Degrees broadcast (|suppliers| rows)
    * under [[MaxBroadcastDegreeRows]], shuffled equi-join above it;
    * the wedge join and the closing semi-join shuffle on edge keys
    * only. The per-part pair fanout is C(k, 2) over the ≤ handful of
    * suppliers sharing a part — never all-pairs over suppliers. */
  def triangles(spark: SparkSession, dir: String): DataFrame = {
    val ps = Tables.lineitem(spark, dir)
      .filter(col("l_quantity") <= 3)
      .select(col("l_partkey").as("p"), col("l_suppkey").as("s"))
      .distinct()
    val e = ps.as("x").join(ps.as("y"),
        col("x.p") === col("y.p") && col("x.s") < col("y.s"))
      .select(col("x.s").as("u"), col("y.s").as("v"))
      .distinct()
    triangleCounts(e)
  }

  /** Degree rows a pinned broadcast will accept before the orientation
    * joins fall back to shuffled equi-joins: ~16 B/row (two longs) ⇒
    * ≈ 80 MB build side at the cap — comfortably inside executor
    * memory; a node set past it is a web-scale graph whose degree
    * attachment should shuffle like any other fact join. */
  val MaxBroadcastDegreeRows = 5000000L

  /** The degree-oriented per-node triangle count over an undirected
    * edge frame (columns `u` < `v`, distinct) — factored from
    * [[triangles]] so TrianglesSpec can drive random graphs through the
    * SAME orientation path the query uses (degree TIES are where a
    * broken total order double- or zero-counts). */
  private[graft] def triangleCounts(e: DataFrame,
      maxBroadcastNodes: Long = MaxBroadcastDegreeRows): DataFrame = {
    val deg = e.select(col("u").as("n"))
      .unionByName(e.select(col("v").as("n")))
      .groupBy(col("n")).agg(count(lit(1)).as("d"))
    // Size gate on the degree broadcast (VERDICT r14 #8, the
    // DecontamStream idiom): correct at |suppliers| but a driver OOM at
    // a 10⁸-node graph. One bounded probe decides at plan-build time
    // (limit cap+1 stops the count early); above the cap the two degree
    // attachments fall back to shuffled equi-joins on the edge endpoints
    // — the documented scale path. Tests force it with 0 and assert
    // identical counts.
    val bcast = deg.select(col("n")).limit(
      math.min(maxBroadcastNodes, Int.MaxValue - 1L).toInt + 1).count() <= maxBroadcastNodes
    def sized(df: DataFrame): DataFrame = if (bcast) broadcast(df) else df
    // orient u—v from the smaller (d, n): carry the head's (d, n) so the
    // wedge join can order its two spokes without a third lookup
    val oriented = e
      .join(sized(deg).withColumnRenamed("n", "u").withColumnRenamed("d", "du"), Seq("u"))
      .join(sized(deg).withColumnRenamed("n", "v").withColumnRenamed("d", "dv"), Seq("v"))
      .select(
        struct(col("du").as("d"), col("u").as("n")).as("ou"),
        struct(col("dv").as("d"), col("v").as("n")).as("ov"))
      .select(
        when(col("ou") < col("ov"), col("ou.n")).otherwise(col("ov.n")).as("x"),
        when(col("ou") < col("ov"), col("ov.n")).otherwise(col("ou.n")).as("y"),
        when(col("ou") < col("ov"), col("ov")).otherwise(col("ou")).as("oy"))
    val wedges = oriented.as("e1").join(oriented.as("e2"),
        col("e1.x") === col("e2.x") && col("e1.oy") < col("e2.oy"))
      .select(col("e1.x").as("a"), col("e1.y").as("b"), col("e2.y").as("c"))
    val tri = wedges.join(oriented.select(col("x").as("b"), col("y").as("c")),
      Seq("b", "c"), "left_semi")
    tri.select(explode(array(col("a"), col("b"), col("c"))).as("suppkey"))
      .groupBy(col("suppkey")).agg(count(lit(1)).as("n_triangles"))
      .orderBy(col("suppkey"))
  }

  /** graph_pagerank: damped PageRank over the bipartite part↔supplier
    * graph in EXACT INTEGER arithmetic — the graph-centrality sibling of
    * [[triangles]]' local clustering signal, and the classic iterative
    * operator every graph engine benchmarks. Ranks live in parts-per-
    * billion longs; one fixed convention both engines reproduce bit-for-
    * bit (the emb_pca_power doctrine — never hash a float fixpoint):
    *
    *   r₀(v)   = 10⁹ div n
    *   share(u)= (85·r(u)) div (100·outdeg(u))   per out-edge
    *   r'(v)   = (15·10⁹) div (100·n) + Σ_{u→v} share(u)
    *
    * with truncating integer division on both sides (Spark `div` ==
    * DuckDB `//` for non-negative operands). The graph is bidirected, so
    * every node has an out-edge — no dangling-mass term to disagree on.
    * Four rounds (the oracle unrolls the same four as MATERIALIZED CTEs,
    * the BPE/PCA pattern); truncation only ever loses mass, keeping
    * every intermediate well inside int64 (85·r ≤ 8.5·10¹⁰).
    *
    * Scale shape: the degree-annotated edge frame persists ONCE and each
    * round is one keyed join + one aggregate — the canonical distributed
    * PageRank step. Rounds materialize EAGERLY via `localCheckpoint`
    * (lineage stays one node deep; the previous round's blocks release
    * as soon as the next lands — the k-means seeding idiom), and the
    * contract output is the TOP-50 (rank, node) report — a TakeOrdered,
    * bounded driver collect — so the operator returns a LocalTableScan
    * and leaves zero cached blocks behind (CacheHygieneSpec discipline).
    * The full per-node rank frame is the penultimate plan node; a
    * production caller writes it to a sink instead of ranking it. */
  def pagerank(spark: SparkSession, dir: String, iters: Int = 4): DataFrame = {
    val (edges, _) = graph(spark, dir)
    val deg = edges.groupBy(col("a")).agg(count(lit(1)).as("odeg"))
    val ed = edges.join(deg, Seq("a")).persist()
    var cpIds: Seq[Int] = Nil
    var nodesIds: Seq[Int] = Nil
    // r15 optimization (guide §2.2, the kHopLevelsConvergedReleasable
    // treatment): the whole computation below is EAGER (per-round
    // localCheckpoints + the final bounded collect), so the iteration's
    // shuffle-partition count can be derived from the materialized edge
    // count instead of the session constant — at sf0.1 each of the 4
    // rounds paid 2–3 shuffles × 32-task scheduling overhead over a
    // ~72k-row edge frame. Restored in `finally` before returning the
    // 50-row local frame.
    val confKey = "spark.sql.shuffle.partitions"
    val savedParts = spark.conf.get(confKey)
    try {
      // r15: the node frame is localCheckpointed ONCE — it is re-read by
      // every round's left join (and the rank init), and the lazy
      // distinct re-shuffled the cached edges per round; the count then
      // reads the materialized blocks. Its block ids live OUTSIDE the
      // round-chain release set (the chain releases superseded rounds;
      // nodes must survive all of them) and are freed in `finally`.
      val nodes = ed.select(col("a").as("n")).distinct().localCheckpoint()
      nodesIds = graft.ops.Lineage.persistedIds(nodes)
      val nNodes = nodes.count()
      require(nNodes > 0, "graph_pagerank: empty graph")
      val nEdges = ed.count() // cache already materialized by nodes
      spark.conf.set(confKey,
        graft.ops.Graph.loopPartitions(nEdges * 24L,
          spark.sparkContext.defaultParallelism))
      val base = 15000000000L / (100L * nNodes)
      var ranks = nodes.withColumn("r", lit(1000000000L / nNodes))
      for (_ <- 1 to iters) {
        val contrib = ed.join(ranks, col("a") === col("n"))
          .select(col("b").as("n"),
            expr("(85 * r) div (100 * odeg)").as("share"))
          .groupBy(col("n")).agg(sum(col("share")).as("inr"))
        val next = nodes.join(contrib, Seq("n"), "left")
          .select(col("n"),
            (lit(base) + coalesce(col("inr"), lit(0L))).as("r"))
          .localCheckpoint()
        val nextIds = graft.ops.Lineage.persistedIds(next)
        graft.ops.Lineage.release(next, cpIds.filterNot(nextIds.contains))
        cpIds = nextIds
        ranks = next
      }
      // r15: the final degree attachment reads the CACHED edge frame
      // (one distinct over it) — `deg` itself would re-run the whole
      // lineitem scan + union + distinct subtree, uncached
      val degN = ed.select(col("a").as("n"), col("odeg")).distinct()
      val top = ranks.join(degN, Seq("n"))
        .select(
          when(pmod(col("n"), lit(2)) === 0,
            concat(lit("p"), expr("n div 2").cast("string")))
            .otherwise(concat(lit("s"), expr("n div 2").cast("string"))).as("node"),
          col("odeg").as("out_deg"), col("r").as("rank_ppb"))
        .orderBy(col("rank_ppb").desc, col("node"))
        .limit(50)
      // eager while the edge cache + final checkpoint are alive; 50 rows
      spark.createDataFrame(
        java.util.Arrays.asList(top.collect(): _*), top.schema)
    } finally {
      spark.conf.set(confKey, savedParts)
      ed.unpersist(blocking = false)
      (cpIds ++ nodesIds).foreach(id => spark.sparkContext.getPersistentRDDs.get(id)
        .foreach { r => r.unpersist(blocking = false); () })
      ()
    }
  }

  /** graph_degree_hist: power-of-2 degree histogram per bipartite side —
    * the first profile any graph pipeline runs before choosing a join
    * strategy (a heavy tail ⇒ salt the hub keys; see
    * pipeline_skew_stats for the relational twin). The bucket is the
    * BIT LENGTH of the degree — `length(bin(deg))` = ⌊log2 deg⌋ + 1,
    * pure integer string length on both engines, so no libm log enters
    * the hash contract.
    *
    * Scale shape: one keyed count per endpoint (the degree aggregate
    * the triangle orientation already pays), then a ≤ 2·64-key rollup —
    * map-side combinable everywhere, bounded output. */
  def degreeHist(spark: SparkSession, dir: String): DataFrame = {
    val (edges, _) = graph(spark, dir)
    val deg = edges.groupBy(col("a")).agg(count(lit(1)).as("deg"))
    deg.select(
      when(pmod(col("a"), lit(2)) === 0, lit("part"))
        .otherwise(lit("supplier")).as("side"),
        length(bin(col("deg"))).cast("int").as("bucket"),
        col("deg"))
      .groupBy(col("side"), col("bucket"))
      .agg(count(lit(1)).as("n_nodes"),
        min(col("deg")).as("min_deg"), max(col("deg")).as("max_deg"))
      .orderBy(col("side"), col("bucket"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "graph_khop" -> kHop,
    "graph_reach_conv" -> reachConverged,
    "graph_pagerank" -> ((s, d) => pagerank(s, d)),
    "graph_degree_hist" -> degreeHist,
    "graph_triangles" -> triangles)

  def oracleSql: Map[String, String] = Map(
    "graph_degree_hist" ->
      """WITH li AS (
        |  SELECT DISTINCT l_partkey * 2 AS a, l_suppkey * 2 + 1 AS b
        |  FROM lineitem WHERE l_quantity <= 3
        |), e AS (
        |  SELECT a, b FROM li UNION SELECT b, a FROM li
        |), deg AS (
        |  SELECT a, CAST(count(*) AS BIGINT) AS deg FROM e GROUP BY 1
        |)
        |SELECT CASE WHEN a % 2 = 0 THEN 'part' ELSE 'supplier' END AS side,
        |  CAST(length(bin(deg)) AS INT) AS bucket,
        |  CAST(count(*) AS BIGINT) AS n_nodes,
        |  min(deg) AS min_deg, max(deg) AS max_deg
        |FROM deg GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "graph_triangles" ->
      """WITH ps AS (
        |  SELECT DISTINCT l_partkey AS p, l_suppkey AS s
        |  FROM lineitem WHERE l_quantity <= 3
        |), e AS (
        |  SELECT DISTINCT a.s AS u, b.s AS v
        |  FROM ps a JOIN ps b ON a.p = b.p AND a.s < b.s
        |), tri AS (
        |  SELECT e1.u AS a, e1.v AS b, e2.v AS c
        |  FROM e e1 JOIN e e2 ON e1.v = e2.u
        |    JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
        |), nodes AS (
        |  SELECT a AS suppkey FROM tri
        |  UNION ALL SELECT b FROM tri
        |  UNION ALL SELECT c FROM tri
        |)
        |SELECT suppkey, CAST(count(*) AS BIGINT) AS n_triangles
        |FROM nodes GROUP BY 1 ORDER BY 1""".stripMargin,
    "graph_khop" ->
      """WITH RECURSIVE base AS (
        |  SELECT 'p' || l_partkey AS a, 's' || l_suppkey AS b
        |  FROM lineitem WHERE l_quantity <= 3
        |), edges AS (
        |  SELECT a, b FROM base UNION SELECT b, a FROM base
        |), reach(src, node, hop) AS (
        |  SELECT 'p' || p_partkey, 'p' || p_partkey, 0
        |  FROM part WHERE p_partkey % 50 = 0
        |  UNION
        |  SELECT r.src, e.b, r.hop + 1
        |  FROM reach r JOIN edges e ON r.node = e.a
        |  WHERE r.hop < 3
        |), levels AS (
        |  SELECT src, node, min(hop) AS hop FROM reach GROUP BY 1, 2
        |)
        |SELECT src, CAST(hop AS INT) AS hop,
        |  CAST(count(*) AS BIGINT) AS n_nodes
        |FROM levels GROUP BY 1, 2""".stripMargin,
    // hop < 32: a recursion bound safely above the graph's ~6 diameter —
    // the (src, node, hop) tuples keep growing on cycles, so the bound is
    // the CTE's terminator; min(hop) is closed well below it
    "graph_reach_conv" ->
      """WITH RECURSIVE base AS (
        |  SELECT 'p' || l_partkey AS a, 's' || l_suppkey AS b
        |  FROM lineitem WHERE l_quantity <= 3
        |), edges AS (
        |  SELECT a, b FROM base UNION SELECT b, a FROM base
        |), reach(src, node, hop) AS (
        |  SELECT 'p' || p_partkey, 'p' || p_partkey, 0
        |  FROM part WHERE p_partkey % 500 = 0
        |  UNION
        |  SELECT r.src, e.b, r.hop + 1
        |  FROM reach r JOIN edges e ON r.node = e.a
        |  WHERE r.hop < 32
        |), levels AS (
        |  SELECT src, node, min(hop) AS hop FROM reach GROUP BY 1, 2
        |)
        |SELECT src, CAST(hop AS INT) AS hop,
        |  CAST(count(*) AS BIGINT) AS n_nodes
        |FROM levels GROUP BY 1, 2""".stripMargin,
    // four unrolled rounds as MATERIALIZED CTEs (the BPE/PCA pattern);
    // every division is truncating (// over non-negative operands ==
    // Spark div), so the ppb ranks are bit-identical by construction
    "graph_pagerank" ->
      """WITH li AS MATERIALIZED (
        |  SELECT DISTINCT l_partkey * 2 AS a, l_suppkey * 2 + 1 AS b
        |  FROM lineitem WHERE l_quantity <= 3
        |), e AS MATERIALIZED (
        |  SELECT a, b FROM li UNION SELECT b, a FROM li
        |), deg AS MATERIALIZED (
        |  SELECT a AS n, CAST(count(*) AS BIGINT) AS odeg FROM e GROUP BY 1
        |), cnt AS MATERIALIZED (
        |  SELECT CAST(count(*) AS BIGINT) AS nn FROM deg
        |), r0 AS MATERIALIZED (
        |  SELECT n, CAST(1000000000 // nn AS BIGINT) AS r FROM deg, cnt
        |), c1 AS MATERIALIZED (
        |  SELECT e.b AS n, CAST(SUM((85 * v.r) // (100 * d.odeg)) AS BIGINT) AS inr
        |  FROM e JOIN r0 v ON e.a = v.n JOIN deg d ON e.a = d.n GROUP BY 1
        |), r1 AS MATERIALIZED (
        |  SELECT deg.n,
        |    CAST(15000000000 // (100 * cnt.nn) + COALESCE(c1.inr, 0) AS BIGINT) AS r
        |  FROM deg CROSS JOIN cnt LEFT JOIN c1 ON deg.n = c1.n
        |), c2 AS MATERIALIZED (
        |  SELECT e.b AS n, CAST(SUM((85 * v.r) // (100 * d.odeg)) AS BIGINT) AS inr
        |  FROM e JOIN r1 v ON e.a = v.n JOIN deg d ON e.a = d.n GROUP BY 1
        |), r2 AS MATERIALIZED (
        |  SELECT deg.n,
        |    CAST(15000000000 // (100 * cnt.nn) + COALESCE(c2.inr, 0) AS BIGINT) AS r
        |  FROM deg CROSS JOIN cnt LEFT JOIN c2 ON deg.n = c2.n
        |), c3 AS MATERIALIZED (
        |  SELECT e.b AS n, CAST(SUM((85 * v.r) // (100 * d.odeg)) AS BIGINT) AS inr
        |  FROM e JOIN r2 v ON e.a = v.n JOIN deg d ON e.a = d.n GROUP BY 1
        |), r3 AS MATERIALIZED (
        |  SELECT deg.n,
        |    CAST(15000000000 // (100 * cnt.nn) + COALESCE(c3.inr, 0) AS BIGINT) AS r
        |  FROM deg CROSS JOIN cnt LEFT JOIN c3 ON deg.n = c3.n
        |), c4 AS MATERIALIZED (
        |  SELECT e.b AS n, CAST(SUM((85 * v.r) // (100 * d.odeg)) AS BIGINT) AS inr
        |  FROM e JOIN r3 v ON e.a = v.n JOIN deg d ON e.a = d.n GROUP BY 1
        |), r4 AS MATERIALIZED (
        |  SELECT deg.n,
        |    CAST(15000000000 // (100 * cnt.nn) + COALESCE(c4.inr, 0) AS BIGINT) AS r
        |  FROM deg CROSS JOIN cnt LEFT JOIN c4 ON deg.n = c4.n
        |)
        |SELECT CASE WHEN r4.n % 2 = 0 THEN 'p' || CAST(r4.n // 2 AS VARCHAR)
        |            ELSE 's' || CAST(r4.n // 2 AS VARCHAR) END AS node,
        |  deg.odeg AS out_deg, r4.r AS rank_ppb
        |FROM r4 JOIN deg ON r4.n = deg.n
        |ORDER BY rank_ppb DESC, node LIMIT 50""".stripMargin)
}
