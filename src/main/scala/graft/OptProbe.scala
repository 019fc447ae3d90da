package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-15 optimization diagnostic: times SUB-STAGES of the heaviest
  * queries with the bench's own noop action so the wall-clock can be
  * attributed to a stage before touching it (guide §1 — measure first).
  * Not part of the driver contract. NOTE: the replicated stage bodies
  * (keepBase/containment/reach loop) mirror the shapes AS MEASURED AT
  * ROUND START — they are the "before" side of OPTIMIZATION_r15.md's
  * attributions and deliberately do not track later query rewrites.
  *
  * Usage: runMain graft.OptProbe [sfDir] [stage ...]
  *   stages: keep cont graph split levels levels2
  */
object OptProbe {
  private def t(spark: SparkSession, name: String)(mk: => DataFrame): Unit = {
    spark.catalog.clearCache()
    System.gc()
    val times = (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      mk.write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }
    println(f"PROBE $name%-28s min=${times.min}%6.2f med=${times.sorted.apply(1)}%6.2f")
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[" + sys.env.getOrElse("SPARK_GRAFT_CPUS", "32") + "]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val par = spark.sparkContext.defaultParallelism

    // ---- keep-family stages (mirrors Pipeline.keepBase & friends) ----
    import graft.pipeline.{Text, Dedup}
    def keepBase(withShingles: Boolean): DataFrame = {
      val sh3 = Text.shingles(col("text"), 3)
      val rowLocal = Seq(
        Text.fingerprint(col("text")).as("fp"),
        Text.qualityScore(col("text")).as("quality"),
        Dedup.sortedHashSet(Text.tokens(col("text"))).as("toks_hs")) ++
        (if (withShingles) Seq(
          transform(sh3, s => xxhash64(s)).as("sh3_h"),
          size(sh3).as("n_sh3")) else Nil)
      Tables.documents(spark, dir).repartition(par, col("doc_id")).select(
        col("doc_id") +: col("lang") +: col("n_chars") +: rowLocal: _*)
    }
    def ngramJaccardFrom(base: DataFrame): DataFrame = {
      val d = base.select(col("doc_id"), col("lang"), col("n_chars"), col("toks_hs").as("sh"))
      val bk = floor(col("n_chars") / 50)
      val sample = d.filter(col("doc_id") % 50 === 0)
        .select(col("doc_id").as("id_a"), col("lang"), col("n_chars").as("nc_a"),
          col("sh").as("sh_a"), explode(array(bk - 1, bk, bk + 1)).as("bucket"))
      val rest = d.select(col("doc_id").as("id_b"), col("lang"), col("n_chars").as("nc_b"),
        col("sh").as("sh_b"), bk.as("bucket"))
      sample.join(rest, Seq("lang", "bucket"))
        .filter(col("id_a") < col("id_b") && abs(col("nc_a") - col("nc_b")) <= 50)
        .withColumn("jaccard", Dedup.jaccardSorted(col("sh_a"), col("sh_b")))
        .filter(col("jaccard") >= 0.5)
        .select(col("id_a"), col("id_b"))
    }
    def contaminationFrom(base: DataFrame): DataFrame = {
      val docSh = base.select(col("doc_id"), explode(col("sh3_h")).as("s")).distinct()
      val probe = docSh.filter(col("doc_id") % 97 === 0).select(col("s")).distinct()
        .withColumn("hit", lit(1))
      val corpus = docSh.filter(col("doc_id") % 97 =!= 0)
      corpus.join(probe, Seq("s"), "left")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_shingles"),
          coalesce(sum(col("hit")), lit(0)).as("n_shared"))
        .withColumn("contaminated",
          when(floor(col("n_shared") * lit(10000.0) / col("n_shingles")).cast("long") >= 5000, 1)
            .otherwise(0))
        .select(col("doc_id"), col("contaminated"))
    }

    // ---- containment stages ----
    def containmentStages(): Unit = {
      import org.apache.spark.sql.expressions.Window
      val docs = Tables.documents(spark, dir)
        .repartition(par, col("doc_id"))
        .select(col("doc_id"), Text.tokens(col("text")).as("toks"))
      t(spark, "cont.docs")(docs)
      val dt0 = docs.select(col("doc_id"), explode(col("toks")).as("tok")).distinct()
        .select(col("doc_id"), xxhash64(col("tok")).as("th"))
      t(spark, "cont.dt0")(dt0)
      val dfreq = dt0.groupBy(col("th")).agg(count(lit(1)).as("df"))
      val sz = dt0.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
        .filter(col("sz") >= 30)
      val dt = dt0.join(sz.select(col("doc_id")), Seq("doc_id"))
      val pr = dt.join(dfreq, Seq("th"))
        .withColumn("rn", org.apache.spark.sql.functions.row_number().over(
          Window.partitionBy(col("doc_id")).orderBy(col("df"), col("th"))))
      t(spark, "cont.pr")(pr)
      val prefix = pr.join(sz, Seq("doc_id"))
        .filter(col("rn") <= col("sz") - expr("(9 * sz + 9) div 10") + 1)
        .select(col("doc_id"), col("th"))
      val cand = prefix.select(col("doc_id").as("id_a"), col("th"))
        .join(dt.select(col("doc_id").as("id_b"), col("th")), Seq("th"))
        .join(sz.select(col("doc_id").as("id_a"), col("sz").as("sz_a")), Seq("id_a"))
        .join(sz.select(col("doc_id").as("id_b"), col("sz").as("sz_b")), Seq("id_b"))
        .filter(col("sz_a") < col("sz_b") ||
          (col("sz_a") === col("sz_b") && col("id_a") < col("id_b")))
        .select(col("id_a"), col("id_b"), col("sz_a"), col("sz_b"))
        .distinct()
      t(spark, "cont.cand")(cand)
      val hs = docs.select(col("doc_id"), Dedup.sortedHashSet(col("toks")).as("hs"))
      val fin = cand
        .join(hs.select(col("doc_id").as("id_a"), col("hs").as("hs_a")), Seq("id_a"))
        .join(hs.select(col("doc_id").as("id_b"), col("hs").as("hs_b")), Seq("id_b"))
        .withColumn("n_common",
          graft.functions.CommonCountSortedExpr.commonCount(col("hs_a"), col("hs_b")))
        .filter(expr("(n_common * 10000) div sz_a") >= 9000)
        .select(col("id_a"), col("id_b"), col("n_common"),
          expr("(n_common * 10000) div sz_a").as("containment_q"),
          expr("(n_common * 10000) div (sz_a + sz_b - n_common)").as("jaccard_q"))
        .orderBy(col("id_a"), col("id_b"))
      t(spark, "cont.full")(fin)
    }

    def tSplit(name: String)(mk: => DataFrame): Unit = {
      spark.catalog.clearCache()
      System.gc()
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        val df = mk
        val t1 = System.nanoTime()
        df.write.mode("overwrite").format("noop").save()
        val t2 = System.nanoTime()
        println(f"PROBE $name%-28s run$i construct=${(t1 - t0) / 1e9}%6.2f write=${(t2 - t1) / 1e9}%6.2f")
      }
    }

    val stages = if (args.length > 1) args.drop(1).toSet else Set("keep", "cont", "graph")
    if (stages("split")) {
      tSplit("split.pipeline_keep")(graft.queries.Pipeline.queries("pipeline_keep")(spark, dir))
      tSplit("split.reach_conv")(graft.queries.Graphs.queries("graph_reach_conv")(spark, dir))
      tSplit("split.pagerank")(graft.queries.Graphs.queries("graph_pagerank")(spark, dir))
      tSplit("split.containment")(graft.queries.Pipeline.queries("dedup_containment")(spark, dir))
    }
    if (stages("levels")) {
      // replicate the reach_conv loop with per-level timing
      val li = Tables.lineitem(spark, dir)
        .filter(col("l_quantity") <= 3)
        .select((col("l_partkey") * 2).as("a"), (col("l_suppkey") * 2 + 1).as("b"))
      val edges = li.unionByName(li.select(col("b").as("a"), col("a").as("b"))).distinct()
      val sources = Tables.part(spark, dir)
        .filter(col("p_partkey") % 500 === 0)
        .select((col("p_partkey") * 2).as("src"))
      (1 to 2).foreach { round =>
        var t0 = System.nanoTime()
        def lap(tag: String): Unit = {
          val t1 = System.nanoTime()
          println(f"PROBE levels.$tag%-22s r$round ${(t1 - t0) / 1e9}%6.2f")
          t0 = t1
        }
        val (levels, release) =
          graft.ops.Graph.kHopLevelsConvergedReleasable(edges, sources, maxK = 32)
        lap("loop_total")
        val rows = levels.groupBy(col("src"), col("hop"))
          .agg(count(lit(1)).as("n_nodes"))
        val n = rows.count()
        lap(s"rollup(n=$n)")
        release()
      }
    }
    if (stages("keep")) {
      t(spark, "keep.base")(keepBase(true))
      t(spark, "keep.base_noshingle")(keepBase(false))
      val b = keepBase(true).persist()
      b.write.mode("overwrite").format("noop").save()
      t(spark, "keep.jaccard_from_cache")(ngramJaccardFrom(b))
      t(spark, "keep.contamination")(contaminationFrom(b))
      b.unpersist(blocking = true)
      t(spark, "keep.pii")(graft.queries.Pipeline.queries("pipeline_pii")(spark, dir))
      t(spark, "keep.lm")(graft.queries.Pipeline.queries("text_lm_score")(spark, dir))
      t(spark, "keep.full")(graft.queries.Pipeline.queries("pipeline_keep")(spark, dir))
    }
    if (stages("levels2")) {
      // replicate the converged-BFS loop body with per-level laps
      val li = Tables.lineitem(spark, dir)
        .filter(col("l_quantity") <= 3)
        .select((col("l_partkey") * 2).as("a"), (col("l_suppkey") * 2 + 1).as("b"))
      val edges = li.unionByName(li.select(col("b").as("a"), col("a").as("b"))).distinct()
      val sources = Tables.part(spark, dir)
        .filter(col("p_partkey") % 500 === 0)
        .select((col("p_partkey") * 2).as("src"))
      (1 to 2).foreach { round =>
        sys.env.get("SPARK_GRAFT_PROBE_PARTS").foreach(p =>
          spark.conf.set("spark.sql.shuffle.partitions", p))
        sys.env.get("SPARK_GRAFT_PROBE_COALESCE").foreach(v =>
          spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", v))
        var t0 = System.nanoTime()
        def lap(tag: String): Unit = {
          val t1 = System.nanoTime()
          println(f"PROBE lv2.$tag%-24s r$round ${(t1 - t0) / 1e9}%6.2f")
          t0 = t1
        }
        def reRoot(df: DataFrame): DataFrame =
          org.apache.spark.sql.GraftDatasetBridge.reRootInternal(df)
        val e = edges.select(col("a"), col("b")).repartition(col("a")).localCheckpoint()
        lap("edges_cp")
        var visited = sources.select(col("src"), col("src").as("node"), lit(0).as("hop"))
        var frontier = reRoot(visited.select("src", "node").localCheckpoint())
        lap("frontier0_cp")
        var h = 1
        var converged = frontier.isEmpty
        lap("frontier0_isEmpty")
        while (h <= 32 && !converged) {
          val next = frontier.alias("f")
            .join(e.alias("ed"), col("f.node") === col("ed.a"))
            .select(col("f.src"), col("ed.b").as("node"))
            .distinct()
            .join(visited.select("src", "node"), Seq("src", "node"), "left_anti")
          val nextCp = reRoot(next.localCheckpoint())
          lap(s"level$h.cp(n=${nextCp.count()})")
          if (nextCp.isEmpty) converged = true
          lap(s"level$h.isEmpty")
          if (!converged) {
            visited = visited.unionByName(nextCp.withColumn("hop", lit(h)))
            if (h % 4 == 0) visited = reRoot(visited.localCheckpoint())
            frontier = nextCp
          }
          h += 1
        }
        lap("done")
      }
    }
    if (stages("mask")) {
      // r16: phase-split of the CURRENT msBfsLevelCounts shape — edge
      // prep (2 checkpoints) vs loop chunks vs rollup vs final collect
      val li = Tables.lineitem(spark, dir)
        .filter(col("l_quantity") <= 3)
        .select((col("l_partkey") * 2).as("a"), (col("l_suppkey") * 2 + 1).as("b"))
      val edges = li.unionByName(li.select(col("b").as("a"), col("a").as("b"))).distinct()
      val sources = Tables.part(spark, dir)
        .filter(col("p_partkey") % 500 === 0)
        .select((col("p_partkey") * 2).as("src"))
      (1 to 2).foreach { round =>
        var t0 = System.nanoTime()
        def lap(tag: String): Unit = {
          val t1 = System.nanoTime()
          println(f"PROBE mask.$tag%-24s r$round ${(t1 - t0) / 1e9}%6.2f")
          t0 = t1
        }
        val srcRows = sources.select(col("src")).distinct().limit(4097).collect()
        lap(s"srcCollect(n=${srcRows.length})")
        val eRaw = edges.select(col("a"), col("b")).localCheckpoint()
        lap("edges_cp1")
        val loopParts = graft.ops.Graph.loopPartitions(
          spark.sparkContext.getRDDStorageInfo
            .map(i => i.memSize + i.diskSize).sum, par)
        val saved = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", loopParts)
        val e = eRaw.repartition(loopParts, col("a")).localCheckpoint()
        lap(s"edges_cp2(parts=$loopParts)")
        val got = graft.ops.Graph.msBfsLevelCounts(edges, sources, maxK = 32)
        lap("msBfs_full")
        spark.conf.set("spark.sql.shuffle.partitions", saved)
        println(s"PROBE mask.rows=${got.map(_.count())}")
        e.unpersist(blocking = false); eRaw.unpersist(blocking = false)
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      }
    }
    if (stages("cont")) containmentStages()
    if (stages("graph")) {
      // graph family: shared edge base then the two iterative ops
      val li = Tables.lineitem(spark, dir)
        .filter(col("l_quantity") <= 3)
        .select((col("l_partkey") * 2).as("a"), (col("l_suppkey") * 2 + 1).as("b"))
      val edges = li.unionByName(li.select(col("b").as("a"), col("a").as("b"))).distinct()
      t(spark, "graph.edges")(edges)
      t(spark, "graph.reach_conv")(graft.queries.Graphs.queries("graph_reach_conv")(spark, dir))
      t(spark, "graph.pagerank")(graft.queries.Graphs.queries("graph_pagerank")(spark, dir))
    }
    spark.stop()
  }
}
