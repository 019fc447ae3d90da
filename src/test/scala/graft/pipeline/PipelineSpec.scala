package graft.pipeline

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Unit coverage for the hash-seeded pipeline operators that have no SQL
  * oracle: minhash estimates track exact Jaccard, simhash hamming distance
  * is small for near-identical docs, LSH top-k recalls the brute-force
  * top-1, multimodal stub invariants hold.
  */
class PipelineSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog again and again"),
    (1L, "the quick brown fox jumps over the lazy dog again and again!"), // near-dup of 0
    (2L, "a completely different document about spark query engines"),
    (3L, "the quick brown fox jumps over the lazy dog again and again"), // exact dup of 0
    (4L, "spark query engines process completely different documents")
  ).toDF("doc_id", "text")

  test("pq codes: 3-bit codes per block, error is the sum of per-block kmeans distances") {
    val dir = "/root/testdata/sf0.001"
    val rows = graft.queries.Pipeline.pqCodes(spark, dir).collect()
      .map(r => (r.getLong(0), Seq(r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)),
        r.getLong(5)))
    assert(rows.nonEmpty)
    rows.foreach { case (id, cs, err) =>
      assert(cs.forall(c => c >= 0 && c < 8), s"vec $id code out of range: $cs")
      assert(err >= 0L)
    }
    // block 0 codes/distances equal an independent kmeans over the slice
    val b0 = Vectors.kmeansQuantized(
        graft.Tables.embeddings(spark, dir)
          .select(col("vec_id"), slice(col("embedding"), 1, 16).as("subv")),
        "vec_id", "subv", k = 8, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { case (id, cs, _) =>
      assert(cs.head === b0(id), s"vec $id block-0 code mismatch")
    }
  }

  test("sampling/packing/contamination invariants on the sf0.001 corpus") {
    val dir = "/root/testdata/sf0.001"
    val spark_ = spark

    // stratified sampling: the kept set is exactly the predicate's set
    val kept = graft.queries.Pipeline.stratifiedSample(spark_, dir).collect()
    kept.foreach { r =>
      val (id, rate) = (r.getLong(0), r.getInt(2))
      assert((((id % 1000000L) * 2654435761L) % 100) < rate, s"doc $id kept but hash >= rate $rate")
    }
    assert(kept.nonEmpty)

    // packing: bin id is exactly start-offset / budget, offsets contiguous
    // per (lang, shard) in doc_id order
    val packed = graft.queries.Pipeline.packSequences(spark_, dir)
      .collect().map(r => (r.getString(1), r.getLong(2), r.getLong(0), r.getInt(3), r.getLong(4)))
    packed.groupBy(p => (p._1, p._2)).foreach { case (_, rows) =>
      var cum = 0L
      rows.sortBy(_._3).foreach { case (_, _, id, nTok, bin) =>
        assert(bin === cum / 512, s"doc $id bin $bin != ${cum / 512}")
        cum += nTok
      }
    }

    // contamination: probe docs never appear; shared <= total; the flag
    // matches the quantized ratio
    val cont = graft.queries.Pipeline.contaminationNgram(spark_, dir).collect()
    cont.foreach { r =>
      val (id, total, shared, q, flag) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getInt(4))
      assert(id % 97 != 0, s"probe doc $id in corpus output")
      assert(shared <= total)
      assert(flag === (if (q >= 5000) 1 else 0))
    }

    // exact-substring contamination: probe docs never appear; hits never
    // exceed windows; flag == (hits > 0); and a hit implies the window
    // really is a verbatim token-aligned substring of some probe doc
    val probeTexts = graft.Tables.documents(spark_, dir)
      .filter(org.apache.spark.sql.functions.col("doc_id") % 97 === 0)
      .select("text").collect().map(_.getString(0).trim.split("\\s+").mkString(" "))
    val sub = graft.queries.Pipeline.contaminationSubstring(spark_, dir).collect()
    assert(sub.nonEmpty)
    sub.foreach { r =>
      val (id, windows, hits, flag) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))
      assert(id % 97 != 0, s"probe doc $id in corpus output")
      assert(hits <= windows && windows > 0)
      assert(flag === (if (hits > 0) 1 else 0))
    }
    val corpusTexts = graft.Tables.documents(spark_, dir)
      .filter(org.apache.spark.sql.functions.col("doc_id") % 97 =!= 0)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).trim.split("\\s+")))
      .toMap
    sub.filter(_.getLong(2) > 0).foreach { r =>
      val toks = corpusTexts(r.getLong(0))
      val windows =
        if (toks.length < 4) Seq(toks.mkString(" "))
        else toks.sliding(4).map(_.mkString(" ")).toSeq
      assert(windows.exists(w => probeTexts.exists(p =>
          p == w || p.startsWith(w + " ") || p.endsWith(" " + w) || p.contains(" " + w + " "))),
        s"doc ${r.getLong(0)} flagged but no token-aligned probe substring found")
    }

    // inverted index: df/ttf consistent, posting sample = the df's 5
    // smallest doc_ids, every posting a real (term, doc) occurrence
    val inv = graft.queries.Pipeline.invertedIndex(spark_, dir).collect()
    assert(inv.nonEmpty)
    val docToks = graft.Tables.documents(spark_, dir)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).toLowerCase.trim.split("\\s+").toSet))
    inv.foreach { r =>
      val (term, df, ttf, tops) =
        (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3))
      assert(ttf >= df && df >= 1)
      val postings = tops.split(",").map(_.toLong)
      assert(postings.length === math.min(df, 5L).toInt)
      assert(postings.sorted.sameElements(postings), s"$term sample unsorted")
      postings.foreach(d => assert(docToks.toMap.apply(d).contains(term),
        s"posting $d lacks term $term"))
      // the sample is exactly the df's SMALLEST doc ids
      val expected = docToks.filter(_._2.contains(term)).map(_._1)
        .sorted.take(5).toSeq
      assert(postings.toSeq === expected, s"$term sample != 5 smallest")
    }

    // repetition: quantized ratio consistent with its own counts
    graft.queries.Pipeline.textRepetition(spark_, dir).collect().foreach { r =>
      val (total, distinct, q) = (r.getInt(1), r.getInt(2), r.getLong(3))
      assert(distinct <= total && total > 0)
      assert(q === math.floor((1.0 - distinct.toDouble / total) * 10000).toLong)
    }
  }

  test("pack_sequences shard count grows with the corpus, floor 4 (r3 #4)") {
    import graft.queries.Pipeline.packShardCount
    assert(packShardCount(0L) === 4)
    assert(packShardCount(500L) === 4)        // sf0.01 keeps the historical 4
    assert(packShardCount(400000L) === 4)
    assert(packShardCount(400001L) === 5)
    assert(packShardCount(100000000L) === 1000)
    assert(packShardCount(10000000000L) === 100000) // 100× corpus → 100× shards
  }

  test("minhash shuffled verification fallback returns exactly the broadcast path's pairs (r3 #3)") {
    val dir = "/root/testdata/sf0.001"
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val viaBroadcast = rows(graft.queries.Pipeline.dedupMinhash(spark, dir))
    val viaShuffle = rows(graft.queries.Pipeline.minhashVerified(spark, dir, maxBroadcast = 0))
    assert(viaShuffle === viaBroadcast)
    assert(viaBroadcast.nonEmpty)
  }

  test("rq codes: level-1 errors equal the ann_kmeans contract, level 2 refines") {
    val dir = "/root/testdata/sf0.001"
    val rq = graft.queries.Pipeline.rqCodes(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    val emb = graft.Tables.embeddings(spark, dir)
    assert(rq.length.toLong === emb.count())
    assert(rq.forall(t => t._2 >= 0 && t._2 < 8 && t._3 >= 0 && t._3 < 8),
      "codes must be 3-bit cluster ids on both levels")
    // level 1 IS the ann_kmeans contract: per-vector err1_q must equal
    // kmeansQuantized's dist_q verbatim
    val km = Vectors.kmeansQuantized(emb, "vec_id", "embedding", k = 8, iters = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    rq.foreach { case (id, c1, _, err1, _) =>
      assert(km(id) === ((c1, err1)), s"level-1 mismatch for vec $id")
    }
    // the second stage must buy error: residual clustering strictly
    // reduces TOTAL reconstruction error on this corpus (fixed data —
    // not a theorem per vector, hence aggregate)
    assert(rq.map(_._5).sum < rq.map(_._4).sum,
      "RVQ level 2 failed to reduce total reconstruction error")
  }

  test("LSH plane counts are capped to the band-id bit layout") {
    intercept[IllegalArgumentException] { Vectors.bandSignatures(col("embedding"), 4, 57) }
    intercept[IllegalArgumentException] { Vectors.bandSignatures(col("embedding"), 256, 8) }
    intercept[IllegalArgumentException] { Vectors.hyperplaneBucket(col("embedding"), 64) }
    // in-range values construct fine
    Vectors.bandSignatures(col("embedding"), 4, Vectors.MaxBandPlanes)
    Vectors.hyperplaneBucket(col("embedding"), 63)
  }

  test("connected components: chains, merges, and isolated vertices resolve to min ids") {
    // a 20-node chain (exercises pointer jumping — plain propagation would
    // need 19 rounds), a triangle bridged to it, and two isolated vertices
    val chain = (100L until 119L).map(i => (i, i + 1))
    val triangle = Seq((200L, 201L), (201L, 202L), (202L, 200L))
    val bridge = Seq((119L, 200L)) // merges chain and triangle into one cluster
    val edges = (chain ++ triangle ++ bridge).toDF("a", "b")
    val vertices = ((100L to 119L) ++ (200L to 202L) ++ Seq(300L, 301L)).toDF("v")
    // both execution paths: driver union-find (default gate) and the
    // distributed min-label loop (gate forced to 0)
    Seq(1000000L, 0L).foreach { gate =>
      val comp = Dedup.connectedComponents(edges, vertices, maxDriverEdges = gate)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      (100L to 119L).foreach(v => assert(comp(v) === 100L, s"chain node $v (gate=$gate)"))
      (200L to 202L).foreach(v => assert(comp(v) === 100L, s"triangle node $v (gate=$gate)"))
      assert(comp(300L) === 300L && comp(301L) === 301L, s"isolated vertices (gate=$gate)")
    }
  }

  test("dedup_clusters: canonical docs partition the corpus; sizes are consistent") {
    val dir = "/root/testdata/sf0.001"
    val rows = graft.queries.Pipeline.dedupClusters(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3)))
    assert(rows.length === 500)
    // cluster id is the min member; exactly one canonical doc per cluster
    val byCluster = rows.groupBy(_._2)
    byCluster.foreach { case (cid, members) =>
      assert(members.map(_._1).min === cid, s"cluster $cid id is not the min member")
      assert(members.count(_._4 == 1) === 1, s"cluster $cid canonical count")
      assert(members.forall(_._3 == members.length), s"cluster $cid size mismatch")
    }
    // the near-dup verified pairs must be co-clustered (transitively)
    val clusterOf = rows.map(r => r._1 -> r._2).toMap
    val pairs = graft.queries.Pipeline.ngramJaccard(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty)
    pairs.foreach { case (a, b) =>
      assert(clusterOf(a) === clusterOf(b), s"pair ($a,$b) split across clusters")
    }
    assert(byCluster.values.exists(_.length > 1), "expected at least one multi-member cluster")
  }

  test("pipeline_keep: reject reasons consistent with the component operators") {
    val dir = "/root/testdata/sf0.001"
    val rows = graft.queries.Pipeline.pipelineKeep(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
    assert(rows.length === 500)
    val canonical = graft.queries.Pipeline.dedupClusters(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getInt(3) == 1)).toMap
    val qualityOf = graft.queries.Pipeline.quality(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getDouble(4)).toMap
    rows.foreach { case (id, keep, reason) =>
      assert((keep == 1) === (reason == "keep"), s"doc $id keep/reason mismatch")
      if (reason == "duplicate") assert(!canonical(id), s"doc $id marked duplicate but canonical")
      if (keep == 1) {
        assert(canonical(id), s"kept doc $id is not cluster-canonical")
        assert(qualityOf(id) >= 0.5, s"kept doc $id below quality threshold")
      }
    }
    assert(rows.exists(_._2 == 1) && rows.exists(_._2 == 0),
      "expected both kept and rejected docs")
  }

  test("dedup_best_rep: one representative per cluster, the max-quality member") {
    val dir = "/root/testdata/sf0.001"
    val reps = graft.queries.Pipeline.dedupBestRep(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    val members = graft.queries.Pipeline.dedupClusters(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._2).view.mapValues(_.map(_._1)).toMap
    val qualityOf = graft.queries.Pipeline.quality(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getDouble(4)).toMap
    assert(reps.length === members.size, "one representative per cluster")
    reps.foreach { case (cid, rep, repQ, size) =>
      val ms = members(cid)
      assert(ms.contains(rep), s"rep $rep not a member of cluster $cid")
      assert(ms.length === size)
      val best = ms.map(qualityOf).max
      assert(qualityOf(rep) === best, s"rep $rep of cluster $cid is not max-quality")
      assert(repQ === math.floor(best * 10000).toLong)
    }
  }

  test("minhash estimate tracks exact jaccard for near-dups") {
    val sh = docs.select($"doc_id", Text.shingles($"text", 3).as("sh"),
      Dedup.minhashSignature(Text.shingles($"text", 3), 64).as("sig"))
    val a = sh.filter($"doc_id" === 0).select($"sh".as("sha"), $"sig".as("siga"))
    val b = sh.filter($"doc_id" === 1).select($"sh".as("shb"), $"sig".as("sigb"))
    val r = a.crossJoin(b)
      .select(Dedup.jaccard($"sha", $"shb").as("exact"),
        Dedup.estimatedJaccard($"siga", $"sigb").as("est"))
      .head()
    val (exact, est) = (r.getDouble(0), r.getDouble(1))
    assert(exact > 0.7, s"near-dup exact jaccard $exact")
    assert(math.abs(exact - est) < 0.3, s"estimate $est vs exact $exact")
  }

  test("minhash LSH candidates include the exact duplicate pair") {
    val sh = docs.select($"doc_id", Text.shingles($"text", 3).as("sh"))
    val cands = Dedup.minhashCandidates(sh, "doc_id", "sh").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cands.contains((0L, 3L)), s"exact dup pair missing from $cands")
  }

  test("simhash: identical docs equal, near-dups close, distinct docs far") {
    val sh = docs.select($"doc_id", Dedup.simhash(Text.shingles($"text", 3)).as("s"))
    val m = sh.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(m(a) ^ m(b))
    assert(ham(0, 3) === 0, "exact dups must have identical simhash")
    assert(ham(0, 1) < ham(0, 2), "near-dup must be closer than unrelated")
  }

  test("LSH top-k finds the brute-force top-1 for most queries (recall)") {
    val dir = "/root/testdata/sf0.001"
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val brute = Vectors.bruteForceTopK(emb, q => q % 100 === 0, 1)
      .select($"query_id", $"neighbor_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val lsh = Vectors.lshTopK(emb, q => q % 100 === 0, 10, nPlanes = 4)
      .select($"query_id", $"neighbor_id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val recalled = brute.count { case (q, n1) => lsh.get(q).exists(_.contains(n1)) }
    // approximate: expect at least some queries to recall their true top-1
    assert(recalled >= 1, s"LSH recalled $recalled of ${brute.size} top-1 neighbors")
  }

  test("multi-table LSH top-k: recall never below single-table; candidate sets are supersets") {
    val dir = "/root/testdata/sf0.001"
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    def collect(nTables: Int): Map[Long, Set[Long]] =
      Vectors.lshTopK(emb, q => q % 100 === 0, Int.MaxValue - 1, nPlanes = 4, nTables = nTables)
        .select($"query_id", $"neighbor_id").collect()
        .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val one = collect(1)
    val four = collect(4)
    // every single-table candidate survives adding tables (k unbounded)
    one.foreach { case (q, ns) =>
      assert(ns.subsetOf(four.getOrElse(q, Set.empty)),
        s"query $q lost candidates going 1 -> 4 tables")
    }
    // and at least one query gains a candidate (recall actually moved)
    assert(four.map(_._2.size).sum > one.map(_._2.size).sum,
      "4 tables produced no additional candidates over 1")
  }

  test("IVF top-k: every reported neighbor shares the query's coarse list; sims match brute force") {
    val dir = "/root/testdata/sf0.001"
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val ivf = Vectors.ivfTopK(emb, q => q % 100 === 0, 10)
      .select($"query_id", $"neighbor_id", $"sim_q").collect()
    assert(ivf.nonEmpty, "IVF must return candidates")
    // sims must equal the exact quantized dot (IVF only restricts candidates)
    val brute = Vectors.bruteForceTopK(emb, q => q % 100 === 0, Int.MaxValue - 1)
      .select($"query_id", $"neighbor_id", $"sim_q").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    ivf.foreach { r =>
      assert(brute((r.getLong(0), r.getLong(1))) === r.getLong(2))
    }
  }

  test("trained IVF multi-probe recall beats the LSH variant (r2 #9)") {
    val dir = "/root/testdata/sf0.001"
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val brute = Vectors.bruteForceTopK(emb, q => q % 100 === 0, 10)
      .select($"query_id", $"neighbor_id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    def recall(approx: Map[Long, Set[Long]]): Double = {
      val hits = brute.toSeq.map { case (q, truth) =>
        approx.get(q).map(a => (a & truth).size).getOrElse(0)
      }.sum
      hits.toDouble / brute.values.map(_.size).sum
    }
    def collectTopK(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.select($"query_id", $"neighbor_id").collect()
        .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val ivfRecall = recall(collectTopK(Vectors.ivfTopK(emb, q => q % 100 === 0, 10)))
    val lshRecall = recall(collectTopK(Vectors.lshTopK(emb, q => q % 100 === 0, 10)))
    assert(ivfRecall >= lshRecall,
      s"trained IVF recall $ivfRecall below LSH recall $lshRecall")
    assert(ivfRecall > 0.3, s"trained IVF recall too low: $ivfRecall")
  }

  test("multi-band embedding candidates recall planted near-dups; superset of single-band (r2 #6)") {
    val dir = "/root/testdata/sf0.001"
    val base = spark.read.parquet(s"$dir/embeddings.parquet")
    // plant genuine near-dups (cosine ≈ 0.999): ±5% deterministic
    // per-component perturbation of the first 40 vectors — the regime the
    // operator exists for (the synthetic corpus itself peaks at cos ≈ 0.51,
    // where LSH recall is rightfully low at any honest bucket width)
    val planted = base.filter($"vec_id" < 40)
      .select(($"vec_id" + 100000L).as("vec_id"),
        transform($"embedding",
          (x, i) => x * (lit(1.0f) + sin(i.cast("double") + $"vec_id") * lit(0.05f)))
          .cast("array<float>").as("embedding"))
    val emb = base.select($"vec_id", $"embedding").unionByName(planted)
    val truth = (0L until 40L).map(i => (i, i + 100000L)).toSet
    val cand = Vectors.embeddingCandidates(emb, "vec_id", "embedding")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (cand & truth).size.toDouble / truth.size
    assert(recall >= 0.9, s"multi-band recall of planted near-dups: $recall")
    // band 0 reuses the single-table seed → multi-band candidates must be
    // a superset of the old single-band form at the same width
    val single = Vectors.embeddingCandidates(emb, "vec_id", "embedding", nBands = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(single.subsetOf(cand), "multi-band must never lose single-band candidates")
    assert(cand.size >= single.size)
  }

  test("embedding-cosine near-dup pairs satisfy the threshold exactly") {
    val q = graft.queries.Pipeline.dedupEmbedding(spark, "/root/testdata/sf0.001")
    val rows = q.collect()
    assert(rows.nonEmpty, "expected at least one similar pair in the corpus")
    rows.foreach { r =>
      assert(r.getLong(0) < r.getLong(1), "pairs must be ordered (a < b)")
      assert(r.getLong(2) > 0, "reported dot must be positive")
    }
  }

  test("multimodal stub: deterministic, resize bounded, frames within range") {
    val d = Multimodal.withMedia(docs, "text")
      .select($"doc_id", $"media_meta",
        Multimodal.resizeMeta($"media_meta", 320, 240).as("rm"),
        Multimodal.sampleFrameIdx($"media_meta", 5, 4).as("frames"))
    val rows = d.collect()
    rows.foreach { r =>
      val meta = r.getStruct(1)
      val rm = r.getStruct(2)
      assert(meta.getAs[Long]("byte_len") > 0)
      assert(rm.getAs[Int]("width") <= 320 && rm.getAs[Int]("height") <= 240)
      val frames = r.getSeq[Int](3)
      assert(frames.nonEmpty && frames.length <= 4)
      assert(frames.forall(f => f >= 1 && f <= meta.getAs[Int]("n_frames")))
    }
    // determinism: same text → same meta
    val metas = rows.map(r => (r.getLong(0), r.getStruct(1).toString())).toMap
    assert(metas(0L) === metas(3L))
  }

  test("two-phase salted reservoir equals the single-sort per-group rank") {
    // ids chosen so several share a salt bucket (doc_id % 32 collides) —
    // the case where a naive phase-1 cut could starve the global top-k
    val ids = (0L until 500L).map(_ * 3L)
    val langs = Seq("en", "de", "fr")
    val d = ids.map(id => (id, langs((id % 7 % 3).toInt))).toDF("doc_id", "lang")
    val k = 10
    val got = graft.queries.Pipeline.reservoirOf(d, k)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
    val expected = ids.map(id => (id, langs((id % 7 % 3).toInt)))
      .groupBy(_._2).flatMap { case (lang, rows) =>
        rows.map { case (id, _) => (id, math.floorMod((id % 1000000L) * 2654435761L, 1000000007L)) }
          .sortBy { case (id, pri) => (pri, id) }
          .take(k).zipWithIndex
          .map { case ((id, _), i) => (id, lang, i + 1) }
      }.toSet
    assert(got === expected)
  }

  test("sq8 codes/error parity with a naive driver model on sf0.001") {
    val dir = "/root/testdata/sf0.001"
    val vecs = graft.Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(x =>
        math.floor(x.toDouble * 1000.0).toLong).toArray)
    val dims = vecs.head._2.length
    val lo = (0 until dims).map(d => vecs.map(_._2(d)).min).toArray
    val hi = (0 until dims).map(d => vecs.map(_._2(d)).max).toArray
    val expected = vecs.map { case (id, qv) =>
      var fp = 0L; var err = 0L
      var d = 0
      while (d < dims) {
        val span = hi(d) - lo(d)
        val code = ((qv(d) - lo(d)) * 255L) / math.max(1L, span)
        fp += (d + 1L) * code
        err += math.abs(qv(d) - (lo(d) + (code * span) / 255L))
        d += 1
      }
      (id, fp, err)
    }.toSet
    val got = graft.queries.Pipeline.embSq8(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === expected)
    // every code is a byte: fp ≤ Σ (d+1)·255
    val fpMax = (1 to dims).map(_ * 255L).sum
    got.foreach { case (id, fp, err) =>
      assert(fp >= 0L && fp <= fpMax, s"vec $id fingerprint out of byte range")
      assert(err >= 0L)
    }
  }

  test("bm25 parity with a naive driver model on sf0.001") {
    val dir = "/root/testdata/sf0.001"
    val texts = graft.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1))
    def toks(t: String): Seq[String] =
      if (t.trim.isEmpty) Seq.empty else t.trim.split("\\s+").toSeq
    val tf = texts.flatMap { case (id, t) => toks(t).map(id -> _) }
      .groupBy(identity).map { case ((id, tok), g) => (id, tok, g.size.toLong) }
    val df = tf.groupBy(_._2).map { case (tok, g) => tok -> g.size.toLong }
    val qterms = df.toSeq.sortBy { case (tok, n) => (-n, tok) }.slice(9, 14).toMap
    val n = texts.length.toLong
    val dl = texts.map { case (id, t) => id -> toks(t).size.toLong }.toMap
    val t = dl.values.sum
    val expected = tf.filter(r => qterms.contains(r._2))
      .groupBy(_._1).map { case (id, rows) =>
        val score = rows.map { case (_, tok, f) =>
          val dfv = qterms(tok)
          val idfQ = ((2 * n - 2 * dfv + 1) * 1000000L) / (2 * dfv + 1)
          val ratioQ = (2200L * f * 1000L) /
            (1000L * f + 300L + (900L * dl(id) * n) / t)
          (idfQ * ratioQ) / 1000L
        }.sum
        (id, rows.size.toLong, score)
      }.toSeq.sortBy { case (id, _, s) => (-s, id) }.take(25)
    val got = graft.queries.Pipeline.bm25TopK(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === expected)
  }

  test("temperature sampling: w_q is the exact integer sqrt, shares from a naive model") {
    val dir = "/root/testdata/sf0.001"
    // independent isqrt: binary search, no floating point at all
    def isqrt(n: Long): Long = {
      var lo = 0L; var hi = math.max(1L, n)
      while (lo < hi) {
        val mid = lo + (hi - lo + 1) / 2
        if (mid <= n / mid && mid * mid <= n) lo = mid else hi = mid - 1
      }
      lo
    }
    val texts = graft.Tables.documents(spark, dir)
      .select(col("source"), col("text")).collect()
      .map(r => r.getString(0) -> r.getString(1))
    def ntok(t: String): Long =
      if (t.trim.isEmpty) 0L else t.trim.split("\\s+").length.toLong
    val per = texts.groupBy(_._1).map { case (src, rows) =>
      (src, rows.length.toLong, rows.map(r => ntok(r._2)).sum)
    }.toSeq
    val sw = per.map(p => isqrt(p._3)).sum
    val st = per.map(_._3).sum
    val expected = per.map { case (src, nd, nt) =>
      val w = isqrt(nt)
      (src, nd, nt, w, (w * 1000000L) / sw, ((st / 2L) * w) / sw)
    }.sortBy(_._1)
    val got = graft.queries.Pipeline.sampTemperature(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got === expected)
  }

  test("isqrt correction survives perfect-square boundaries (k², k²±1)") {
    // drive the exact SQL expression the query uses over the hard cases
    val ks = Seq(1L, 2L, 3L, 1000L, 94906265L /* ~sqrt(2^53) */)
    val ns = ks.flatMap(k => Seq(k * k - 1, k * k, k * k + 1)).filter(_ >= 0)
    val rows = ns.toDF("n")
      .withColumn("s0", expr("CAST(floor(sqrt(CAST(n AS DOUBLE))) AS BIGINT)"))
      .withColumn("s", expr(
        "s0 + (CASE WHEN (s0 + 1) * (s0 + 1) <= n THEN 1 " +
          "WHEN s0 * s0 > n THEN -1 ELSE 0 END)"))
      .collect().map(r => r.getLong(0) -> r.getLong(2))
    rows.foreach { case (n, s) =>
      assert(s * s <= n && (s + 1) * (s + 1) > n, s"isqrt($n) = $s is wrong")
    }
  }

  test("matryoshka hits parity with a naive prefix-dot model on sf0.001") {
    val dir = "/root/testdata/sf0.001"
    val vecs = graft.Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(x =>
        math.floor(x.toDouble * 1000.0).toLong).toArray)
    def top10(dims: Int, qid: Long): Seq[Long] = {
      val q = vecs.find(_._1 == qid).get._2
      vecs.filter(_._1 != qid).map { case (id, v) =>
        id -> (0 until dims).map(d => q(d) * v(d)).sum
      }.sortBy { case (id, s) => (-s, id) }.take(10).map(_._1)
    }
    val expected = vecs.map(_._1).filter(_ % 100 == 0).sorted.map { qid =>
      val full = top10(vecs.head._2.length, qid)
      val s16 = top10(16, qid).toSet
      val s32 = top10(32, qid).toSet
      (qid, full.size.toLong, full.count(s16).toLong, full.count(s32).toLong)
    }.toSeq
    val got = graft.queries.Pipeline.embMatryoshka(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got === expected)
  }

  test("hot spans parity with a naive shingle model on sf0.001") {
    val dir = "/root/testdata/sf0.001"
    val texts = graft.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1))
    def shingles(t: String): Seq[String] = {
      val toks = if (t.trim.isEmpty) Vector.empty else t.trim.split("\\s+").toVector
      if (toks.isEmpty) Seq.empty
      else if (toks.size < 4) Seq(toks.mkString(" "))
      else toks.sliding(4).map(_.mkString(" ")).toSeq
    }
    val expected = texts.flatMap { case (id, t) => shingles(t).distinct.map(_ -> id) }
      .groupBy(_._1).map { case (s, g) => (s, g.length.toLong, g.map(_._2).min) }
      .filter(_._2 >= 2L).toSeq
      .sortBy { case (s, df, _) => (-df, s) }.take(20)
    val got = graft.queries.Pipeline.hotSpans(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === expected)
  }

  test("chunking parity with a naive sliding-window model") {
    val words = Vector("alpha", "beta", "gamma", "delta", "eps")
    // lengths straddling every boundary case: < width, == width, width+1,
    // exact multiple of stride past width, and a long tail
    val docs = Seq(1, 7, 8, 9, 12, 16, 17, 25, 60).zipWithIndex.map { case (n, i) =>
      (i.toLong, (0 until n).map(j => words((i + j) % words.size)).mkString(" "))
    }
    val (width, stride) = (8, 5)
    val got = graft.queries.Pipeline.chunkingOf(docs.toDF("doc_id", "text"), width, stride)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getString(3))).toSet
    val expected = docs.flatMap { case (id, text) =>
      val toks = text.trim.split("\\s+").toVector
      val nChunks = if (toks.size <= width) 1
        else 1 + (toks.size - width + stride - 1) / stride
      (0 until nChunks).map { i =>
        val chunk = toks.slice(i * stride, i * stride + width)
        (id, i, chunk.size.toLong,
          java.security.MessageDigest.getInstance("MD5")
            .digest(chunk.mkString(" ").getBytes("UTF-8"))
            .map("%02x".format(_)).mkString)
      }
    }.toSet
    assert(got === expected)
  }
}
