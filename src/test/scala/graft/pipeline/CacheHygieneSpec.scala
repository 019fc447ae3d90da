package graft.pipeline

import graft.{SparkEntry, SparkTestBase}

/** No pipeline operator may leak cached blocks past its own invocation
  * (VERDICT r4 #4): a long-lived session composing operators — exactly
  * what pipeline_keep encourages — must not accumulate block-manager debt
  * (the failure class behind the round-3 bench swings). Mirrors the
  * Incremental.step reaper proof: snapshot the persisted-RDD set, build
  * AND materialize the query, assert no new persistent RDDs remain.
  */
class CacheHygieneSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  // the operators that persist internally (minhash buckets, cluster edge
  // frames, the shared keepBase scan) plus a plain one as control;
  // r10 additions: the iterative BFS (whose caching variants were
  // measured and rejected — this pins that no persist crept back), the
  // heaviest kernel join, and two of the new wave
  private val covered = Seq("dedup_minhash_lsh", "dedup_clusters",
    "dedup_best_rep", "pipeline_keep", "contamination_ngram",
    "graph_khop", "dedup_editdist", "ann_knn_classify", "text_chunking",
    // r11 additions: kmeans persists the quantized point set across Lloyd
    // iterations; the other three as controls
    "ann_kmeans", "contamination_substring", "pipeline_url_canon",
    "pipeline_host_caps",
    // the converged BFS checkpoints per level; the query must release
    // every block via the releasable variant's thunk before returning
    "graph_reach_conv")

  covered.foreach { name =>
    test(s"$name releases every cached block it created") {
      val sc = spark.sparkContext
      val before = sc.getPersistentRDDs.keySet
      val df = SparkEntry.queries(name)(spark, dir)
      df.count()
      val leaked = sc.getPersistentRDDs.keySet -- before
      assert(leaked.isEmpty,
        s"$name left ${leaked.size} persistent RDD(s) cached: ids $leaked")
    }
  }
}
