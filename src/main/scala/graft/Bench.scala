package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query against
  * `SPARK_GRAFT_SF_DIR` and prints ONE JSON line.
  *
  * Robustness (round-2 hardening):
  *   - fixed query order (sorted by name) so runs are comparable;
  *   - median of 3 timed runs per query — a single noisy pass (host
  *     contention, cold page cache) cannot distort the round-over-round
  *     comparison;
  *   - failures are NOT swallowed: a failing query reports -1 with its
  *     error class in an `"errors"` map and the process exits nonzero,
  *     so a broken query can never masquerade as a fast one.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JVM/codegen warmup on the smallest SF so steady-state per-query cost
    // is measured rather than first-touch JIT/classloading (which otherwise
    // lands arbitrarily on whichever query runs first).
    val warmDir = "/root/testdata/sf0.001"
    if (new java.io.File(warmDir).isDirectory) {
      Seq("q1_pricing_summary", "q3_join_agg", "q4_window_rank", "evt_lww_state",
        "text_token_stats", "ann_brute_topk", "dedup_minhash_lsh", "text_langid")
        .foreach { n =>
          SparkEntry.queries.get(n).foreach(fn =>
            try fn(spark, warmDir).count() catch { case _: Throwable => () })
        }
    }
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val times = (1 to runs).flatMap { _ =>
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).count()
          Some((System.nanoTime() - t0) / 1e9)
        } catch {
          case e: Throwable =>
            errors(name) = e.getClass.getSimpleName + ": " +
              Option(e.getMessage).getOrElse("").take(120).replaceAll("[\"\\n\\\\]", " ")
            None
        }
      }
      val median =
        if (times.isEmpty) -1.0
        else times.sorted.apply(times.size / 2)
      name -> median
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errJson = errors.map { case (k, v) => s"\"$k\":\"$v\"" }.mkString("{", ",", "}")
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errJson,"runs":$runs,"sf":"$sfDir"}""")
    spark.stop()
    if (errors.nonEmpty) sys.exit(1)
  }
}
