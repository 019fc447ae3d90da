package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (ARRAY<FLOAT>).
  *
  * Baseline: brute-force cosine top-k — a broadcast of the (small) query
  * set against the full corpus, all math in higher-order functions inside
  * whole-stage codegen, followed by a per-query top-k window. At 100 TB the
  * corpus side stays partitioned; only queries broadcast.
  *
  * Scale path: LSH bucketing via random-hyperplane signs (SimHash for
  * vectors) — candidates only within matching buckets, turning all-pairs
  * into a bucket-keyed shuffle; and an IVF-style variant that assigns each
  * vector to its nearest of `nlist` fixed probe directions and searches
  * only matching lists.
  *
  * Determinism note for oracle parity: quantized dot products
  * (floor(x*1000) INT per component, BIGINT sums) are exact integer math —
  * identical in any engine and insensitive to summation order;
  * double-precision cosine is kept for production use.
  */
object Vectors {

  /** Exact double-precision dot product of two ARRAY<FLOAT/DOUBLE>. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity (0 when either norm is 0). */
  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val n = norm(a) * norm(b)
    when(n === 0, lit(0.0)).otherwise(d / n)
  }

  /** Order-insensitive exact similarity: quantize each component to
    * floor(x*1000) and sum component products as BIGINT.
    *
    * Implemented as a Scala UDF rather than transform/zip_with/aggregate:
    * higher-order-function lambdas evaluate interpreted per element (~µs
    * each with boxing), while one JIT'd loop per row is ~100× faster on
    * 64-dim vectors — measured 36 s → ~1 s on the sf0.1 ANN benchmark.
    * Semantics are exactly floor(x·1000) per component, Σ products —
    * identical to the SQL-expressible form used by the DuckDB oracle. */
  private val quantizedDotFn = udf { (a: Seq[Float], b: Seq[Float]) =>
    var s = 0L
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) {
      s += math.floor(a(i).toDouble * 1000).toLong * math.floor(b(i).toDouble * 1000).toLong
      i += 1
    }
    s
  }
  def quantizedDot(a: Column, b: Column): Column = quantizedDotFn(a, b)

  /** Random-hyperplane LSH bucket: sign bits of dot products against
    * `nPlanes` pseudo-random hyperplanes derived deterministically from a
    * seed (splitmix64-mixed per (plane, component) — no stored model).
    * Scala UDF for the same reason as [[quantizedDot]]: one JIT'd loop per
    * row instead of nPlanes × dim interpreted lambda evaluations. */
  def hyperplaneBucket(vec: Column, nPlanes: Int, seed: Int = 42): Column = {
    val fn = udf { (v: Seq[Float]) =>
      var bucket = 0L
      var p = 0
      while (p < nPlanes) {
        var s = 0.0
        var i = 0
        while (i < v.length) {
          // splitmix64 of (seed, plane, idx) → ±1 weight
          var z = seed.toLong * 0x9E3779B97F4A7C15L + p.toLong * 0xBF58476D1CE4E5B9L + i.toLong
          z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
          z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
          z = z ^ (z >>> 31)
          s += (if ((z & 1L) == 0L) v(i).toDouble else -v(i).toDouble)
          i += 1
        }
        if (s > 0) bucket |= (1L << p)
        p += 1
      }
      bucket
    }
    fn(vec)
  }

  /** Brute-force top-k neighbors for a query subset.
    *
    * @param emb   (vec_id BIGINT, embedding ARRAY<FLOAT>) corpus
    * @param isQuery predicate over vec_id selecting the query set (small)
    * @param k     neighbors per query
    * @return (query_id, neighbor_id, sim_q BIGINT quantized similarity, rank)
    */
  def bruteForceTopK(emb: DataFrame, isQuery: Column => Column, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val queries = emb.filter(isQuery(col("vec_id")))
      .select(col("vec_id").as("query_id"), col("embedding").as("q"))
    // repartition: the dot-product kernel is CPU-bound and small parquet
    // inputs may be a single partition
    val corpus = emb.repartition(col("vec_id"))
      .select(col("vec_id").as("neighbor_id"), col("embedding").as("c"))
    val scored = corpus.join(broadcast(queries), col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), quantizedDot(col("q"), col("c")).as("sim_q"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim_q").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w).cast("int"))
      .filter(col("rank") <= k)
  }

  /** IVF-style coarse quantization: assign each vector to its
    * highest-scoring of `nlist` fixed probe directions (deterministic
    * pseudo-random ±1 directions from a seed — a stand-in for trained
    * centroids; the operator shape is identical). One JIT'd pass per row.
    */
  def ivfListId(vec: Column, nlist: Int, seed: Int = 77): Column = {
    val fn = udf { (v: Seq[Float]) =>
      var best = 0
      var bestScore = Double.MinValue
      var l = 0
      while (l < nlist) {
        var s = 0.0
        var i = 0
        while (i < v.length) {
          var z = seed.toLong * 0x9E3779B97F4A7C15L + l.toLong * 0xBF58476D1CE4E5B9L + i.toLong
          z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
          z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
          z = z ^ (z >>> 31)
          s += (if ((z & 1L) == 0L) v(i).toDouble else -v(i).toDouble)
          i += 1
        }
        if (s > bestScore) { bestScore = s; best = l }
        l += 1
      }
      best
    }
    fn(vec)
  }

  /** IVF top-k: queries search only vectors assigned to the same coarse
    * list (single-probe). The list id keys the shuffle — the standard
    * inverted-file ANN shape: at 100 TB the corpus is partitioned by list
    * and only matching partitions are scanned per query. Same output
    * contract as [[bruteForceTopK]].
    */
  def ivfTopK(emb: DataFrame, isQuery: Column => Column, k: Int, nlist: Int = 16): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val withList = emb.repartition(col("vec_id"))
      .select(col("vec_id"), col("embedding"), ivfListId(col("embedding"), nlist).as("list_id"))
    val queries = withList.filter(isQuery(col("vec_id")))
      .select(col("vec_id").as("query_id"), col("embedding").as("q"), col("list_id"))
    val corpus = withList
      .select(col("vec_id").as("neighbor_id"), col("embedding").as("c"), col("list_id"))
    val scored = corpus.join(broadcast(queries), Seq("list_id"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), quantizedDot(col("q"), col("c")).as("sim_q"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim_q").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w).cast("int"))
      .filter(col("rank") <= k)
  }

  /** LSH-bucketed approximate top-k: same contract as [[bruteForceTopK]]
    * but candidates restricted to the query's hyperplane bucket —
    * the bucket id becomes the shuffle key, so the corpus is never
    * broadcast-joined in full at scale.
    */
  def lshTopK(emb: DataFrame, isQuery: Column => Column, k: Int, nPlanes: Int = 8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val withBucket = emb.select(col("vec_id"), col("embedding"),
      hyperplaneBucket(col("embedding"), nPlanes).as("bucket"))
    val queries = withBucket.filter(isQuery(col("vec_id")))
      .select(col("vec_id").as("query_id"), col("embedding").as("q"), col("bucket"))
    val corpus = withBucket
      .select(col("vec_id").as("neighbor_id"), col("embedding").as("c"), col("bucket"))
    val scored = corpus.join(queries, Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), quantizedDot(col("q"), col("c")).as("sim_q"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim_q").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w).cast("int"))
      .filter(col("rank") <= k)
  }
}
