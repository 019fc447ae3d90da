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
    * r10: native codegen'd Catalyst expression
    * ([[graft.functions.QuantizedDotExpr]]) — the loop runs over Tungsten
    * `ArrayData` inside whole-stage codegen, replacing the Scala UDF
    * (which itself replaced interpreted zip_with/aggregate lambdas,
    * measured 36 s → ~1 s on the sf0.1 ANN benchmark; the UDF still paid
    * an ArrayData→Seq conversion + a codegen fence per call site).
    * Semantics are exactly floor(x·1000) per component, Σ products —
    * identical to the SQL-expressible form used by the DuckDB oracle. */
  def quantizedDot(a: Column, b: Column): Column =
    graft.functions.QuantizedDotExpr.quantizedDot(a, b)

  /** Overflow guard for quantized-cosine compares (ADVICE r7): the dedup
    * queries compare `dot_q·dot_q·100 ≥ na_q·nb_q·16` in LongType, while
    * the DuckDB oracle's list products promote to HUGEINT (128-bit) — a
    * silent 64-bit wrap on the Spark side would surface only as a
    * confusing hash mismatch. By Cauchy–Schwarz over the quantized
    * INTEGER vectors, dot_q² ≤ na_q·nb_q exactly, so bounding every
    * self-dot at [[MaxNormQ]] bounds both compare operands:
    * (2.9e8)²·100 ≈ 8.4e18 < 2⁶³−1. Unit-norm embeddings sit at
    * nq ≈ 1e6 — two orders under the bound; a corpus that trips it needs
    * a Decimal-side compare, and this raise makes that loud. */
  val MaxNormQ = 290000000L
  def checkedNormQ(nq: Column): Column =
    when(nq > lit(MaxNormQ), raise_error(concat(
      lit("quantized self-dot overflow hazard: nq="), nq.cast("string"),
      lit(s" > $MaxNormQ — the Long cosine compare could wrap; use a Decimal compare"))))
      .otherwise(nq)

  /** Vectors longer than this are truncated by the hyperplane LSH — the
    * ±1 weight matrices are pre-materialized to this width so the per-row
    * work is pure dot products. */
  val MaxLshDim = 4096

  /** ±1 hyperplane weights, derived deterministically from `seed`
    * (splitmix64-mixed per (plane, component) — no stored model).
    * Pre-materialized ONCE at plan time and captured in the UDF closure:
    * the splitmix chain costs ~25 ops per weight, so recomputing it per
    * ROW (as a naive implementation would) multiplies the per-row cost
    * ~60×; hoisted, each row is nPlanes × dim fused multiply-adds. */
  private def planeWeights(nPlanes: Int, seed: Int, dim: Int): Array[Array[Double]] =
    Array.tabulate(nPlanes) { p =>
      Array.tabulate(dim) { i =>
        var z = seed.toLong * 0x9E3779B97F4A7C15L + p.toLong * 0xBF58476D1CE4E5B9L + i.toLong
        z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
        z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
        z = z ^ (z >>> 31)
        if ((z & 1L) == 0L) 1.0 else -1.0
      }
    }

  /** Sign-bit signature of `v` against pre-materialized plane weights. */
  private def sigFromWeights(v: Seq[Float], w: Array[Array[Double]]): Long = {
    var bucket = 0L
    var p = 0
    while (p < w.length) {
      val wp = w(p)
      var s = 0.0
      var i = 0
      val n = math.min(v.length, wp.length)
      while (i < n) { s += wp(i) * v(i); i += 1 }
      if (s > 0) bucket |= (1L << p)
      p += 1
    }
    bucket
  }

  /** Random-hyperplane LSH bucket as a column. Scala UDF for the same
    * reason as [[quantizedDot]]: one JIT'd loop per row instead of
    * nPlanes × dim interpreted lambda evaluations. */
  def hyperplaneBucket(vec: Column, nPlanes: Int, seed: Int = 42): Column = {
    require(nPlanes >= 1 && nPlanes <= 63,
      s"nPlanes must be in [1, 63] (sign bits of one long): $nPlanes")
    val w = planeWeights(nPlanes, seed, MaxLshDim)
    val fn = udf { (v: Seq[Float]) => sigFromWeights(v, w) }
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
    // conditional spread: the dot-product kernel is CPU-bound and small
    // parquet inputs may be a single partition; explicit size-derived
    // count so AQE's byte-based coalescing cannot re-serialize it (r16:
    // width from scan bytes, not the core-count constant)
    val corpus = graft.Tables.cpuSpread(emb, "vec_id")
      .select(col("vec_id").as("neighbor_id"), col("embedding").as("c"))
    val scored = corpus.join(broadcast(queries), col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), quantizedDot(col("q"), col("c")).as("sim_q"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim_q").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w).cast("int"))
      .filter(col("rank") <= k)
  }

  /** Sign-threshold binary codes — each embedding collapses to
    * ⌈dims/64⌉ packed longs with bit d set iff its quantized component
    * exceeds the corpus mean of dimension d (binary/sign quantization:
    * ×32 less vector memory than float32 and Hamming retrieval at one
    * XOR+POPCNT per word — the cheapest rung of the compression ladder
    * under [[graft.queries.Pipeline]]'s sq8/PQ/Matryoshka operators).
    *
    * Exact-integer contract: components quantize to floor(x·1000) (the
    * suite-wide convention) and the threshold compare is
    * `q_d · n > Σ_d` — a MULTIPLY, never a mean division, because Spark
    * `div` truncates toward zero while DuckDB `//` floors, and per-dim
    * sums of centered embeddings go negative. Strictly-greater, so a
    * dimension exactly at its mean reads 0 on both engines.
    *
    * Scale shape: the per-dim sums accumulate like the PCA Gram — one
    * corpus scan folding each partition into a single (dims+1)-long
    * array (sums + row count), with only those ~8·dims-byte partials
    * combining on the driver (`treeAggregate`); the packer is then one
    * JIT'd pass per row with the sums hoisted into the closure (the
    * hyperplaneBucket precedent). `addExact`/`multiplyExact` fail fast
    * where the oracle's HUGEINT would keep counting — q ≤ ~2·10³ at the
    * ×1000 quantization bounds both products inside int64 past 10¹⁵
    * rows.
    *
    * @return (vec_id BIGINT, code ARRAY<BIGINT> of ⌈dims/64⌉ words)
    */
  def binaryCodes(emb: DataFrame): DataFrame = {
    val qv = emb.select(col("vec_id"), transform(col("embedding"),
      x => floor(x.cast("double") * 1000).cast("long")).as("qv"))
    val dimRows = qv.select(size(col("qv"))).limit(1).collect()
    require(dimRows.nonEmpty, "binaryCodes: empty embeddings table")
    val dims = dimRows(0).getInt(0)
    require(dims >= 1, s"binaryCodes: zero-length embedding")
    val acc = qv.select(col("qv")).rdd
      .map(_.getSeq[Long](0).toArray)
      .treeAggregate(new Array[Long](dims + 1))(
        (a, v) => {
          require(v.length == dims,
            s"binaryCodes: ragged embedding — expected $dims dims, got ${v.length}")
          var i = 0
          while (i < dims) { a(i) = Math.addExact(a(i), v(i)); i += 1 }
          a(dims) += 1
          a
        },
        (a, b) => {
          var i = 0
          while (i <= dims) { a(i) = Math.addExact(a(i), b(i)); i += 1 }
          a
        })
    val n = acc(dims)
    require(n > 0, "binaryCodes: empty embeddings table")
    val sums = java.util.Arrays.copyOf(acc, dims)
    val words = (dims + 63) / 64
    val pack = udf { (v: Array[Long]) =>
      require(v.length == dims,
        s"binaryCodes: ragged embedding — expected $dims dims, got ${v.length}")
      val w = new Array[Long](words)
      var d = 0
      while (d < dims) {
        if (Math.multiplyExact(v(d), n) > sums(d)) w(d >> 6) |= 1L << (d & 63)
        d += 1
      }
      w
    }
    qv.select(col("vec_id"), pack(col("qv")).as("code"))
  }

  /** Hamming top-k over [[binaryCodes]] output — the binary-embedding
    * twin of [[bruteForceTopK]]: bounded query codes broadcast against
    * the repartitioned corpus, distance via the codegen'd
    * [[graft.functions.HammingDistExpr]] (one XOR+POPCNT per word inside
    * whole-stage codegen), per-query top-k window ordered (hamming ASC,
    * neighbor ASC) — ties total, so the ranking is engine-portable.
    *
    * @param codes (vec_id BIGINT, code ARRAY<BIGINT>) from [[binaryCodes]]
    * @return (query_id, neighbor_id, hamming BIGINT, rank INT)
    */
  def hammingTopK(codes: DataFrame, isQuery: Column => Column, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val queries = codes.filter(isQuery(col("vec_id")))
      .select(col("vec_id").as("query_id"), col("code").as("qc"))
    val corpus = graft.Tables.cpuSpread(codes, "vec_id")
      .select(col("vec_id").as("neighbor_id"), col("code").as("c"))
    val scored = corpus.join(broadcast(queries), col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        graft.functions.HammingDistExpr.hammingDist(col("qc"), col("c")).as("hamming"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("hamming"), col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w).cast("int"))
      .filter(col("rank") <= k)
  }

  /** Train `k` coarse-quantizer centroids with Lloyd's iterations over a
    * deterministic, bounded driver-side sample (every `sampleMod`-th
    * vec_id, ordered, capped at `maxSample`). This is standard IVF
    * training: centroids come from a small sample, assignment of the full
    * corpus stays distributed. Deterministic end to end (seeded by the
    * sampling rule and id order) so runs are reproducible. */
  def trainCentroids(emb: DataFrame, idCol: String, vecCol: String, k: Int,
      sampleMod: Int = 7, maxSample: Int = 4096, iters: Int = 8): Array[Array[Double]] = {
    val sample = emb.filter(pmod(col(idCol), lit(sampleMod)) === 0)
      .orderBy(col(idCol)).limit(maxSample)
      .select(col(vecCol)).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    require(sample.nonEmpty, "empty training sample")
    val dim = sample.head.length
    // init: evenly strided sample points (deterministic k-means++ stand-in)
    var centroids = Array.tabulate(math.min(k, sample.length))(i =>
      sample((i.toLong * sample.length / math.min(k, sample.length)).toInt).clone())
    (0 until iters).foreach { _ =>
      val sums = Array.fill(centroids.length)(new Array[Double](dim))
      val counts = new Array[Long](centroids.length)
      sample.foreach { v =>
        var best = 0; var bestD = Double.MaxValue
        var c = 0
        while (c < centroids.length) {
          var d = 0.0; var i = 0
          while (i < dim) { val t = v(i) - centroids(c)(i); d += t * t; i += 1 }
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        var i = 0
        while (i < dim) { sums(best)(i) += v(i); i += 1 }
        counts(best) += 1
      }
      centroids = centroids.zipWithIndex.map { case (old, c) =>
        if (counts(c) == 0) old
        else Array.tabulate(dim)(i => sums(c)(i) / counts(c))
      }
    }
    centroids
  }

  /** Top-`nprobe` nearest centroid ids for a vector (L2), as an array —
    * one JIT'd pass per row. nprobe=1 gives the assignment list id. */
  def centroidProbes(vec: Column, centroids: Array[Array[Double]], nprobe: Int): Column = {
    val fn = udf { (v: Seq[Float]) =>
      val k = centroids.length
      val dists = new Array[Double](k)
      var c = 0
      while (c < k) {
        var d = 0.0; var i = 0
        val cent = centroids(c); val n = math.min(v.length, cent.length)
        while (i < n) { val t = v(i).toDouble - cent(i); d += t * t; i += 1 }
        dists(c) = d; c += 1
      }
      (0 until k).sortBy(i => (dists(i), i)).take(math.min(nprobe, k)).toArray
    }
    fn(vec)
  }

  /** IVF top-k with trained centroids + multi-probe (VERDICT r2 #9):
    * corpus vectors are assigned to their nearest centroid's inverted
    * list (distributed, one list each); each query probes its `nprobe`
    * nearest lists. The list id keys the shuffle — the standard
    * inverted-file ANN shape: at 100 TB the corpus is partitioned by list
    * and only probed partitions are scanned per query. A neighbor sits in
    * exactly one list, so probe fan-out never duplicates (query, neighbor)
    * pairs. Same output contract as [[bruteForceTopK]].
    */
  def ivfTopK(emb: DataFrame, isQuery: Column => Column, k: Int,
      nlist: Int = 16, nprobe: Int = 4): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cents = trainCentroids(emb, "vec_id", "embedding", nlist)
    val corpus = graft.Tables.cpuSpread(emb, "vec_id")
      .select(col("vec_id").as("neighbor_id"), col("embedding").as("c"),
        element_at(centroidProbes(col("embedding"), cents, 1), 1).as("list_id"))
    val queries = emb.filter(isQuery(col("vec_id")))
      .select(col("vec_id").as("query_id"), col("embedding").as("q"),
        explode(centroidProbes(col("embedding"), cents, nprobe)).as("list_id"))
    val scored = corpus.join(broadcast(queries), Seq("list_id"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), quantizedDot(col("q"), col("c")).as("sim_q"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim_q").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w).cast("int"))
      .filter(col("rank") <= k)
  }

  /** Distributed Lloyd's over QUANTIZED vectors — the embedding
    * pipeline's clustering primitive beyond [[trainCentroids]]' bounded
    * driver-side IVF training pass (VERDICT r10 #9): here ASSIGNMENT and
    * the centroid UPDATE aggregation both run distributed; the driver
    * only syncs the k×dim centroid table between iterations (the
    * classical Lloyd driver-sync, k·dim rows — bounded regardless of
    * corpus size).
    *
    * All arithmetic is exact-integer over floor(x·1000) quantized
    * components, with centroid means floor-divided ((s − pmod(s, n)) / n,
    * the nonnegative-mod floor division both engines can express
    * identically), so a DuckDB oracle reproduces every assignment and SSE
    * bit-for-bit — the verify-gate trick the quantized-dot kernels
    * already use. Ties (two centroids at equal distance) resolve to the
    * smaller cluster id via the combined `d·k + cid` key.
    *
    * Scale shape per iteration: one row-local assignment pass (JIT'd UDF
    * loop over the closure-captured k×dim centroid table — same pattern
    * as [[centroidProbes]]) + one (cid, idx)-keyed aggregation with
    * map-side combine (k·dim groups). The point set is cached across
    * iterations and released before return.
    *
    * @return per-point final assignment: (idCol, cluster_id, dist_q) —
    *         `dist_q` the quantized squared L2 distance to the assigned
    *         centroid after the LAST assignment pass.
    */
  /** One farthest-point seeding round's min-distance update: fold the
    * newest centroid into the running `__bestd` via the codegen'd
    * [[graft.functions.LongSqDistExpr]] — factored out so the
    * no-UDF-on-the-seeding-scan contract is directly plan-pinnable
    * (KmeansSpec). */
  private[graft] def seedDistUpdate(cur: DataFrame, lastV: Array[Long]): DataFrame =
    cur.withColumn("__bestd", least(col("__bestd"),
      graft.functions.LongSqDistExpr.sqDist(col("__v"), typedLit(lastV.toSeq))))

  /** One seeding round's argmax frame: chosen ids anti-joined away
    * (broadcast — the frame is ≤ k rows), then the single-row
    * max((d, −id, v)) aggregate. */
  private[graft] def seedArgmaxFrame(cur: DataFrame, chosenDf: DataFrame): DataFrame =
    cur.join(broadcast(chosenDf), col("__id") === col("__cid"), "left_anti")
      .select(struct(col("__bestd").as("d"),
        (lit(0L) - col("__id")).as("nid"), col("__v").as("v")).as("s"))
      .agg(max(col("s")))

  def kmeansQuantized(emb: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int, seeding: String = "farthest",
      maxLocalSeedRows: Long = 100000L): DataFrame =
    kmeansQuantizedCore(
      emb.select(col(idCol), transform(col(vecCol),
        x => floor(x.cast("double") * lit(1000.0)).cast("long")).as("__v")),
      idCol, k, iters, seeding, maxLocalSeedRows)._1

  /** [[kmeansQuantized]] over PRE-QUANTIZED long vectors, also returning
    * the final centroid block — the residual-quantization entry point
    * (emb_rq_codes): RVQ's second level clusters integer residuals, and
    * re-routing them through the float×1000 quantization would corrupt
    * them (r/1000·1000 in doubles is not the identity). Same seeding,
    * assignment, and floor-divided update as the float path — the ONLY
    * difference is skipping the quantization projection. */
  private[graft] def kmeansLongs(pre: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int, seeding: String = "farthest",
      maxLocalSeedRows: Long = 100000L): (DataFrame, Array[(Long, Array[Long])]) =
    kmeansQuantizedCore(pre.select(col(idCol), col(vecCol).as("__v")),
      idCol, k, iters, seeding, maxLocalSeedRows)

  private def kmeansQuantizedCore(qIn: DataFrame, idCol: String,
      k: Int, iters: Int, seeding: String,
      maxLocalSeedRows: Long): (DataFrame, Array[(Long, Array[Long])]) = {
    // k ≤ 2^20 keeps the packed `d·k + cid` key inside a Long for any
    // quantized distance below 2^43 (≈8.8e12 — e.g. 8,800 dims of
    // full-range ±1.0 components at the ×1000 quantization). The
    // assignment kernel still fails FAST (require below) rather than
    // silently wrapping if a pathological vector exceeds it (ADVICE r11).
    require(k >= 1 && k <= (1 << 20) && iters >= 1, s"bad kmeans params k=$k iters=$iters")
    require(seeding == "farthest" || seeding == "minids" || seeding == "hashids",
      s"bad seeding: $seeding")
    // quantized-vector rows the farthest-point seeder will collect for
    // the driver-local traversal: ≤ ~25 MB at 32 dims (8 B/component)
    // at the default gate; the parameter exists so KmeansSpec can force
    // the distributed rounds on a small fixture
    require(maxLocalSeedRows >= 0, s"bad maxLocalSeedRows=$maxLocalSeedRows")
    val q = qIn
    q.persist()
    try {
      // Deterministic seeding (VERDICT r12 #9). "farthest" (default) is
      // the derandomized k-means++ — greedy farthest-point traversal:
      // c0 = the smallest id's vector, then k−1 rounds of "the point
      // maximizing its min squared distance to the chosen set" (tie →
      // smallest id). Pure exact-integer argmax both engines reproduce
      // (the ann_kmeans oracle unrolls the same k−1 steps in SQL), and
      // spread-out seeds give Lloyd a far better start than an id-order
      // block. Each round is one bounded aggregate over the persisted
      // quantized frame (max of a (dist, −id) struct: one row to the
      // driver) + one indexed fetch — k passes total, no pairwise work.
      // "minids" keeps the legacy k-smallest-ids block (the overflow
      // spec uses it to place seeds AWAY from an extreme outlier).
      // "hashids" is the LARGE-k mode (adaptive SemDeDup, k in the
      // thousands): seeds = the k rows with the smallest
      // (xxhash64(id), id) — a deterministic uniform sample (hash order
      // is uncorrelated with geometry), i.e. classic random kmeans
      // init made engine-reproducible, in ONE TakeOrdered pass where
      // farthest-point would need k sequential scan rounds.
      var centroids: Array[(Long, Array[Long])] =
        if (seeding == "minids") {
          val picked = q.orderBy(col(idCol)).limit(k).collect()
          require(picked.length == k,
            s"kmeans: k=$k exceeds the available point count ${picked.length}")
          picked.zipWithIndex
            .map { case (r, i) => (i.toLong, r.getSeq[Long](1).toArray) }
        } else if (seeding == "hashids") {
          val picked = q.select(col(idCol), col("__v"))
            .orderBy(xxhash64(col(idCol)), col(idCol)).limit(k).collect()
          // fail-fast parity with the farthest path (ADVICE r14): fewer
          // rows than k would silently return a short centroid block
          // (empty clusters downstream). Duplicate VECTORS are fine —
          // hash order samples rows, and Lloyd merges coincident
          // centroids on the first update — but the ROW count must be k.
          require(picked.length == k,
            s"kmeans: k=$k exceeds the available point count ${picked.length}")
          picked.zipWithIndex
            .map { case (r, i) => (i.toLong, r.getSeq[Long](1).toArray) }
        } else if (q.count() <= maxLocalSeedRows) {
          // size-gated LOCAL traversal (the minhashVerified gate idiom):
          // under the cap the greedy argmax sequence runs driver-side on
          // one bounded collect of the already-persisted quantized frame
          // — k·n·dim integer ops, microseconds — instead of k−1
          // distributed argmax rounds whose per-job scheduling overhead
          // dwarfs the arithmetic (measured +1.4 s at sf0.1 before the
          // gate). Above the cap the distributed rounds scan — exactly
          // the regime where a scan is worth its overhead. Both paths
          // compute the IDENTICAL pick sequence.
          val pts: Array[(Long, Array[Long])] =
            q.select(col(idCol).cast("long"), col("__v")).collect()
              .map(r => (r.getLong(0), r.getSeq[Long](1).toArray)).sortBy(_._1)
          require(pts.length >= k, s"kmeans: k=$k exceeds point count ${pts.length}")
          val n = pts.length
          val bestD = Array.fill(n)(Long.MaxValue)
          val taken = Array.fill(n)(false)
          val buf = scala.collection.mutable.ArrayBuffer[(Long, Array[Long])](
            (0L, pts(0)._2))
          taken(0) = true
          var lastV = pts(0)._2
          while (buf.length < k) {
            var bi = -1; var bd = -1L
            var i = 0
            while (i < n) {
              if (!taken(i)) {
                val v = pts(i)._2
                var d = 0L; var j = 0; val m = math.min(v.length, lastV.length)
                while (j < m) { val t = v(j) - lastV(j); d += t * t; j += 1 }
                if (d < bestD(i)) bestD(i) = d
                if (bestD(i) > bd) { bd = bestD(i); bi = i } // tie → smaller id (first)
              }
              i += 1
            }
            taken(bi) = true
            lastV = pts(bi)._2
            buf += ((buf.length.toLong, lastV))
          }
          buf.toArray
        } else {
          // Distributed farthest-point rounds above the local gate
          // (VERDICT r13 #3 rewrite). min-distance-so-far is a
          // MATERIALIZED column updated once per round by the codegen'd
          // [[graft.functions.LongSqDistExpr]] against the newest
          // centroid literal (min over a set = min(prev, newest)) — no
          // interpreted per-row UDF on the scan, and O(k·n·dim) total
          // integer work instead of the O(k²·n·dim) the k-centroid
          // closure re-scan did. Chosen ids are excluded by a broadcast
          // ANTI-JOIN against a k-row frame, replacing the O(k)-literal
          // `isin` predicate (per-row O(k) evaluation AND per-round
          // O(k) analysis — un-plannable for k in the thousands). Each
          // round localCheckpoints (id, __v, __bestd): lineage stays one
          // node deep, and the previous round's blocks are released as
          // soon as the next is materialized.
          val spark = qIn.sparkSession
          val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, Array[Long])]
          val chosen = scala.collection.mutable.ArrayBuffer.empty[Long]
          val first = q.orderBy(col(idCol)).limit(1).collect().head
          buf += ((0L, first.getSeq[Long](1).toArray))
          chosen += first.getLong(0)
          var cur = q.select(col(idCol).cast("long").as("__id"), col("__v"))
            .withColumn("__bestd", lit(Long.MaxValue))
          var prevCp: Seq[Int] = Nil
          def persistedIds(df: DataFrame): Seq[Int] = {
            val queue = scala.collection.mutable.Queue[org.apache.spark.rdd.RDD[_]](df.rdd)
            val seen = scala.collection.mutable.Set.empty[Int]
            val out = scala.collection.mutable.ArrayBuffer.empty[Int]
            while (queue.nonEmpty) {
              val r = queue.dequeue()
              if (seen.add(r.id)) {
                if (r.getStorageLevel != org.apache.spark.storage.StorageLevel.NONE) out += r.id
                else queue ++= r.dependencies.map(_.rdd)
              }
            }
            out.toSeq
          }
          def release(ids: Seq[Int]): Unit =
            ids.foreach(id => spark.sparkContext.getPersistentRDDs.get(id).foreach { r =>
              r.unpersist(blocking = false); ()
            })
          try {
            while (buf.length < k) {
              val cp = seedDistUpdate(cur, buf.last._2).localCheckpoint()
              release(prevCp)
              prevCp = persistedIds(cp)
              cur = cp
              val chosenDf = spark.createDataset(chosen.toSeq)(
                org.apache.spark.sql.Encoders.scalaLong).toDF("__cid")
              // one aggregate per round: the winning VECTOR rides inside
              // the max struct (arrays are orderable but (d, −id) decides
              // — ids are unique), so no second lookup job per pick
              val row = seedArgmaxFrame(cur, chosenDf).head()
              require(!row.isNullAt(0),
                s"kmeans: k=$k exceeds the available point count ${buf.length}")
              val st = row.getStruct(0)
              buf += ((buf.length.toLong, st.getSeq[Long](2).toArray))
              chosen += -st.getLong(1)
            }
          } finally release(prevCp)
          buf.toArray
        }
      val kL = k.toLong
      def assigned(cents: Array[(Long, Array[Long])]): DataFrame = {
        // r15 (VERDICT r14 #3): the argmin runs in the codegen'd
        // [[graft.functions.KMeansAssignExpr]] — the centroid block and id
        // list ride as PLAN LITERALS (k is gate-bounded), the row vector
        // is read in place from Tungsten memory, and the Lloyd scan stays
        // inside whole-stage codegen. The closure UDF this replaces
        // fenced codegen on the hottest scan in the operator and copied
        // every vector into a fresh Array[Long] per row per iteration.
        // Packing, tie rule, and the overflow fail-fast are bit-identical.
        val blockCol = array(cents.map { case (_, cv) => lit(cv) }: _*)
        val cidCol = lit(cents.map(_._1))
        // integral `div` (not the double-returning `/`): exact for any
        // representable packed key, no 2^53 mantissa cliff (ADVICE r11)
        q.withColumn("__comb",
            graft.functions.KMeansAssignExpr.assign(col("__v"), blockCol, cidCol, kL))
          .withColumn("cluster_id", pmod(col("__comb"), lit(kL)))
          .withColumn("dist_q", expr(s"__comb div ${kL}L"))
      }
      for (_ <- 1 until iters) {
        // centroid update: floor-divided element-wise means, one keyed
        // aggregation; k·dim-row driver sync builds the next closure table
        val upd = assigned(centroids)
          .select(col("cluster_id"), posexplode(col("__v")).as(Seq("idx", "val")))
          .groupBy(col("cluster_id"), col("idx"))
          .agg(sum(col("val")).as("s"), count(lit(1)).as("cnt"))
          .select(col("cluster_id"), col("idx"),
            expr("(s - pmod(s, cnt)) div cnt").as("cq"))
          .collect()
        centroids = upd.groupBy(_.getLong(0)).toArray.sortBy(_._1).map { case (cid, rows) =>
          (cid, rows.sortBy(_.getInt(1)).map(_.getLong(2)).toArray)
        }
      }
      (assigned(centroids).select(col(idCol), col("cluster_id"), col("dist_q")),
        centroids)
    } finally {
      q.unpersist()
      ()
    }
  }

  /** Plane count sized to the corpus: log2(n / targetPerBucket), so
    * expected bucket occupancy — and the quadratic within-bucket pair
    * count — stays bounded as the corpus grows. Capped at
    * [[MaxBandPlanes]] (56 planes already address 7×10¹⁶ buckets — far
    * past any corpus — and the cap keeps [[bandSignatures]]' band-id bits
    * clear of the sign bits). */
  def autoPlanes(emb: DataFrame, targetPerBucket: Int = 32): Int = {
    val n = emb.count() // parquet footer-stats count: metadata-only at scale
    math.min(MaxBandPlanes,
      math.max(6, math.ceil(math.log(math.max(1.0, n.toDouble / targetPerBucket)) / math.log(2.0)).toInt))
  }

  /** Greatest plane count [[bandSignatures]] accepts: the band id occupies
    * bits 56–63 of the combined key, so sign bits must stay below bit 56 —
    * beyond that, distinct bands would silently alias into one bucket. */
  val MaxBandPlanes = 56

  /** All `nBands` band signatures of a vector in ONE pass (one JIT'd UDF
    * loop over pre-materialized weights), band id folded into the high
    * bits → a single long join key per (row, band). */
  def bandSignatures(vec: Column, nBands: Int, planes: Int): Column = {
    require(planes >= 1 && planes <= MaxBandPlanes,
      s"planes must be in [1, $MaxBandPlanes] (band id lives in bits 56-63): $planes")
    require(nBands >= 1 && nBands <= 255, s"nBands must fit the 8 band-id bits: $nBands")
    val ws = Array.tabulate(nBands)(band => planeWeights(planes, 42 + 1013 * band, MaxLshDim))
    val fn = udf { (v: Seq[Float]) =>
      Array.tabulate(nBands)(band => (band.toLong << 56) | sigFromWeights(v, ws(band)))
    }
    fn(vec)
  }

  /** Near-dup candidate pairs by multi-band hyperplane LSH (VERDICT r2 #6).
    *
    * Two scale levers the single-table fixed-width form lacked:
    *   - `nPlanes` grows with the corpus (log2(n / targetPerBucket)), so
    *     expected rows-per-bucket — and with them the quadratic
    *     within-bucket pair count — stay bounded as the corpus grows
    *     100×; at n = 10⁹ and target 32 this is ~25 planes, not 6.
    *   - `nBands` independent hash tables (distinct seeds) recover the
    *     recall that narrower buckets cost: a true near-dup pair only
    *     needs to collide in ONE band. Candidates are deduped across
    *     bands before the (expensive) exact verification.
    *
    * Returns distinct (id_a, id_b) with id_a < id_b. All band signatures
    * are computed in ONE pass over each vector (a single JIT'd UDF loop),
    * exploded, and joined once keyed by (band, bucket) — the corpus is
    * scanned twice (left/right side of the self-join), not 2 × nBands
    * times, and the shuffle key space is nBands × 2^planes buckets.
    * Never all-pairs.
    */
  def embeddingCandidates(emb: DataFrame, idCol: String, vecCol: String,
      nBands: Int = 4, nPlanes: Option[Int] = None,
      targetPerBucket: Int = 32): DataFrame = {
    val planes = nPlanes.getOrElse(autoPlanes(emb, targetPerBucket))
    val withB = emb.select(col(idCol),
      explode(bandSignatures(col(vecCol), nBands, planes)).as("bb"))
    // Explicit partition count: the pair-generation work is CPU-bound, and
    // AQE's byte-based coalescing would otherwise serialize it onto one
    // task at small SF. REPARTITION_BY_NUM is never coalesced.
    val par = emb.sparkSession.sparkContext.defaultParallelism
    withB.repartition(par, col("bb")).select(col(idCol).as("id_a"), col("bb"))
      .join(withB.select(col(idCol).as("id_b"), col("bb")), Seq("bb"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      // pinned repartition on the pair key: the cross-band dedup agg then
      // reuses this exchange (ClusteredDistribution satisfied) and runs at
      // full width instead of AQE-coalescing onto one task
      .repartition(par, col("id_a"), col("id_b"))
      .distinct()
  }

  /** LSH-bucketed approximate top-k: same contract as [[bruteForceTopK]]
    * but candidates restricted to the query's hyperplane bucket(s) —
    * the bucket id becomes the shuffle key, so the corpus is never
    * broadcast-joined in full at scale.
    *
    * Recall is MANAGED by `nTables` (independent hash tables with distinct
    * seeds): a true neighbor is a candidate if it shares the query's
    * bucket in ANY table, so missed-neighbor probability decays
    * geometrically with tables while cost grows only linearly (the
    * standard multi-table LSH trade). `nTables = 1` reproduces the
    * single-table baseline bit-for-bit (table 0 uses the same seed).
    */
  def lshTopK(emb: DataFrame, isQuery: Column => Column, k: Int, nPlanes: Int = 8,
      nTables: Int = 1): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val withB = emb.select(col("vec_id"), col("embedding"),
      explode(bandSignatures(col("embedding"), nTables, nPlanes)).as("bb"))
    val queries = withB.filter(isQuery(col("vec_id")))
      .select(col("vec_id").as("query_id"), col("embedding").as("q"), col("bb"))
    val corpus = withB
      .select(col("vec_id").as("neighbor_id"), col("embedding").as("c"), col("bb"))
    val scored = corpus.join(queries, Seq("bb"))
      .filter(col("query_id") =!= col("neighbor_id"))
      // a pair can collide in several tables — dedup BEFORE the dot
      .dropDuplicates("query_id", "neighbor_id")
      .select(col("query_id"), col("neighbor_id"), quantizedDot(col("q"), col("c")).as("sim_q"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim_q").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w).cast("int"))
      .filter(col("rank") <= k)
  }
}
