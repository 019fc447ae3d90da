package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loaders for the driver-provided test data
  * (`/root/testdata/sf*`; see TESTDATA.md).
  *
  * Reads are plain `spark.read.parquet` so Catalyst pushes filters and
  * prunes columns into the scan — every query should show its predicates
  * under `PushedFilters` and a narrow `ReadSchema` in
  * `.explain("formatted")`. At 100 TB the same call reads a partitioned
  * directory tree; nothing here assumes a single file.
  *
  * Schema inference here is DELIBERATE (unlike every
  * [[graft.streaming.StateStore]] read, which passes explicit schemas on
  * the 2-second hot path): these are external tables whose schema the
  * test-data generator owns, each read once per query, and a hardcoded
  * copy would silently drift from the generator's.
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "region")
  /** The events table's `ts` column has shipped in three physical forms
    * across test-data generations: TIMESTAMP(NANOS) (readable only with
    * `spark.sql.legacy.parquet.nanosAsLong=true` → BIGINT nanoseconds),
    * naive TIMESTAMP(MICROS) (isAdjustedToUTC=false → TIMESTAMP_NTZ under
    * Spark's default NTZ inference), and UTC-adjusted TIMESTAMP(MICROS)
    * (→ TIMESTAMP). Normalize all three to a `ts_us` BIGINT microseconds
    * column (matching DuckDB's naive-µs TIMESTAMP arithmetic; sessions run
    * in UTC so the NTZ→TZ cast is instant-preserving) so query code is
    * independent of the writer generation and reader mode.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val raw = load(spark, dir, "events")
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val tsUs = raw.schema("ts").dataType match {
      case LongType => expr("ts div 1000")
      case TimestampNTZType => unix_micros(col("ts").cast(TimestampType))
      case _ => unix_micros(col("ts"))
    }
    raw.withColumn("ts_us", tsUs)
  }
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")

  /** Default spread granularity: one partition per 64 KB of (compressed)
    * scan input. The r16 paired probes (32 vs 8 cores, sf0.1) showed the
    * r15 fan-out-to-`defaultParallelism` idiom INVERSE-SCALING: a ~600 KB
    * documents scan fanned into 32 tasks costs more in exchange + task
    * scheduling + the orderBy range-sampler than the row-local kernels
    * save (pipeline_pii 0.73 s @32c vs 0.54 s @8c on identical code).
    * 64 KB ≈ a few hundred documents per task — enough rows that a
    * regex/tokenize kernel amortizes its per-task overhead, while a
    * corpus of any real size still reaches the full core count. */
  private[graft] val SpreadQuantumBytes: Long = 64L << 10

  /** `df` repartitioned for CPU-bound ROW-LOCAL kernels (regex passes,
    * tokenize/shingle/hash chains) ONLY when its planned scan
    * parallelism is below the SIZE-DERIVED width — min(cores,
    * ceil(scanBytes/quantum)), floored at 2 so the explicit
    * REPARTITION_BY_NUM stays visible (plan-pinned: AQE must never be
    * the thing that decides kernel parallelism). The local test files
    * are single-row-group parquet, so every scan arrives as ONE
    * partition and an unrepartitioned kernel runs single-core (r15:
    * measured as the whole cost of pipeline_pii and friends); r16 makes
    * the fan-out scale-adaptive instead of a core-count constant
    * (VERDICT r15 #1 — the guide §2.2 `loopPartitions` treatment), so
    * the same code neither under-parallelizes a big scan nor drowns a
    * kilobyte scan in per-task overhead. A production scan that is
    * already split at least `width` ways passes through UNTOUCHED — no
    * corpus-wide text shuffle at 100 TB (guide §2.4).
    *
    * Contract: `df` must be a plain (possibly projected/filtered) scan
    * with NO shuffle beneath — both probes (logical-stats bytes and the
    * planned partition count) are only job-free on that shape (ADVICE
    * r15: `df.rdd` on a shuffled frame under AQE would execute the
    * shuffle stages just to read a partition count). */
  def cpuSpread(df: DataFrame, key: String,
      quantumBytes: Long = SpreadQuantumBytes): DataFrame = {
    val par = df.sparkSession.sparkContext.defaultParallelism
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val width = ((bytes + BigInt(quantumBytes - 1)) / BigInt(quantumBytes))
      .min(BigInt(par)).max(BigInt(2)).toInt
    if (df.rdd.getNumPartitions >= width) df
    else df.repartition(width, org.apache.spark.sql.functions.col(key))
  }
}
