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

  /** `df` repartitioned for CPU-bound ROW-LOCAL kernels (regex passes,
    * tokenize/shingle/hash chains) ONLY when its planned scan
    * parallelism is below the cluster's — the local test files are
    * single-row-group parquet, so every scan arrives as ONE partition
    * and an unrepartitioned kernel runs single-core (r15: measured as
    * the whole cost of pipeline_pii and friends). A production scan
    * that is already split at least `defaultParallelism` ways passes
    * through UNTOUCHED — unlike the unconditional repartition idiom,
    * this adds no corpus-wide text shuffle at 100 TB (guide §2.4:
    * remove shuffles outright). The probe reads the physical plan's
    * partition count only — no job runs. */
  def cpuSpread(df: DataFrame, key: String): DataFrame = {
    val par = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= par) df
    else df.repartition(par, org.apache.spark.sql.functions.col(key))
  }
}
