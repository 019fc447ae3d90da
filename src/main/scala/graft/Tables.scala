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
}
