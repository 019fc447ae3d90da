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
  /** The events table carries TIMESTAMP(NANOS) which Spark's parquet reader
    * rejects unless `spark.sql.legacy.parquet.nanosAsLong=true` (set in
    * Verify/Bench/test sessions), in which case `ts` arrives as BIGINT
    * nanoseconds. Normalize either representation to a `ts_us` BIGINT
    * microseconds column (matching DuckDB's µs-truncated TIMESTAMP) so
    * query code is independent of the reader mode.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val raw = load(spark, dir, "events")
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.LongType
    val tsUs =
      if (raw.schema("ts").dataType == LongType) expr("ts div 1000")
      else unix_micros(col("ts"))
    raw.withColumn("ts_us", tsUs)
  }
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}
