package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Key-bucketed parquet state store for the incremental catch-up.
  *
  * Each table is laid out as `root/<table>/bucket=<b>/part-*.parquet` with
  * `b = pmod(xxhash64(bucketKey), nBuckets)`. A micro-batch that touches a
  * set of keys only ever
  *
  *   - READS the buckets those keys hash to (Spark partition pruning on the
  *     `bucket` directory column — untouched buckets are never opened), and
  *   - REWRITES exactly those buckets (dynamic partition overwrite — the
  *     commit protocol stages and atomically swaps only the partitions
  *     present in the written frame).
  *
  * So per-batch I/O is proportional to the touched key set's bucket span,
  * not to table size — the property the reference gets from its in-memory
  * dictionaries (`ProjektorState.cs:23-125`) and a 1000-executor cluster
  * gets from a MERGE-capable table format. On an object store the same
  * layout works unchanged (no directory renames — the committer only
  * relies on task-file atomicity).
  *
  * The bucket column is written as INT so the inferred partition type
  * matches the pruning filter exactly (a long/int mismatch would defeat
  * directory pruning and silently re-scan every bucket).
  *
  * The bucket-id collection per batch is a driver-side `collect()` of at
  * most `nBuckets` integers (bounded, not data-sized).
  */
class StateStore(spark: SparkSession, val root: String, val nBuckets: Int = 64) {

  import org.apache.hadoop.fs.{FileSystem, Path}

  private def path(table: String) = s"$root/$table"

  // all store I/O goes through the Hadoop FileSystem API, so the same
  // layout runs on local disk, HDFS, or an object store unchanged
  private def fs: FileSystem =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  def bucketOf(key: Column): Column =
    pmod(xxhash64(key.cast("string")), lit(nBuckets.toLong)).cast("int")

  def exists(table: String): Boolean = {
    val p = new Path(path(table))
    // a bare _SUCCESS/empty dir (all-bucket overwrite of an empty frame)
    // counts as existing-but-empty only if some bucket dir is present
    fs.exists(p) && fs.getFileStatus(p).isDirectory &&
      fs.listStatus(p).exists(_.getPath.getName.startsWith("bucket="))
  }

  private def emptyDf(schema: StructType): DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)

  /** Full scan of a bucketed table (bucket column dropped). Used only for
    * bounded-size tables (folded state ≪ event log) and final reads. */
  def readAll(table: String, schema: StructType): DataFrame =
    if (exists(table)) {
      val df = spark.read.parquet(path(table)).drop("bucket")
      df.select(schema.fieldNames.map(col).toSeq: _*)
    } else emptyDf(schema)

  /** Rows of `table` whose `keyCol` is in `keys` (a one-column frame named
    * `k`). Reads only the buckets the keys hash to; the key restriction is
    * a broadcast semi join (keys are batch-bounded). */
  def readKeyed(table: String, schema: StructType, keyCol: String, keys: DataFrame): DataFrame = {
    if (!exists(table)) return emptyDf(schema)
    val buckets = keys.select(bucketOf(col("k")).as("b")).distinct()
      .collect().map(_.getInt(0))
    if (buckets.isEmpty) return emptyDf(schema)
    spark.read.parquet(path(table))
      .filter(col("bucket").isin(buckets.toSeq: _*))
      .join(broadcast(keys.withColumnRenamed("k", keyCol)), Seq(keyCol), "left_semi")
      .drop("bucket")
      .select(schema.fieldNames.map(col).toSeq: _*)
  }

  /** Delete-then-insert merge: remove every row whose `keyCol` is in
    * `touchedKeys` (one column `k`), insert `replacement`, rewriting only
    * the buckets involved. `bucketSrcCol` is the column bucketing the
    * table's layout (defaults to the merge key); when they differ (e.g.
    * eligible-ends bucketed by route node but deleted by equipment id),
    * `extraBucketValues` must carry the bucket-source values (one column
    * `b`) of the rows being deleted (their OLD positions) so those buckets
    * are rewritten too.
    */
  def mergeReplace(table: String, keyCol: String,
      touchedKeys: DataFrame, replacement: DataFrame,
      bucketSrcCol: Option[String] = None,
      extraBucketValues: Option[DataFrame] = None): Unit = {
    val bcol = bucketSrcCol.getOrElse(keyCol)
    val withBucket = replacement.withColumn("bucket", bucketOf(col(bcol)))
    if (!exists(table)) {
      withBucket.write.mode("overwrite").partitionBy("bucket").parquet(path(table))
      return
    }
    val intB = StructType.fromDDL("b INT")
    val keyBuckets =
      if (bucketSrcCol.isEmpty) touchedKeys.select(bucketOf(col("k")).as("b"))
      else emptyDf(intB)
    val buckets = withBucket.select(col("bucket").as("b"))
      .unionByName(keyBuckets)
      .unionByName(extraBucketValues.map(_.select(bucketOf(col("b")).as("b")))
        .getOrElse(emptyDf(intB)))
      .distinct().collect().map(_.getInt(0))
    if (buckets.isEmpty) return
    val kept = spark.read.parquet(path(table))
      .filter(col("bucket").isin(buckets.toSeq: _*))
      .join(broadcast(touchedKeys.withColumnRenamed("k", keyCol)), Seq(keyCol), "left_anti")
    // localCheckpoint cuts the lineage back to the store files we are about
    // to overwrite (Spark refuses to write a path it is also reading, and a
    // lazy plan would otherwise re-read post-overwrite files); the
    // checkpointed frame is bounded by the touched buckets' size
    val merged = kept.unionByName(withBucket.select(kept.columns.map(col).toSeq: _*))
      .localCheckpoint(true)
    merged.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("bucket").parquet(path(table))
    // dynamic overwrite only replaces partitions PRESENT in the written
    // frame — a touched bucket whose rows were all deleted would silently
    // keep its stale file. Drop those directories explicitly (single-writer
    // store; bounded by nBuckets).
    val present = merged.select(col("bucket")).distinct().collect().map(_.getInt(0)).toSet
    (buckets.toSet -- present).foreach { bk =>
      fs.delete(new Path(s"${path(table)}/bucket=$bk"), true)
    }
  }

  /** Unbucketed tiny table (specification dimensions): full overwrite via
    * tmp+swap (content is a handful of rows; atomicity via rename checked —
    * on stores without atomic rename the window is a missing-table read,
    * never a torn one, and the next batch rewrites it). */
  def writeSmall(table: String, df: DataFrame): Unit = {
    val out = df.localCheckpoint(true)
    val tmp = new Path(s"$root/.tmp_$table")
    val target = new Path(path(table))
    fs.delete(tmp, true)
    out.write.mode("overwrite").parquet(tmp.toString)
    val trash = new Path(s"$root/.old_$table")
    fs.delete(trash, true)
    if (fs.exists(target) && !fs.rename(target, trash))
      sys.error(s"StateStore: failed to move aside $target")
    if (!fs.rename(tmp, target))
      sys.error(s"StateStore: failed to promote $tmp to $target")
    fs.delete(trash, true)
    ()
  }

  def readSmall(table: String, schema: StructType): DataFrame = {
    val p = new Path(path(table))
    if (fs.exists(p) && fs.getFileStatus(p).isDirectory)
      spark.read.parquet(p.toString).select(schema.fieldNames.map(col).toSeq: _*)
    else emptyDf(schema)
  }
}
