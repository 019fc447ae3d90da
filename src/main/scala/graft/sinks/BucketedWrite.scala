package graft.sinks

import org.apache.spark.sql.DataFrame

/** Hash-bucketed parquet table writer — the CO-LOCATED JOIN layout for
  * fact⋈fact work at scale: two tables bucketed into the same bucket
  * count on their join key read back with a bucket-aligned
  * `hashpartitioning`, so the join (and any aggregation keyed on the
  * bucket column) plans with NO exchange on either side — the shuffle
  * is paid once at WRITE time and amortized over every subsequent read
  * (the warehouse-standard trade for repeatedly-joined 100 TB facts).
  *
  * Complements the repo's other layout sinks: [[ClusteredWrite]] buys
  * min/max file PRUNING via z-order range clustering; this buys shuffle
  * ELIMINATION via hash bucketing. `sortCols` additionally sorts within
  * each bucket file (sort-merge joins then skip their sort too).
  *
  * The table registers in the session catalog with an explicit external
  * `path`, so tests and callers control the storage location; bucketing
  * metadata lives in the catalog (plain parquet readers see ordinary
  * files and ignore it — same graceful degradation as production
  * bucketed warehouses).
  */
object BucketedWrite {

  /** Write `df` as an external bucketed parquet table.
    *
    * @param table     catalog table name to (re)create
    * @param path      external storage location
    * @param bucketCol hash-bucket column — use the dominant join key
    * @param nBuckets  bucket count; match it across co-joined tables
    *                  (bucket-aligned joins need equal counts) and size
    *                  it so one bucket ≈ one healthy task at full scale
    * @param sortCols  optional within-bucket sort columns
    */
  def writeBucketed(df: DataFrame, table: String, path: String,
      bucketCol: String, nBuckets: Int, sortCols: Seq[String] = Nil): Unit = {
    require(nBuckets >= 1, s"nBuckets must be >= 1, got $nBuckets")
    val base = df.write.mode("overwrite").format("parquet")
      .option("path", path)
      .bucketBy(nBuckets, bucketCol)
    val w = if (sortCols.nonEmpty) base.sortBy(sortCols.head, sortCols.tail: _*) else base
    w.saveAsTable(table)
  }
}
