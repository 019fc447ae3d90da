package graft.sinks

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Clustered parquet writer — the write-side data-layout operator a
  * 100 TB table needs so READS stay cheap: rows are range-partitioned on
  * a clustering key (e.g. a [[graft.functions.ZOrder]] curve value),
  * sorted within each partition, and size-capped per file. The result is
  * a layout where every file covers a narrow, non-overlapping key range,
  * so parquet min/max stats prune files for any predicate correlated
  * with the key.
  *
  * Scale shape: ONE range shuffle (sampled boundaries — skew in the key
  * produces more partitions on the hot range, not one hot file), a
  * per-partition sort that spills, and `maxRecordsPerFile` as the file-
  * size governor. No driver-side anything; 1000 executors write 1000
  * ranges concurrently.
  */
object ClusteredWrite {

  /** Write `df` clustered by `key` into `outDir`. The computed key is
    * PERSISTED alongside the data (layout audits — and parquet min/max
    * pruning on the key itself — read it straight from the output); its
    * column name is uniquified against the input schema so a pre-existing
    * user column is never clobbered, and returned so callers can find it. */
  def writeClustered(df: DataFrame, key: Column, outDir: String,
      numRanges: Int, maxRecordsPerFile: Long = 1000000L): String = {
    val keyName = Iterator.iterate("_cluster_key")("_" + _)
      .dropWhile(df.columns.contains).next()
    df.withColumn(keyName, key)
      .repartitionByRange(numRanges, col(keyName))
      .sortWithinPartitions(col(keyName))
      .write.option("maxRecordsPerFile", maxRecordsPerFile)
      .mode("overwrite").parquet(outDir)
    keyName
  }
}
