package org.apache.spark.sql

/** Bridge into Spark 4's `private[sql]` `internalCreateDataFrame`: re-root
  * an already-materialized (localCheckpoint'ed) frame onto a FRESH
  * LogicalRDD — new attribute ids, no constraints carried (the
  * `Union.rewriteConstraints` workaround, see `graft.ops.Graph`) — without
  * the public `createDataFrame(df.rdd, schema)` path's
  * InternalRow→Row→InternalRow deserialization round-trip (measured 2×+
  * on frontier-sized BFS frames). Kept to the one conversion call — no
  * Spark internals are re-implemented here.
  */
object GraftDatasetBridge {
  def reRootInternal(df: Dataset[Row]): Dataset[Row] = {
    val spark = df.sparkSession.asInstanceOf[classic.SparkSession]
    spark.internalCreateDataFrame(df.queryExecution.toRdd, df.schema)
  }
}
