package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Block bookkeeping for `localCheckpoint`-based lineage cuts (the
  * [[Graph]] convergence-loop idiom, factored out for the other
  * iterative operators — BPE merge training, k-means++ seeding).
  *
  * `localCheckpoint` persists a dataset's INTERNAL rdd, which never
  * registers with the CacheManager, so `unpersist` must be issued on
  * the rdd itself. [[persistedIds]] walks THIS dataframe's own rdd
  * lineage for persisted ancestors (never a global persistent-RDD set
  * diff — a concurrent job's cache must not be collateral, ADVICE r11;
  * SparkContext state is session-wide shared). */
private[graft] object Lineage {

  /** Ids of the persisted RDDs this frame's lineage roots in. */
  def persistedIds(df: DataFrame): Seq[Int] = {
    val queue = scala.collection.mutable.Queue[org.apache.spark.rdd.RDD[_]](df.rdd)
    val seen = scala.collection.mutable.Set.empty[Int]
    val out = scala.collection.mutable.ArrayBuffer.empty[Int]
    while (queue.nonEmpty) {
      val r = queue.dequeue()
      if (seen.add(r.id)) {
        if (r.getStorageLevel != StorageLevel.NONE) out += r.id
        else queue ++= r.dependencies.map(_.rdd)
      }
    }
    out.toSeq
  }

  /** Release previously-captured checkpoint blocks (no-op for ids
    * already gone). */
  def release(df: DataFrame, ids: Seq[Int]): Unit = {
    val sc = df.sparkSession.sparkContext
    ids.foreach(id => sc.getPersistentRDDs.get(id).foreach { r =>
      r.unpersist(blocking = false)
      ()
    })
  }
}
