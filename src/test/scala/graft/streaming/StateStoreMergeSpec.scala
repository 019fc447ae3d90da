package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.{DataFrame, Row}

import java.nio.file.Files
import scala.util.Random

/** Direct convergence properties of [[StateStore.mergeReplace]] — the
  * primitive the exactly-once claim rests on (`Incremental` object doc):
  * delete+reinsert of the touched keys must be (a) exact against a
  * set-theoretic oracle, (b) idempotent under full replay, and (c) robust
  * to the crash remnant its two-phase commit can leave behind (dynamic
  * overwrite done, emptied-bucket cleanup not yet — stale files for
  * deleted keys still on disk when the merge re-runs).
  */
class StateStoreMergeSpec extends SparkTestBase {

  private val schema = StructType.fromDDL("k STRING, v INT")

  private def toDf(rows: Seq[(String, Int)]): DataFrame = {
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(rows.map { case (k, v) => Row(k, v) }.asJava, schema)
  }

  private def keysDf(keys: Seq[String]): DataFrame = {
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(keys.map(Row(_)).asJava, StructType.fromDDL("k STRING"))
  }

  private def contents(store: StateStore): Set[(String, Int)] =
    store.readAll("t", schema).collect().map(r => (r.getString(0), r.getInt(1))).toSet

  test("mergeReplace converges: oracle-exact, replay-idempotent, crash-remnant-proof") {
    val rnd = new Random(7)
    (1 to 6).foreach { iter =>
      val dir = Files.createTempDirectory(s"graft-merge-$iter").toFile.getPath
      val store = new StateStore(spark, dir, nBuckets = 8)

      val allKeys = (0 until 30).map(i => s"k$i")
      val initial = allKeys.filter(_ => rnd.nextBoolean()).map(k => k -> rnd.nextInt(100))
      store.writeBucketed("t", "k", toDf(initial))

      // touched: some existing (deleted or rewritten) + some brand-new keys
      val touched = rnd.shuffle(allKeys).take(1 + rnd.nextInt(12)) ++
        Seq(s"new-$iter-a", s"new-$iter-b")
      val replacement = touched.filter(_ => rnd.nextBoolean()).map(k => k -> rnd.nextInt(100))
      val expected =
        initial.filterNot { case (k, _) => touched.contains(k) }.toSet ++ replacement.toSet

      store.mergeReplace("t", "k", keysDf(touched), toDf(replacement))
      assert(contents(store) === expected, s"iter $iter: merge diverged from oracle")

      // full replay of the identical merge
      store.mergeReplace("t", "k", keysDf(touched), toDf(replacement))
      assert(contents(store) === expected, s"iter $iter: replay not idempotent")

      // crash remnant: a deleted key's stale row resurfaces in its bucket
      // (dynamic overwrite committed, emptied-bucket cleanup crashed)
      val deleted = touched.filterNot(k => replacement.exists(_._1 == k))
        .filter(k => initial.exists(_._1 == k))
      deleted.headOption.foreach { staleKey =>
        val b = store.bucketOf("t", org.apache.spark.sql.functions.lit(staleKey))
        val bucket = toDf(Seq(staleKey -> -1)).select(org.apache.spark.sql.functions.col("k"), b.as("bucket"))
          .collect().head.getInt(1)
        toDf(Seq(staleKey -> -1)).write.mode("append").parquet(s"$dir/t/bucket=$bucket")
        assert(contents(store) !== expected, s"iter $iter: remnant injection had no effect")
        store.mergeReplace("t", "k", keysDf(touched), toDf(replacement))
        assert(contents(store) === expected, s"iter $iter: crash remnant survived re-merge")
      }
    }
  }
}
