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

  test("bucket aside from a crashed swap is recovered, not lost (ADVICE r7 medium)") {
    import org.apache.hadoop.fs.Path
    val dir = Files.createTempDirectory("graft-aside").toFile.getPath
    val store = new StateStore(spark, dir, nBuckets = 4)
    val rows = (0 until 24).map(i => s"k$i" -> i)
    store.writeBucketed("t", "k", toDf(rows))
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val someBucket = fs.listStatus(new Path(s"$dir/t"))
      .map(_.getPath.getName).find(_.startsWith("bucket=")).get
    // crash point: live moved aside, staged dir never promoted — the
    // pre-r8 delete-then-rename would have lost these rows permanently
    assert(fs.rename(new Path(s"$dir/t/$someBucket"),
      new Path(s"$dir/t/.old_$someBucket")))
    val store2 = new StateStore(spark, dir, nBuckets = 4) // fresh process
    assert(contents(store2) === rows.toSet,
      "rows of the crashed bucket swap were not recovered from the aside")
    assert(!fs.exists(new Path(s"$dir/t/.old_$someBucket")), "aside not cleaned up")
    // crash point: promote completed, aside cleanup crashed — the aside is
    // pre-merge garbage and must be DISCARDED (live wins), not restored
    toDf(Seq("zz-stale" -> -99)).write.mode("overwrite")
      .parquet(s"$dir/t/.old_$someBucket")
    val store3 = new StateStore(spark, dir, nBuckets = 4)
    assert(contents(store3) === rows.toSet, "completed-swap aside leaked into reads")
    assert(!fs.exists(new Path(s"$dir/t/.old_$someBucket")), "garbage aside not dropped")
    ()
  }

  test("readKeyedSnap tops up buckets for a second key set in the same batch (ADVICE r7)") {
    val dir = Files.createTempDirectory("graft-snaptop").toFile.getPath
    val store = new StateStore(spark, dir, nBuckets = 8)
    val rows = (0 until 40).map(i => s"k$i" -> i)
    store.writeBucketed("t", "k", toDf(rows))
    // first call: a small key set — snapshot copies only its buckets
    val firstKeys = Seq("k0")
    val got1 = store.readKeyedSnap(5L, "t", schema, "k", keysDf(firstKeys))
      .collect().map(_.getString(0)).toSet
    assert(got1 === Set("k0"))
    // second call, same batch, different key set: before the manifest
    // top-up this silently returned only keys whose buckets happened to
    // be in the first copy
    val secondKeys = (1 until 40).map(i => s"k$i")
    val got2 = store.readKeyedSnap(5L, "t", schema, "k", keysDf(secondKeys))
      .collect().map(_.getString(0)).toSet
    assert(got2 === secondKeys.toSet,
      s"snapshot reuse missed ${(secondKeys.toSet -- got2).size} keys whose buckets were never copied")
    // and the snapshot view is stable: replaying both calls agrees
    val replay = store.readKeyedSnap(5L, "t", schema, "k", keysDf(secondKeys))
      .collect().map(_.getString(0)).toSet
    assert(replay === secondKeys.toSet)
  }

  test("snapshot replay stays pre-merge-faithful across a mid-batch rebucket") {
    val dir = Files.createTempDirectory("graft-snapreb").toFile.getPath
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def liveBucketCount(): Int = fs.listStatus(new org.apache.hadoop.fs.Path(s"$dir/t"))
      .map(_.getPath.getName).count(_.startsWith("bucket="))
    // small bucket budget so the 400-row table lands on a MULTI-bucket
    // layout (a 1-bucket layout would make every later key set a subset
    // of the first copy and the guard untestable)
    val store = new StateStore(spark, dir, nBuckets = 2, maxBucketBytes = 1024)
    val rows = (0 until 400).map(i => s"k$i" -> i)
    store.writeBucketed("t", "k", toDf(rows))
    val n0 = liveBucketCount()
    assert(n0 >= 2, s"test setup: expected a multi-bucket layout, got $n0")
    // first run: the pre-merge snapshot pins k0's bucket under count n0
    val got1 = store.readKeyedSnap(9L, "t", schema, "k", keysDf(Seq("k0")))
      .collect().map(r => (r.getString(0), r.getInt(1))).toSet
    assert(got1 === Set("k0" -> 0))
    // ... then the batch's own merge rewrites k0 AND triggers a REBUCKET
    // (tinier bucket budget + enough new rows), and the process crashes
    // before the batch commits
    val grower = new StateStore(spark, dir, nBuckets = 2, maxBucketBytes = 256)
    val newKeys = (0 until 300).map(i => s"grow$i")
    grower.mergeReplace("t", "k", keysDf("k0" +: newKeys),
      toDf(("k0" -> 999) +: newKeys.map(_ -> -1)))
    val liveBuckets = liveBucketCount()
    assert(liveBuckets > n0, s"merge did not rebucket ($n0 -> $liveBuckets)")
    // replay happens in a FRESH process (its store reads _nbuckets from
    // disk — the new count): requiredness is computed under the manifest's
    // CREATION count, so no top-up happens and the view stays pre-merge
    // (one row, the original value — not the merged 999). Pre-fix, ids
    // computed under the new live count copied post-merge dirs into the
    // snapshot: k0 came back doubled (0 AND 999).
    val replayStore = new StateStore(spark, dir, nBuckets = 2)
    val replayRows = replayStore.readKeyedSnap(9L, "t", schema, "k", keysDf(Seq("k0")))
      .collect().map(r => (r.getString(0), r.getInt(1))).toSet
    assert(replayRows === Set("k0" -> 0),
      s"snapshot replay not pre-merge-faithful after rebucket: $replayRows")
    // a genuinely NEW key set after the rebucket cannot be served
    // faithfully (pre-merge rows for its buckets are gone) — the store
    // must fail loudly instead of copying wrong-layout post-merge rows
    val manifestBytes = {
      // versioned create-only manifests (ADVICE r8): read the highest seq
      val snapDir = new org.apache.hadoop.fs.Path(s"$dir/_snap/batch=9/t")
      val mp = fs.listStatus(snapDir).map(_.getPath)
        .filter(_.getName.startsWith("_buckets"))
        .maxBy(p => p.getName.stripPrefix("_buckets").stripPrefix(".") match {
          case "" => -1L; case s => s.toLong })
      val in = fs.open(mp)
      try { val b = new Array[Byte](fs.getFileStatus(mp).getLen.toInt); in.readFully(b); new String(b, "UTF-8") }
      finally in.close()
    }
    val attempt = scala.util.Try {
      replayStore.readKeyedSnap(9L, "t", schema, "k", keysDf(rows.map(_._1)))
        .collect().map(_.getString(0)).toSet
    }
    assert(attempt.isFailure,
      s"no error thrown; manifest=$manifestBytes live=$liveBuckets got=${attempt}")
    assert(attempt.failed.get.getMessage.contains("rebucketed"),
      s"unexpected error: ${attempt.failed.get.getMessage}")
  }

  test("a store written under another codec merges and reads unchanged (lz4 migration)") {
    // parquet files are self-describing, so a pre-round-12 store (snappy)
    // keeps working after the writers switched to lz4 — merged buckets
    // come out lz4, untouched buckets stay snappy, reads see one table
    val dir = Files.createTempDirectory("graft-codec").toFile.getPath
    val store = new StateStore(spark, dir, nBuckets = 4)
    val initial = (0 until 24).map(i => s"k$i" -> i)
    store.writeBucketed("t", "k", toDf(initial))
    // rewrite every bucket's files with snappy IN PLACE (simulating the
    // old store), preserving the layout and the bucket hashing
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    (0 until 4).foreach { b =>
      val p = s"$dir/t/bucket=$b"
      if (fs.exists(new org.apache.hadoop.fs.Path(p))) {
        val rows = spark.read.schema(schema).parquet(p)
          .collect().map(r => (r.getString(0), r.getInt(1)))
        val tmp = s"$dir/.codec_tmp"
        toDf(rows.toSeq).coalesce(1).write.mode("overwrite")
          .option("compression", "snappy").parquet(tmp)
        fs.delete(new org.apache.hadoop.fs.Path(p), true)
        assert(fs.rename(new org.apache.hadoop.fs.Path(tmp),
          new org.apache.hadoop.fs.Path(p)))
      }
    }
    assert(contents(store) === initial.toSet, "snappy rewrite changed contents")
    // an lz4-era merge over the snappy store: delete k0/k1, rewrite k2, add new
    store.mergeReplace("t", "k", keysDf(Seq("k0", "k1", "k2", "knew")),
      toDf(Seq("k2" -> 999, "knew" -> 1000)))
    val expected = initial.toSet -- Set("k0" -> 0, "k1" -> 1, "k2" -> 2) ++
      Set("k2" -> 999, "knew" -> 1000)
    assert(contents(store) === expected, "mixed-codec merge diverged")
  }
}
