package graft.sinks

import graft.SparkTestBase
import graft.functions.ZOrder
import org.apache.spark.sql.functions._

/** [[ClusteredWrite.writeClustered]]: the layout contract — data round-
  * trips exactly, per-file cluster-key ranges are pairwise disjoint
  * (range shuffle + within-partition sort → parquet min/max stats prune
  * whole files), and z-order clustering yields per-file 2-D bounding
  * boxes far smaller than the global domain (BOTH dimensions prune, not
  * just a leading sort column). */
class ClusteredWriteSpec extends SparkTestBase {
  import spark.implicits._

  test("round trip, disjoint per-file key ranges, small 2-D bounding boxes") {
    val rnd = new scala.util.Random(11)
    val rows = Seq.fill(20000)((rnd.nextInt(256).toLong, rnd.nextInt(256).toLong))
    val df = rows.toDF("x", "y")
    val out = java.nio.file.Files.createTempDirectory("clustered_write").toString
    try {
      val keyName = ClusteredWrite.writeClustered(df,
        ZOrder.zOrder(col("x"), col("y"), 8), out, numRanges = 8)
      assert(keyName === "_cluster_key")
      // a pre-existing user column of that name is preserved, not clobbered
      val out2 = java.nio.file.Files.createTempDirectory("clustered_write2").toString
      try {
        val clash = df.withColumn("_cluster_key", lit(7L))
        val k2 = ClusteredWrite.writeClustered(clash,
          ZOrder.zOrder(col("x"), col("y"), 8), out2, numRanges = 2)
        assert(k2 === "__cluster_key")
        val back2 = spark.read.parquet(out2)
        assert(back2.columns.toSet === Set("x", "y", "_cluster_key", "__cluster_key"))
        assert(back2.select("_cluster_key").distinct().collect().map(_.getLong(0)).toSeq === Seq(7L))
      } finally {
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(out2))
      }

      val back = spark.read.parquet(out)
      // exact round trip of the data columns
      assert(back.select("x", "y").as[(Long, Long)].collect().sorted ===
        rows.sorted)

      val perFile = back
        .groupBy(input_file_name().as("f"))
        .agg(min(col("_cluster_key")).as("kmin"), max(col("_cluster_key")).as("kmax"),
          min(col("x")).as("xmin"), max(col("x")).as("xmax"),
          min(col("y")).as("ymin"), max(col("y")).as("ymax"),
          count(lit(1)).as("n"))
        .collect()
        .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6), r.getLong(7)))
      assert(perFile.length >= 8, s"expected >= 8 files, got ${perFile.length}")

      // disjoint key ranges: sorted by min, each file's max <= next min
      // (RangePartitioner keeps equal keys in one partition)
      val sorted = perFile.sortBy(_._1)
      sorted.sliding(2).foreach {
        case Array((_, aMax, _, _, _, _, _), (bMin, _, _, _, _, _, _)) =>
          assert(aMax <= bMin, s"overlapping file key ranges: $aMax > $bMin")
        case _ => ()
      }

      // 2-D locality: mean per-file bounding-box area well under the
      // global 256×256 domain (a lexicographic (x, y) sort would give
      // every file the FULL y range — area ~ 256 * width)
      val meanArea = sorted.map { case (_, _, x0, x1, y0, y1, _) =>
        (x1 - x0 + 1).toDouble * (y1 - y0 + 1).toDouble
      }.sum / sorted.length
      assert(meanArea < 256.0 * 256.0 / 3.0,
        s"z-order files not local: mean bbox area $meanArea")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(out))
    }
  }
}
