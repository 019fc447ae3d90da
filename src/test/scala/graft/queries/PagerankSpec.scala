package graft.queries

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** [[Graphs.pagerank]]: the distributed integer PageRank must equal a
  * naive driver-side model running the IDENTICAL ppb conventions
  * (truncating divisions, 0.85 damping as 85/100, bidirected edges) on
  * the same derived graph — every rank bit-identical, and the top-50
  * report's (rank desc, node) order total. */
class PagerankSpec extends SparkTestBase {

  private def naiveTop50(dir: String, iters: Int = 4): Seq[(String, Long, Long)] = {
    val li = graft.Tables.lineitem(spark, dir)
      .filter(col("l_quantity") <= 3)
      .select((col("l_partkey") * 2).as("a"), (col("l_suppkey") * 2 + 1).as("b"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val edges = (li ++ li.map(_.swap)).distinct
    val deg = edges.groupBy(_._1).map { case (n, es) => n -> es.size.toLong }
    val nodes = deg.keys.toSeq.sorted
    val n = nodes.size.toLong
    val base = 15000000000L / (100L * n)
    var r = nodes.map(_ -> 1000000000L / n).toMap
    for (_ <- 1 to iters) {
      val in = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
      edges.foreach { case (u, v) =>
        in(v) += (85L * r(u)) / (100L * deg(u))
      }
      r = nodes.map(nd => nd -> (base + in(nd))).toMap
    }
    nodes.map { nd =>
      val name = if (nd % 2 == 0) s"p${nd / 2}" else s"s${nd / 2}"
      (name, deg(nd), r(nd))
    }.sortBy { case (name, _, rank) => (-rank, name) }.take(50)
  }

  test("sf0.001: distributed ranks equal the naive integer model bit-for-bit") {
    val got = Graphs.pagerank(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === naiveTop50("/root/testdata/sf0.001"))
    assert(got.nonEmpty && got.forall(_._3 > 0L))
  }

  test("pagerank leaves no cached blocks behind") {
    // DELTA check against the shared test session's pre-existing blocks
    // (another suite may legitimately hold a cache while this runs)
    val before = spark.sparkContext.getRDDStorageInfo.map(_.id).toSet
    Graphs.pagerank(spark, "/root/testdata/sf0.001").collect()
    // checkpoint + edge-cache hygiene: the operator consumes eagerly and
    // releases everything before returning (grace for async unpersist)
    val deadline = System.nanoTime() + 5000000000L
    def fresh() = spark.sparkContext.getRDDStorageInfo.map(_.id).filterNot(before)
    var info = fresh()
    while (info.nonEmpty && System.nanoTime() < deadline) {
      Thread.sleep(100); info = fresh()
    }
    assert(info.isEmpty, s"lingering blocks: ${info.mkString(",")}")
  }
}
