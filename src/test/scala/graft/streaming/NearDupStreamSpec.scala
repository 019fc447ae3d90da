package graft.streaming

import graft.{SparkTestBase, Tables}
import graft.pipeline.Dedup
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** [[NearDupStream]] ≡ the batch MinHash-LSH banding on the same corpus
  * fed across micro-batches in doc-id order: (1) the row-local bucket
  * rows must land in EXACTLY the batch aggregate path's (band, key)
  * buckets, (2) the streamed rep pairs must equal the batch "member ⋈
  * bucket-min" frame under any in-order chunking, and (3) an
  * out-of-order feed must fail fast. */
class NearDupStreamSpec extends SparkTestBase {
  import spark.implicits._

  private val providerKey = "spark.sql.streaming.stateStore.providerClass"
  private val rocks =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  private def withRocks[A](body: => A): A = {
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey, rocks)
    try body finally {
      prev match {
        case Some(p) => spark.conf.set(providerKey, p)
        case None => spark.conf.unset(providerKey)
      }
    }
  }

  private val dir = "/root/testdata/sf0.001"

  private def docs = Tables.documents(spark, dir)
    .select(col("doc_id"), col("text"))

  test("row-local bucket rows equal the batch aggregate buckets bit-for-bit") {
    // include empty / whitespace-only docs: the batch path drops them at
    // its shingle explode, and bucketRows must agree instead of
    // collapsing their all-null signatures into one shared bucket
    // (ADVICE r13)
    val withEmpties = docs.unionByName(
      Seq((900000001L, ""), (900000002L, "   \n\t ")).toDF("doc_id", "text"))
    val shingled = withEmpties.select(col("doc_id"),
      graft.pipeline.Text.shingles(col("text"), 3).as("sh"))
    val batch = Dedup.minhashBuckets(shingled, "doc_id", "sh")
      .select(col("id"), col("band"), col("key"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val rowLocal = NearDupStream.bucketRows(withEmpties, "doc_id", "text")
      .select(col("id"), col("band"), col("key"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(rowLocal.nonEmpty)
    assert(rowLocal === batch)
    assert(!rowLocal.exists(t => t._1 >= 900000001L),
      "empty docs must produce no bucket rows")
  }

  test("streamed rep pairs equal the batch bucket-min pairs on chunked in-order feeds") {
    withRocks {
      val buckets = NearDupStream.bucketRows(docs, "doc_id", "text")
      // batch expectation: every bucket member paired with its bucket min
      val mins = buckets.groupBy(col("band"), col("key"))
        .agg(min(col("id")).as("rep_id"))
      val expected = buckets.join(mins, Seq("band", "key"))
        .filter(col("id") =!= col("rep_id"))
        .select(col("rep_id"), col("id"), col("band"), col("key"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3)))
        .toSet
      assert(expected.nonEmpty, "fixture must contain near-dup bucket collisions")

      val feed = buckets.orderBy(col("id"), col("band")).collect()
        .map(r => NearDupStream.BucketRow(
          r.getInt(r.fieldIndex("band")), r.getLong(r.fieldIndex("key")),
          r.getLong(r.fieldIndex("id"))))
      val n = feed.length
      val chunks = Seq(feed.slice(0, n / 3), feed.slice(n / 3, 2 * n / 3),
        feed.slice(2 * n / 3, n))

      implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val input = MemoryStream[NearDupStream.BucketRow]
      val q = NearDupStream.candidatePairs(input.toDS())
        .writeStream.format("memory").queryName("neardup_stream")
        .outputMode(OutputMode.Append()).start()
      try {
        chunks.foreach { c => input.addData(c.toIndexedSeq); q.processAllAvailable() }
        val got = spark.table("neardup_stream").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3)))
          .toSet
        assert(got === expected)
      } finally {
        q.stop()
        spark.sql("DROP VIEW IF EXISTS neardup_stream")
        ()
      }
    }
  }

  test("an out-of-order bucket feed fails fast instead of electing a non-min rep") {
    withRocks {
      implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val input = MemoryStream[NearDupStream.BucketRow]
      val q = NearDupStream.candidatePairs(input.toDS())
        .writeStream.format("memory").queryName("neardup_stream_ooo")
        .outputMode(OutputMode.Append()).start()
      try {
        input.addData(Seq(NearDupStream.BucketRow(0, 42L, 10L)))
        q.processAllAvailable()
        input.addData(Seq(NearDupStream.BucketRow(0, 42L, 5L)))
        val e = intercept[Exception] { q.processAllAvailable() }
        val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
          .map(t => Option(t.getMessage).getOrElse("")).mkString("\n")
        assert(msgs.contains("out-of-order doc"))
      } finally {
        q.stop()
        spark.sql("DROP VIEW IF EXISTS neardup_stream_ooo")
        ()
      }
    }
  }
}
