package graft.pipeline

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** [[graft.queries.Pipeline.containment]]: the prefix-filtered inverted-
  * index join must return EXACTLY the naive all-pairs containment set —
  * the prefix filter is a candidate BOUND (pigeonhole over the
  * rarest-first token order), never a recall trade, and the merge-walk
  * count over xxhash64 sets must equal the string-set count. A crafted
  * fixture pins the asymmetric case the Jaccard threshold misses
  * (short doc quoted inside a much longer page). Contract constants:
  * contained side ≥ 30 distinct tokens, containment ≥ 0.9. */
class ContainmentSpec extends SparkTestBase {
  import spark.implicits._

  private def naivePairs(docs: Seq[(Long, String)]): Set[(Long, Long, Long, Long, Long)] = {
    val sets = docs.map { case (id, t) =>
      val toks = t.trim.split("\\s+").filter(_.nonEmpty).toSet
      (id, toks)
    }.filter(_._2.size >= 30)
    (for {
      (ia, sa) <- sets
      (ib, sb) <- sets
      if sa.size < sb.size || (sa.size == sb.size && ia < ib)
      common = (sa intersect sb).size.toLong
      cq = common * 10000L / sa.size
      if cq >= 9000L
    } yield (ia, ib, common, cq,
      common * 10000L / (sa.size + sb.size - common))).toSet
  }

  private def run(docs: Seq[(Long, String)]): Set[(Long, Long, Long, Long, Long)] = {
    val dir = java.nio.file.Files.createTempDirectory("graft_containment").toString
    docs.toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    graft.queries.Pipeline.containment(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
  }

  test("quoted-paragraph fixture: containment catches what jaccard misses") {
    val quote = (1 to 30).map(i => s"q$i").mkString(" ")
    val page = (1 to 90).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, quote),                                        // the quote: 30 tokens
      (2L, page + " " + quote),                           // quote inside a long page
      (3L, quote),                                        // exact dup of 1
      (4L, (1 to 40).map(i => s"u$i").mkString(" ")),     // unrelated
      // 24 of the quote's 30 tokens (0.8 containment — below the 0.9 bar)
      (5L, (1 to 24).map(i => s"q$i").mkString(" ") + " " +
        (1 to 8).map(i => s"z$i").mkString(" ")))
    val got = run(docs)
    val expected = naivePairs(docs)
    assert(got === expected)
    // the asymmetric pair (1 ⊂ 2): containment 10000, jaccard = 30/120 —
    // far below any symmetric near-dup threshold
    val p12 = got.find(p => p._1 == 1L && p._2 == 2L)
    assert(p12.exists(p => p._4 === 10000L && p._5 === 2500L),
      s"expected full containment at low jaccard for (1,2): $got")
    // the exact dup (1,3): both ratios 10000
    assert(got.exists(p => p._1 == 1L && p._2 == 3L && p._4 == 10000L && p._5 == 10000L))
    // the 0.8-contained doc stays out
    assert(!got.exists(p => p._1 == 5L || p._2 == 5L))
  }

  test("random corpora: prefix filtering loses no pair (completeness, not recall)") {
    val rnd = new scala.util.Random(41)
    for (trial <- 1 to 3) {
      val vocab = (1 to 60).map(i => s"t$i")
      val docs = (1L to 25L).map { id =>
        val n = 25 + rnd.nextInt(30)
        (id, Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
      }
      assert(run(docs) === naivePairs(docs), s"trial $trial")
    }
  }

  test("sf0.001 corpus matches the naive model end-to-end") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    val got = graft.queries.Pipeline.containment(spark, "/root/testdata/sf0.001")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
    assert(got === naivePairs(docs))
  }
}
