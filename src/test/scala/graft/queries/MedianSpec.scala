package graft.queries

import graft.SparkTestBase

import scala.util.Random

/** [[Relational.medianExactOf]] randomized parity: the two-phase
  * range-bucket median must equal the naive sorted model's lower median
  * (rank (n+1) div 2) on any mix of group sizes, duplicate-heavy value
  * distributions, odd/even counts, negatives, and values straddling the
  * 65536-cent bucket boundaries. */
class MedianSpec extends SparkTestBase {
  import spark.implicits._

  private def naiveLowerMedian(xs: Seq[Long]): Long = {
    val sorted = xs.sorted
    sorted(((xs.size + 1) / 2) - 1) // rank (n+1) div 2, 1-based
  }

  test("two-phase median equals the naive sorted model on random data") {
    val rnd = new Random(42)
    (1 to 5).foreach { round =>
      val groups = (0 until 6).map(g => s"g$g")
      val data = groups.flatMap { g =>
        val n = 1 + rnd.nextInt(400)
        val style = rnd.nextInt(3)
        Seq.fill(n)(g -> (style match {
          case 0 => rnd.nextInt(1000).toLong - 500L            // dup-heavy, negatives
          case 1 => rnd.nextLong() % 10000000L                 // wide range
          case 2 => 65536L * rnd.nextInt(4) + rnd.nextInt(3)   // bucket-boundary straddlers
        }))
      }
      val got = Relational.medianExactOf(spark, data.toDF("grp", "cents"))
        .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      val expected = data.groupBy(_._1).map { case (g, rows) =>
        g -> ((naiveLowerMedian(rows.map(_._2)), rows.size.toLong))
      }
      assert(got === expected, s"round $round diverged")
    }
  }

  test("exact quantile equals the naive ceil-rank model across q values") {
    val rnd = new Random(7)
    Seq(10000L, 250000L, 500000L, 900000L, 990000L, 1000000L).foreach { q =>
      val data = (0 until 4).flatMap { g =>
        val n = 1 + rnd.nextInt(300)
        Seq.fill(n)(s"g$g" -> (rnd.nextLong() % 1000000L))
      }
      val got = Relational.quantileExactOf(spark, data.toDF("grp", "cents"), q)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val expected = data.groupBy(_._1).map { case (g, rows) =>
        val sorted = rows.map(_._2).sorted
        val r = math.max(1L, (rows.size.toLong * q + 999999L) / 1000000L)
        g -> sorted((r - 1).toInt)
      }
      assert(got === expected, s"q=$q diverged")
    }
  }

  test("single-row and two-row groups pick the lower median") {
    val data = Seq("a" -> 7L, "b" -> 3L, "b" -> 9L)
    val got = Relational.medianExactOf(spark, data.toDF("grp", "cents"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map("a" -> 7L, "b" -> 3L))
  }
}
