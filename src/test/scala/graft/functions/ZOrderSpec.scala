package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** [[ZOrder.zOrder]]: known interleave values, mask behavior on
  * out-of-range inputs, and bit-for-bit parity between the Column form
  * and the SQL text [[ZOrder.zOrderSql]] emits for the oracle. */
class ZOrderSpec extends SparkTestBase {
  import spark.implicits._

  test("known Morton values") {
    val df = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L), (255L, 255L))
      .toDF("x", "y")
      .select(ZOrder.zOrder(col("x"), col("y"), 8).as("z"))
    // z(3,5): x bits 0,1 -> even slots 0,2; y bits 0,2 -> odd slots 1,5
    assert(df.collect().map(_.getLong(0)).toSeq ===
      Seq(0L, 1L, 2L, 39L, 65535L))
  }

  test("inputs beyond `bits` are masked, not corrupted") {
    val df = Seq((256L + 3L, 512L + 5L)).toDF("x", "y")
      .select(ZOrder.zOrder(col("x"), col("y"), 8).as("z"))
    assert(df.collect().head.getLong(0) === 39L)
  }

  test("Column form == SQL text form on random inputs") {
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(200)((rnd.nextLong().abs % 1024, rnd.nextLong().abs % 1024))
    val df = rows.toDF("x", "y")
    df.createOrReplaceTempView("zorder_parity_in")
    val viaCol = df.select(ZOrder.zOrder(col("x"), col("y"), 10).as("z"))
      .collect().map(_.getLong(0)).toSeq
    val viaSql = spark.sql(
        s"SELECT ${ZOrder.zOrderSql("x", "y", 10)} AS z FROM zorder_parity_in")
      .collect().map(_.getLong(0)).toSeq
    assert(viaCol === viaSql)
  }

  test("locality: adjacent z values stay adjacent in (x, y) space") {
    // consecutive z codes differ by at most 1 in one coordinate when the
    // low bit flips — spot-pin the curve really is Morton order, not some
    // other bijection: decode by de-interleaving and check round trip
    def decode(z: Long, bits: Int): (Long, Long) = {
      var (x, y) = (0L, 0L)
      for (i <- 0 until bits) {
        x |= ((z >> (2 * i)) & 1L) << i
        y |= ((z >> (2 * i + 1)) & 1L) << i
      }
      (x, y)
    }
    val rows = for (x <- 0L until 16L; y <- 0L until 16L) yield (x, y)
    val zs = rows.toDF("x", "y")
      .select(col("x"), col("y"), ZOrder.zOrder(col("x"), col("y"), 4).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    zs.foreach { case (x, y, z) => assert(decode(z, 4) === ((x, y))) }
    assert(zs.map(_._3).sorted === (0L until 256L))
  }
}
