package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Banded backward range join: all pairs (l, r) sharing the key columns
  * with `r.ord` in the half-open window `(l.ord - before, l.ord]`.
  *
  * Spark-first scale design: Spark plans a raw
  * `key = key AND r.ord > l.ord - B AND r.ord <= l.ord` join as a
  * broadcast-nested-loop (or, keyed, a per-key cartesian filtered late) —
  * quadratic in per-key row count and the classic 100 TB scale-killer.
  * The banded encoding turns it into an EQUI-join Catalyst can hash:
  * bucket every ordinate by the band width B, replicate each right row to
  * its own bucket and the next (every matching left bucket is one of the
  * two), hash-join on (key, bucket), and apply the exact range predicate
  * post-join. Each candidate pair is produced exactly once (for any match,
  * exactly one of the two replicas lands in the left row's bucket), so no
  * dedup pass is needed. Cost: 2× replication of the right side and a
  * hash shuffle — linear, AQE-skew-splittable, no nested loop anywhere.
  * The same encoding with `explode(sequence(...))` generalizes to band
  * widths narrower than the range (more replicas, tighter candidate
  * sets); B = range width is the sweet spot when matches are dense.
  */
object RangeJoin {

  /** Inner pair join; left columns keep their names, right payload columns
    * (everything but the keys) come back `prefix`-named. Aggregate or
    * left-join the result against the left frame to keep zero-match rows.
    */
  def bandedBackward(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      leftOrd: String, rightOrd: String, before: Long,
      prefix: String = "r_"): DataFrame = {
    require(before > 0, s"band width must be positive, got $before")
    val reserved = Seq("__bucket", "__lord", "__rord", "__r")
    require(!left.columns.exists(reserved.contains),
      s"left frame must not use the reserved columns ${reserved.mkString(", ")}")
    // exact integer bucketing: (x - pmod(x, w)) is an exact multiple of w,
    // so integer DIV (truncating) equals floor division for negatives too
    // — a double-division floor() would mis-bucket ordinates above 2^53
    def bucketOf(c: String): org.apache.spark.sql.Column =
      expr(s"($c - pmod($c, ${before}L)) DIV ${before}L")
    val payloadCols = right.columns.filterNot(keyCols.contains).toSeq
    val lB = left.withColumn("__lord", col(leftOrd).cast("long"))
      .withColumn("__bucket", bucketOf("__lord")).drop("__lord")
    val rRep = right.select(keyCols.map(col) ++
        Seq(col(rightOrd).cast("long").as("__rord"),
          struct(payloadCols.map(col): _*).as("__r")): _*)
      .withColumn("__bucket",
        explode(array(bucketOf("__rord"), bucketOf("__rord") + 1)))
    lB.join(rRep, keyCols :+ "__bucket")
      .filter(col("__rord") > col(leftOrd).cast("long") - before &&
        col("__rord") <= col(leftOrd).cast("long"))
      .select(left.columns.toSeq.map(col) ++
        payloadCols.map(c => col("__r").getField(c).as(prefix + c)): _*)
  }
}
