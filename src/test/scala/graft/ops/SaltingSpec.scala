package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Salted join must be result-identical to the plain join, including on a
  * heavily skewed key distribution. */
class SaltingSpec extends SparkTestBase {
  import spark.implicits._

  test("salted join equals plain join on a skewed key") {
    // 90% of fact rows share one key — the skew scenario
    val fact = (1 to 2000).map(i => (if (i % 10 == 0) i.toLong % 7 else 42L, s"v$i"))
      .toDF("k", "payload")
    val dim = Seq((42L, "hot"), (0L, "a"), (1L, "b"), (2L, "c"), (3L, "d"),
      (4L, "e"), (5L, "f"), (6L, "g")).toDF("k", "label")

    val plain = fact.join(dim, Seq("k")).select($"k", $"payload", $"label")
      .collect().map(_.toSeq).toSet
    val salted = Salting.saltedJoin(fact, dim, "k", 8)
      .select($"k", $"payload", $"label")
      .collect().map(_.toSeq).toSet
    assert(salted === plain)
    assert(plain.nonEmpty)
  }

  test("skew-stats recommendation feeds saltedJoin: result-identical, naive-model-exact") {
    // the pipeline_skew_stats → Salting.saltedJoin handoff on the real
    // event stream: compute the recommended fan-out for event_type, use
    // it as the salt count, and pin result identity with the plain join
    val dir = "/root/testdata/sf0.001"
    val stats = graft.queries.Pipeline.skewStats(spark, dir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(6))).toMap
    val (nRows, nKeys, maxCnt, saltRec) = stats("event_type")
    // naive model of the recommendation
    assert(saltRec === math.max(1L, (maxCnt * 32L + nRows - 1L) / nRows))
    assert(nKeys > 0 && maxCnt > 0)
    val ev = graft.Tables.events(spark, dir)
      .select(col("event_type").as("k"), col("event_id"))
    val dim = ev.select($"k").distinct().withColumn("label", concat(lit("t:"), $"k"))
    val plain = ev.join(dim, Seq("k")).select($"k", $"event_id", $"label")
      .collect().map(_.toSeq).toSet
    val salted = Salting.saltedJoin(ev, dim, "k", saltRec.toInt)
      .select($"k", $"event_id", $"label").collect().map(_.toSeq).toSet
    assert(salted === plain && plain.nonEmpty)
  }

  test("salt values actually spread the hot key") {
    val fact = (1 to 500).map(i => (42L, s"v$i")).toDF("k", "payload")
    val salts = fact.withColumn("__salt",
        pmod(xxhash64(struct(fact.columns.map(col): _*)), lit(8)).cast("int"))
      .select($"__salt").distinct().count()
    assert(salts >= 6, s"expected the hot key spread over most salt buckets, got $salts")
  }
}
