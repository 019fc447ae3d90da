package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffle joins: when one join key dominates (a hot
  * route node, a celebrity user), a plain hash-partitioned join puts the
  * whole hot key in one task. Salting splits the hot key across
  * `saltCount` sub-partitions: the large (skewed) side gets a pseudo-
  * random salt per row, the small side is replicated once per salt value,
  * and the join runs on (key, salt) — identical results, `saltCount`-way
  * parallelism on the hot key.
  *
  * AQE's skew-join handling (`spark.sql.adaptive.skewJoin.enabled`, on by
  * default) covers sort-merge joins automatically; explicit salting
  * remains the tool for aggregations-after-join and for engines pinned to
  * hash joins. Result equality with the plain join is property-tested.
  */
object Salting {

  /** Inner equi-join of `large` (skewed) with `small` on `key`, salted
    * `saltCount` ways. Column sets must be disjoint apart from `key`. */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String, saltCount: Int): DataFrame = {
    // deterministic per-row salt: hash of the whole row spreads even a
    // single hot key uniformly (rand() would break retry idempotence)
    val saltedLarge = large.withColumn("__salt",
      pmod(xxhash64(struct(large.columns.map(col): _*)), lit(saltCount)).cast("int"))
    val replicatedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(saltCount - 1))))
    saltedLarge.join(replicatedSmall, Seq(key, "__salt")).drop("__salt")
  }
}
