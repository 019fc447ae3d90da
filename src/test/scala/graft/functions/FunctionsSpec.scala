package graft.functions

import graft.SparkTestBase

/** SQL-surface registration: hop_subtract as a native analyzer-registered
  * function plus the named UDF kernels. */
class FunctionsSpec extends SparkTestBase {

  test("hop_subtract is callable from spark.sql") {
    Functions.registerAll(spark)
    val r = spark.sql(
      """SELECT hop_subtract(array('a','b','c','d','e'), array('b'), array('d')) AS walk""")
      .head().getSeq[String](0)
    assert(r === Seq("a", "d", "e"))
  }

  test("registered kernel UDFs work in SQL") {
    Functions.registerAll(spark)
    assert(spark.sql("SELECT graft_token_count('one two  three') AS n").head().getInt(0) === 3)
    assert(spark.sql(
      "SELECT graft_quantized_dot(array(CAST(1.0 AS FLOAT)), array(CAST(2.0 AS FLOAT))) AS d")
      .head().getLong(0) === 2000000L)
    assert(spark.sql(
      "SELECT graft_hamming_dist(array(CAST(5 AS BIGINT)), array(CAST(3 AS BIGINT))) AS d")
      .head().getLong(0) === 2L)
  }

  test("JdbcSink SQL builders produce well-formed statements") {
    val up = graft.sinks.JdbcSink.upsertSql("utility_network", "span_equipment",
      Seq("id", "interest_id", "name"))
    assert(up.contains("ON CONFLICT (id) DO UPDATE SET interest_id = EXCLUDED.interest_id, name = EXCLUDED.name"))
    val boot = graft.sinks.JdbcSink.bootstrapSql("utility_network")
    assert(boot.head === "CREATE SCHEMA IF NOT EXISTS utility_network")
    assert(boot.count(_.startsWith("CREATE TABLE")) === 8)
    assert(graft.sinks.JdbcSink.deleteSql("s", "rel_interest_to_route_element")
      === "DELETE FROM s.rel_interest_to_route_element WHERE interest_id = ?")
  }
}
