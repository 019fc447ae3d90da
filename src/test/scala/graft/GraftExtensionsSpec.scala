package graft

import org.apache.spark.sql.{GraftExtensionsBridge, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier

/** `spark.sql.extensions=graft.GraftExtensions` must make `hop_subtract`
  * resolvable in plain SQL with no user registration call. The config is
  * STATIC (read from the SparkContext at session build), so a suite
  * sharing one context cannot build a fresh extension-configured session;
  * instead the spec applies the extension's injected functions to the
  * live session's registry through the same `registerFunctions` hook the
  * session builder invokes, and drives SQL end-to-end.
  */
class GraftExtensionsSpec extends SparkTestBase {

  test("extension-injected hop_subtract resolves in SQL; 3-arg contract enforced") {
    val registry = spark.sessionState.functionRegistry
    val ident = FunctionIdentifier("hop_subtract")
    // start from a session with NO user registration
    registry.dropFunction(ident)
    val err = intercept[Exception](
      spark.sql("SELECT hop_subtract(array('a'), array('a'), array('a'))").collect())
    assert(err.getMessage.contains("hop_subtract"), s"expected unresolved routine: ${err.getMessage}")

    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext)
    GraftExtensionsBridge.applyFunctions(ext, registry)

    val out = spark.sql(
      """SELECT hop_subtract(array('a','b','c','d'), array('b'), array('d')) AS walk"""
    ).collect()(0).getSeq[String](0)
    // hop (b→d): 'b' and 'c' dropped, 'd' (the to-node) kept
    assert(out === Seq("a", "d"))

    val arity = intercept[Exception](
      spark.sql("SELECT hop_subtract(array('a'))").collect())
    assert(arity.getMessage.contains("3 arguments"), s"got: ${arity.getMessage}")
  }

  test("extension-injected graft_quantized_dot resolves in SQL") {
    val registry = spark.sessionState.functionRegistry
    registry.dropFunction(FunctionIdentifier("graft_quantized_dot"))
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext)
    GraftExtensionsBridge.applyFunctions(ext, registry)

    val d = spark.sql(
      """SELECT graft_quantized_dot(array(CAST(0.5 AS FLOAT), CAST(2.0 AS FLOAT)),
        |                           array(CAST(0.5 AS FLOAT), CAST(0.25 AS FLOAT))) AS d""".stripMargin)
      .head().getLong(0)
    assert(d === 500L * 500L + 2000L * 250L)

    val arity = intercept[Exception](
      spark.sql("SELECT graft_quantized_dot(array(CAST(1.0 AS FLOAT)))").collect())
    assert(arity.getMessage.contains("2 arguments"), s"got: ${arity.getMessage}")
  }

  test("extension-injected graft_hamming_dist resolves in SQL") {
    val registry = spark.sessionState.functionRegistry
    registry.dropFunction(FunctionIdentifier("graft_hamming_dist"))
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext)
    GraftExtensionsBridge.applyFunctions(ext, registry)

    val d = spark.sql(
      """SELECT graft_hamming_dist(array(CAST(5 AS BIGINT), CAST(-1 AS BIGINT)),
        |                          array(CAST(3 AS BIGINT))) AS d""".stripMargin)
      .head().getLong(0)
    assert(d === 2L + 64L) // 101^011 = 2 bits; -1 vs zero-pad = 64 bits

    val arity = intercept[Exception](
      spark.sql("SELECT graft_hamming_dist(array(CAST(1 AS BIGINT)))").collect())
    assert(arity.getMessage.contains("2 arguments"), s"got: ${arity.getMessage}")
  }

  test("extension-injected graft_space_saving aggregates in SQL") {
    val registry = spark.sessionState.functionRegistry
    registry.dropFunction(FunctionIdentifier("graft_space_saving"))
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext)
    GraftExtensionsBridge.applyFunctions(ext, registry)

    val rows = spark.sql(
      """SELECT e.key AS k, e.cnt AS c, e.err AS er
        |FROM (SELECT explode(hh) AS e FROM (
        |  SELECT graft_space_saving(v, 16, 3) AS hh
        |  FROM VALUES (7L),(7L),(9L),(7L),(9L),(1L) AS t(v)))""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(rows === Seq((7L, 3L, 0L), (9L, 2L, 0L), (1L, 1L, 0L)))

    val nonLit = intercept[Exception](
      spark.sql("SELECT graft_space_saving(v, v, 3) FROM VALUES (1L) AS t(v)").collect())
    assert(nonLit.getMessage.contains("literal"), s"got: ${nonLit.getMessage}")
  }
}
