package graft

import graft.functions.{HammingDistExpr, HopSubtractExpr, QuantizedDotExpr}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session-extensions injector: registers the engine's native Catalyst
  * functions at session-build time via
  * `--conf spark.sql.extensions=graft.GraftExtensions` — the integration
  * path for clusters where the platform (not user code) builds the
  * session, so an explicit [[graft.functions.Functions.registerAll]] call
  * is impossible. Analyzer-level registration: `hop_subtract` resolves in
  * plain `spark.sql` text on any session built with the extension.
  *
  * Scala-UDF-backed helpers (token counts) stay in
  * [[graft.functions.Functions.registerAll]]: they need a live session's
  * UDF registry, and unlike the native expressions they bring no
  * analyzer/codegen benefit that would justify expression wrappers.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("hop_subtract"),
      new ExpressionInfo(classOf[HopSubtractExpr].getName, "hop_subtract"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 3,
          s"hop_subtract(walk, from_nodes, to_nodes) takes 3 arguments, got ${exprs.length}")
        HopSubtractExpr(exprs(0), exprs(1), exprs(2))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_quantized_dot"),
      new ExpressionInfo(classOf[QuantizedDotExpr].getName, "graft_quantized_dot"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2,
          s"graft_quantized_dot(a, b) takes 2 arguments, got ${exprs.length}")
        QuantizedDotExpr(exprs(0), exprs(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_hamming_dist"),
      new ExpressionInfo(classOf[HammingDistExpr].getName, "graft_hamming_dist"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2,
          s"graft_hamming_dist(a, b) takes 2 arguments, got ${exprs.length}")
        HammingDistExpr(exprs(0), exprs(1))
      }))
    // the custom AGGREGATE surfaces in SQL too: capacity/k must be
    // foldable integer literals (they parameterize the buffer, not the
    // per-row evaluation)
    ext.injectFunction((
      FunctionIdentifier("graft_space_saving"),
      new ExpressionInfo(
        classOf[graft.functions.SpaceSavingAgg].getName, "graft_space_saving"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 3,
          s"graft_space_saving(key, capacity, k) takes 3 arguments, got ${exprs.length}")
        def intLit(e: Expression, name: String): Int = {
          require(e.foldable, s"graft_space_saving: $name must be a literal")
          e.eval(null) match {
            case i: Int => i
            case l: Long => l.toInt
            case other => throw new IllegalArgumentException(
              s"graft_space_saving: $name must be an integer literal, got $other")
          }
        }
        graft.functions.SpaceSavingAgg(exprs(0),
          intLit(exprs(1), "capacity"), intLit(exprs(2), "k"))
          .toAggregateExpression()
      }))
    ()
  }
}
