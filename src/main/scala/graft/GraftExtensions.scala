package graft

import graft.functions.HopSubtractExpr
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
  * Scala-UDF-backed helpers (token counts, quantized dots) stay in
  * [[graft.functions.Functions.registerAll]]: they need a live session's
  * UDF registry, and unlike the native expression they bring no
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
    ()
  }
}
