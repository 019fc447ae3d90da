package org.apache.spark.sql

import org.apache.spark.sql.catalyst.analysis.FunctionRegistry

/** Bridge into `private[sql]` [[SparkSessionExtensions.registerFunctions]]
  * so the extension's injected functions can be applied to an existing
  * session's registry — needed to TEST `spark.sql.extensions` wiring:
  * the config is static (read from the SparkContext at session build), so
  * a test suite sharing one context cannot exercise it via a new session.
  */
object GraftExtensionsBridge {
  def applyFunctions(ext: SparkSessionExtensions, registry: FunctionRegistry): Unit = {
    ext.registerFunctions(registry)
    ()
  }
}
