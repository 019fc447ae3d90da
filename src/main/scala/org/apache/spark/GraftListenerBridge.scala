package org.apache.spark

/** `private[spark]` access shim (the GraftDatasetBridge pattern): the
  * bench's per-query resource attribution (graft.BenchMetrics, VERDICT
  * r13 #1) needs the async listener bus DRAINED at each query boundary,
  * or task-end metrics posted after the timing window would bleed into
  * the next query's deltas. */
object GraftListenerBridge {

  /** Block until every queued listener event is delivered (bounded);
    * a timeout degrades to "deltas may bleed slightly" rather than an
    * error — attribution noise, never a lost bench line. */
  def drain(sc: SparkContext, timeoutMs: Long = 10000L): Boolean =
    try { sc.listenerBus.waitUntilEmpty(timeoutMs); true }
    catch { case _: java.util.concurrent.TimeoutException => false }
}
