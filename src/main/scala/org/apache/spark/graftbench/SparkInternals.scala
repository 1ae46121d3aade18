package org.apache.spark.graftbench

import org.apache.spark.SparkContext

/** Bench-only bridge to two `private[spark]` members the public API does
  * not expose (standard extension-package pattern — no Spark internals
  * are modified, only read):
  *
  * `drainListenerBus` blocks until the async listener bus has delivered
  * every queued event. The bench attributes per-query executor CPU time
  * by snapshotting a SparkListener's task-metric accumulator before and
  * after each repetition; without the drain, task-end events still in
  * flight when the action returns would be charged to the NEXT
  * repetition — exactly the cross-talk the per-rep CPU attribution
  * exists to rule out. Never used by library code: operators must not
  * depend on listener timing.
  */
object SparkInternals {
  def drainListenerBus(sc: SparkContext): Unit =
    try sc.listenerBus.waitUntilEmpty()
    catch { case _: java.util.concurrent.TimeoutException => () }
}
