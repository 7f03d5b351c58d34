package org.apache.spark.graft

import org.apache.spark.SparkContext

/** `LiveListenerBus.waitUntilEmpty` is `private[spark]`; this shim exposes
  * a deterministic drain so task-metric listeners (ScaleProbe) read fully
  * accumulated counters instead of racing the async bus behind a sleep.
  */
object ListenerDrain {
  def waitUntilEmpty(sc: SparkContext, timeoutMillis: Long = 30000L): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMillis)
}
