package org.apache.spark

/**
 * Bridge to the `private[spark]` listener bus: tests that count jobs via a
 * SparkListener must drain the async bus deterministically before reading
 * their counters (a fixed sleep is flaky on loaded hosts).
 */
object GraftListenerBridge {
  def waitUntilListenerBusEmpty(sc: SparkContext, timeoutMs: Long): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMs)
}
