package org.apache.spark

/** Test-only bridge into `private[spark]` listener-bus internals:
  * deterministic listener-event draining for specs that assert on job
  * or SQL-execution counts (async bus, so a bare sleep would be flaky).
  */
object GraftTestBridge {
  def drainListenerBus(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}
