package org.apache.spark

/** Test-only bridge: `SparkContext.listenerBus` is `private[spark]`, but
  * job-count assertions need listener events flushed before reading the
  * counter — this exposes exactly that flush to the graft test suites.
  */
object ListenerBusAccess {
  def waitUntilEmpty(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
