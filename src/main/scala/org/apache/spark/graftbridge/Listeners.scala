package org.apache.spark.graftbridge

import org.apache.spark.SparkContext

/** `private[spark]` seam for the bench's spill instrumentation: listener
  * events post asynchronously, so per-query attribution of task metrics
  * needs the bus drained between queries. Accessor only — no Spark
  * internals are re-implemented here (same posture as
  * [[org.apache.spark.sql.graftbridge.Bridge]]).
  */
object Listeners {
  def drain(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
