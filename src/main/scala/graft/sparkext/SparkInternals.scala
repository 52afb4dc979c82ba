package org.apache.spark.sql.graftext

import org.apache.spark.SparkContext

/** Dev-probe access to `private[spark]` surfaces (this package sits
  * inside the spark namespace). Not part of the library API. */
object SparkInternals {
  /** Block until queued listener events are delivered — required before
    * reading listener-accumulated metrics deltas (the bus is async). */
  def drainListenerBus(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}
