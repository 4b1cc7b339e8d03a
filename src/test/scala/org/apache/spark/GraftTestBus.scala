package org.apache.spark

/** Test-only accessor for the private[spark] listener bus: lets specs
  * deterministically drain async event delivery (instead of a fixed
  * Thread.sleep that races on loaded hosts) before asserting on what a
  * SparkListener observed.
  */
object GraftTestBus {
  def drain(sc: SparkContext, timeoutMs: Long): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMs)
}
