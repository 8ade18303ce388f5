package org.apache.spark.grafttest

import org.apache.spark.SparkContext

/** Test-only bridge to the private[spark] listener bus: lets specs drain
  * pending listener events so job-count assertions aren't racy (events are
  * delivered on async queue threads; without a drain, a previous action's
  * JobStart can leak into a freshly attached listener, or a just-finished
  * action's events can be counted late). */
object ListenerDrain {
  def drain(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty(30000)
}
