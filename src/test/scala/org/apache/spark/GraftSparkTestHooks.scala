package org.apache.spark

/** Test-only bridge to `private[spark]` internals: lets graft specs drain
  * the async listener bus before reading listener-counted metrics (job
  * counts), the same way Spark's own test utilities do. Test scope only —
  * main code never reaches into org.apache.spark internals.
  */
object GraftSparkTestHooks {
  def waitListenerBus(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}
