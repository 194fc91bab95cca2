package org.apache.spark

/** Test-only bridge into Spark package-private API (the main-source
  * analog is `org.apache.spark.sql.GraftColumnBridge`): the listener
  * bus flush lets HofGuardSpec assert on asynchronously-delivered
  * QueryExecutionListener events without sleeping. */
object GraftTestBridges {
  def waitUntilListenerBusEmpty(sc: SparkContext, timeoutMs: Long): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMs)
}
