package org.apache.spark

/** Main-source bridge into Spark's package-private listener bus (the
  * test twin is `GraftTestBridges`; the SQL twin is
  * `org.apache.spark.sql.GraftColumnBridge`). CkptDrill reads
  * listener-fed recovery counters after a run; a fixed sleep races a
  * backlogged bus (r18 advisor — late ExecutorRemoved/TaskEnd
  * delivery made the drill flakily claim no kill landed), while a
  * bus drain is exact. */
object GraftListenerBridge {
  def waitUntilListenerBusEmpty(sc: SparkContext, timeoutMs: Long): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMs)
}
