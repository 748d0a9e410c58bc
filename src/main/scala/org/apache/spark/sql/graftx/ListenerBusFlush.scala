package org.apache.spark.sql.graftx

import org.apache.spark.sql.SparkSession

/** Test-support accessor: drain the shared listener bus so
  * QueryExecutionListener callbacks registered by a lint (WindowSweepSpec's
  * checkpoint-boundary sweep) have all fired before the lint inspects what
  * they captured. `SparkContext.listenerBus` is `private[spark]`, hence the
  * org.apache.spark-rooted package — the same access pattern Spark's own
  * test utilities use. */
object ListenerBusFlush {
  def flush(spark: SparkSession): Unit =
    spark.sparkContext.listenerBus.waitUntilEmpty()
}
