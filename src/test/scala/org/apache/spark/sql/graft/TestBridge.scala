package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSession

/** Test-only access to `private[spark]` internals (the
  * [[CatalystBridge]] pattern, but on the TEST classpath — production
  * code never needs these).
  *
  * `waitListenerBus` drains the shared listener bus so a
  * QueryExecutionListener registered by a spec has seen every
  * execution of the actions run so far — PlanAuditSpec uses it to
  * audit plans of CONSTRUCTION-TIME jobs (driver-finish statistics
  * like mannWhitneyU execute inside query construction; their plans
  * never appear in the returned DataFrame). */
object TestBridge {
  def waitListenerBus(spark: SparkSession): Unit =
    spark.sparkContext.listenerBus.waitUntilEmpty()
}
