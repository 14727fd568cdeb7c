package graft

import org.apache.spark.sql.SparkSessionExtensions

/** SparkSessionExtensions entry point: makes graft's native functions
  * available to plain SQL. Usage:
  * {{{
  * SparkSession.builder()
  *   .withExtensions(new GraftExtensions)          // builder-time
  * // or on an existing session:
  * GraftExtensions.register(spark)                  // imperative
  * spark.sql("SELECT dot_product(a, b) FROM vecs")
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    org.apache.spark.sql.graft.CatalystBridge.functionDescriptors
      .foreach(ext.injectFunction)
    // pure range joins → cell-bucketized equi-joins (OFF until
    // spark.graft.rangeJoin.cellWidth is set; see RangeJoinRewrite)
    ext.injectOptimizerRule(_ => new graft.plans.RangeJoinRewrite)
    // format("scd") native path: rewrite the DSv2 relation into the
    // compiled replay plan at analysis, so pushdown reaches the files
    // (without this, the format still works through its V1Scan
    // fallback — see graft.sources.ScdDataSource)
    ext.injectResolutionRule(session =>
      new org.apache.spark.sql.graft.ScdRelationRewrite(session))
  }
}

object GraftExtensions {
  /** Register on an already-built session (e.g. a notebook's). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    org.apache.spark.sql.graft.CatalystBridge.registerFunctions(spark)
}
