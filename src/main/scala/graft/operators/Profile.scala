package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Data-profiling aggregates: the quick-look statistics a pipeline
  * computes over a new source before deciding how to mix/filter it. */
object Profile {

  /** Equal-width histogram of a numeric column: global min/max via one
    * aggregate (broadcast back as a 1-row table — never a driver
    * collect), bucket index by floor((v − min)/width) clamped to the
    * last bucket, one groupBy(bucket) count. Two passes over the data,
    * both map-side combinable — the standard distributed histogram.
    *
    * Determinism: min/max/width/bucket arithmetic is a fixed chain of
    * IEEE double ops on exactly-agreed inputs — identical in any
    * engine; bucket bounds are rounded for display only. Empty buckets
    * are absent from the output (join a sequence if density is
    * needed). Output: bucket, lo, hi, n. */
  def histogram(df: DataFrame, valueCol: Column, nBuckets: Int): DataFrame = {
    require(nBuckets >= 1, s"nBuckets must be >= 1: $nBuckets")
    val bounds = df.agg(
      min(valueCol.cast("double")).as("__mn"),
      max(valueCol.cast("double")).as("__mx"))
    val width = (col("__mx") - col("__mn")) / nBuckets
    // coalesce BEFORE least: least/greatest IGNORE null operands (in
    // Spark and DuckDB alike), so a width-0 null bucket would otherwise
    // come out as the max bucket instead of 0
    val bucket = least(
      coalesce(
        floor((valueCol.cast("double") - col("__mn")) /
          nullif(width, lit(0.0))).cast("long"),
        lit(0L)),
      lit(nBuckets - 1L))
    // NULL values are excluded (min/max already ignore them); without
    // this the width-0 coalesce would silently count NULLs in bucket 0
    df.where(valueCol.isNotNull).crossJoin(broadcast(bounds))
      .withColumn("bucket", bucket)
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"),
        round(first(col("__mn")) + first(width) * col("bucket"), 6).as("lo"),
        round(first(col("__mn")) + first(width) * (col("bucket") + 1), 6)
          .as("hi"))
      .select(col("bucket"), col("lo"), col("hi"), col("n"))
  }
}
