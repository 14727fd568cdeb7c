package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SCD merge/upsert patterns — the Spark-SQL operations the reference's
  * Type-7 design maps onto for forward maintenance (BASELINE.json
  * north_star: "SCD ETL patterns map directly to Spark SQL
  * merge/upsert operations").
  *
  *   - `upsert` (SCD Type 1): staging overwrites matching keys,
  *     unmatched dim rows pass through. One shuffle (the anti-join on
  *     the key) + a union; with both sides bucketed by the key the
  *     join is co-located and shuffle-free.
  *   - `scd2FromChangeLog` (SCD Type 2): reconstruct versioned history
  *     from a change stream with `lead()` over (key, time) — one
  *     shuffle on the key; each version's validity is
  *     [ts, next_ts), open-ended for the current row.
  *   - `snapshotAsOf`: the SCD2 complement of the reference's
  *     `scd.time` — select the version effective at a timestamp.
  */
object ScdMerge {

  /** Type-1 merge: rows of `staging` replace dim rows with the same
    * key; new keys are inserted. Column sets must match. */
  def upsert(dim: DataFrame, staging: DataFrame, key: String): DataFrame =
    dim.join(staging.select(key), Seq(key), "left_anti")
      .unionByName(staging.select(dim.columns.toIndexedSeq.map(col): _*))

  /** Build SCD2 version intervals from a change log.
    *
    * @param changes  one row per (key, changeTime, attributes)
    * @param tieBreak column making (key, time) total
    * @return input columns + valid_from_us, valid_to_us (NULL = open /
    *         current), is_current
    */
  def scd2FromChangeLog(changes: DataFrame, key: String, tsCol: String,
      tieBreak: String): DataFrame = {
    // accept either a timestamp column or a pre-computed epoch-micros
    // long (callers normalize to micros when the source has finer
    // precision than Spark's TimestampType, e.g. parquet ns)
    val ts = changes.schema(tsCol).dataType match {
      case org.apache.spark.sql.types.LongType => col(tsCol)
      case _ => unix_micros(col(tsCol))
    }
    val w = Window.partitionBy(col(key)).orderBy(ts, col(tieBreak))
    changes
      .withColumn("valid_from_us", ts)
      .withColumn("valid_to_us", lead(ts, 1).over(w))
      .withColumn("is_current", col("valid_to_us").isNull)
  }

  /** Rows of an SCD2 table effective at `asOfUs` (micros):
    * valid_from <= t < valid_to. */
  def snapshotAsOf(scd2: DataFrame, asOfUs: Long): DataFrame =
    scd2.where(col("valid_from_us") <= asOfUs &&
      (col("valid_to_us").isNull || col("valid_to_us") > asOfUs))
}
