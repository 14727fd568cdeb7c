package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization: a new session starts when the gap to the
  * previous event of the same user exceeds `gapSeconds`.
  *
  * Two windows over one partitioning (user, ordered by time): the
  * boundary flag via `lag`, then the session id as the running sum of
  * boundaries — a single shuffle on user_id, then narrow. At 100 TB
  * the cost is one hash partition + per-partition sort; no state
  * explosion (contrast with collecting events per user). */
object Sessionize {

  /** Output: one row per session — user, session_seq (1-based per
    * user), n_events, start/end in epoch micros, duration_s. */
  def sessions(events: DataFrame, userCol: String = "user_id",
      tsCol: String = "ts", idCol: String = "event_id",
      gapSeconds: Long = 1800): DataFrame = {
    // tsCol may be a timestamp or a pre-computed epoch-micros long
    val us = events.schema(tsCol).dataType match {
      case org.apache.spark.sql.types.LongType => col(tsCol)
      case _ => unix_micros(col(tsCol))
    }
    val w = Window.partitionBy(col(userCol)).orderBy(us, col(idCol))
    val withFlag = events.withColumn("__prev_us", lag(us, 1).over(w))
      .withColumn("__new_session",
        when(col("__prev_us").isNull ||
          us - col("__prev_us") > gapSeconds * 1000000L, 1).otherwise(0))
    val withId = withFlag.withColumn("session_seq",
      sum(col("__new_session")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("long"))
    withId.groupBy(col(userCol), col("session_seq"))
      .agg(
        count(lit(1)).as("n_events"),
        min(us).as("start_us"),
        max(us).as("end_us"),
        round((max(us) - min(us)) / 1e6, 3).as("duration_s"))
  }
}
