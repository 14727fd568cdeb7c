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
    * user), n_events, start/end in epoch micros, duration_s.
    *
    * NULL-timestamp events are DROPPED (r16 adversarial events sweep):
    * an event without a time has no position on the time axis, so its
    * session membership would be an artifact of the engine's null
    * ordering — Spark windows sort nulls FIRST (the event became its
    * own leading session), DuckDB's replay folded it elsewhere.
    * Dropping is the only order-independent answer; a NULL user_id is
    * fine (it is a GROUP, not an ordering input) and keeps its own
    * sessions. */
  def sessions(events: DataFrame, userCol: String = "user_id",
      tsCol: String = "ts", idCol: String = "event_id",
      gapSeconds: Long = 1800): DataFrame = {
    // tsCol may be a timestamp or a pre-computed epoch-micros long
    val us = events.schema(tsCol).dataType match {
      case org.apache.spark.sql.types.LongType => col(tsCol)
      case _ => unix_micros(col(tsCol))
    }
    val timed = events.where(us.isNotNull)
    val w = Window.partitionBy(col(userCol)).orderBy(us, col(idCol))
    val withFlag = timed.withColumn("__prev_us", lag(us, 1).over(w))
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

  /** Ordered-step funnel: per user, t_k = earliest `steps(k)` event at
    * or after t_(k-1) (t_0 = earliest `steps(0)` event). A user appears
    * with NULL t_k once a step is never completed in order.
    *
    * Scale: one groupBy + one shuffle join per step, all keyed on the
    * user — each stage's left side is the per-user funnel table (one
    * row per user who completed step 0), each right side the
    * type-filtered event slice; nothing quadratic, no windows over the
    * raw event stream. */
  def funnel(events: DataFrame, steps: Seq[String],
      userCol: String = "user_id", tsCol: String = "ts_us",
      typeCol: String = "event_type"): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val ts = col(tsCol)
    var cur = events.where(col(typeCol) === steps.head)
      .groupBy(col(userCol)).agg(min(ts).as("t_0"))
    for (k <- 1 until steps.size) {
      val next = events.where(col(typeCol) === steps(k))
        .select(col(userCol), ts)
        .join(cur.select(col(userCol), col(s"t_${k - 1}")), Seq(userCol))
        .where(ts >= col(s"t_${k - 1}"))
        .groupBy(col(userCol)).agg(min(ts).as(s"t_$k"))
      cur = cur.join(next, Seq(userCol), "left")
    }
    cur
  }

  /** Funnel stage counts + step-over-step conversion: one row per
    * step — (step_idx, step, n_users, conv). The window runs over the
    * `steps.size`-row summary, not the event stream. */
  def funnelSummary(events: DataFrame, steps: Seq[String],
      userCol: String = "user_id", tsCol: String = "ts_us",
      typeCol: String = "event_type"): DataFrame = {
    val perUser = funnel(events, steps, userCol, tsCol, typeCol)
    val counts = perUser.agg(
      count(col("t_0")).as("n_0"),
      (1 until steps.size).map(k => count(col(s"t_$k")).as(s"n_$k")): _*)
    val stackArgs = steps.indices
      .map(k => s"CAST($k AS BIGINT), '${steps(k)}', n_$k").mkString(", ")
    val stacked = counts.select(expr(
      s"stack(${steps.size}, $stackArgs) AS (step_idx, step, n_users)"))
    val w = Window.orderBy("step_idx")
    val prev = lag(col("n_users"), 1).over(w)
    stacked.withColumn("conv",
      when(prev > 0, round(col("n_users").cast("double") / prev, 4)))
  }

  /** Autocorrelation of the event rate at chosen lags — the
    * seasonality diagnostic behind alert thresholds and traffic
    * models ("is there a daily cycle?" = ACF at lag 24 on hourly
    * buckets). Missing buckets count as ZERO events (a dark hour is
    * data, and skipping it would misalign every lag), so the series
    * densifies over the full [min, max] bucket range first.
    *
    * Exact arithmetic: per-lag Pearson over (c_t, c_{t+k}) pairs with
    * all five sums in decimal(38,0) (bucket counts ≤ corpus rows;
    * n·Σxy stays under 10³⁸ for any realistic retention), one double
    * division against one IEEE sqrt, rounded to 6 — the engine's
    * correlation discipline ([[graft.operators.Eval.spearman]]).
    * acf is null for a constant series (zero variance).
    *
    * 100 TB shape: ONE map-side-combined groupBy to the bucket
    * table; the dense grid, self-joins, and sums are all bounded by
    * the TIME DOMAIN (~9 k hourly buckets/yr), never corpus rows.
    * Output: one row per lag — lag, n_pairs, acf. */
  def rateAutocorrelation(events: DataFrame, tsUsCol: String,
      bucketUs: Long, lags: Seq[Int]): DataFrame = {
    require(bucketUs > 0 && lags.nonEmpty && lags.forall(_ >= 1),
      s"rateAutocorrelation: bucketUs > 0 and lags >= 1: " +
        s"$bucketUs, $lags")
    val dec = "decimal(38,0)"
    val counts = events
      .select(expr(s"$tsUsCol div ${bucketUs}L").as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("c"))
    val bounds = counts.agg(min("bucket").as("mn"), max("bucket").as("mx"))
    val dense = bounds
      .select(explode(expr("sequence(mn, mx)")).as("bucket"))
      .join(counts, Seq("bucket"), "left")
      .select(col("bucket"), coalesce(col("c"), lit(0L)).as("c"))
      .localCheckpoint(false) // domain-bounded; feeds every lag join
    val perLag = lags.map { k =>
      val lead = dense.select((col("bucket") - k).as("bucket"),
        col("c").as("y"))
      dense.join(lead, "bucket")
        .agg(count(lit(1)).as("n_pairs"),
          sum(col("c").cast(dec)).as("sx"),
          sum(col("y").cast(dec)).as("sy"),
          sum(col("c").cast(dec) * col("y").cast(dec)).as("sxy"),
          sum(col("c").cast(dec) * col("c").cast(dec)).as("sxx"),
          sum(col("y").cast(dec) * col("y").cast(dec)).as("syy"))
        .select(lit(k.toLong).as("lag"), col("n_pairs"),
          expr("""CASE WHEN (n_pairs * sxx - sx * sx) = 0
                |  OR (n_pairs * syy - sy * sy) = 0 THEN NULL
                |ELSE round(CAST(n_pairs * sxy - sx * sy AS DOUBLE) /
                |  sqrt(CAST(n_pairs * sxx - sx * sx AS DOUBLE) *
                |    CAST(n_pairs * syy - sy * sy AS DOUBLE)), 6)
                |END""".stripMargin).as("acf"))
    }
    perLag.reduce(_ unionByName _)
  }

  /** Robust rate-anomaly detection over an event stream: per-bucket
    * counts scored by the MAD robust z — the ingest monitor ("which
    * hours spiked / went dark?") that survives exactly the outliers
    * that poison mean/σ control charts (a one-hour 100× spike drags
    * the mean; the median shrugs).
    *
    * Pure integer arithmetic, type-1 lower medians (rank ⌈n/2⌉):
    *   M = median(bucket counts); MAD = median(|c − M|)
    *   z_mil = sign(c − M) · (|c − M|·1000 div max(MAD,1))
    * and the flag compares MULTIPLICATIVELY (|c−M|·1000 ≥ thr·max(MAD,1))
    * so no division rounding sits on the decision boundary. The
    * division runs on the non-negative magnitude only — floor and
    * truncate agree there, so any engine replays z_mil bit-for-bit.
    *
    * 100 TB shape: the corpus pays ONE map-side-combined groupBy to
    * the bucket table; medians, deviations and scores all run on that
    * table, which is bounded by the TIME DOMAIN (~9 k hourly buckets
    * per retention year), never by corpus rows — the rank windows are
    * single-partition but domain-bounded (the q_resample precedent).
    *
    * Output: bucket, n_events, med, mad, z_mil, is_anomaly. */
  def rateAnomalies(events: DataFrame, tsUsCol: String, bucketUs: Long,
      zMilThreshold: Long): DataFrame = {
    require(bucketUs > 0 && zMilThreshold > 0,
      s"rateAnomalies: bucketUs and zMilThreshold must be > 0: " +
        s"$bucketUs, $zMilThreshold")
    val counts = events
      .select(expr(s"$tsUsCol div ${bucketUs}L").as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("c"))
      .localCheckpoint(false) // tiny; feeds 3 consumers below
    val n = counts.agg(count(lit(1)).as("n"))
    def rankPick(df: DataFrame, v: String, out: String): DataFrame = {
      val w = Window.orderBy(col(v), col("bucket"))
      df.withColumn("__rn", row_number().over(w))
        .crossJoin(broadcast(n))
        .where(col("__rn") === expr("(n + 1) div 2"))
        .select(col(v).as(out))
    }
    val med = rankPick(counts, "c", "med")
    val d = counts.crossJoin(broadcast(med))
      .withColumn("dev", abs(col("c") - col("med")))
    val mad = rankPick(d, "dev", "mad")
    d.crossJoin(broadcast(mad))
      .select(col("bucket"), col("c").as("n_events"),
        col("med"), col("mad"),
        (when(col("c") >= col("med"), 1L).otherwise(-1L) *
          expr("(abs(c - med) * 1000) div greatest(mad, 1L)"))
          .cast("long").as("z_mil"),
        (abs(col("c") - col("med")) * 1000 >=
          lit(zMilThreshold) * greatest(col("mad"), lit(1L)))
          .cast("long").as("is_anomaly"))
  }
}
