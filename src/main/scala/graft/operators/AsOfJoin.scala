package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ByteType, DataType, IntegerType,
  LongType, ShortType, StructField, StructType}

/** As-of (temporal) join: for each left row, the matching right row by
  * time with the same key — `backward` (most recent rightTime <=
  * leftTime, the default), `forward` (earliest rightTime >= leftTime),
  * or `nearest` (smaller absolute time gap; ties to backward) — the
  * direction set of pandas `merge_asof`.
  *
  * Implementation is the union-tag pattern, not a range join: tag both
  * sides, union, and carry the latest right row forward with
  * `last_value(..., ignoreNulls) OVER (PARTITION BY key ORDER BY time)`
  * (resp. `first_value` over the following frame for forward; both
  * frames over ONE sort for nearest). One shuffle on the key (the
  * union sorts within partitions), versus a range join's quadratic
  * per-key blowup — this is the formulation that survives 100 TB: cost
  * is sort + single pass, identical to what a dedicated MERGE_ASOF
  * physical operator would do, expressed with built-ins so
  * Catalyst/AQE stay in charge.
  */
object AsOfJoin {

  /** Internal struct field carrying the matched right row's time for
    * `nearest` distance comparison (numeric time required there). */
  private val RtField = "__graft_rt"

  /** @param left      probe side (e.g. fact events)
    * @param right     reference side whose latest-at-time row attaches
    * @param key       equi-join column present on both sides
    * @param leftTime  event-time column on left
    * @param rightTime event-time column on right
    * @param rightCols right columns to attach (renamed as given)
    * @param tieBreak  column making (key, time) total — keeps the
    *                  "latest" choice deterministic under time ties
    * @param direction `backward` | `forward` | `nearest`. Backward
    *                  attaches the LATEST right row at-or-before the
    *                  probe time (ties on time: largest tieBreak);
    *                  forward the EARLIEST at-or-after (ties: smallest
    *                  tieBreak); nearest whichever of the two is closer
    *                  in time, backward winning exact-distance ties.
    *                  `nearest` requires a numeric (castable-to-long)
    *                  time column — it subtracts timestamps.
    *
    * Output: all left columns + for each (rc, alias) the as-of value
    * (NULL when no right row precedes).
    *
    * The attached columns travel as ONE non-null struct per right row
    * (ADVICE r01): `last(..., ignoreNulls)` then distinguishes "no
    * preceding right row" (struct NULL) from "preceding right row with
    * a genuinely NULL payload column" (struct non-null, field NULL) —
    * a per-column carry would skip the latter and resurrect older
    * values.
    */
  def asOf(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String,
      rightCols: Seq[(String, String)], tieBreak: String,
      direction: String = "backward"): DataFrame = {
    require(Set("backward", "forward", "nearest")(direction),
      s"direction must be backward|forward|nearest, got '$direction'")
    // nearest compares long-cast time distances; a non-integral time
    // column would cast to NULL and silently degrade to backward, and
    // a timestamp would lose sub-second precision — enforce the
    // documented contract instead (cast to epoch micros upstream)
    if (direction == "nearest") {
      def integral(dt: DataType): Boolean = dt match {
        case ByteType | ShortType | IntegerType | LongType => true
        case _ => false
      }
      val lt = left.schema(leftTime).dataType
      val rt = right.schema(rightTime).dataType
      require(integral(lt) && integral(rt),
        "direction='nearest' requires integral time columns (cast " +
          s"timestamps to epoch micros first); got $leftTime: $lt, " +
          s"$rightTime: $rt")
    }
    // a NULL-time row has no as-of position (r16 adversarial events
    // sweep class): the union-tag sort would place an undated quote
    // BEFORE all time in Spark (nulls first) but AFTER all time in a
    // NULLS-LAST engine — the same row silently becomes "the earliest
    // quote" or "the latest", two different wrong answers. Dropped on
    // BOTH sides: an undated reference can never attach, an undated
    // probe has nothing defined to see.
    val left1 = left.where(col(leftTime).isNotNull)
    val right1 = right.where(col(rightTime).isNotNull)
    val leftCols = left.columns
    // nearest carries the matched right time inside the payload struct
    // so the projection can compare the two candidates' distances
    val rtFields: Seq[(Column, StructField)] =
      if (direction == "nearest")
        Seq((col(rightTime).cast(LongType).as(RtField),
          StructField(RtField, LongType, nullable = true)))
      else Seq.empty
    val payload = struct(rtFields.map(_._1) ++ rightCols.map {
      case (rc, alias) => col(rc).as(alias) }: _*)
    val payloadType = StructType((rtFields.map(_._2) ++ rightCols.map {
      case (rc, alias) =>
        StructField(alias, right.schema(rc).dataType, nullable = true)
    }).toArray)
    val meta = Seq(key, "__t", "__side", "__tb", "__r")
    val leftSel = left1
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1))
      .withColumn("__tb", col(tieBreak))
      .withColumn("__r", lit(null).cast(payloadType))
      .select((meta ++ leftCols.filterNot(_ == key)).map(col): _*)
    val rightSel = right1
      .withColumn("__t", col(rightTime))
      .withColumn("__side", lit(0))
      .withColumn("__tb", col(tieBreak))
      .withColumn("__r", payload)
      .select(meta.map(col): _*)
    val unioned = leftSel.unionByName(rightSel, allowMissingColumns = true)
    applyWindow(unioned, key, leftCols.toIndexedSeq, rightCols, direction)
  }

  /** Wide-row variant: only (uid, key, time, tie-break) go through the
    * window's shuffle + sort; the resolved as-of payload then joins
    * back to the untouched left rows on `uid` (MUST be unique per left
    * row — typically the event id already serving as tie-break).
    *
    * Why it exists: the base `asOf` sorts ENTIRE left rows inside the
    * window partition, so at a wide fact schema the sort/spill cost is
    * dominated by payload bytes that the as-of logic never looks at.
    * Here the sort touches 4 narrow columns; the payload moves once,
    * through a hash equi-join that AQE can plan (and skew-split). Same
    * output and semantics as `asOf` — proven by equality in
    * AsOfJoinSpec. Prefer this at 100 TB whenever left has more than a
    * handful of columns; prefer `asOf` when left is already narrow
    * (the rejoin's extra shuffle outweighs the slimmer sort). */
  def asOfSlim(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String,
      rightCols: Seq[(String, String)], tieBreak: String,
      uid: String, direction: String = "backward"): DataFrame = {
    val slimCols = Seq(uid, key, leftTime, tieBreak).distinct
    val attached = asOf(left.select(slimCols.map(col): _*), right, key,
      leftTime, rightTime, rightCols, tieBreak, direction)
    val payload = attached.select((uid +: rightCols.map(_._2)).map(col): _*)
    left.join(payload, Seq(uid))
  }

  private def applyWindow(unioned: DataFrame, key: String,
      leftCols: Seq[String], rightCols: Seq[(String, String)],
      direction: String): DataFrame = {
    // ascending scan: right rows sort before left rows at equal time
    // (side 0 < 1), so a right row AT the probe's timestamp is already
    // visible to the backward carry (<= is inclusive)
    val asc = Window.partitionBy(col(key))
      .orderBy(col("__t"), col("__side"), col("__tb"))
    val carried = direction match {
      case "backward" =>
        unioned.withColumn("__asof", last(col("__r"), ignoreNulls = true)
          .over(asc.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      case "forward" =>
        // side DESC puts equal-time right rows AFTER the left row, so
        // the following-frame carry sees them (>= stays inclusive);
        // first-by-scan at the earliest qualifying time = smallest
        // tieBreak — deterministic mirror of backward's largest
        val w = Window.partitionBy(col(key))
          .orderBy(col("__t"), col("__side").desc, col("__tb"))
          .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        unioned.withColumn("__asof", first(col("__r"), ignoreNulls = true).over(w))
      case "nearest" =>
        // both frames over ONE ascending sort (a single WindowExec: the
        // partition and order specs are shared, only the frames differ).
        // An equal-time right row is only in the backward frame, but
        // its distance is 0 so backward wins regardless — forward
        // deliberately sees the strictly-later rows only.
        val bwd = last(col("__r"), ignoreNulls = true)
          .over(asc.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        val fwd = first(col("__r"), ignoreNulls = true)
          .over(asc.rowsBetween(Window.currentRow, Window.unboundedFollowing))
        val withBoth = unioned
          .withColumn("__bwd", bwd).withColumn("__fwd", fwd)
        val lt = col("__t").cast(LongType)
        val bt = col("__bwd").getField(RtField)
        val ft = col("__fwd").getField(RtField)
        val chosen = when(col("__fwd").isNull, col("__bwd"))
          .when(col("__bwd").isNull, col("__fwd"))
          .when(ft - lt < lt - bt, col("__fwd"))
          .otherwise(col("__bwd")) // ties (incl. dist 0) → backward
        withBoth.withColumn("__asof", chosen)
    }
    carried.where(col("__side") === 1)
      .select(leftCols.toIndexedSeq.map(col) ++ rightCols.map { case (_, alias) =>
        col("__asof").getField(alias).as(alias) }: _*)
  }
}
