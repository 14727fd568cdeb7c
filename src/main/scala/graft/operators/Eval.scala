package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gate-calibration utilities: once a quality/classifier gate scores a
  * corpus (nbScore, qualityScore, a perplexity proxy), the operating
  * threshold has to come from somewhere — this is the relational
  * threshold sweep that produces the precision/recall/F1 curve the
  * cutoff is read off of.
  */
object Eval {

  /** Threshold sweep over a scored, labeled table: bucket scores onto
    * a fixed `nBins` grid over [lo, hi) (out-of-range scores clamp to
    * the edge bins), ONE map-side-combinable groupBy for per-bin
    * (rows, positives), then the cumulative keep-iff-score>=t sweep
    * runs over the TINY bin table (<= nBins rows, one window on a
    * single partition — deliberately, because nBins is a constant,
    * never corpus-sized). One output row per OCCUPIED bin:
    * threshold (the bin's lower edge), kept, tp, precision, recall
    * (NULL when the corpus has no positives), f1.
    *
    * The corpus-sized pass is the binning groupBy alone — the curve
    * costs one shuffle of nBins rows per mapper regardless of corpus
    * size. */
  def thresholdSweep(scored: DataFrame, scoreCol: Column, labelCol: Column,
      lo: Double, hi: Double, nBins: Int = 100): DataFrame = {
    require(nBins >= 1, s"nBins must be >= 1: $nBins")
    require(hi > lo, s"need hi > lo: [$lo, $hi)")
    val width = (hi - lo) / nBins
    val bin = least(lit(nBins - 1), greatest(lit(0),
      floor((scoreCol - lit(lo)) / lit(width)).cast("int")))
    val perBin = scored
      .select(bin.as("bin"), labelCol.cast("long").as("y"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"), sum(col("y")).as("n_pos"))
    val totals = perBin.agg(sum(col("n_pos")).as("total_pos"))
    val w = Window.orderBy(col("bin").desc)
    perBin
      .withColumn("kept", sum(col("n")).over(w))
      .withColumn("tp", sum(col("n_pos")).over(w))
      .crossJoin(broadcast(totals))
      .select(
        round(lit(lo) + col("bin").cast("double") * lit(width), 6)
          .as("threshold"),
        col("kept"), col("tp"),
        round(col("tp").cast("double") / col("kept").cast("double"), 6)
          .as("precision"),
        round(col("tp").cast("double") /
          nullif(col("total_pos"), lit(0)).cast("double"), 6).as("recall"),
        round(lit(2.0) * col("tp").cast("double") /
          (col("kept") + col("total_pos")).cast("double"), 6).as("f1"))
      .orderBy("threshold")
  }
}
