package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Threshold-sweep specs on a hand-computable fixture. */
class EvalSpec extends SparkSpec {

  import spark.implicits._

  test("thresholdSweep: precision/recall/f1 per occupied bin, hand-checked") {
    val scored = Seq((0.95, 1L), (0.85, 0L), (0.75, 1L), (0.15, 0L))
      .toDF("score", "label")
    val rows = Eval.thresholdSweep(scored, col("score"), col("label"),
      lo = 0.0, hi = 1.0, nBins = 10)
      .collect().map(r => r.getDouble(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4),
          r.getDouble(5))).toMap
    assert(rows.keySet == Set(0.9, 0.8, 0.7, 0.1))
    assert(rows(0.9) == (1L, 1L, 1.0, 0.5, 0.666667))
    assert(rows(0.8) == (2L, 1L, 0.5, 0.5, 0.5))
    assert(rows(0.7)._1 == 3L && rows(0.7)._2 == 2L)
    assert(math.abs(rows(0.7)._3 - 0.666667) < 1e-6) // 2/3 rounded 6dp
    assert(rows(0.7)._4 == 1.0)
    assert(rows(0.1) == (4L, 2L, 0.5, 1.0, 0.666667))
  }

  test("thresholdSweep clamps out-of-range scores into the edge bins") {
    val scored = Seq((-5.0, 0L), (0.5, 1L), (99.0, 1L))
      .toDF("score", "label")
    val rows = Eval.thresholdSweep(scored, col("score"), col("label"),
      lo = 0.0, hi = 1.0, nBins = 10)
      .select("threshold", "kept").collect()
      .map(r => r.getDouble(0) -> r.getLong(1)).toMap
    // -5 clamps to bin 0 (threshold 0.0), 99 to bin 9 (threshold 0.9)
    assert(rows == Map(0.9 -> 1L, 0.5 -> 2L, 0.0 -> 3L))
  }

  test("thresholdSweep: no positives -> recall NULL, precision 0") {
    val scored = Seq((0.5, 0L), (0.6, 0L)).toDF("score", "label")
    val r = Eval.thresholdSweep(scored, col("score"), col("label"),
      lo = 0.0, hi = 1.0, nBins = 4).collect()
    assert(r.forall(_.isNullAt(4)), "recall must be NULL with no positives")
    assert(r.forall(_.getDouble(3) == 0.0))
  }

  test("reliability: sigmoid binning, exact per-bin means, edge clamp") {
    // scores 0 -> prob .5 (bin 5); ±large saturate to bins 0/9
    val rows = Seq(
      (0.0, 1L), (0.0, 0L),        // bin 5: avg_pred .5, pos_rate .5
      (1000.0, 1L),                // sigmoid 1.0 clamps into bin 9
      (-1000.0, 0L), (-1000.0, 1L) // sigmoid 0.0 -> bin 0, rate .5
    ).toDF("score", "label")
    val got = Eval.reliability(rows, col("score"), col("label"), nBins = 10)
      .collect().map(r => (r.getDouble(0), r.getLong(1),
        r.getDouble(2), r.getDouble(3)))
    assert(got.toSeq == Seq(
      (0.0, 2L, 0.0, 0.5),
      (0.5, 2L, 0.5, 0.5),
      (0.9, 1L, 1.0, 1.0)))
  }

  test("calibrationError folds the reliability bins: hand case") {
    val rows = Seq(
      (0.0, 1L), (0.0, 0L),        // bin 5: |.5 - .5| -> 0
      (1000.0, 1L),                // bin 9: |1 - 1|  -> 0
      (-1000.0, 0L), (-1000.0, 1L) // bin 0: |0 - .5| -> 2 rows * .5
    ).toDF("score", "label")
    val r = Eval.calibrationError(rows, col("score"), col("label"),
      nBins = 10).head()
    assert(r.getLong(0) == 5L && r.getDouble(1) == 0.2, r)
  }

  test("aucExact: hand case — perfect, inverted, and tied-class corners") {
    def auc(rows: Seq[(Double, Long)]): Option[Double] = {
      val r = Eval.aucExact(rows.toDF("score", "label"),
        col("score"), col("label")).head()
      if (r.isNullAt(2)) None else Some(r.getDouble(2))
    }
    // perfectly separated: every positive above every negative
    assert(auc(Seq((0.1, 0L), (0.2, 0L), (0.8, 1L), (0.9, 1L))) ==
      Some(1.0))
    // perfectly inverted
    assert(auc(Seq((0.9, 0L), (0.8, 0L), (0.1, 1L), (0.2, 1L))) ==
      Some(0.0))
    // all scores tied: every pos/neg pair counts 1/2
    assert(auc(Seq((0.5, 0L), (0.5, 1L), (0.5, 0L), (0.5, 1L))) ==
      Some(0.5))
    // one class absent: undefined, NULL
    assert(auc(Seq((0.5, 1L), (0.7, 1L))).isEmpty)
  }

  test("aucExact: randomized scores match naive pairwise counting") {
    val rnd = new scala.util.Random(7L)
    for (_ <- 1 to 3) {
      // coarse score grid on purpose: plenty of cross-class ties
      val rows = Seq.fill(60)(
        (rnd.nextInt(8) / 4.0, if (rnd.nextBoolean()) 1L else 0L))
      val pos = rows.collect { case (s, 1L) => s }
      val neg = rows.collect { case (s, 0L) => s }
      val naive = pos.flatMap(p => neg.map(n =>
        if (p > n) 1.0 else if (p == n) 0.5 else 0.0)).sum /
        (pos.size.toDouble * neg.size)
      val got = Eval.aucExact(rows.toDF("score", "label"),
        col("score"), col("label")).head().getDouble(2)
      assert(math.abs(got - naive) < 1e-6, s"got $got expected $naive")
    }
  }
}
