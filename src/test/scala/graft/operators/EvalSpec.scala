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
}
