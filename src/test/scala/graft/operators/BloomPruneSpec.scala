package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bloom-pruned semi/anti joins must be row-identical to the plain
  * joins — including under heavy false-positive pressure (undersized
  * bloom) and NULL keys. */
class BloomPruneSpec extends SparkSpec {

  private def probe = {
    import spark.implicits._
    ((1L to 400L).map(i => (Some(i % 97), s"row$i")) :+
      ((None: Option[Long], "nullrow")))
      .toDF("k", "payload")
  }

  private def build = {
    import spark.implicits._
    (0L to 40L).map(i => i * 2).toDF("k") // even keys 0..80
  }

  test("bloomSemiJoin equals plain left-semi") {
    val got = BloomPrune.bloomSemiJoin(probe, build, "k")
    val want = probe.join(build.distinct(), Seq("k"), "left_semi")
    assert(got.count() > 0)
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
  }

  test("bloomAntiJoin equals plain left-anti, keeps NULL keys") {
    val got = BloomPrune.bloomAntiJoin(probe, build, "k")
    val want = probe.join(build.distinct(), Seq("k"), "left_anti")
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
    assert(got.where(col("k").isNull).count() == 1L)
  }

  test("undersized bloom (many false positives) stays exact") {
    // expectedItems = 2 for 41 keys → high FP rate; the exact join
    // must still remove every false positive
    val gotS = BloomPrune.bloomSemiJoin(probe, build, "k", expectedItems = 2L)
    val wantS = probe.join(build.distinct(), Seq("k"), "left_semi")
    assert(gotS.except(wantS).isEmpty && wantS.except(gotS).isEmpty)
    val gotA = BloomPrune.bloomAntiJoin(probe, build, "k", expectedItems = 2L)
    val wantA = probe.join(build.distinct(), Seq("k"), "left_anti")
    assert(gotA.except(wantA).isEmpty && wantA.except(gotA).isEmpty)
  }

  test("empty build side: semi empty, anti = whole probe") {
    import spark.implicits._
    val none = Seq.empty[Long].toDF("k")
    assert(BloomPrune.bloomSemiJoin(probe, none, "k").count() == 0L)
    assert(BloomPrune.bloomAntiJoin(probe, none, "k").count()
      == probe.count())
  }

  test("the probe filter carries might_contain before the join") {
    val plan = BloomPrune.bloomSemiJoin(probe, build, "k")
      .queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), s"no bloom probe in plan:\n$plan")
  }
}
