package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bucketized interval join: result-identical to the naive inequality
  * join, but planned as a hash equi-join (the naive form nested-loops). */
class RangeJoinSpec extends SparkSpec {

  import spark.implicits._

  private lazy val points = Seq(
    (1L, 5L), (1L, 25L), (1L, 250L), (2L, 25L), (2L, 9999L))
    .toDF("k", "p")
  private lazy val intervals = Seq(
    (1L, 0L, 30L, "a"), (1L, 20L, 260L, "b"), // overlapping intervals
    (2L, 0L, 10L, "c"))
    .toDF("k", "s", "e", "tag")

  test("matches the naive inequality join, including multi-matches") {
    val naive = points.join(intervals,
        points("k") === intervals("k") &&
          points("p") >= intervals("s") && points("p") <= intervals("e"))
      .select(points("k"), points("p"), intervals("tag")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    val bucketized = RangeJoin.pointInInterval(points, "p",
        intervals, "s", "e", bucketWidth = 100L, extraKeys = Seq("k"))
      .select("k", "p", "tag").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(bucketized == naive)
    // sanity: the fixture exercises a double match and a no-match point
    assert(naive.count(t => t._1 == 1L && t._2 == 25L) == 2)
    assert(!naive.exists(_._2 == 9999L))
  }

  test("intervalOverlap matches the naive overlap join on random data") {
    val rnd = new scala.util.Random(7)
    val ivs = (1 to 120).map { i =>
      val s = rnd.nextInt(400).toLong
      (i.toLong, (i % 3).toLong, s, s + rnd.nextInt(60))
    }.toDF("iid", "k", "s", "e")
    val a = ivs.select(col("k"), col("iid").as("ia"), col("s").as("sa"),
      col("e").as("ea"))
    val b = ivs.select(col("k"), col("iid").as("ib"), col("s").as("sb"),
      col("e").as("eb"))
    val naive = a.join(b, a("k") === b("k") && col("ia") < col("ib") &&
        col("sa") <= col("eb") && col("sb") <= col("ea"))
      .select("ia", "ib").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = RangeJoin.intervalOverlap(a, "sa", "ea", b, "sb", "eb",
        bucketWidth = 50, extraKeys = Seq("k"))
      .where(col("ia") < col("ib"))
      .select("ia", "ib")
    val gotRows = got.collect().map(r => (r.getLong(0), r.getLong(1)))
    // first-cell emission: each pair appears EXACTLY once (no dedup op)
    assert(gotRows.length == gotRows.toSet.size)
    assert(gotRows.toSet == naive)
  }

  test("intervalOverlap drops inverted intervals instead of fabricating cells") {
    val a = Seq((1L, 10L, 5L)).toDF("ia", "sa", "ea") // end < start
    val b = Seq((2L, 0L, 100L)).toDF("ib", "sb", "eb")
    assert(RangeJoin.intervalOverlap(a, "sa", "ea", b, "sb", "eb",
      bucketWidth = 10).isEmpty)
  }

  test("key-less interval join: naive nested-loops, bucketized hash-joins") {
    // no equi component at all — the pure range-join trap
    val naivePlan = points.join(intervals,
        points("p") >= intervals("s") && points("p") <= intervals("e"))
      .queryExecution.executedPlan.toString
    assert(naivePlan.contains("BroadcastNestedLoopJoin") ||
      naivePlan.contains("CartesianProduct"), naivePlan)
    val bucketized = RangeJoin.pointInInterval(points, "p",
      intervals, "s", "e", bucketWidth = 100L)
    val plan = bucketized.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan)
    assert(plan.contains("__cell"), plan) // the cell IS the equi key
    // and it still returns the right rows (cross-key matches now legal)
    assert(bucketized.count() ==
      points.join(intervals,
        points("p") >= intervals("s") && points("p") <= intervals("e"))
        .count())
  }
}
