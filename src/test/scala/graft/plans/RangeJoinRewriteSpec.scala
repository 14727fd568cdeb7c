package graft.plans

import graft.SparkSpec

/** The injected optimizer rule must rescue exactly the pure-range
  * joins, leave everything else untouched, and change only the plan —
  * never the rows. */
class RangeJoinRewriteSpec extends SparkSpec {

  import spark.implicits._

  private lazy val points = Seq(
    (1L, 5L), (1L, 25L), (1L, 250L), (2L, 25L), (2L, 9999L))
    .toDF("k", "p")
  private lazy val intervals = Seq(
    (1L, 0L, 30L, "a"), (1L, 20L, 260L, "b"), (2L, 0L, 10L, "c"))
    .toDF("k", "s", "e", "tag")

  private def rangeJoined = points.join(intervals,
    points("p") >= intervals("s") && points("p") <= intervals("e"))

  private def withRule[A](f: => A): A = {
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = prev :+ new RangeJoinRewrite
    spark.conf.set("spark.graft.rangeJoin.cellWidth", "100")
    try f finally {
      spark.conf.unset("spark.graft.rangeJoin.cellWidth")
      spark.experimental.extraOptimizations = prev
    }
  }

  test("pure range join: rewritten to a cell equi-join, rows identical") {
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    val expected = rows(rangeJoined) // no rule: nested-loop reference run
    val (got, plan) = withRule {
      val df = rangeJoined
      (rows(df), df.queryExecution.executedPlan.toString)
    }
    assert(got == expected)
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan)
    assert(plan.contains("__pcell") && plan.contains("__icell"), plan)
  }

  test("join with an equi conjunct is left alone") {
    val plan = withRule {
      points.join(intervals,
          points("k") === intervals("k") &&
            points("p") >= intervals("s") && points("p") <= intervals("e"))
        .queryExecution.executedPlan.toString
    }
    assert(!plan.contains("__pcell"), plan)
  }

  test("inverted intervals (e < s) neither crash nor match") {
    // Sequence(s, e, 1) would THROW on e < s at runtime; the rewrite
    // must keep the pre-rewrite behavior: zero matches
    val bad = Seq((1L, 300L, 10L, "inv"), (1L, 0L, 30L, "ok"))
      .toDF("k", "s", "e", "tag")
    def joined = points.join(bad,
      points("p") >= bad("s") && points("p") <= bad("e"))
    val expected = joined.collect().map(_.toSeq).toSet
    val got = withRule { joined.collect().map(_.toSeq).toSet }
    assert(got == expected)
    assert(got.forall(_.contains("ok")))
  }

  test("equi+range join: conf-gated rewrite hashes on (key, cell), rows identical") {
    def joined = points.join(intervals,
      points("k") === intervals("k") &&
        points("p") >= intervals("s") && points("p") <= intervals("e"))
    val expected = joined.collect().map(_.toSeq).toSet
    val (got, plan) = withRule {
      spark.conf.set("spark.graft.rangeJoin.rewriteEquiJoins", "true")
      try {
        val df = joined
        (df.collect().map(_.toSeq).toSet,
          df.queryExecution.executedPlan.toString)
      } finally spark.conf.unset("spark.graft.rangeJoin.rewriteEquiJoins")
    }
    assert(got == expected)
    // the hash join keys now include the cell next to the user key
    assert(plan.contains("__pcell") && plan.contains("__icell"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan)
  }

  test("rule is inert without the width conf") {
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = prev :+ new RangeJoinRewrite
    try {
      val plan = rangeJoined.queryExecution.executedPlan.toString
      assert(!plan.contains("__pcell"), plan)
      assert(plan.contains("BroadcastNestedLoopJoin") ||
        plan.contains("CartesianProduct"), plan)
    } finally spark.experimental.extraOptimizations = prev
  }
}
