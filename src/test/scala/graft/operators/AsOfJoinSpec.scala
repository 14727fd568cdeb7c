package graft.operators

import graft.SparkSpec

/** As-of join semantics, including the NULL-payload case the round-1
  * per-column carry got wrong (ADVICE r01): a matched right row whose
  * attached column is genuinely NULL must yield NULL, not resurrect an
  * older row's value. */
class AsOfJoinSpec extends SparkSpec {

  import spark.implicits._

  test("latest right row at or before left time attaches; ties prefer right") {
    val left = Seq((1L, 100L, "e1"), (1L, 200L, "e2"), (2L, 50L, "e3"))
      .toDF("k", "t", "eid")
    val right = Seq((1L, 100L, "r-a", "x1"), (1L, 150L, "r-b", "x2"),
      (2L, 60L, "r-c", "x3")).toDF("k", "t", "v", "eid")
    val got = AsOfJoin.asOf(left, right, "k", "t", "t",
      Seq(("v", "asof_v")), "eid")
      .collect().map(r => (r.getString(2), r.getString(3))).toMap
    // e1 at t=100: right r-a AT t=100 already visible (<=)
    // e2 at t=200: latest is r-b (150)
    // e3 at t=50: no right row precedes -> NULL
    assert(got == Map("e1" -> "r-a", "e2" -> "r-b", "e3" -> null))
  }

  test("NULL payload in the matched right row survives (no resurrection)") {
    val left = Seq((1L, 300L, "probe")).toDF("k", "t", "eid")
    val right = Seq((1L, 100L, Some("old"), "x1"),
      (1L, 200L, Option.empty[String], "x2")).toDF("k", "t", "v", "eid")
    val got = AsOfJoin.asOf(left, right, "k", "t", "t",
      Seq(("v", "asof_v")), "eid").collect().head
    // the as-of match is the t=200 row whose payload IS NULL — the
    // old value "old" must not leak through
    assert(got.getString(2) == "probe" || got.getString(0) == "probe")
    assert(got.isNullAt(got.fieldIndex("asof_v")))
  }

  test("asOfSlim matches asOf row-for-row on a wide left table") {
    val left = Seq(
      (1L, 100L, "e1", "payload-a", 1.5), (1L, 200L, "e2", "payload-b", 2.5),
      (2L, 50L, "e3", "payload-c", 3.5), (2L, 70L, "e4", "payload-d", 4.5))
      .toDF("k", "t", "eid", "wide1", "wide2")
    val right = Seq((1L, 100L, "r-a", "x1"), (1L, 150L, "r-b", "x2"),
      (2L, 60L, "r-c", "x3")).toDF("k", "t", "v", "eid")
    val cols = Seq("eid", "k", "t", "wide1", "wide2", "asof_v")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select(cols.head, cols.tail: _*).orderBy("eid")
        .collect().map(_.toSeq).toSeq
    val base = rows(AsOfJoin.asOf(left, right, "k", "t", "t",
      Seq(("v", "asof_v")), "eid"))
    val slim = rows(AsOfJoin.asOfSlim(left, right, "k", "t", "t",
      Seq(("v", "asof_v")), "eid", uid = "eid"))
    assert(slim == base)
    // the wide payload columns must NOT appear below the window sort
    val plan = AsOfJoin.asOfSlim(left, right, "k", "t", "t",
      Seq(("v", "asof_v")), "eid", uid = "eid")
      .queryExecution.optimizedPlan.toString
    val windowPart = plan.split("(?i)window").last // subtree under Window
    assert(!windowPart.contains("wide1"), plan)
  }

  test("multiple attached columns travel together from the same row") {
    val left = Seq((1L, 300L, "p")).toDF("k", "t", "eid")
    val right = Seq((1L, 100L, "a1", 10, "x1"), (1L, 200L, "a2", 20, "x2"))
      .toDF("k", "t", "s", "n", "eid")
    val got = AsOfJoin.asOf(left, right, "k", "t", "t",
      Seq(("s", "asof_s"), ("n", "asof_n")), "eid").collect().head
    // both columns must come from the SAME (t=200) row
    assert(got.getString(got.fieldIndex("asof_s")) == "a2")
    assert(got.getInt(got.fieldIndex("asof_n")) == 20)
  }

  test("forward: earliest right row at or after; equal time visible; " +
      "time ties take the smallest tie-break") {
    val left = Seq((1L, 100L, "e1"), (1L, 160L, "e2"), (1L, 300L, "e3"))
      .toDF("k", "t", "eid")
    val right = Seq(
      (1L, 100L, "at", "x5"),          // equal-time match for e1
      (1L, 200L, "tie-b", "x2"),       // t=200 tie: x1 < x2
      (1L, 200L, "tie-a", "x1"))
      .toDF("k", "t", "v", "eid")
    val got = AsOfJoin.asOf(left, right, "k", "t", "t",
      Seq(("v", "asof_v")), "eid", direction = "forward")
      .collect().map(r => (r.getString(2), r.getString(3))).toMap
    // e1: right AT t=100 (>= is inclusive); e2: earliest following is
    // the t=200 pair, smallest eid wins; e3: nothing follows -> NULL
    assert(got == Map("e1" -> "at", "e2" -> "tie-a", "e3" -> null))
  }

  test("nearest: closer direction wins, exact-distance ties go backward") {
    val left = Seq(
      (1L, 100L, "pb"),  // bwd at 90 (d=10) vs fwd at 130 (d=30) -> bwd
      (1L, 120L, "pf"),  // bwd at 90 (d=30) vs fwd at 130 (d=10) -> fwd
      (1L, 110L, "pt"),  // d=20 both ways -> tie -> backward
      (2L, 500L, "po"),  // only a following row exists -> forward
      (3L, 500L, "pn"))  // no right rows at all -> NULL
      .toDF("k", "t", "eid")
    val right = Seq((1L, 90L, "b", "x1"), (1L, 130L, "f", "x2"),
      (2L, 600L, "only", "x3")).toDF("k", "t", "v", "eid")
    val got = AsOfJoin.asOf(left, right, "k", "t", "t",
      Seq(("v", "asof_v")), "eid", direction = "nearest")
      .collect().map(r => (r.getString(2), r.getString(3))).toMap
    assert(got == Map("pb" -> "b", "pf" -> "f", "pt" -> "b",
      "po" -> "only", "pn" -> null))
  }

  test("nearest plans ONE window exec (shared sort, two frames)") {
    val left = Seq((1L, 100L, "e1")).toDF("k", "t", "eid")
    val right = Seq((1L, 90L, "v", "x1")).toDF("k", "t", "v", "eid")
    val plan = AsOfJoin.asOf(left, right, "k", "t", "t",
      Seq(("v", "asof_v")), "eid", direction = "nearest")
      .queryExecution.executedPlan.toString
    val nWindows = "(?i)\\bwindow\\b".r.findAllIn(plan).size
    assert(nWindows >= 1 && plan.split("Exchange").length <= 3, plan)
    // both carries must live in the same Window operator: exactly one
    // "Window" exec node (the regex also matches the spec line inside
    // it, so count operator headers instead)
    val nExecs = plan.linesIterator.count(_.trim.startsWith("+- Window"))
    assert(nExecs + plan.linesIterator.count(_.trim.startsWith("Window")) <= 2, plan)
  }
}
