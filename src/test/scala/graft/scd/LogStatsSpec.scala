package graft.scd

import graft.SparkSpec

/** `ScdReader.logStatsText` — the per-statement dry-run probe. */
class LogStatsSpec extends SparkSpec {

  import spark.implicits._

  private val base = Seq(
    (1L, 10.0, "A"), (2L, -5.0, "B"), (3L, 100.0, "A"))
    .toDF("id", "bal", "seg")

  test("sequential semantics: later statements see earlier outputs") {
    val log =
      """UPDATE t SET bal = bal * 0 - 1 WHERE seg = 'A';
        |DELETE FROM t WHERE bal < 0;
        |UPDATE t SET seg = 'X' WHERE bal < 0;
        |""".stripMargin
    val got = ScdReader.logStatsText(spark, base, log)
      .orderBy("stmt_idx").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq == Seq(
      (0L, "UPDATE", 2L),  // seg A rows
      (1L, "DELETE", 3L),  // post-update: -1, -5, -1 all negative
      (2L, "UPDATE", 0L))) // everyone already deleted
  }

  test("time gate removes statements exactly as read would") {
    val log =
      """UPDATE t SET bal = bal + 1 WHERE TRUE;
        |-- time=2030-01-01
        |DELETE FROM t WHERE TRUE;
        |""".stripMargin
    val got = ScdReader.logStatsText(spark, base, log, Some("2024-01-01"))
      .collect().map(r => (r.getString(1), r.getLong(2)))
    assert(got.toSeq == Seq(("UPDATE", 3L)))
  }

  test("empty retained log yields an empty, correctly-typed result") {
    val got = ScdReader.logStatsText(spark, base, "", None)
    assert(got.isEmpty)
    assert(got.columns.toSeq == Seq("stmt_idx", "verb", "n_matched"))
  }

  test("NULL predicates count as no-fire, matching replay") {
    val withNull = Seq((1L, Option.empty[Double]), (2L, Some(-1.0)))
      .toDF("id", "bal")
    val log = "DELETE FROM t WHERE bal < 0;\n"
    val got = ScdReader.logStatsText(spark, withNull, log).collect()
    assert(got(0).getLong(2) == 1L) // the NULL row never fires
  }
}
