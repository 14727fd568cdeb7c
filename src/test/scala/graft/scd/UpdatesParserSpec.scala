package graft.scd

import org.scalatest.funsuite.AnyFunSuite

/** Parser-unit fixtures per FIXTURES.md §2 / SURVEY.md §5.2. */
class UpdatesParserSpec extends AnyFunSuite {

  private val doctorsLog =
    """UPDATE doctors set number = 12 where number = 2;
      |-- time=2014-09-01
      |DELETE FROM doctors WHERE first_name = 'Colin';
      |""".stripMargin

  test("doctors log, scdTime=now: both statements retained in file order") {
    val log = UpdatesParser.parse(doctorsLog, System.currentTimeMillis())
    assert(log.table.exists(_.equalsIgnoreCase("doctors")))
    assert(log.statements == Seq(
      ScdUpdate("doctors", Seq(("number", "12")), Some("number = 2"), 0L),
      ScdDelete("doctors", Some("first_name = 'Colin'"),
        ScdTime.parse("2014-09-01", 0L))))
  }

  test("doctors log, scdTime=2014-01-01: DELETE time-gated out") {
    val t = ScdTime.parse("2014-01-01", 0L)
    val log = UpdatesParser.parse(doctorsLog, t)
    assert(log.statements.map(_.getClass.getSimpleName) == Seq("ScdUpdate"))
  }

  test("scdTime=-1 gates everything (statement times are >= 0)") {
    assert(UpdatesParser.parse(doctorsLog, ScdTime.Disabled).isEmpty)
  }

  test("time gate is inclusive (<=)") {
    val t = ScdTime.parse("2014-09-01", 0L)
    assert(UpdatesParser.parse(doctorsLog, t).statements.size == 2)
    assert(UpdatesParser.parse(doctorsLog, t - 1).statements.size == 1)
  }

  test("multi-line statement joined with spaces until ;") {
    val log = UpdatesParser.parse(
      "UPDATE t SET\n  a = 1,\n  b = 2\nWHERE a < 0;", 0L)
    assert(log.statements == Seq(
      ScdUpdate("t", Seq(("a", "1"), ("b", "2")), Some("a < 0"), 0L)))
  }

  test("trailing -- comment stripped; quote-aware (divergence from reference)") {
    val log = UpdatesParser.parse(
      "DELETE FROM t WHERE name = 'a--b'; -- drop weird names", 1L)
    assert(log.statements ==
      Seq(ScdDelete("t", Some("name = 'a--b'"), 0L)))
    // strict-compat mode reproduces the reference's indexOf bug:
    // truncation mid-literal leaves an unterminated statement
    assertThrows[IllegalStateException] {
      UpdatesParser.parse("DELETE FROM t WHERE name = 'a--b';", 1L,
        strictCommentCompat = true)
    }
  }

  test("comment-only and blank lines ignored") {
    val log = UpdatesParser.parse(
      "-- a header comment\n\n  \nUPDATE t SET a = 1;\n-- trailing\n", 0L)
    assert(log.statements.size == 1)
  }

  test("-- TIME= directive is case-insensitive; empty value = query scd.time") {
    val log = UpdatesParser.parse(
      "-- TIME=2525-01-01\nDELETE FROM t;\n-- time=\nUPDATE t SET a = 1;", 1000L)
    // first stmt gated out (2525 > 1000); second effective at scd.time itself
    assert(log.statements == Seq(ScdUpdate("t", Seq(("a", "1")), None, 1000L)))
  }

  test("dangling unterminated statement → Incomplete SQL") {
    val e = intercept[IllegalStateException] {
      UpdatesParser.parse("UPDATE t SET a = 1", 0L)
    }
    assert(e.getMessage.contains("Incomplete SQL"))
  }

  test("unsupported verb → Unsupported DML") {
    val e = intercept[IllegalStateException] {
      UpdatesParser.parse("INSERT INTO t VALUES (1);", 0L)
    }
    assert(e.getMessage.contains("Unsupported DML"))
  }

  test("two table names → Multiple table names") {
    val e = intercept[IllegalStateException] {
      UpdatesParser.parse("UPDATE a SET x = 1;\nUPDATE b SET x = 1;", 0L)
    }
    assert(e.getMessage.contains("Multiple table names"))
  }

  test("table-name match is case-insensitive (reference uppercases)") {
    val log = UpdatesParser.parse(
      "UPDATE Dim SET x = 1;\nDELETE FROM DIM WHERE x = 2;", 0L)
    assert(log.statements.size == 2)
  }

  test("SET split respects parens and string literals") {
    val log = UpdatesParser.parse(
      "UPDATE t SET a = concat(b, ',', 'x=y'), c = coalesce(d, 0) " +
        "WHERE e IN (1, 2) AND f = 'where';", 0L)
    val u = log.statements.head.asInstanceOf[ScdUpdate]
    assert(u.sets == Seq(
      ("a", "concat(b, ',', 'x=y')"), ("c", "coalesce(d, 0)")))
    assert(u.where.contains("e IN (1, 2) AND f = 'where'"))
  }

  test("UPDATE without WHERE applies to all; DELETE without WHERE deletes all") {
    val log = UpdatesParser.parse("UPDATE t SET a = 1;\nDELETE FROM t;", 0L)
    assert(log.statements == Seq(
      ScdUpdate("t", Seq(("a", "1")), None, 0L),
      ScdDelete("t", None, 0L)))
  }

  test("ScdTime tri-state parse") {
    assert(ScdTime.parse("", 42L) == 42L)
    assert(ScdTime.parse(null, 42L) == 42L)
    assert(ScdTime.parse("-1", 42L) == -1L)
    assert(ScdTime.parse("1400000000000", 0L) == 1400000000000L)
    assert(ScdTime.parse("1970-01-01", 99L) == 0L)
    assert(ScdTime.parse("2014-09-01", 0L) == 1409529600000L)
    assert(ScdTime.parse("2014-09-01T12:30", 0L) == 1409529600000L + (12 * 3600 + 30 * 60) * 1000L)
    assert(ScdTime.parse("2014-09-01T12:30:15", 0L) == 1409529600000L + (12 * 3600 + 30 * 60 + 15) * 1000L)
  }

  test("ScdTime accepts Joda dateOptionalTimeParser forms (ADVICE r01)") {
    val noon = 1409529600000L + 12 * 3600 * 1000L
    // hour-only time
    assert(ScdTime.parse("2014-09-01T12", 0L) == noon)
    // fractional seconds, 1..6+ digits
    assert(ScdTime.parse("2014-09-01T12:00:00.5", 0L) == noon + 500L)
    assert(ScdTime.parse("2014-09-01T12:00:00.123456", 0L) == noon + 123L)
    // offset forms: +HH:MM, +HHMM, +HH, Z
    assert(ScdTime.parse("2014-09-01T12:00:00+02:00", 0L) == noon - 2 * 3600 * 1000L)
    assert(ScdTime.parse("2014-09-01T12:00:00+0200", 0L) == noon - 2 * 3600 * 1000L)
    assert(ScdTime.parse("2014-09-01T12:00:00+02", 0L) == noon - 2 * 3600 * 1000L)
    assert(ScdTime.parse("2014-09-01T12:00:00Z", 0L) == noon)
    assert(ScdTime.parse("2014-09-01T12:00:00-05:30", 0L) ==
      noon + (5 * 3600 + 30 * 60) * 1000L)
  }
}
