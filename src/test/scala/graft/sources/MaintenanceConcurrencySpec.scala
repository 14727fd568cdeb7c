package graft.sources

import graft.SparkSpec
import graft.scd.ScdReader
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Two-writer interleavings of the maintenance surface (VERDICT r13
  * ask #5): the procedures are single-writer by contract (the
  * reference's append-a-line workflow), so what must hold is not
  * lock-free magic but the weaker, checkable pair —
  *
  *   1. every SEQUENTIAL interleaving of two writers lands on the
  *      result of SOME serial order of the same calls, and
  *   2. the one interleaving that CANNOT be serialized (a truncation
  *      whose consumed set interleaves with kept statements) fails
  *      LOUD and leaves every log byte intact — never a silent
  *      half-state.
  *
  * Sub-operation races (a dmlSink's read-modify-write overlapping a
  * truncation's rename) are out of scope by the documented
  * stop-writers-first contract in [[graft.scd.ScdReader.truncateLog]];
  * these specs pin everything a sequential CALL scheduler can hit. */
class MaintenanceConcurrencySpec extends SparkSpec {

  import spark.implicits._

  spark.conf.set("spark.sql.catalog.graft", classOf[ScdCatalog].getName)

  private def freshDir(): String = {
    val d = Files.createTempDirectory("maint").toString
    (1 to 10).map(i => (i.toLong, i * 10.0)).toDF("id", "bal")
      .write.mode("overwrite").parquet(d)
    spark.sql(s"CALL graft.add_update('$d', " +
      "'UPDATE t SET bal = bal + 1 WHERE id = 1;', '1000')")
    spark.sql(s"CALL graft.add_update('$d', " +
      "'UPDATE t SET bal = bal + 10 WHERE id = 2;', '2000')")
    d
  }

  private def stmtCount(d: String): Long =
    ScdReader.readSidecar(spark, d)
      .map(t => graft.scd.UpdatesParser
        .parse(t, Long.MaxValue).statements.size.toLong)
      .getOrElse(0L)

  test("add_update vs compact(clear_log): both sequential orders land on the same serial state") {
    // order 1: append s3, THEN compact at 2500 (consumes s1, s2 —
    // s3's time 3000 survives the cut)
    val d1 = freshDir()
    val out1 = Files.createTempDirectory("snap1").toString + "/s"
    spark.sql(s"CALL graft.add_update('$d1', " +
      "'UPDATE t SET bal = bal + 100 WHERE id = 3;', '3000')")
    spark.sql(s"CALL graft.compact('$d1', '$out1', '2500', true)")
    // order 2: compact FIRST, then append s3 onto the truncated log
    val d2 = freshDir()
    val out2 = Files.createTempDirectory("snap2").toString + "/s"
    spark.sql(s"CALL graft.compact('$d2', '$out2', '2500', true)")
    spark.sql(s"CALL graft.add_update('$d2', " +
      "'UPDATE t SET bal = bal + 100 WHERE id = 3;', '3000')")
    // both logs hold exactly the one unconsumed statement...
    assert(stmtCount(d1) == 1L && stmtCount(d2) == 1L)
    // ...both snapshots are the same as-of-2500 view...
    assert(spark.read.parquet(out1).orderBy("id").collect().toSeq ==
      spark.read.parquet(out2).orderBy("id").collect().toSeq)
    // ...and the source dirs replay identically afterwards: the
    // interleavings are indistinguishable from one serial execution
    val r1 = ScdReader.read(spark, d1, asOf = Some("4000"))
      .orderBy("id").collect().toSeq
    val r2 = ScdReader.read(spark, d2, asOf = Some("4000"))
      .orderBy("id").collect().toSeq
    assert(r1 == r2, s"$r1 vs $r2")
    // the consumed prefix is archived, not destroyed
    val archived = new java.io.File(d1).listFiles()
      .exists(_.getName.startsWith(".updates.archive-"))
    assert(archived, "consumed statements must be archived")
  }

  test("the non-serializable interleaving fails loud and modifies nothing: backdated append, then mid-log truncation") {
    // writer A appends a statement BACKDATED to 1500 — file order is
    // now (1000, 2000, 1500); writer B compacts at 1800. The consumed
    // set {1000, 1500} interleaves with the kept 2000, so snapshot +
    // remainder could not replay in the original file order under ANY
    // serial story — the compact must refuse, loudly, leaving the log
    // byte-identical (the snapshot itself may land: it is a separate
    // output directory, not shared state).
    val d = freshDir()
    val before = ScdReader.readSidecar(spark, d).get
    spark.sql(s"CALL graft.add_update('$d', " +
      "'UPDATE t SET bal = bal + 7 WHERE id = 4;', '1500')")
    val withBackdated = ScdReader.readSidecar(spark, d).get
    val out = Files.createTempDirectory("snapc").toString + "/s"
    val e = intercept[Exception] {
      spark.sql(s"CALL graft.compact('$d', '$out', '1800', true)")
    }
    def msgs(t: Throwable): String = {
      var c: Throwable = t
      var m = Option(c.getMessage).getOrElse("")
      while (c.getCause != null) {
        c = c.getCause; m += " | " + Option(c.getMessage).getOrElse("")
      }
      m
    }
    assert(msgs(e).contains("No log has been modified"), msgs(e))
    assert(ScdReader.readSidecar(spark, d).get == withBackdated,
      "log must be byte-identical after the refused truncation")
    assert(stmtCount(d) == 3L)
    // the losing writer recovers by re-CALLing at a serializable cut
    // (>= the log's max effective time)
    spark.sql(s"CALL graft.compact('$d', '$out', '2000', true)")
    assert(stmtCount(d) == 0L)
    assert(before.nonEmpty) // silence unused warning; fixture sanity
  }

  test("optimize vs zone_map: a manifest the optimize didn't refresh is DETECTED stale, heals on re-CALL; same-call refresh never goes stale") {
    val d = Files.createTempDirectory("maintz").toString + "/data"
    (1 to 4000).map(i => (i.toLong, i % 97))
      .toDF("id", "k").repartition(6)
      .write.mode("overwrite").parquet(d)
    val man = Files.createTempDirectory("maintz").toString + "/zm"
    val files0 = spark.sql(s"CALL graft.zone_map('$d', 'id', '$man')")
      .head().getLong(1)
    assert(files0 >= 6L)
    // writer A rewrites the layout WITHOUT naming the manifest
    spark.sql(s"CALL graft.optimize('$d', 'id', ${1L << 20}, 20)")
    // writer B's manifest lost — and the audit says so (missing rows
    // for every replaced file), rather than silently reading ok
    val audit1 = spark.sql(
      s"CALL graft.verify_zone_map('$d', 'id', '$man')").head()
    assert(audit1.getLong(2) > 0L || audit1.getLong(3) > 0L,
      s"stale manifest must surface as missing/unindexed: $audit1")
    // heal-on-re-CALL: one zone_map CALL re-lands the invariant
    spark.sql(s"CALL graft.zone_map('$d', 'id', '$man')")
    val audit2 = spark.sql(
      s"CALL graft.verify_zone_map('$d', 'id', '$man')").head()
    assert(audit2.getLong(1) == 0L && audit2.getLong(2) == 0L &&
      audit2.getLong(3) == 0L, s"healed manifest must read clean: $audit2")
    // the races-free composition: optimize refreshes the named
    // manifest INSIDE the same CALL — no window for a reader to see
    // the stale state between the two maintenance writers
    spark.sql(s"CALL graft.optimize('$d', 'id', ${1L << 20}, 20, '$man')")
    val audit3 = spark.sql(
      s"CALL graft.verify_zone_map('$d', 'id', '$man')").head()
    assert(audit3.getLong(1) == 0L && audit3.getLong(2) == 0L &&
      audit3.getLong(3) == 0L, s"same-call refresh must read clean: $audit3")
  }
}
