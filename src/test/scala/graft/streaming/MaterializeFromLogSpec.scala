package graft.streaming

import graft.SparkSpec
import graft.scd.{ScdLogFeed, ScdReader}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import java.nio.file.{Files, Paths}

/** [[ScdStream.materializeFromLog]]: the log-tail-driven Type-7
  * materialized view — incremental fold, seq-gated exactly-once, crash
  * and checkpoint-mismatch behavior. */
class MaterializeFromLogSpec extends SparkSpec {

  import spark.implicits._

  private val Stmt1 = "UPDATE t SET bal = bal + 100 WHERE seg = 'A';"
  private val Stmt2 = "DELETE FROM t WHERE id > 90;"
  private val Stmt3 = "UPDATE t SET bal = bal + 100 WHERE seg = 'A';"

  private def mkDir(): String = {
    val d = Files.createTempDirectory("mvlog").toString
    (1 to 100).map(i =>
      (i.toLong, i * 10.0, if (i % 2 == 0) "A" else "B"))
      .toDF("id", "bal", "seg")
      .write.mode("overwrite").parquet(d)
    d
  }

  private def writeLog(dir: String, stmts: String*): Unit =
    Files.writeString(Paths.get(dir, ScdReader.SidecarName),
      stmts.mkString("", "\n", "\n"))

  private def runOnce(tableDir: String, snap: String, ckpt: String): Unit = {
    val q = ScdStream.materializeFromLog(spark, tableDir, snap, ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
  }

  private def sorted(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("id").collect().toSeq

  test("snapshot tracks the log incrementally and equals asOfSeq") {
    val dir = mkDir()
    writeLog(dir, Stmt1, Stmt2)
    val snap = Files.createTempDirectory("mvsnap").toString
    val ckpt = Files.createTempDirectory("mvckpt").toString

    runOnce(dir, snap, ckpt)
    val s1 = ScdStream.latestSnapshot(spark, snap).get
    assert(sorted(s1) == sorted(ScdLogFeed.asOfSeq(spark, dir, 2)))
    assert(s1.count() == 90)
    assert(ScdStream.snapshotMaxSeq(spark, snap) == 1L)

    // append a statement; the next run folds ONLY it (onto the
    // previous snapshot — 'A' balances go +200 total, applied once each)
    writeLog(dir, Stmt1, Stmt2, Stmt3)
    runOnce(dir, snap, ckpt)
    val s2 = ScdStream.latestSnapshot(spark, snap).get
    assert(ScdStream.snapshotMaxSeq(spark, snap) == 2L)
    assert(sorted(s2) == sorted(ScdLogFeed.asOfSeq(spark, dir, 3)))
    assert(s2.where($"id" === 2).head.getAs[Double]("bal") == 220.0)

    // no log growth => nothing changes
    runOnce(dir, snap, ckpt)
    assert(ScdStream.snapshotMaxSeq(spark, snap) == 2L)
  }

  test("seq gate: a wiped checkpoint cannot double-apply statements") {
    val dir = mkDir()
    writeLog(dir, Stmt1, Stmt2)
    val snap = Files.createTempDirectory("mvsnap2").toString
    val ckpt1 = Files.createTempDirectory("mvckpt2a").toString
    runOnce(dir, snap, ckpt1)
    val before = sorted(ScdStream.latestSnapshot(spark, snap).get)

    // fresh checkpoint: the stream re-delivers seqs 0..1 from scratch;
    // the snapshot's seq watermark must swallow the replay (DML replay
    // is NOT idempotent — bal+100 twice would corrupt)
    val ckpt2 = Files.createTempDirectory("mvckpt2b").toString
    runOnce(dir, snap, ckpt2)
    assert(sorted(ScdStream.latestSnapshot(spark, snap).get) == before)
    assert(ScdStream.snapshotMaxSeq(spark, snap) == 1L)

    // and a PARTIAL overlap (replay 0..1 plus a genuinely new stmt 2)
    // applies exactly the new statement
    writeLog(dir, Stmt1, Stmt2, Stmt3)
    val ckpt3 = Files.createTempDirectory("mvckpt2c").toString
    runOnce(dir, snap, ckpt3)
    val s = ScdStream.latestSnapshot(spark, snap).get
    assert(s.where($"id" === 2).head.getAs[Double]("bal") == 220.0)
    assert(ScdStream.snapshotMaxSeq(spark, snap) == 2L)
  }

  test("applyLogBatch replay of the same batch is a no-op") {
    val dir = mkDir()
    writeLog(dir, Stmt1)
    val snap = Files.createTempDirectory("mvsnap3").toString
    val batch = ScdLogFeed.feed(spark, dir)
    ScdStream.applyLogBatch(batch, dir, snap, batchId = 0)
    val first = sorted(ScdStream.latestSnapshot(spark, snap).get)
    // at-least-once foreachBatch: identical re-delivery applies nothing
    ScdStream.applyLogBatch(batch, dir, snap, batchId = 0)
    ScdStream.applyLogBatch(batch, dir, snap, batchId = 1)
    assert(sorted(ScdStream.latestSnapshot(spark, snap).get) == first)
    assert(first.count(_.getAs[String]("seg") == "A") == 50)
  }

  test("closed loop: dmlSink ingest -> log feed -> materialized view") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val dir = mkDir()
    val snap = Files.createTempDirectory("mvloop-snap").toString
    val mvCkpt = Files.createTempDirectory("mvloop-mv").toString
    val dmlCkpt = Files.createTempDirectory("mvloop-dml").toString

    // stage 1: stream DML statements INTO the table's log (the
    // continuous-ingest face), then fold the log into the snapshot
    implicit val sqlCtx = spark.sqlContext
    val lines = MemoryStream[String]
    val dml = ScdStream.dmlSink(lines.toDF().toDF("stmt"), "stmt", dir,
      dmlCkpt).trigger(Trigger.AvailableNow())
    lines.addData(Stmt1)
    val q1 = dml.start(); q1.awaitTermination(60000)
    runOnce(dir, snap, mvCkpt)
    val s1 = ScdStream.latestSnapshot(spark, snap).get
    assert(s1.where($"seg" === "A" && $"bal" % 10 === 0).count() == 50)
    assert(ScdStream.snapshotMaxSeq(spark, snap) == 0L)

    // stage 2: more DML arrives; the view catches up incrementally
    lines.addData(Stmt2)
    val q2 = dml.start(); q2.awaitTermination(60000)
    runOnce(dir, snap, mvCkpt)
    val s2 = ScdStream.latestSnapshot(spark, snap).get
    assert(s2.count() == 90)
    assert(ScdStream.snapshotMaxSeq(spark, snap) == 1L)
    // the whole loop equals the batch as-of read of the same dir
    assert(sorted(s2) ==
      sorted(ScdReader.read(spark, dir, asOf = Some("2031-01-01"))))
  }

  test("mixing materializeFromLog with an upsertSink snapshot dir refuses") {
    val dir = mkDir()
    writeLog(dir, Stmt1)
    val snap = Files.createTempDirectory("mvsnap4").toString
    // an upsert-style version: committed but with an EMPTY marker
    ScdStream.mergeBatch(
      Seq((1L, 10.0, "A", 1L)).toDF("id", "bal", "seg", "ts"),
      "id", "ts", snap, batchId = 0)
    intercept[IllegalStateException] {
      ScdStream.applyLogBatch(ScdLogFeed.feed(spark, dir), dir, snap, 1)
    }
  }
}
