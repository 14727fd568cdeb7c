package graft.sources

import graft.SparkSpec
import graft.scd.{ScdLogFeed, ScdReader}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import java.nio.file.{Files, Paths}

/** The `.updates` log feed: batch form ([[graft.scd.ScdLogFeed]]),
  * the DSv2 streaming tail (`readStream.format("scd").option("feed",
  * "log")`), seq-replay (`asOfSeq`) and incremental CDC
  * (`cdcBetween`). */
class ScdLogStreamSpec extends SparkSpec {

  import spark.implicits._

  private val Stmt1 = "UPDATE t SET bal = bal + 5 WHERE seg = 'A';"
  private val Stmt2 = "DELETE FROM t WHERE id > 90;"
  private val Stmt3 = "UPDATE t SET name = 'x' WHERE id = 1;"

  private def mkDir(): String = {
    val d = Files.createTempDirectory("scdlog").toString
    (1 to 100).map(i =>
      (i.toLong, s"name$i", i * 10.0, if (i % 2 == 0) "A" else "B"))
      .toDF("id", "name", "bal", "seg")
      .write.mode("overwrite").parquet(d)
    d
  }

  private def writeLog(dir: String, stmts: String*): Unit =
    Files.writeString(Paths.get(dir, ScdReader.SidecarName),
      stmts.mkString("", "\n", "\n"))

  test("batch feed: file order, verbs, effective times") {
    val dir = mkDir()
    writeLog(dir, Stmt1, "-- time=2024-06-01", Stmt2)
    val rows = ScdLogFeed.feed(spark, dir).orderBy("seq").collect()
    assert(rows.map(_.getAs[Long]("seq")).toSeq == Seq(0L, 1L))
    assert(rows.map(_.getAs[String]("verb")).toSeq ==
      Seq("UPDATE", "DELETE"))
    assert(rows.map(_.getAs[String]("target_table")).toSeq == Seq("t", "t"))
    assert(rows(0).getAs[Long]("effective_ms") == 0L)
    assert(rows(1).getAs[Long]("effective_ms") == 1717200000000L)
    assert(rows(1).getAs[String]("stmt") == Stmt2)
    // no sidecar => empty feed, not an error
    assert(ScdLogFeed.feed(spark, mkDir()).count() == 0)
  }

  test("batch feed through format(\"scd\").option(\"feed\",\"log\")") {
    val dir = mkDir()
    writeLog(dir, Stmt1, "-- time=2024-06-01", Stmt2)
    val df = spark.read.format("scd").option("feed", "log").load(dir)
    assert(df.schema == ScdLogFeed.schema)
    assert(df.orderBy("seq").collect().toSeq ==
      ScdLogFeed.feed(spark, dir).orderBy("seq").collect().toSeq)
    // DDL surface
    spark.sql(s"""CREATE OR REPLACE TEMPORARY VIEW scd_log_v
                 |USING scd OPTIONS (path '$dir', feed 'log')""".stripMargin)
    assert(spark.sql("SELECT count(*) FROM scd_log_v").head().getLong(0) == 2)
    // unknown feed value fails fast
    intercept[IllegalArgumentException] {
      spark.read.format("scd").option("feed", "nope").load(dir).count()
    }
  }

  test("streaming tail: emits appends exactly once, survives restart") {
    val dir = mkDir()
    writeLog(dir, Stmt1)
    val ckpt = Files.createTempDirectory("scdlogckpt").toString
    // foreachBatch sink: supports checkpoint recovery (memory doesn't),
    // so each runOnce() is a genuine restart from the same checkpoint
    val emitted = scala.collection.mutable.ArrayBuffer.empty[(Long, String, Long)]

    def runOnce(): Unit = {
      val q = spark.readStream.format("scd").option("feed", "log").load(dir)
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          emitted ++= batch.orderBy("seq").collect().map(r =>
            (r.getAs[Long]("seq"), r.getAs[String]("stmt"),
              r.getAs[Long]("effective_ms")))
          ()
        }
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(60000)
    }

    runOnce()
    assert(emitted.map(_._1).toSeq == Seq(0L))
    assert(emitted(0)._2 == Stmt1)

    // append two more statements; a restarted stream picks up ONLY them
    writeLog(dir, Stmt1, "-- time=2024-06-01", Stmt2, Stmt3)
    runOnce()
    assert(emitted.map(_._1).toSeq == Seq(0L, 1L, 2L))
    assert(emitted(2)._3 == 1717200000000L)

    // no growth => restart emits nothing (exactly-once on replays)
    runOnce()
    assert(emitted.length == 3)
  }

  test("asOfSeq: n=0 raw, prefix replay, full length equals far-future view") {
    val dir = mkDir()
    writeLog(dir, Stmt1, "-- time=2024-06-01", Stmt2)
    assert(ScdLogFeed.asOfSeq(spark, dir, 0).orderBy("id").collect().toSeq ==
      spark.read.parquet(dir).orderBy("id").collect().toSeq)
    // first statement only: the update applied, nothing deleted
    val s1 = ScdLogFeed.asOfSeq(spark, dir, 1)
    assert(s1.count() == 100)
    assert(s1.where($"seg" === "A" && $"bal" % 10 === 5).count() == 50)
    // full prefix == time-based far-future view
    assert(ScdLogFeed.asOfSeq(spark, dir, 2).orderBy("id").collect().toSeq ==
      ScdReader.read(spark, dir, asOf = Some("2031-01-01"))
        .orderBy("id").collect().toSeq)
    // n beyond the log is the whole log, not an error
    assert(ScdLogFeed.asOfSeq(spark, dir, 99).count() == 90)
  }

  test("cdcBetween: per-statement change sets compose to the full diff") {
    val dir = mkDir()
    writeLog(dir, Stmt1, "-- time=2024-06-01", Stmt2)
    val cdc1 = ScdLogFeed.cdcBetween(spark, dir, 0, 1, "id")
    // statement 1 updates the 50 'A' rows
    assert(cdc1.groupBy("change_type").count().collect().toSeq
      .map(r => (r.getString(0), r.getLong(1))) == Seq(("U", 50L)))
    val cdc2 = ScdLogFeed.cdcBetween(spark, dir, 1, 2, "id")
    // statement 2 deletes ids 91..100, pre-image carried
    val d = cdc2.orderBy("id").collect()
    assert(d.forall(_.getAs[String]("change_type") == "D"))
    assert(d.map(_.getAs[Long]("id")).toSeq == (91L to 100L))
    assert(d.head.getAs[Double]("bal") == 910.0) // id 91, seg B: no +5
    // composing the per-statement sets replays to the full-range diff:
    // U rows later deleted resolve to D (delete wins over update)
    val full = ScdLogFeed.cdcBetween(spark, dir, 0, 2, "id")
    assert(full.where($"change_type" === "D").count() == 10)
    assert(full.where($"change_type" === "U").count() == 45)
    // 45 = 50 'A'-updated rows minus the 5 even ids in 91..100
  }

  test("startingSeq skips the consumed prefix; maxStatementsPerTrigger bounds batches") {
    val dir = mkDir()
    writeLog(dir, Stmt1, "-- time=2024-06-01", Stmt2, Stmt3)

    // startingSeq=2: a fresh checkpoint emits only the unconsumed tail
    val ckptA = Files.createTempDirectory("scdlogA").toString
    val seqsA = scala.collection.mutable.ArrayBuffer.empty[Long]
    val qA = spark.readStream.format("scd").option("feed", "log")
      .option("startingSeq", "2").load(dir)
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        seqsA ++= b.collect().map(_.getAs[Long]("seq")); ()
      }
      .option("checkpointLocation", ckptA)
      .trigger(Trigger.AvailableNow()).start()
    qA.awaitTermination(60000)
    assert(seqsA.sorted.toSeq == Seq(2L))

    // maxStatementsPerTrigger=1: the 3-statement log drains one per batch
    val ckptB = Files.createTempDirectory("scdlogB").toString
    val batches = scala.collection.mutable.ArrayBuffer.empty[Seq[Long]]
    val qB = spark.readStream.format("scd").option("feed", "log")
      .option("maxStatementsPerTrigger", "1").load(dir)
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        val s = b.collect().map(_.getAs[Long]("seq")).toSeq
        if (s.nonEmpty) batches += s
        ()
      }
      .option("checkpointLocation", ckptB)
      .trigger(Trigger.AvailableNow()).start()
    qB.awaitTermination(60000)
    assert(batches.toSeq == Seq(Seq(0L), Seq(1L), Seq(2L)))
  }

  test("cdc composition: applying the change set to view@from gives view@to") {
    val dir = mkDir()
    writeLog(dir, Stmt1, "-- time=2024-06-01", Stmt2, Stmt3)
    for ((from, to) <- Seq((0L, 1L), (1L, 2L), (2L, 3L), (0L, 3L))) {
      val before = ScdLogFeed.asOfSeq(spark, dir, from)
      val after = ScdLogFeed.asOfSeq(spark, dir, to)
      val cdc = ScdLogFeed.cdcBetween(spark, dir, from, to, "id")
      val cols = before.columns.toIndexedSeq
      val dKeys = cdc.where($"change_type" === "D").select("id")
      val uRows = cdc.where($"change_type" === "U")
        .select(cols.map(col): _*)
      val iRows = cdc.where($"change_type" === "I")
        .select(cols.map(col): _*)
      val applied = before
        .join(dKeys, Seq("id"), "left_anti")
        .join(uRows.select("id"), Seq("id"), "left_anti")
        .unionByName(uRows).unionByName(iRows)
      assert(applied.orderBy("id").collect().toSeq ==
        after.orderBy("id").collect().toSeq,
        s"cdc ($from,$to] did not compose")
    }
  }

  test("streaming tail + cdcBetween in foreachBatch is incremental CDC") {
    val dir = mkDir()
    writeLog(dir, Stmt1, "-- time=2024-06-01", Stmt2)
    val ckpt = Files.createTempDirectory("scdcdc").toString
    val seen = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
    val q = spark.readStream.format("scd").option("feed", "log").load(dir)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val seqs = batch.agg(min("seq"), max("seq")).head()
        if (!seqs.isNullAt(0)) {
          val cdc = ScdLogFeed.cdcBetween(spark, dir,
            seqs.getLong(0), seqs.getLong(1) + 1, "id")
          seen ++= cdc.groupBy("change_type").count().collect()
            .map(r => (r.getString(0), r.getLong(1)))
        }
        ()
      }
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    // one batch covering both statements => the full-range diff
    assert(seen.sorted.toSeq == Seq(("D", 10L), ("U", 45L)))
  }
}
