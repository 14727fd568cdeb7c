package graft.sources

import graft.SparkSpec
import graft.scd.{ScdLogFeed, ScdReader}
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** [[ScdCatalog]]: path-addressed SQL access with native time travel —
  * `TIMESTAMP AS OF` (scd.time coordinate) and `VERSION AS OF`
  * (statement-seq coordinate). */
class ScdCatalogSpec extends SparkSpec {

  import spark.implicits._

  private lazy val dir: String = {
    val d = Files.createTempDirectory("scdcat").toString
    (1 to 100).map(i =>
      (i.toLong, s"name$i", i * 10.0, if (i % 2 == 0) "A" else "B"))
      .toDF("id", "name", "bal", "seg")
      .write.mode("overwrite").parquet(d)
    Files.writeString(java.nio.file.Paths.get(d, ScdReader.SidecarName),
      """UPDATE t SET bal = bal + 5 WHERE seg = 'A';
        |-- time=2030-01-01
        |DELETE FROM t WHERE id > 90;
        |""".stripMargin)
    spark.conf.set("spark.sql.catalog.graft",
      classOf[ScdCatalog].getName)
    d
  }

  test("SELECT through the catalog equals ScdReader.read") {
    val viaSql = spark.sql(s"SELECT * FROM graft.`$dir` ORDER BY id")
      .collect().toSeq
    assert(viaSql == ScdReader.read(spark, dir).orderBy("id")
      .collect().toSeq)
    assert(viaSql.length == 100) // future DELETE gated at "now"
  }

  test("TIMESTAMP AS OF travels the scd.time coordinate") {
    val future = spark.sql(
      s"SELECT * FROM graft.`$dir` TIMESTAMP AS OF '2031-01-01'")
    assert(future.count() == 90) // DELETE applied
    val past = spark.sql(
      s"SELECT * FROM graft.`$dir` TIMESTAMP AS OF '2024-01-01'")
    assert(past.count() == 100)
    // the epoch-0 UPDATE applies even in 2024
    assert(past.where($"seg" === "A" && $"bal" % 10 === 5).count() == 50)
  }

  test("VERSION AS OF travels the statement-seq coordinate") {
    val v0 = spark.sql(s"SELECT * FROM graft.`$dir` VERSION AS OF 0")
    assert(v0.orderBy("id").collect().toSeq ==
      spark.read.parquet(dir).orderBy("id").collect().toSeq)
    val v1 = spark.sql(s"SELECT * FROM graft.`$dir` VERSION AS OF 1")
    assert(v1.count() == 100)
    assert(v1.where($"seg" === "A" && $"bal" % 10 === 5).count() == 50)
    val v2 = spark.sql(s"SELECT * FROM graft.`$dir` VERSION AS OF 2")
    assert(v2.orderBy("id").collect().toSeq ==
      ScdLogFeed.asOfSeq(spark, dir, 2).orderBy("id").collect().toSeq)
    assert(v2.count() == 90)
  }

  test("pushdown reaches the file scan through the catalog table") {
    val df = spark.sql(s"SELECT id, bal FROM graft.`$dir` WHERE id = 7")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      (plan.contains("id") || plan.contains("IsNotNull")), plan)
    assert(df.collect().length == 1)
  }

  test("missing dir, bad version, and DDL all fail clearly") {
    val e = intercept[Exception] {
      spark.sql("SELECT * FROM graft.`/no/such/dir`").collect()
    }
    assert(e.getMessage.contains("TABLE_OR_VIEW_NOT_FOUND") ||
      e.getMessage.toLowerCase.contains("not found"), e.getMessage)
    intercept[Exception] {
      spark.sql(s"SELECT * FROM graft.`$dir` VERSION AS OF 'xyz'")
        .collect()
    }
    val ddl = intercept[Exception] {
      spark.sql(s"CREATE TABLE graft.t2 (id INT) USING parquet")
    }
    assert(ddl.getMessage.contains("read-only") ||
      ddl.getMessage.toLowerCase.contains("not support"), ddl.getMessage)
  }
}
