package graft.sources

import graft.SparkSpec
import graft.scd.ScdReader
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** The SQL-only `format("scd")` surface (VERDICT r7 next-round #1):
  * correctness vs the Scala API, pushdown through the DSv2 node on the
  * native (extensions) path, and the V1Scan fallback on a session
  * without GraftExtensions. */
class ScdSqlSourceSpec extends SparkSpec {

  import spark.implicits._

  private lazy val dir: String = {
    val d = Files.createTempDirectory("scdsql").toString
    (1 to 100).map(i =>
      (i.toLong, s"name$i", i * 10.0, if (i % 2 == 0) "A" else "B"))
      .toDF("id", "name", "bal", "seg")
      .write.mode("overwrite").parquet(d)
    Files.writeString(java.nio.file.Paths.get(d, ScdReader.SidecarName),
      """UPDATE t SET bal = bal + 5 WHERE seg = 'A';
        |-- time=2030-01-01
        |DELETE FROM t WHERE id > 90;
        |""".stripMargin)
    d
  }

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("format(\"scd\") equals ScdReader.read (native path)") {
    val viaSql = spark.read.format("scd").load(dir)
      .orderBy("id").collect().toSeq
    val viaApi = ScdReader.read(spark, dir).orderBy("id").collect().toSeq
    assert(viaSql == viaApi)
    // the UPDATE applied, the future DELETE gated
    assert(viaSql.length == 100)
    assert(viaSql.filter(_.getAs[String]("seg") == "A")
      .forall(r => r.getAs[Double]("bal") == r.getAs[Long]("id") * 10.0 + 5))
  }

  test("asOf option: -1 disables replay; future time applies the DELETE") {
    val raw = spark.read.format("scd").option("asOf", "-1").load(dir)
    assert(raw.where(col("seg") === "A" && col("bal") % 10 === 5).count() == 0)
    val future = spark.read.format("scd").option("asOf", "2031-01-01")
      .load(dir)
    assert(future.count() == 90)
  }

  test("spark.graft.scd.time session conf is the default asOf") {
    spark.conf.set(ScdReader.ConfKeyGraft, "2031-01-01")
    try {
      assert(spark.read.format("scd").load(dir).count() == 90)
      // explicit option still wins over the conf
      assert(spark.read.format("scd").option("asOf", "-1").load(dir)
        .count() == 100)
    } finally spark.conf.unset(ScdReader.ConfKeyGraft)
    // conf gone → back to "now" (DELETE gated again)
    assert(spark.read.format("scd").load(dir).count() == 100)
  }

  test("native path: no DSv2 scan node survives; filter + pruning reach the file scan") {
    val df = spark.read.format("scd").load(dir).where(col("id") === 42)
    val plan = planOf(df)
    assert(!plan.contains("BatchScan"), s"DSv2 node not rewritten:\n$plan")
    assert(plan.contains("PushedFilters: [IsNotNull(id), EqualTo(id,42)]"),
      s"filter not pushed through the scd relation:\n$plan")
    val plan2 = planOf(spark.read.format("scd").load(dir).select("id", "name"))
    assert(plan2.contains("ReadSchema: struct<id:bigint,name:string>"),
      s"columns not pruned through the scd relation:\n$plan2")
    // still the zero-shuffle codegen'd chain PushdownSpec locks for the API
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }

  test("CREATE TEMPORARY VIEW ... USING scd serves the as-of view to plain SQL") {
    spark.sql(s"""CREATE OR REPLACE TEMPORARY VIEW scd_spec_t
                 |USING scd OPTIONS (path '$dir')""".stripMargin)
    val viaView =
      spark.sql("SELECT id, bal FROM scd_spec_t WHERE seg = 'A' ORDER BY id")
        .collect().toSeq
    val viaApi = ScdReader.read(spark, dir).where(col("seg") === "A")
      .select("id", "bal").orderBy("id").collect().toSeq
    assert(viaView == viaApi)
    spark.sql("DROP VIEW scd_spec_t")
  }

  test("V1Scan fallback: a session WITHOUT GraftExtensions still reads correctly") {
    // build a sibling session with no extensions (shares the context;
    // never stop() it — same discipline as GraftExtensionsSpec)
    val orig = spark
    org.apache.spark.sql.SparkSession.clearActiveSession()
    org.apache.spark.sql.SparkSession.clearDefaultSession()
    try {
      val bare = org.apache.spark.sql.SparkSession.builder()
        .master("local[2]").getOrCreate()
      assert(bare.sessionState ne orig.sessionState) // really a new session
      val got = bare.read.format("scd").load(dir).orderBy("id")
        .collect().toSeq
      val want = ScdReader.read(orig, dir).orderBy("id").collect().toSeq
      assert(got.map(_.toSeq) == want.map(_.toSeq))
      // pruning + filtering flow through the fallback too (applied on
      // the inner view; Spark re-applies filters above, so this is a
      // correctness check of the composed result)
      val g2 = bare.read.format("scd").load(dir)
        .where(col("seg") === "A").select("id", "bal").orderBy("id")
        .collect().toSeq
      val w2 = ScdReader.read(orig, dir).where(col("seg") === "A")
        .select("id", "bal").orderBy("id").collect().toSeq
      assert(g2.map(_.toSeq) == w2.map(_.toSeq))
      // zero-column projection (count(*)) through the fallback
      assert(bare.read.format("scd").load(dir).count() == 100)
    } finally {
      org.apache.spark.sql.SparkSession.setActiveSession(orig)
      org.apache.spark.sql.SparkSession.setDefaultSession(orig)
    }
  }

  test("V1 fallback captures a SET scd.time conf at load(), not at the action") {
    // r17 sweep find: the native analyzer rewrite resolves the session
    // conf when the query ANALYZES (load time), but the fallback used
    // to read it inside buildScan — action time. A conf set around
    // load() and unset before the action was silently ignored,
    // breaking the fallback's "never wrong, just slower" contract.
    val orig = spark
    org.apache.spark.sql.SparkSession.clearActiveSession()
    org.apache.spark.sql.SparkSession.clearDefaultSession()
    try {
      val bare = org.apache.spark.sql.SparkSession.builder()
        .master("local[2]").getOrCreate()
      assert(bare.sessionState ne orig.sessionState)
      bare.conf.set(ScdReader.ConfKeyGraft, "2031-01-01")
      val df = try bare.read.format("scd").load(dir)
               finally bare.conf.unset(ScdReader.ConfKeyGraft)
      // acted on AFTER the unset — the captured time must still gate
      // the future DELETE in (100 -> 90 rows), matching the native path
      assert(df.count() == 90)
      // and with no conf at load, the default (now) applies: 100 rows
      assert(bare.read.format("scd").load(dir).count() == 100)
    } finally {
      org.apache.spark.sql.SparkSession.setActiveSession(orig)
      org.apache.spark.sql.SparkSession.setDefaultSession(orig)
    }
  }

  test("partition pruning reaches PartitionFilters through format(\"scd\")") {
    val pdir = Files.createTempDirectory("scdsqlpart").toString
    (1 to 100).map(i => (i.toLong, i * 10.0, if (i % 2 == 0) "A" else "B"))
      .toDF("id", "bal", "seg")
      .write.mode("overwrite").partitionBy("seg").parquet(pdir)
    Files.writeString(java.nio.file.Paths.get(pdir, ScdReader.SidecarName),
      "UPDATE t SET bal = bal + 5 WHERE id > 50;\n")
    val df = spark.read.format("scd").load(pdir).where(col("seg") === "A")
    val plan = planOf(df)
    assert(plan.contains("PartitionFilters: [isnotnull(seg"),
      s"partition filter not pruned:\n$plan")
    assert(df.count() == 50)
  }

  test("missing path raises a clear error") {
    val e = intercept[IllegalArgumentException] {
      ScdDataSource.params(Map.empty[String, String])
    }
    assert(e.getMessage.contains("path"))
  }
}
