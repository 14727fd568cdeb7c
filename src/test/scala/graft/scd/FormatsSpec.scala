package graft.scd

import graft.SparkSpec
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import java.nio.file.{Files, Paths}

/** The "table = directory + .updates sidecar" abstraction is
  * format-agnostic: the same replay must produce the same rows over
  * every DataSource format the host engine ships (SURVEY §2.2 source
  * row — the reference is Avro-only; parquet/orc/json/csv/xml come
  * free from the format plumbing, and this spec pins that claim; xml
  * is Spark 4's built-in source, rowTag-scoped). */
class FormatsSpec extends SparkSpec {

  import spark.implicits._

  private val log =
    """-- time=2020-01-01T00:00:00
      |UPDATE t SET v = 'patched' WHERE id = 2;
      |-- time=2020-06-01T00:00:00
      |DELETE FROM t WHERE id = 3;
      |""".stripMargin

  private def writeDir(format: String): String = {
    val dir = Files.createTempDirectory(s"fmt_$format").toString
    val df = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")
    df.coalesce(1).write.mode("overwrite").format(format)
      .option("header", "true").option("rowTag", "row").save(dir)
    Files.writeString(Paths.get(dir, ".updates"), log)
    dir
  }

  private val csvSchema = StructType(Seq(
    StructField("id", LongType), StructField("v", StringType)))

  for (format <- Seq("parquet", "orc", "json", "csv", "xml")) {
    test(s"SCD replay over $format matches the parquet result") {
      val dir = writeDir(format)
      val schema = if (format == "csv") Some(csvSchema) else None
      val opts = format match {
        case "csv" => Map("header" -> "true")
        case "xml" => Map("rowTag" -> "row")
        case _ => Map.empty[String, String]
      }
      val got = ScdReader.read(spark, dir, format, schema, opts)
        .orderBy("id").collect()
        .map(r => (r.getLong(r.fieldIndex("id")),
          r.getString(r.fieldIndex("v"))))
        .toSeq
      assert(got == Seq((1L, "a"), (2L, "patched")))
      // as-of before the first statement: pristine base
      val past = ScdReader.read(spark, dir, format, schema, opts,
        asOf = Some("2019-01-01")).count()
      assert(past == 3L)
    }
  }

  test("filter pushdown reaches the ORC scan through the SCD view") {
    val dir = writeDir("orc")
    val plan = ScdReader.read(spark, dir, "orc")
      .where($"id" === 1L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(id), EqualTo(id,1)]"),
      plan)
  }
}
