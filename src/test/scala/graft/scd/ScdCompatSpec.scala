package graft.scd

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** O13 error-policy tests: default = fail fast (Spark-idiomatic, ANSI
  * error surfaces); `errorSkipCompat` = reference row-skip
  * (SQLUpdater.java:171-174 catches SQLException and skips the
  * record). */
class ScdCompatSpec extends SparkSpec {

  import scala.jdk.CollectionConverters._

  private val schema = StructType(Seq(
    StructField("k", IntegerType), StructField("v", IntegerType)))

  private def df = spark.createDataFrame(
    Seq(Row(1, 10), Row(2, 20), Row(3, 30)).asJava, schema)

  test("default policy: division-by-zero UPDATE fails the query") {
    val log = "UPDATE t SET v = 1 div (k - 2);"
    val ex = intercept[Exception] {
      ScdReader.applyLogText(spark, df, log, None).collect()
    }
    assert(ex.getMessage.toLowerCase.contains("divide") ||
      ex.getCause != null)
  }

  test("compat policy: the erroring row is skipped, others update") {
    val log = "UPDATE t SET v = 10 div (k - 2);"
    val got = ScdReader.applyLogText(spark, df, log, None,
      errorSkipCompat = true)
      .collect().map(r => (r.getInt(0), r.getInt(1))).toSet
    // k=2 divides by zero -> dropped; k=1 -> 10/(−1) = −10; k=3 -> 10/1
    assert(got == Set((1, -10), (3, 10)))
  }

  test("compat policy: SET errors on non-matching rows don't fire (H2 short-circuit)") {
    val log = "UPDATE t SET v = 10 div (k - 2) WHERE k = 999;"
    val got = ScdReader.applyLogText(spark, df, log, None,
      errorSkipCompat = true)
      .collect().map(r => (r.getInt(0), r.getInt(1))).toSet
    // nothing matches; the k=2 row must survive untouched even though
    // its SET expression would raise
    assert(got == Set((1, 10), (2, 20), (3, 30)))
  }

  test("compat policy: erroring DELETE predicate skips (drops) the row") {
    val log = "DELETE FROM t WHERE 10 div (k - 2) > 100;"
    val got = ScdReader.applyLogText(spark, df, log, None,
      errorSkipCompat = true)
      .collect().map(_.getInt(0)).toSet
    // k=2: predicate raises -> reference skips the record -> dropped;
    // k=1,3: predicate cleanly false -> kept
    assert(got == Set(1, 3))
  }

  test("compat policy: unknown SET column still fails fast (prepare-time error)") {
    val log = "UPDATE t SET nosuch = 1;"
    intercept[IllegalStateException] {
      ScdReader.applyLogText(spark, df, log, None, errorSkipCompat = true)
    }
  }

  test("replay handles types beyond the reference's limit (decimal/date/timestamp)") {
    // the reference supports only int/long/float/double/boolean/string
    // (README.md:248-252, decimal named as future work) — the compiled
    // Spark replay is type-agnostic: SET casts back to the declared type
    val extSchema = StructType(Seq(
      StructField("k", IntegerType),
      StructField("price", DecimalType(10, 2)),
      StructField("d", DateType),
      StructField("ts", TimestampType)))
    val df = spark.createDataFrame(
      Seq(
        Row(1, new java.math.BigDecimal("10.50"),
          java.sql.Date.valueOf("2024-01-01"),
          java.sql.Timestamp.valueOf("2024-01-01 10:00:00")),
        Row(2, new java.math.BigDecimal("99.99"),
          java.sql.Date.valueOf("2024-06-15"),
          java.sql.Timestamp.valueOf("2024-06-15 12:30:00"))).asJava,
      extSchema)
    val log =
      """UPDATE t SET price = price * 2, d = date_add(d, 10) WHERE k = 1;
        |DELETE FROM t WHERE ts > timestamp'2024-06-01 00:00:00';
        |""".stripMargin
    val got = ScdReader.applyLogText(spark, df, log, None).collect()
    assert(got.length == 1)
    val r = got.head
    assert(r.getDecimal(1) == new java.math.BigDecimal("21.00"))
    assert(r.getDate(2) == java.sql.Date.valueOf("2024-01-11"))
  }

  test("compat policy: NULL predicate still fires nothing") {
    val withNull = spark.createDataFrame(
      Seq(Row(1, 10), Row(2, null)).asJava, schema)
    val log = "UPDATE t SET k = k + 100 WHERE v > 5;"
    val got = ScdReader.applyLogText(spark, withNull, log, None,
      errorSkipCompat = true)
      .collect().map(_.getInt(0)).toSet
    assert(got == Set(101, 2))
  }
}
