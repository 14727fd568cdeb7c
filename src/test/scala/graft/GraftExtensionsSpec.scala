package graft

import org.apache.spark.sql.functions._

/** SQL-surface registration of graft's native functions. */
class GraftExtensionsSpec extends SparkSpec {

  import spark.implicits._

  test("imperative registration exposes dot_product to SQL and expr()") {
    GraftExtensions.register(spark)
    Seq((Array(1.0f, 2.0f), Array(3.0f, 4.0f))).toDF("a", "b")
      .createOrReplaceTempView("vecs_ext")
    val viaSql = spark.sql("SELECT dot_product(a, b) AS d FROM vecs_ext")
      .collect().head.getDouble(0)
    assert(viaSql == 11.0)
    val viaExpr = spark.table("vecs_ext")
      .select(expr("dot_product(a, b)")).collect().head.getDouble(0)
    assert(viaExpr == 11.0)
  }

  test("wrong arity is rejected at analysis") {
    GraftExtensions.register(spark)
    Seq((Array(1.0f), 1)).toDF("a", "x").createOrReplaceTempView("vecs_ext2")
    intercept[Exception] {
      spark.sql("SELECT dot_product(a) FROM vecs_ext2").collect()
    }
  }
}
