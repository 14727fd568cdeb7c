package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The native DotProduct expression must be bit-identical to the
  * higher-order reference formulation and must actually stay inside
  * whole-stage codegen (no CodegenFallback in its plan). */
class DotProductSpec extends SparkSpec {

  import spark.implicits._

  private def vecs = Seq(
    (1L, Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)),
    (2L, Array(-0.5f, 0.25f, 8.0f), Array(0.1f, -0.2f, 0.3f)),
    (3L, Array(0.0f, 0.0f, 0.0f), Array(1.0f, 1.0f, 1.0f)))
    .toDF("id", "a", "b")

  test("bit-identical to the higher-order reference on float arrays") {
    val both = vecs.select(
      VectorFunctions.dot(col("a"), col("b")).as("native"),
      VectorFunctions.dotHof(col("a"), col("b")).as("hof"))
      .collect()
    both.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("double arrays and mixed element types work") {
    val d = Seq((Array(1.0, 2.0), Array(3.0, 4.0))).toDF("a", "b")
    assert(d.select(VectorFunctions.dot(col("a"), col("b")))
      .collect().head.getDouble(0) == 11.0)
    val mixed = Seq((Array(1.0f, 2.0f), Array(3.0, 4.0))).toDF("a", "b")
    assert(mixed.select(VectorFunctions.dot(col("a"), col("b")))
      .collect().head.getDouble(0) == 11.0)
  }

  test("NULL array, NULL element, and length mismatch all yield NULL (like zip_with)") {
    val df = Seq(
      (1L, Some(Seq(Some(1.0), Some(2.0))), Some(Seq(Some(3.0), Some(4.0)))),
      (2L, None, Some(Seq(Some(1.0)))),
      (3L, Some(Seq(Some(1.0), None)), Some(Seq(Some(1.0), Some(2.0)))),
      (4L, Some(Seq(Some(1.0))), Some(Seq(Some(1.0), Some(2.0)))))
      .toDF("id", "a", "b")
    val rows = df.select(col("id"),
      VectorFunctions.dot(col("a"), col("b")).as("native"),
      VectorFunctions.dotHof(col("a"), col("b")).as("hof"))
      .collect().map(r => (r.getLong(0), r.isNullAt(1), r.isNullAt(2))).toList
    assert(rows == List((1L, false, false), (2L, true, true),
      (3L, true, true), (4L, true, true)))
  }

  test("cosine built on the native dot matches the oracle-rounded values") {
    val c = vecs.select(round(
      VectorFunctions.cosine(col("a"), col("b")), 6).as("c")).collect()
    assert(math.abs(c(0).getDouble(0) - 0.974632) < 1e-6)
  }

  test("plan stays in whole-stage codegen (no CodegenFallback)") {
    // parquet round-trip so ConvertToLocalRelation can't pre-evaluate
    val dir = java.nio.file.Files.createTempDirectory("dotp").toString
    vecs.write.mode("overwrite").parquet(dir)
    val plan = spark.read.parquet(dir)
      .select(VectorFunctions.dot(col("a"), col("b")))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1)"), s"not codegen'd:\n$plan")
    // ...whereas the higher-order formulation falls out of codegen:
    // ArrayAggregate/ZipWith are CodegenFallback — documented contrast
    val hofPlan = spark.read.parquet(dir)
      .select(VectorFunctions.dotHof(col("a"), col("b")))
      .queryExecution.executedPlan.toString
    assert(hofPlan.contains("aggregate(zip_with"), s"unexpected:\n$hofPlan")
  }
}
