package graft.scd

import graft.SparkSpec
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Regression lock on the core scale property: the compiled SCD view is
  * TRANSPARENT to Catalyst — outer filters push through the replay into
  * the file scan, and unneeded columns are pruned out of it. If replay
  * ever becomes an optimization barrier (UDF, mapPartitions, opaque
  * plan node), these assertions fail. */
class PushdownSpec extends SparkSpec {

  import spark.implicits._

  private lazy val dir: String = {
    val d = Files.createTempDirectory("scdpush").toString
    (1 to 100).map(i => (i.toLong, s"name$i", i * 10.0, if (i % 2 == 0) "A" else "B"))
      .toDF("id", "name", "bal", "seg")
      .write.mode("overwrite").parquet(d)
    Files.writeString(java.nio.file.Paths.get(d, ScdReader.SidecarName),
      "UPDATE t SET bal = bal + 5 WHERE seg = 'A';\n")
    d
  }

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("outer equality filter reaches PushedFilters of the parquet scan") {
    val plan = planOf(ScdReader.read(spark, dir).where(col("id") === 42))
    assert(plan.contains("PushedFilters: [IsNotNull(id), EqualTo(id,42)]"),
      s"filter not pushed:\n$plan")
  }

  test("projection prunes pruned-update columns entirely from the scan") {
    // neither selected column depends on the UPDATE, so Catalyst
    // eliminates the whole CASE WHEN *and its column dependencies* —
    // the "column-pruned update application" the reference README
    // deferred as future work (README.md:235-237), free here
    val plan = planOf(ScdReader.read(spark, dir).select("id", "name"))
    assert(plan.contains("ReadSchema: struct<id:bigint,name:string>"),
      s"unexpected read schema:\n$plan")
    // selecting the updated column pulls in exactly its dependencies
    val plan2 = planOf(ScdReader.read(spark, dir).select("id", "bal"))
    assert(plan2.contains("ReadSchema: struct<id:bigint,bal:double,seg:string>"),
      s"unexpected read schema:\n$plan2")
  }

  test("replay plan is narrow: no shuffle, whole-stage codegen") {
    val plan = planOf(ScdReader.read(spark, dir))
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
    // "*(n)" prefixes mark whole-stage-codegen stages in toString
    assert(plan.contains("*(1)"), s"not codegen'd:\n$plan")
  }

  test("partition pruning reaches PartitionFilters through the SCD view") {
    val pdir = Files.createTempDirectory("scdpart").toString
    (1 to 100).map(i => (i.toLong, i * 10.0, if (i % 2 == 0) "A" else "B"))
      .toDF("id", "bal", "seg")
      .write.mode("overwrite").partitionBy("seg").parquet(pdir)
    Files.writeString(java.nio.file.Paths.get(pdir, ScdReader.SidecarName),
      "UPDATE t SET bal = bal + 5 WHERE id > 50;\n")
    val plan = planOf(ScdReader.read(spark, pdir).where(col("seg") === "A"))
    assert(plan.contains("PartitionFilters: [isnotnull(seg"),
      s"partition filter not pruned:\n$plan")
    // only the A partition's rows survive, updates still applied
    val rows = ScdReader.read(spark, pdir).where(col("seg") === "A").collect()
    assert(rows.length == 50)
    assert(rows.forall(r => r.getAs[Long]("id") % 2 == 0))
  }
}
