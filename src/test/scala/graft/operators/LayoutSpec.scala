package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Proof that clustered layout actually prunes: a selective range
  * filter over a range-clustered table must open a strict subset of
  * the files (parquet min/max skipping), versus all files for the
  * randomly-laid-out copy. */
class LayoutSpec extends SparkSpec {

  import spark.implicits._

  /** rows the parquet scan EMITS after row-group min/max skipping +
    * pushed-filter evaluation (file-level pruning from footers is a
    * table-format feature; vanilla Spark skips at row-group level
    * inside the reader — that's what clustering unlocks) */
  private def scanOutputRows(df: org.apache.spark.sql.DataFrame): Long = {
    df.collect() // execute so metrics populate
    df.queryExecution.executedPlan.collectLeaves().collect {
      case s: FileSourceScanExec => s.metrics("numOutputRows").value
    }.sum
  }

  test("range filter on clustered layout skips row groups the unclustered layout reads") {
    val n = 50000
    // pseudo-random key order so the unclustered layout interleaves ids
    val df = (1 to n).map(i => ((i * 48271) % n, i)).toDF("id", "payload")
    val unclustered = Files.createTempDirectory("lay_rand").toString
    df.repartition(8).write.mode("overwrite").parquet(unclustered)
    val clustered = Files.createTempDirectory("lay_clust").toString
    Layout.clusteredWrite(df, Seq(col("id")), clustered, numFiles = 8)

    val pred = col("id").between(100, 200)
    val randRows = scanOutputRows(spark.read.parquet(unclustered).where(pred))
    val clustRows = scanOutputRows(spark.read.parquet(clustered).where(pred))
    // clustered: only the one row group whose min/max covers [100,200]
    // survives the footer check; interleaved: every row group overlaps
    assert(clustRows < randRows / 4,
      s"no row-group skipping: clustered=$clustRows unclustered=$randRows")
    // identical results either way
    assert(spark.read.parquet(clustered).where(pred).count() ==
      spark.read.parquet(unclustered).where(pred).count())
  }

  test("z-order layout prunes on the NON-prefix dimension; linear sort cannot") {
    // 64x64 grid: lexicographic (x, y) clustering gives y no locality
    val grid = (for { x <- 0 until 64; y <- 0 until 64 }
      yield (x, y, x * 64 + y)).toDF("x", "y", "payload")
    val linear = Files.createTempDirectory("lay_lin").toString
    Layout.clusteredWrite(grid, Seq(col("x"), col("y")), linear,
      numFiles = 16)
    val zed = Files.createTempDirectory("lay_z").toString
    Layout.zOrderedWrite(grid, Seq(col("x"), col("y")), bits = 6, zed,
      numFiles = 16)

    // filter on y ALONE — the dimension the linear sort subordinates
    val pred = col("y") < 4
    val linRows = scanOutputRows(spark.read.parquet(linear).where(pred))
    val zRows = scanOutputRows(spark.read.parquet(zed).where(pred))
    // every x-clustered row group spans all y: nothing skips; z-tiles
    // confine y < 4 to the bottom row of tiles
    assert(zRows < linRows / 2,
      s"z-order did not prune: z=$zRows linear=$linRows")
    assert(spark.read.parquet(zed).where(pred).count() ==
      spark.read.parquet(linear).where(pred).count())
    // the layout key is not persisted
    assert(spark.read.parquet(zed).columns.toSet == Set("x", "y", "payload"))
  }

  test("bucketed tables join with zero exchanges (co-located join)") {
    val facts = (1 to 20000).map(i => (i % 1000, i)).toDF("k", "v")
    val dims = (0 until 1000).map(i => (i, s"d$i")).toDF("k", "name")
    Layout.bucketedWrite(facts, "k", 8, "lay_facts")
    Layout.bucketedWrite(dims, "k", 8, "lay_dims")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("lay_facts")
        .join(spark.table("lay_dims"), Seq("k"))
      assert(joined.count() == 20000)
      val plan = joined.queryExecution.executedPlan.toString
      // both sides pre-bucketed on k with equal bucket counts: the
      // sort-merge join consumes bucket layout directly — NO shuffle
      assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
      prevThreshold)
  }
}
