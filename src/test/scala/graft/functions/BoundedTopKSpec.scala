package graft.functions

import scala.util.Random

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.CatalystBridge
import graft.SparkSpec
import graft.operators.Rank

/** BoundedTopK's contract: with a total struct order it returns
  * EXACTLY the window-rank rows, under every partitioning (merges and
  * the serialize/deserialize path included), and the heap never grows
  * past k. */
class BoundedTopKSpec extends SparkSpec {
  import spark.implicits._

  test("exact window equivalence under every partitioning") {
    val rnd = new Random(7)
    val rows = Seq.tabulate(5000)(i =>
      (s"g${rnd.nextInt(7)}", rnd.nextInt(400).toLong, i.toLong))
    val df = rows.toDF("g", "score", "id")
    val w = Window.partitionBy("g")
      .orderBy(col("score").desc, col("id"))
    val expected = df
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= 10)
      .select("g", "rank", "score", "id")
      .orderBy("g", "rank")
      .collect().toSeq
    for (parts <- Seq(1, 5, 17)) {
      val got = Rank.topKPerGroup(df.repartition(parts), Seq("g"),
          struct(col("score"), negate(col("id")).as("nid")), 10)
        .select(col("g"), col("rank"), col("score"),
          negate(col("nid")).cast("long").as("id"))
        .orderBy("g", "rank")
        .collect().toSeq
      assert(got == expected, s"parts=$parts")
    }
  }

  test("groups smaller than k return all rows, ranked") {
    val df = Seq(("a", 3L, 1L), ("a", 1L, 2L), ("b", 9L, 3L))
      .toDF("g", "score", "id")
    val got = Rank.topKPerGroup(df, Seq("g"),
        struct(col("score"), col("id")), 10)
      .select("g", "rank", "score", "id").orderBy("g", "rank")
      .collect().map(r =>
        (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq(("a", 1L, 3L, 1L), ("a", 2L, 1L, 2L),
      ("b", 1L, 9L, 3L)))
  }

  test("top_k is callable from plain SQL") {
    CatalystBridge.registerFunctions(spark)
    Seq(("a", 5L), ("a", 9L), ("a", 1L)).toDF("g", "s")
      .createOrReplaceTempView("tk_sql_in")
    val arr = spark.sql(
      "SELECT top_k(struct(s), 2) AS t FROM tk_sql_in GROUP BY g")
      .head().getSeq[org.apache.spark.sql.Row](0)
    assert(arr.map(_.getLong(0)) == Seq(9L, 5L))
  }

  test("string scores and null struct inputs") {
    val df = Seq(Some("bb"), None, Some("aa"), Some("cc"))
      .toDF("s").withColumn("st",
        when(col("s").isNotNull, struct(col("s"))))
    val got = df.agg(CatalystBridge.topK(col("st"), 2).as("t"))
      .head().getSeq[org.apache.spark.sql.Row](0).map(_.getString(0))
    assert(got == Seq("cc", "bb"))
  }
}
