package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-group ranking at scale.
  *
  * The window formulation (`row_number() OVER (PARTITION BY g ORDER BY
  * s DESC)`) is the oracle-friendly shape but shuffles and sorts every
  * row of every group — a hot group is one straggler task. The
  * aggregate formulation here rides
  * [[graft.functions.expressions.BoundedTopK]]: k-entry heap state,
  * map-side partial top-k, shuffle volume k·partitions per group.
  * With a total order (include a unique tie-break in `orderStruct`)
  * both produce identical rows, which the q_group_topk oracle pins.
  */
object Rank {

  /** Top `k` rows per group by `orderStruct` DESCENDING (put the score
    * first and a unique tie-break last, e.g.
    * `struct(col("score"), col("id"))`). Returns one row per kept
    * element: groupCols, `rank` (1-based), and the struct's fields. */
  def topKPerGroup(df: DataFrame, groupCols: Seq[String],
      orderStruct: Column, k: Int): DataFrame = {
    val agg = df.groupBy(groupCols.map(col): _*)
      .agg(org.apache.spark.sql.graft.CatalystBridge.topK(orderStruct, k)
        .as("__top"))
    val exploded = agg.select(
      groupCols.map(col) :+ posexplode(col("__top")).as(Seq("__pos", "__row")): _*)
    val fields = exploded.schema("__row").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType].fieldNames
    exploded.select(
      groupCols.map(col) ++
        Seq((col("__pos") + 1).cast("long").as("rank")) ++
        fields.map(f => col("__row").getField(f).as(f)): _*)
  }
}
