package graft.operators

import org.apache.spark.sql.{Column, DataFrame}

/** File-layout control for scan pruning — at 100 TB the cheapest query
  * is the one that never opens most files. Parquet footers carry
  * per-file/row-group min-max stats; they only prune when the data is
  * CLUSTERED on the filtered columns. */
object Layout {

  /** Write `df` range-clustered on `cols`: `repartitionByRange` makes
    * each output file own a disjoint key range, `sortWithinPartitions`
    * tightens row-group stats inside the file. A selective filter on
    * `cols` then reads one file instead of all of them (verified by
    * LayoutSpec via the scan's numFiles metric).
    *
    * This is the "sorted table" half of what a table format's
    * clustering (Z-order etc.) gives you, expressed with plain Spark
    * primitives; multi-column range clustering approximates
    * lexicographic Z-ordering for prefix filters. */
  def clusteredWrite(df: DataFrame, cols: Seq[Column], outDir: String,
      numFiles: Int, format: String = "parquet"): Unit =
    df.repartitionByRange(numFiles, cols: _*)
      .sortWithinPartitions(cols: _*)
      .write.mode("overwrite").format(format).save(outDir)

  /** Write `df` as a BUCKETED table: both sides of a recurring join
    * bucketed by the join key with the same bucket count join with NO
    * exchange — the pre-shuffled layout for the fact/dim joins that
    * repeat every day at 100 TB (verified by LayoutSpec: the join plan
    * contains zero Exchange operators). */
  def bucketedWrite(df: DataFrame, key: String, buckets: Int,
      table: String): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet").saveAsTable(table)
}
