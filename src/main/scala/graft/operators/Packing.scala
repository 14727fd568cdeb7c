package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for training-data pipelines: assign documents to
  * fixed-token-budget chunks (context windows) so a trainer can
  * concatenate each chunk into one sequence.
  *
  * The assignment is CUMULATIVE-OFFSET chunking: within a shard,
  * documents are laid out in a deterministic order and each begins at
  * the running token offset of its predecessors; its chunk is the
  * window its FIRST token lands in (`floor(offset / maxTokens)`).
  * This is the streaming-friendly approximation of greedy bin packing
  * — a document may straddle a boundary (trainers either split it or
  * pad; both need exactly this offset), and unlike true greedy
  * first-fit it is a pure prefix sum, so it replays identically in
  * any engine and needs no sequential state.
  *
  * Scale: a single global ordering would serialize the prefix sum on
  * one partition — the classic window-function bottleneck. Packing is
  * therefore SHARDED (`shardCol`): each shard packs independently and
  * in parallel (trainers shard anyway for data-parallel reading). The
  * plan is one hash shuffle on the shard key + a within-partition
  * sort; token counting is per-row expression work.
  */
object Packing {

  /** Chunk assignment per document. Output adds: n_tokens (whitespace
    * tokens), start_offset (cumulative tokens before this doc within
    * its shard), chunk_id (window of the doc's first token). Order
    * within a shard is by `orderCol` — pass a stable unique key (doc
    * id) for reproducible packing. */
  def packByOffset(docs: DataFrame, shardCol: Column, orderCol: Column,
      textCol: String = "text", maxTokens: Int = 2048): DataFrame = {
    require(maxTokens > 0, s"maxTokens must be positive: $maxTokens")
    val w = Window.partitionBy(shardCol).orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val nTok = TextAnalysis.tokenCount(col(textCol)).cast("long")
    docs
      .withColumn("n_tokens", nTok)
      .withColumn("start_offset",
        (sum(col("n_tokens")).over(w) - col("n_tokens")).cast("long"))
      .withColumn("chunk_id", floor(col("start_offset") / maxTokens))
  }

  /** Per-chunk roll-up: how full each packed window is — the packing
    * efficiency report (docs per chunk, token fill, waste). A chunk's
    * fill can exceed maxTokens when its last doc straddles into the
    * next window; `overflow` reports those tokens. */
  def chunkStats(packed: DataFrame, shardCol: Column,
      maxTokens: Int = 2048): DataFrame =
    packed.groupBy(shardCol.as("shard"), col("chunk_id"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        min(col("start_offset")).as("first_offset"))
      .withColumn("overflow",
        greatest(col("first_offset") + col("n_tokens")
          - (col("chunk_id") + 1) * maxTokens, lit(0L)))
}
