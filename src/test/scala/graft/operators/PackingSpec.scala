package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PackingSpec extends SparkSpec {

  private def docs = {
    import spark.implicits._
    // shard A: 4+4+4 tokens; budget 10 -> doc 3 starts at offset 8
    // (straddles into chunk 0..1 boundary: chunk of its FIRST token = 0)
    Seq(
      (1L, "a", "t t t t"),
      (2L, "a", "t t t t"),
      (3L, "a", "t t t t"),
      (4L, "a", "t t t t"), // starts at 12 -> chunk 1
      (5L, "b", "t t t t t t t t t t t"), // 11 tokens, starts at 0 -> chunk 0
      (6L, "b", "t t")) // starts at 11 -> chunk 1
      .toDF("doc_id", "shard", "text")
  }

  test("packByOffset: offsets cumulative per shard, chunk = first-token window") {
    val got = Packing.packByOffset(docs, col("shard"), col("doc_id"),
        maxTokens = 10)
      .select("doc_id", "n_tokens", "start_offset", "chunk_id")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got(1L) == ((4L, 0L, 0L)))
    assert(got(2L) == ((4L, 4L, 0L)))
    assert(got(3L) == ((4L, 8L, 0L))) // straddles; assigned to chunk 0
    assert(got(4L) == ((4L, 12L, 1L)))
    assert(got(5L) == ((11L, 0L, 0L)))
    assert(got(6L) == ((2L, 11L, 1L)))
  }

  test("chunkStats: fill and overflow per chunk") {
    val packed = Packing.packByOffset(docs, col("shard"), col("doc_id"),
      maxTokens = 10)
    val got = Packing.chunkStats(packed, col("shard"), maxTokens = 10)
      .select("shard", "chunk_id", "n_docs", "n_tokens", "overflow")
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // shard a chunk 0: docs 1-3, 12 tokens, 2 overflow past offset 10
    assert(got(("a", 0L)) == ((3L, 12L, 2L)))
    assert(got(("a", 1L)) == ((1L, 4L, 0L)))
    // shard b chunk 0: one 11-token doc, 1 token overflow
    assert(got(("b", 0L)) == ((1L, 11L, 1L)))
    assert(got(("b", 1L)) == ((1L, 2L, 0L)))
  }

  test("packing is deterministic under repartitioning") {
    val a = Packing.packByOffset(docs.repartition(7), col("shard"),
      col("doc_id"), maxTokens = 10).select("doc_id", "chunk_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = Packing.packByOffset(docs.coalesce(1), col("shard"),
      col("doc_id"), maxTokens = 10).select("doc_id", "chunk_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a == b)
  }
}
