package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The containment family's dense-vocab guard (VERDICT r14 #4):
  * chunked (forced by a tiny budget) must be PAIR-IDENTICAL to
  * single-pass (forced by a huge budget) across the inline, indexed,
  * and incremental forms — the id_a hash partition is an exact
  * partition of the directed-pair space, and each pass re-applies
  * the full filter + verify chain. The dense fixture below draws
  * every doc from one tiny vocabulary, the exact regime the guard
  * exists for (rarest shingles still carry high df). */
class ContainmentChunkSpec extends SparkSpec {

  // 40 docs over an 8-word vocabulary: trigram df is high for EVERY
  // shingle, so the volume estimate trips any small budget
  private def docs = {
    import spark.implicits._
    val vocab = Vector("ash", "bay", "cod", "dew", "elm", "fir",
      "gum", "hay")
    (1L to 40L).map { i =>
      val words = (0 until 24).map(j =>
        vocab(((i * 7 + j * 5 + j * j) % 8).toInt))
      (i, words.mkString(" "))
    }.toDF("doc_id", "text")
  }

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("inline containmentJoin: chunked ≡ single-pass") {
    val single = canon(Dedup.containmentJoin(docs, threshold = 0.6,
      chunkBudget = Long.MaxValue))
    val chunked = canon(Dedup.containmentJoin(docs, threshold = 0.6,
      chunkBudget = 1L))
    assert(single.nonEmpty, "fixture must produce directed pairs")
    assert(chunked == single)
  }

  test("indexed + incremental forms: chunked ≡ single-pass") {
    val base = java.nio.file.Files
      .createTempDirectory("cont_chunk").toString
    val corpus = docs.where(col("doc_id") % 2 === 0)
    val batch = docs.where(col("doc_id") % 2 === 1)
    Dedup.jaccardIndexWrite(corpus, s"$base/idx", w = 3)
    val idxSingle = canon(Dedup.containmentJoinIndexed(spark,
      s"$base/idx", threshold = 0.6, chunkBudget = Long.MaxValue))
    val idxChunked = canon(Dedup.containmentJoinIndexed(spark,
      s"$base/idx", threshold = 0.6, chunkBudget = 1L))
    assert(idxSingle.nonEmpty && idxChunked == idxSingle)
    val incSingle = canon(Dedup.containmentJoinIncremental(batch,
      s"$base/idx", threshold = 0.6, chunkBudget = Long.MaxValue))
    val incChunked = canon(Dedup.containmentJoinIncremental(batch,
      s"$base/idx", threshold = 0.6, chunkBudget = 1L))
    assert(incSingle.nonEmpty && incChunked == incSingle)
  }

  test("normal corpora stay single-pass (estimate under the budget)") {
    // distinct per-doc vocabularies: every shingle df = 1, estimate =
    // prefix row count ≪ default budget — chunksFor must return 1
    import spark.implicits._
    val sparse = (1L to 30L).map(i =>
      (i, (0 until 12).map(j => s"w${i}_$j").mkString(" ")))
      .toDF("doc_id", "text")
    // pair-free output either way; the point is the path equivalence
    assert(canon(Dedup.containmentJoin(sparse, threshold = 0.8)) ==
      canon(Dedup.containmentJoin(sparse, threshold = 0.8,
        chunkBudget = 1L)))
  }
}
