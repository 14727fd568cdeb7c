package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests for the packing family on RANDOM corpora — the
  * fixture specs pin exact values; these pin the structural
  * invariants on generated data (deterministic scalacheck sampling,
  * fixed seeds, the UpdatesPropertySpec pattern):
  *
  *   - packSegments: every non-final window per shard fills to
  *     exactly maxTokens; every doc's segments reassemble it.
  *   - packAppend ≡ full repack on every random monotone split
  *     point, including splits that land mid-window.
  *   - chunkText windows concatenate to the shard's full token
  *     stream in order.
  *   - slidingWindows covers every token, non-final windows full.
  */
class PackingPropertySpec extends SparkSpec {
  import spark.implicits._

  private def sample[A](gen: Gen[A], seed: Long): A =
    gen.pureApply(Gen.Parameters.default, Seed(seed))

  /** Random corpus: 40–120 docs over 3 shards, 0–9 word docs (word =
    * "w<doc>_<i>" so every token is unique and reassembly is
    * checkable by equality). */
  private def corpus(seed: Long) = {
    val nDocs = sample(Gen.choose(40, 120), seed)
    val rows = (1 to nDocs).map { i =>
      val nTok = sample(Gen.choose(0, 9), seed * 1000 + i)
      (i.toLong, s"s${i % 3}", (1 to nTok).map(j => s"w${i}_$j").mkString(" "))
    }
    // empty text tokenizes to [""] (1 token) — that's the library
    // convention and fine for these invariants
    rows.toDF("doc_id", "shard", "text")
  }

  test("packSegments invariants hold on random corpora") {
    for (seed <- 1L to 3L) {
      val d = corpus(seed)
      val m = 7
      val seg = Packing.packSegments(d, col("shard"), col("doc_id"),
        maxTokens = m).cache()
      val fills = seg.groupBy("shard", "chunk_id")
        .agg(sum("n_seg_tokens").as("fill"))
      val last = fills.groupBy("shard").agg(max("chunk_id").as("lc"))
      val bad = fills.join(last, "shard")
        .where(col("chunk_id") < col("lc") && col("fill") =!= m)
      assert(bad.count() == 0, s"seed $seed: non-final window not full")
      val re = seg.groupBy("doc_id").agg(sum("n_seg_tokens").as("s"))
        .join(Packing.packByOffset(d, col("shard"), col("doc_id"),
          maxTokens = m).select("doc_id", "n_tokens"), "doc_id")
        .where(col("s") =!= col("n_tokens"))
      assert(re.count() == 0, s"seed $seed: reassembly broken")
      seg.unpersist()
    }
  }

  test("packAppend equals full repack at every random monotone split") {
    for (seed <- 10L to 12L) {
      val d = corpus(seed).cache()
      val maxId = d.agg(max("doc_id")).head().getLong(0)
      val cut = sample(Gen.choose(2L, maxId - 1), seed * 7)
      val totals = Packing.packTotals(
        Packing.packByOffset(d.where(col("doc_id") < cut), col("shard"),
          col("doc_id"), maxTokens = 7), col("shard"))
      val inc = Packing.packAppend(d.where(col("doc_id") >= cut),
          col("shard"), col("doc_id"), totals, maxTokens = 7)
        .select("doc_id", "start_offset", "chunk_id")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSet
      val full = Packing.packByOffset(d, col("shard"), col("doc_id"),
          maxTokens = 7)
        .where(col("doc_id") >= cut)
        .select("doc_id", "start_offset", "chunk_id")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSet
      assert(inc == full, s"seed $seed cut $cut: append != repack")
      d.unpersist()
    }
  }

  test("chunkText reassembles each shard's full token stream") {
    for (seed <- 20L to 22L) {
      val d = corpus(seed)
      val byShard = Packing.chunkText(d, col("shard"), col("doc_id"),
          maxTokens = 11)
        .orderBy("shard", "chunk_id")
        .collect().groupBy(_.getString(0))
        .map { case (s, rows) => s -> rows.map(_.getString(4)).mkString(" ") }
      val want = d.orderBy("doc_id").collect()
        .groupBy(_.getString(1))
        .map { case (s, rows) =>
          s -> rows.map(_.getString(2).toLowerCase).mkString(" ") }
      assert(byShard == want, s"seed $seed: shard streams differ")
    }
  }

  test("slidingWindows covers every token exactly; non-final windows full") {
    for (seed <- 30L to 32L) {
      val d = corpus(seed)
      val w = Packing.slidingWindows(d, windowTokens = 5, stride = 3)
        .select("doc_id", "win_idx", "tok_start", "tok_end", "n_tokens")
        .collect().groupBy(_.getLong(0))
      w.foreach { case (id, rows) =>
        val n = rows.head.getLong(4)
        val covered = rows.flatMap(r =>
          r.getLong(2) until r.getLong(3)).toSet
        assert(covered == (0L until n).toSet, s"doc $id coverage")
        val lastIdx = rows.map(_.getLong(1)).max
        rows.filter(_.getLong(1) < lastIdx).foreach { r =>
          assert(r.getLong(3) - r.getLong(2) == 5L,
            s"doc $id non-final window not full")
        }
      }
    }
  }
}
