package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Measured recall floors for the ANN family against the exact
  * brute-force baseline on the sf0.001 embeddings — every operator is
  * deterministic (hash LSH, lowest-id/trained centroids), so these are
  * exact repeatable numbers, not flaky statistics. The floors are set
  * just under the measured values; a refactor that silently hurts
  * recall (wrong bucket math, probe loop off-by-one) fails here even
  * though results stay "plausible". */
class AnnRecallSpec extends SparkSpec {

  private lazy val emb =
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").cache()
  private lazy val queries = emb.where(col("vec_id") < 20)

  private def pairs(df: DataFrame): Set[(Long, Long)] =
    df.select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  private lazy val exact =
    pairs(Similarity.bruteForceTopK(emb, queries, k = 5))

  private def recall(got: Set[(Long, Long)]): Double =
    got.intersect(exact).size.toDouble / exact.size

  test("multi-probe sign-LSH recall@5 holds its floor") {
    val r1 = recall(pairs(Similarity.lshTopK(emb, queries, k = 5)))
    val r9 = recall(pairs(
      Similarity.lshTopK(emb, queries, k = 5, probes = 9)))
    // probing Hamming-1 buckets must never lose recall
    assert(r9 >= r1, s"multi-probe lost recall: $r1 -> $r9")
    // measured 0.13 on this fixture: the synthetic embeddings are
    // near-uniform (max pairwise cosine ≈ 0.47 — no cluster structure
    // for sign planes to exploit), the documented worst case for LSH;
    // the floor locks the implementation, not a marketing number
    assert(r9 >= 0.12, s"recall@5 with 9 probes fell to $r9")
  }

  test("IVF recall@5 holds its floor and grows with nProbe") {
    val r2 = recall(pairs(Similarity.ivfTopK(emb, queries, k = 5)))
    val r4 = recall(pairs(
      Similarity.ivfTopK(emb, queries, k = 5, nProbe = 4)))
    assert(r4 >= r2, s"more probes lost recall: $r2 -> $r4")
    assert(r4 >= 0.5, s"IVF recall@5 at nProbe=4 fell to $r4")
  }

  test("PQ-ADC recall@5 holds its floor; exact re-rank never hurts") {
    val nEmb = Similarity.l2Normalize(emb)
    val raw = recall(pairs(Similarity.pqTopK(nEmb,
      nEmb.where(col("vec_id") < 20), topK = 5)))
    val rr = recall(pairs(Similarity.pqTopKRerank(emb, queries,
      topK = 5, shortlist = 50)))
    info(s"pq raw=$raw rerank50=$rr")
    // the exact re-rank re-orders a superset of the raw ADC top-k by
    // true cosine — it can only improve agreement with brute force
    assert(rr >= raw, s"re-rank lost recall: $raw -> $rr")
    // measured: raw ADC 0.12 (16 codewords per 8-dim subspace cannot
    // represent an unclustered corpus — same worst case as sign-LSH's
    // 0.13), re-rank over a 50-wide shortlist 0.55 — the compressed
    // scan narrows, the exact pass decides
    assert(rr >= 0.5, s"PQ rerank recall@5 fell to $rr")
  }

  test("trained PQ codebooks lift ADC recall over the hash-sampled init") {
    val nEmb = Similarity.l2Normalize(emb)
    val nQ = nEmb.where(col("vec_id") < 20)
    def adcRecall(books: DataFrame): Double = {
      val enc = Similarity.pqEncode(nEmb, books)
      val dts = Similarity.pqDistanceTables(nQ, books)
      recall(pairs(Similarity.pqTopKWith(enc, dts, 5)))
    }
    val sampled = adcRecall(Similarity.pqCodebooks(nEmb))
    val trained = adcRecall(Similarity.pqCodebooksTrained(nEmb, iters = 2))
    info(s"pq adc sampled=$sampled trained=$trained")
    // Lloyd rounds can only cut per-subspace quantization error vs the
    // raw hash sample — on the same worst-case fixture, trained books
    // must rank strictly closer to brute force
    assert(trained > sampled,
      s"training did not lift ADC recall: $sampled -> $trained")
  }

  test("IVF over trained (k-means++) centroids holds its floor") {
    val cents = Similarity.kmeansFit(emb, k = 8, iters = 2)
    val r = recall(pairs(
      Similarity.ivfTopKWith(emb, queries, k = 5, cents, nProbe = 2)))
    // measured 0.46 — trained cells are BALANCED on this unclustered
    // fixture, so fewer candidates per probe than the size-skewed
    // lowest-id cells (see ivfTopKWith's scaladoc trade-off note)
    assert(r >= 0.45, s"trained-IVF recall@5 fell to $r")
  }
}
