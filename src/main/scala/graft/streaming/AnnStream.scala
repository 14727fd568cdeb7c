package graft.streaming

import graft.functions.VectorFunctions
import graft.operators.Similarity
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming ANN matcher — the embedding twin of
  * [[ScdStream.corpusMatchStream]]: incoming vectors are probed
  * against a STATIC IVF index, emitting one hit row per
  * (stream vector, corpus vector) pair at or above `minCosine`. The
  * live face of embedding near-dup: anti-join a crawl's sink on the
  * hit ids to drop semantic duplicates against the standing corpus.
  *
  * Entirely STATELESS, by construction:
  *   - cell selection is a per-row EXPRESSION over the (bounded,
  *     driver-collected — same sanctioned shape as the broadcast the
  *     batch path uses) centroid table: cosine against each centroid,
  *     sort_array, slice nProbe, explode. No aggregation → no
  *     streaming state, append-mode safe.
  *   - the probe is a stream-static equi-join on the cell id.
  *   - each corpus vector lives in exactly ONE cell, so multi-probe
  *     can never emit a duplicate pair — no dedup state needed
  *     (the same argument as corpusMatchStream's first-agreeing-band).
  *
  * At scale: the corpus-side index is the persisted artifact (write it
  * partitioned by `cid` so each micro-batch's join prunes to the
  * probed cells); the stream side ships (id, vector, cid) only.
  * Recall follows the batch IVF trade (see [[Similarity.ivfTopKWith]]
  * and AnnRecallSpec's measured floors).
  */
object AnnStream {

  /** The static index [[annMatchStream]] probes: every corpus vector
    * with its nearest-centroid cell id — [[Similarity.assignCells]]
    * renamed to the stream-facing schema (corpus_id, corpus_vec, cid).
    * Persist partitioned/bucketed by `cid`. */
  def annIndex(corpus: DataFrame, cents: DataFrame,
      id: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    Similarity.assignCells(corpus, cents, id, vecCol)
      .select(col(id).as("corpus_id"), col(vecCol).as("corpus_vec"),
        col("cid"))

  /** Probe a stream of (id, vecCol) rows against [[annIndex]] output.
    * `cents` must be the SAME centroid table the index was built with
    * (cid numeric, cvec array-of-double) — it is collected driver-side
    * at query build (centroid tables are small by definition; the
    * batch path broadcasts the same rows). Output: id, corpus_id,
    * cosine (rounded to 6, like the batch ANN family). */
  def annMatchStream(stream: DataFrame, index: DataFrame,
      cents: DataFrame, id: String = "vec_id",
      vecCol: String = "embedding", nProbe: Int = 2,
      minCosine: Double = 0.8): DataFrame = {
    val centArr = cents
      .select(col("cid").cast("long"), col("cvec").cast("array<double>"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1)))
    require(centArr.nonEmpty, "annMatchStream: empty centroid table")
    require(nProbe >= 1 && nProbe <= centArr.length,
      s"annMatchStream needs 1 <= nProbe <= ${centArr.length}, got $nProbe")
    // per-row cell ranking as a pure expression: struct order is
    // (cosine desc, cid asc) via the negated-cid middle field — the
    // exact tie-break of the batch nearestCells, so stream and batch
    // probe identical cells. A zero-norm stream vector yields NULL
    // cosines (sorted last) and is dropped by the verify filter.
    val cellStructs = array(centArr.map { case (cid, cvec) =>
      val cv = array(cvec.map(lit): _*)
      struct(
        round(VectorFunctions.cosine(col(vecCol), cv), 6).as("ccos"),
        lit(-cid).as("ncid"),
        lit(cid).as("cid"))
    }: _*)
    val probed = stream.select(col(id), col(vecCol),
      explode(slice(sort_array(cellStructs, asc = false), 1, nProbe))
        .as("__c"))
      .select(col(id), col(vecCol), col("__c.cid").as("cid"))
    probed.join(index, Seq("cid"))
      .withColumn("cosine",
        round(VectorFunctions.cosine(col(vecCol), col("corpus_vec")), 6))
      .where(col("cosine") >= minCosine)
      .select(col(id), col("corpus_id"), col("cosine"))
  }
}
