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
    val centArr = collectCents(cents, "annMatchStream")
    require(nProbe >= 1 && nProbe <= centArr.length,
      s"annMatchStream needs 1 <= nProbe <= ${centArr.length}, got $nProbe")
    val probed = stream.select(col(id), col(vecCol),
      explode(slice(sort_array(cellStructs(vecCol, centArr),
        asc = false), 1, nProbe)).as("__c"))
      .select(col(id), col(vecCol), col("__c.cid").as("cid"))
    probed.join(index, Seq("cid"))
      .withColumn("cosine",
        round(VectorFunctions.cosine(col(vecCol), col("corpus_vec")), 6))
      .where(col("cosine") >= minCosine)
      .select(col(id), col("corpus_id"), col("cosine"))
  }

  /** STREAMING SEMANTIC decontamination gate — the ingest-time face
    * of [[graft.operators.Dedup.decontaminateSemantic]], completing
    * the gate ladder exactly as the batch scrubs complete theirs
    * (verbatim `decontaminateStreamGate` → fuzzy
    * `decontaminateNearStreamGate` → THIS): admit only stream rows
    * whose embedding sits below cosine `threshold` against every
    * benchmark vector met in the row's probed cells. A reworded eval
    * item sharing no gram with the incoming doc still blocks here.
    *
    * Stateless, by the family's construction: the stream row's OWN
    * cell comes from a pure expression over the driver-collected
    * centroid table ([[annMatchStream]]'s sanctioned shape — bounded
    * by definition), and the gate itself is ONE stream-static LEFT
    * ANTI join against the benchmark suite's probe rows (`id_b, qv,
    * cid` — suite-bounded, broadcast at micro-batch planning) with
    * the exact-cosine predicate inside the join condition. No
    * aggregation state, no watermark, append-safe.
    *
    * Semantics ≡ batch, pinned by AnnStreamSpec: at equal
    * (cents, nProbe, threshold) the REJECTED set is exactly the
    * batch scrub's `contaminated = 1` set — the same probed-cell
    * recall contract (a pair whose corpus cell falls outside the
    * benchmark item's probes is missed by BOTH faces), and exact
    * cosine means neither face ever false-positives. A zero-norm
    * stream vector has NULL cosines and passes (it is semantically
    * near nothing). */
  def decontaminateSemanticStreamGate(stream: DataFrame,
      benchmark: DataFrame, cents: DataFrame, nProbe: Int = 2,
      threshold: Double = 0.9, id: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"decontaminateSemanticStreamGate: threshold in (0, 1]: " +
        s"$threshold")
    val centArr = collectCents(cents, "decontaminateSemanticStreamGate")
    require(nProbe >= 1 && nProbe <= centArr.length,
      s"decontaminateSemanticStreamGate needs 1 <= nProbe <= " +
        s"${centArr.length}, got $nProbe")
    // benchmark probes, exactly the batch scrub's probe side
    val probes = Similarity.probeCells(benchmark, cents, nProbe,
      "__id_b", "__qv", id, vecCol)
      .select(col("__qv"), col("cid").as("__pcid"))
    // the stream row's own (single) cell — the batch assignCells
    // argmax as an expression, same (cosine desc, cid asc) tie-break
    val own = element_at(
      slice(sort_array(cellStructs(vecCol, centArr), asc = false),
        1, 1), 1).getField("cid")
    stream.withColumn("__cid", own)
      .join(probes,
        col("__cid") === col("__pcid") &&
          round(VectorFunctions.cosine(col("__qv"), col(vecCol)), 6) >=
            threshold,
        "left_anti")
      .drop("__cid")
  }

  /** Driver-collected (cid, cvec) rows — the sanctioned bounded fold
    * both stream-side cell expressions ride. */
  private def collectCents(cents: DataFrame,
      caller: String): Array[(Long, Seq[Double])] = {
    val arr = cents
      .select(col("cid").cast("long"), col("cvec").cast("array<double>"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1)))
    require(arr.nonEmpty, s"$caller: empty centroid table")
    arr
  }

  /** Per-row cell ranking as a pure expression: struct order is
    * (cosine desc, cid asc) via the negated-cid middle field — the
    * exact tie-break of the batch [[Similarity.probeCells]], so
    * stream and batch probe identical cells. A zero-norm vector
    * yields NULL cosines (sorted last). */
  private def cellStructs(vecCol: String,
      centArr: Array[(Long, Seq[Double])]) =
    array(centArr.map { case (cid, cvec) =>
      val cv = array(cvec.map(lit): _*)
      struct(
        round(VectorFunctions.cosine(col(vecCol), cv), 6).as("ccos"),
        lit(-cid).as("ncid"),
        lit(cid).as("cid"))
    }: _*)
}
