package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.CatalystBridge
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Unigram-LM tokenizer (Kudo 2018 — the SentencePiece "unigram"
  * model), completing the tokenizer triad next to BPE
  * ([[TextAnalysis.bpeTrain]]) and WordPiece
  * ([[TextAnalysis.wordpieceSegment]]): BPE grows pieces bottom-up by
  * pair frequency, unigram starts from a LARGE substring seed and
  * keeps the pieces a probabilistic model actually uses — the
  * T5/ALBERT/XLNet family's tokenizer.
  *
  * This is the deterministic hard-EM (Viterbi) variant, built on the
  * engine's exact-replay discipline:
  *  - piece scores are integer MICRO-NATS (`floor(−ln(F/T)·1e6)`, the
  *    [[TextAnalysis.unigramLm]] quantization);
  *  - the Viterbi DP is integer-only end to end (long costs, long
  *    sums, longest-piece tie-break), so the chosen segmentation —
  *    and therefore each EM iteration's usage counts, and therefore
  *    the TRAINED TABLE — is bit-identical on any engine. The DuckDB
  *    oracle replays the full loop: seeding, one unrolled-DP
  *    segmentation pass per iteration, and the re-estimation.
  *
  * 100 TB shape (the [[TextAnalysis.bpeTrain]] cost model): ONE corpus
  * pass builds the word-count table; seeding is one substring explode
  * + groupBy over DISTINCT WORDS (heavy-tailed, ≪ corpus); each EM
  * iteration segments the distinct-word table with a per-row codegen'd
  * expression (vocabulary = plan constant, no join) and folds usage in
  * one map-side-combinable groupBy; the M-step is a vocab-bounded
  * driver finish (tokenizer vocabularies are plan constants, like
  * k-means centroids and BPE merge tables). Encoding touches the
  * corpus exactly once, shuffle-free in the scan. */
object UnigramTokenizer {

  /** Fallback cost of an out-of-vocabulary single codepoint, in
    * micro-nats (≈ e^-25 — strictly worse than any trained piece, so
    * the fallback only fires when nothing in the vocab covers a
    * position). */
  val OovCostMicro = 25000000L

  /** Maximum piece length (codepoints) enumerated at seeding. */
  val MaxPieceLen = 4

  /** Corpus word counts, cleaned exactly as BPE training cleans
    * (lowercase, space-split, [a-z0-9] kept): (w, n). `maxWordLen`
    * bounds the oracle's DP unroll; words past it are dropped from
    * TRAINING (they still encode fine — the DP has no length limit at
    * inference). */
  private[operators] def wordCounts(docs: DataFrame, textCol: String,
      maxWordLen: Int): DataFrame =
    docs
      .select(explode(TextAnalysis.tokens(col(textCol))).as("w0"))
      .select(regexp_replace(col("w0"), "[^a-z0-9]", "").as("w"))
      .where(length(col("w")).between(1, maxWordLen))
      .groupBy("w").agg(count(lit(1)).as("n"))

  /** Substring seed vocabulary: every substring of length
    * 1..[[MaxPieceLen]] of every distinct word, weighted by word count
    * PER OCCURRENCE; the top `vocabSize` multi-character pieces by
    * (freq DESC, piece ASC) — a TakeOrdered, never a global window —
    * plus ALL single characters (the coverage floor). Output:
    * (piece, freq). */
  private[operators] def seedVocab(words: DataFrame,
      vocabSize: Int): DataFrame = {
    val subs = words
      .select(col("w"), col("n"),
        explode(sequence(lit(1), length(col("w")))).as("i"))
      .select(col("w"), col("n"), col("i"),
        explode(sequence(lit(1),
          least(lit(MaxPieceLen), length(col("w")) - col("i") + 1)))
          .as("l"))
      .select(expr("substr(w, i, l)").as("piece"), col("n"))
      .groupBy("piece").agg(sum(col("n")).as("freq"))
    val multi = subs.where(length(col("piece")) > 1)
      .orderBy(col("freq").desc, col("piece"))
      .limit(vocabSize)
    val singles = subs.where(length(col("piece")) === 1)
    multi.unionByName(singles)
  }

  /** micro-nat scores from (piece, F) counts: cost = floor(−ln(F/T)·1e6)
    * with T = ΣF — the one float op in the trainer, applied to exact
    * integer inputs (the [[TextAnalysis.unigramLm]] precedent the
    * oracle's `ln` replays). Driver-side: the vocab is bounded. */
  private def toScores(counts: Seq[(String, Long)]): Seq[(String, Long)] = {
    val t = counts.map(_._2).sum.toDouble
    counts.map { case (p, f) =>
      p -> math.floor(-math.log(f.toDouble / t) * 1e6).toLong
    }
  }

  /** Train: seed → `iters` hard-EM rounds (Viterbi-segment the
    * distinct-word table, fold usage, re-estimate). Returns the
    * artifact: (piece, cost_micro), the pieces the model kept.
    *
    * M-step contract (oracle-replayed): usage U(p) = Σ word-count over
    * best segmentations; F(p) = U(p) + 1 for single characters (never
    * pruned — coverage), F(p) = U(p) for longer pieces; pieces with
    * F = 0 are pruned; scores re-quantized from F/ΣF.
    *
    * `pruneTo = Some(k)` adds Kudo's LIKELIHOOD-DELTA pruning
    * (VERDICT r9 #5) after each round's E-step: for every used
    * multi-character piece p, the loss of dropping it is
    *
    *   L(p) = U(p) · (altCost(p) − cost(p))
    *
    * where altCost(p) is the integer Viterbi cost of segmenting the
    * STRING p under the current table WITHOUT p (other scores held
    * fixed — the hard-EM local approximation of SentencePiece's prune
    * step; at realistic vocab sizes the F = 0-only rule keeps junk
    * pieces whose uses re-segment almost for free, which this rank
    * drops). Only the k highest-loss multi pieces survive
    * (tie-break: loss DESC, piece ASC — a total order), singles are
    * never pruned, and the M-step re-estimates over the survivors.
    * All integer micro-nats; the oracle replays the per-piece
    * alternative DP and the rank cutoff exactly. */
  def unigramTrain(docs: DataFrame, vocabSize: Int, iters: Int = 1,
      textCol: String = "text", maxWordLen: Int = 16,
      pruneTo: Option[Int] = None): DataFrame = {
    require(vocabSize >= 1 && iters >= 0,
      s"bad unigram params: v=$vocabSize iters=$iters")
    // the M-step is a vocab-bounded driver finish (tokenizer vocabs
    // are plan constants, the k-means-centroid precedent) — bound it
    // so a caller can't collect an unbounded piece table (VERDICT r9
    // nit #2); 2^16 pieces ≈ a real SentencePiece vocab ceiling
    require(vocabSize <= (1 << 16),
      s"unigramTrain: vocabSize $vocabSize exceeds the 65536 driver-" +
        "side piece-table bound — the trainer collects the vocab")
    pruneTo.foreach(k => require(k >= 1,
      s"unigramTrain: pruneTo must be >= 1, got $k"))
    val spark = docs.sparkSession
    import spark.implicits._
    val words = wordCounts(docs, textCol, maxWordLen).localCheckpoint()
    val seed = seedVocab(words, vocabSize)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    var scores = toScores(seed)
    for (_ <- 1 to iters) {
      val seg = CatalystBridge.unigramSegment(col("w"), scores,
        OovCostMicro)
      val usage = words
        .select(col("n"), explode(split(seg, "\\|")).as("piece"))
        .groupBy("piece").agg(sum(col("n")).as("u"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val counts = scores.map { case (p, _) =>
        val f = usage.getOrElse(p, 0L) + (if (p.length == 1) 1L else 0L)
        p -> f
      }.filter(_._2 > 0)
      val kept = pruneTo match {
        case Some(k) =>
          val costMap = scores.toMap
          // loss in BigInt: f is a corpus-scale usage count and the
          // cost delta is up to ~len·OOV micro-nats, so the product
          // overflows a long past ~1e11 uses (the oracle carries the
          // same rank key as HUGEINT)
          val losses = counts.filter(_._1.length > 1).map {
            case (p, f) =>
              val alt = viterbiCostExcluding(p, costMap)
              (p, f, BigInt(f) * BigInt(alt - costMap(p)))
          }
          losses.sortWith { case ((p1, _, l1), (p2, _, l2)) =>
            l1 > l2 || (l1 == l2 && p1 < p2)
          }.take(k)
            .map { case (p, f, _) => p -> f } ++
            counts.filter(_._1.length == 1)
        case None => counts
      }
      scores = toScores(kept)
    }
    scores.toDF("piece", "cost_micro")
  }

  /** Driver-side integer Viterbi over ONE piece string with `target`
    * itself excluded from the table — the alternative-encoding cost
    * Kudo's prune rank needs. Bounded work: |target| ≤ [[MaxPieceLen]]
    * and the table is the plan-constant vocab. Mirrored cell for cell
    * by the oracle's pt0..pt4 DP. */
  private def viterbiCostExcluding(target: String,
      cost: Map[String, Long]): Long = {
    val n = target.length
    val d = Array.fill(n + 1)(Long.MaxValue / 4)
    d(0) = 0L
    for (i <- 1 to n; l <- 1 to math.min(MaxPieceLen, i)) {
      val piece = target.substring(i - l, i)
      val c =
        if (piece == target) None
        else cost.get(piece)
          .orElse(if (l == 1) Some(OovCostMicro) else None)
      c.foreach(cv => d(i) = math.min(d(i), d(i - l) + cv))
    }
    d(n)
  }

  /** Persist / load the trained piece table (KB-scale artifact, the
    * bpeIndex pattern). Returns the piece count actually kept, from
    * the write itself (EM pruning can drop unused seed pieces). */
  def unigramIndexWrite(docs: DataFrame, vocabSize: Int, iters: Int,
      path: String, textCol: String = "text",
      maxWordLen: Int = 16): Long =
    graft.functions.CountedWrite(
      unigramTrain(docs, vocabSize, iters, textCol, maxWordLen))(
      _.coalesce(1).write.mode("overwrite").parquet(path))

  def unigramIndexRead(spark: SparkSession,
      path: String): Seq[(String, Long)] =
    spark.read.parquet(path).orderBy("piece")
      .select("piece", "cost_micro").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq

  /** Corpus inference under a trained table: every word Viterbi-
    * segmented by the per-row expression (scores are plan constants —
    * no join, no shuffle in the scan), documents reassembled in word
    * order. Output: (idCol, n_words, n_pieces, seg_md5) — seg_md5
    * hashes the '|'-within-word, ' '-between-words segmentation
    * string, keeping the board row compact. Words are cleaned exactly
    * as training cleaned them; `maxWordLen` only bounds which words
    * the BOARD query segments (must match the oracle's unroll) — pass
    * Int.MaxValue for unbounded production encoding. */
  def unigramEncode(docs: DataFrame, scores: Seq[(String, Long)],
      textCol: String = "text", idCol: String = "doc_id",
      maxWordLen: Int = Int.MaxValue): DataFrame = {
    val w = docs
      .select(col(idCol),
        posexplode(TextAnalysis.tokens(col(textCol)))
          .as(Seq("pos", "w0")))
      .select(col(idCol), col("pos"),
        regexp_replace(col("w0"), "[^a-z0-9]", "").as("w"))
      .where(length(col("w")).between(1, maxWordLen))
      .withColumn("seg",
        CatalystBridge.unigramSegment(col("w"), scores, OovCostMicro))
    w.groupBy(idCol)
      .agg(count(lit(1)).as("n_words"),
        sum(size(split(col("seg"), "\\|"))).as("n_pieces"),
        md5(concat_ws(" ", transform(
          array_sort(collect_list(struct(col("pos"), col("seg")))),
          s => s.getField("seg")))).as("seg_md5"))
  }

  /** [[unigramEncode]] against a persisted index. */
  def unigramEncodeWith(docs: DataFrame, indexPath: String,
      textCol: String = "text", idCol: String = "doc_id",
      maxWordLen: Int = Int.MaxValue): DataFrame =
    unigramEncode(docs,
      unigramIndexRead(docs.sparkSession, indexPath), textCol, idCol,
      maxWordLen)
}
