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
      textCol: String = "text", maxTokens: Int = 2048): DataFrame =
    packByOffsetWith(docs, shardCol, orderCol,
      TextAnalysis.tokenCount(col(textCol)), maxTokens)

  /** [[packByOffset]] under a CALLER-SUPPLIED token counter — the
    * form a real trainer needs, because context budgets are in
    * TOKENIZER tokens, not whitespace words: pass
    * `TextAnalysis.bpeishTokenCount(col("text"))` for the regex
    * estimate, `size(UnigramTokenizer.unigramEncodeWith(...))` for
    * exact trained-tokenizer counts, or a precomputed length column.
    * Any non-negative integer expression works; the packing plan is
    * unchanged (one per-shard window — the counter is per-row
    * expression work fused into the same scan). */
  def packByOffsetWith(docs: DataFrame, shardCol: Column,
      orderCol: Column, nTokens: Column,
      maxTokens: Int = 2048): DataFrame = {
    require(maxTokens > 0, s"maxTokens must be positive: $maxTokens")
    val w = Window.partitionBy(shardCol).orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .withColumn("n_tokens", nTokens.cast("long"))
      .withColumn("start_offset",
        (sum(col("n_tokens")).over(w) - col("n_tokens")).cast("long"))
      .withColumn("chunk_id", floor(col("start_offset") / maxTokens))
  }

  /** The trainer-facing STRADDLE SPLIT of [[packByOffset]]: one row
    * per (document × context window it spans), with the exact token
    * range each window takes. [[packByOffset]] tells a trainer which
    * window a doc STARTS in; this is the table it actually reads —
    * every window's segments concatenate to exactly `maxTokens`
    * tokens (except each shard's final, partial window), and every
    * document's segments concatenate back to the whole document.
    *
    * A doc at running offset s with n tokens spans windows
    * floor(s/M) .. floor((s+n-1)/M); window c takes the doc's tokens
    * [max(0, c·M − s), min(n, (c+1)·M − s)). Zero-token docs span
    * nothing and emit no row (documented; count them upstream if
    * they must be audited).
    *
    * Scale: the only shuffle is [[packByOffset]]'s per-shard window;
    * the explode factor is 1 + (n−1)/M per doc — total output rows =
    * docs + totalTokens/M, linear in corpus size with no new
    * shuffle. Output adds: chunk_id, seg_idx (0-based within the
    * doc), tok_start/tok_end (doc-relative, end-exclusive),
    * n_seg_tokens. */
  def packSegments(docs: DataFrame, shardCol: Column, orderCol: Column,
      textCol: String = "text", maxTokens: Int = 2048): DataFrame =
    packSegmentsWith(docs, shardCol, orderCol,
      TextAnalysis.tokenCount(col(textCol)), maxTokens)

  /** [[packSegments]] under a caller-supplied token counter (see
    * [[packByOffsetWith]]). */
  def packSegmentsWith(docs: DataFrame, shardCol: Column,
      orderCol: Column, nTokens: Column,
      maxTokens: Int = 2048): DataFrame = {
    val m = lit(maxTokens.toLong)
    val packed = packByOffsetWith(docs, shardCol, orderCol, nTokens,
      maxTokens)
    val s = col("start_offset")
    val n = col("n_tokens")
    packed
      .where(n > 0)
      .withColumn("chunk_id",
        explode(sequence(floor(s / m), floor((s + n - 1) / m))))
      .withColumn("seg_idx", (col("chunk_id") - floor(s / m))
        .cast("long"))
      .withColumn("tok_start", greatest(col("chunk_id") * m - s, lit(0L)))
      .withColumn("tok_end", least((col("chunk_id") + 1) * m - s, n))
      .withColumn("n_seg_tokens", col("tok_end") - col("tok_start"))
  }

  /** Fill-in-the-middle transform (the public FiM recipe: reorder a
    * document as prefix/suffix/middle around sentinel tokens so an
    * autoregressive model learns infilling — PSM mode, applied to a
    * deterministic `rate`-fraction of documents). Two uniform token
    * cut points come from EXACT INTEGER md5 residues (salted per
    * cut, `value-of-first-8-hex % (n+1)` — no float in the cut
    * arithmetic, so any engine replays bit-identically), the apply
    * decision from the library's standard id-hash fraction. Output
    * adds `fim_applied` and `text_fim`; BOTH branches are in token
    * space (lowercased whitespace tokens rejoined by single spaces —
    * the transformed branch cannot preserve raw bytes, so the
    * passthrough branch doesn't either, keeping the column uniform).
    * Empty prefix/middle/suffix segments are legal (cuts may
    * coincide or touch the ends), matching the recipe.
    *
    * Pure per-row expression work: shuffle-free, linear, composes
    * with [[packByOffsetWith]] downstream (FiM first, pack after —
    * sentinels count as tokens). */
  def fimTransform(docs: DataFrame, id: String = "doc_id",
      textCol: String = "text", rate: Double = 0.5,
      preTok: String = "<fim_pre>", sufTok: String = "<fim_suf>",
      midTok: String = "<fim_mid>"): DataFrame = {
    require(rate >= 0.0 && rate <= 1.0, s"rate must be in [0,1]: $rate")
    val toks = TextAnalysis.tokens(col(textCol))
    val n = size(toks).cast("long")
    def cutHash(salt: String): Column =
      conv(substring(md5(concat(col(id).cast("string"),
        lit(":" + salt))), 1, 8), 16, 10).cast("long") % (n + 1)
    val a0 = cutHash("a")
    val b0 = cutHash("b")
    val a = least(a0, b0)
    val b = greatest(a0, b0)
    val pre = slice(toks, lit(1), a.cast("int"))
    val mid = slice(toks, (a + 1).cast("int"), (b - a).cast("int"))
    val suf = slice(toks, (b + 1).cast("int"), (n - b).cast("int"))
    val fim = array_join(concat(
      array(lit(preTok)), pre, array(lit(sufTok)), suf,
      array(lit(midTok)), mid), " ")
    val applies = Sketch.md5Fraction(col(id)) < rate
    docs
      .withColumn("fim_applied", applies)
      .withColumn("text_fim",
        when(applies, fim).otherwise(array_join(toks, " ")))
  }

  /** PER-DOCUMENT overlapping windows — retrieval/passage chunking
    * (the RAG-prep sibling of training packing, which is cross-doc
    * and non-overlapping): token windows of `size` starting every
    * `stride` tokens, overlap = size − stride. Coverage rule, exact
    * in integers in both engines: starts are k·stride for
    * k = 0 .. ceil(max(0, n − size) / stride), so every token is
    * covered, every window before the last is full, and the last
    * window ends exactly at the document's n-th token (it may be
    * shorter only when n < size).
    *
    * Shuffle-free: one per-row explode, fan-out ≈ n/stride windows
    * per doc — linear in corpus tokens, embarrassingly parallel.
    * NULL-text docs emit NO window row (the explode is over a null
    * sequence) — the same silent-drop [[packSegments]] documents for
    * its zero-token docs, stated here for symmetry (ADVICE r14).
    * Output: id (+ input cols), win_idx, tok_start/tok_end
    * (doc-relative, end-exclusive), n_win_tokens, window text (token
    * space = [[TextAnalysis.tokens]], the library convention). */
  def slidingWindows(docs: DataFrame, id: String = "doc_id",
      textCol: String = "text", windowTokens: Int = 256,
      stride: Int = 128): DataFrame = {
    require(windowTokens >= 1 && stride >= 1 && stride <= windowTokens,
      s"slidingWindows needs 1 <= stride <= windowTokens: " +
        s"$stride, $windowTokens")
    val toks = TextAnalysis.tokens(col(textCol))
    val n = size(toks).cast("long")
    val lastK = (greatest(n - windowTokens, lit(0L)) +
      (stride - 1)).cast("long") / lit(stride.toLong)
    docs
      // the scaladoc's NULL-text no-row contract, made real (r16
      // adversarial sweep): under legacy sizeOfNull the null doc's
      // n = -1 still produced ONE degenerate window whose text was ''
      // in Spark but NULL in the DuckDB replay — absent is not empty
      .where(col(textCol).isNotNull)
      .withColumn("n_tokens", n)
      .withColumn("win_idx",
        explode(sequence(lit(0L), floor(lastK))))
      .withColumn("tok_start", col("win_idx") * stride)
      .withColumn("tok_end",
        least(col("tok_start") + windowTokens, col("n_tokens")))
      .withColumn("n_win_tokens", col("tok_end") - col("tok_start"))
      .withColumn("window",
        concat_ws(" ", slice(TextAnalysis.tokens(col(textCol)),
          (col("tok_start") + 1).cast("int"),
          col("n_win_tokens").cast("int"))))
  }

  /** Per-shard token totals of a packed frame — the tiny (one row per
    * shard) state [[packAppendWith]] resumes from; persist it beside
    * the packed output. */
  def packTotals(packed: DataFrame, shardCol: Column): DataFrame =
    packed.groupBy(shardCol.as("shard"))
      .agg(sum(col("n_tokens")).as("prior_tokens"))

  /** INCREMENTAL packing — the daily-ingest form: pack a NEW batch
    * starting at each shard's stored token total
    * ([[packTotals]]/chunk-stats of everything packed so far),
    * without touching the already-packed corpus. Provided the batch's
    * `orderCol` values sort after the packed corpus's (monotone
    * ingest ids — the caller's contract, as with every incremental
    * operator here), the result equals what a full repack of
    * old ∪ new would assign the new docs — bit-identical offsets,
    * chunk ids, and therefore [[packSegments]] ranges (spec-pinned).
    * A shard unseen in `priorTotals` starts at offset 0.
    *
    * Cost: the batch's own per-shard window plus one BROADCAST join
    * against the rows-per-shard totals table — O(batch), never
    * O(corpus), and the batch itself is never re-exchanged for the
    * join. The broadcast assumes what packing already assumes: shard
    * keys are a bounded reader-parallelism knob (hundreds to
    * thousands), not a per-row id — a totals table too big to
    * broadcast means the shardCol is wrong for packing, not that this
    * join needs a shuffle. */
  def packAppendWith(docs: DataFrame, shardCol: Column,
      orderCol: Column, nTokens: Column, priorTotals: DataFrame,
      maxTokens: Int = 2048): DataFrame = {
    val m = lit(maxTokens.toLong)
    // collision-proof names: the batch may itself carry a "shard" or
    // "prior_tokens" column
    val totals = priorTotals.select(col("shard").as("__pt_shard"),
      col("prior_tokens").as("__pt_tokens"))
    packByOffsetWith(docs, shardCol, orderCol, nTokens, maxTokens)
      .join(broadcast(totals), shardCol === col("__pt_shard"), "left")
      .withColumn("start_offset",
        col("start_offset") + coalesce(col("__pt_tokens"), lit(0L)))
      .withColumn("chunk_id", floor(col("start_offset") / m))
      .drop("__pt_shard", "__pt_tokens")
  }

  /** [[packAppendWith]] under the default whitespace counter. */
  def packAppend(docs: DataFrame, shardCol: Column, orderCol: Column,
      priorTotals: DataFrame, textCol: String = "text",
      maxTokens: Int = 2048): DataFrame =
    packAppendWith(docs, shardCol, orderCol,
      TextAnalysis.tokenCount(col(textCol)), priorTotals, maxTokens)

  /** The TERMINAL packing op: materialize each context window's
    * actual training text — [[packSegments]]'s ranges applied to the
    * token stream and reassembled per window, the table you hand a
    * trainer (or write with
    * [[graft.operators.Layout.shuffledShardWrite]]). Token space is
    * [[TextAnalysis.tokens]] (lowercased whitespace tokens, the
    * library-wide convention), documents inside a window join with a
    * single space, in `orderCol` order.
    *
    * Scale: ZERO new shuffles — the per-window groupBy's clustering
    * (shard, chunk_id) is satisfied by the packing window's existing
    * hash partitioning on shard (subset-of-clustering rule), so the
    * whole op is ONE exchange end to end (plan-verified: Exchange →
    * Sort → Window → Generate → partial/final aggregate, no second
    * Exchange). Per-group aggregation state is BOUNDED BY THE CONTEXT
    * BUDGET — a window collects at most `maxTokens` tokens of text
    * regardless of corpus size (ordered reassembly via sorted struct
    * collect, the q_string_agg pattern — no per-group window sort).
    * Output: shard, chunk_id, n_docs, n_tokens, text. */
  def chunkText(docs: DataFrame, shardCol: Column, orderCol: Column,
      textCol: String = "text", maxTokens: Int = 2048): DataFrame = {
    val seg = packSegments(docs, shardCol, orderCol, textCol, maxTokens)
    val piece = concat_ws(" ", slice(TextAnalysis.tokens(col(textCol)),
      (col("tok_start") + 1).cast("int"),
      col("n_seg_tokens").cast("int")))
    seg.select(shardCol.as("shard"), col("chunk_id"),
        struct(orderCol.as("o"), piece.as("p")).as("op"),
        col("n_seg_tokens"))
      .groupBy(col("shard"), col("chunk_id"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_seg_tokens")).as("n_tokens"),
        array_join(transform(array_sort(collect_list(col("op"))),
          x => x.getField("p")), " ").as("text"))
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
