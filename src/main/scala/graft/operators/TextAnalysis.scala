package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization stats, heuristic language ID, quality scoring, and
  * document fingerprinting. Pure per-row Catalyst expressions —
  * narrow, codegen'd, shuffle-free, and engine-portable (every
  * function used has an identical-semantics DuckDB counterpart, so
  * the driver's oracle can replay them in SQL) — except
  * [[repetitionStats]], which needs a within-document group-by and
  * documents its own shape.
  */
object TextAnalysis {

  /** whitespace tokens of the lowercased text */
  def tokens(text: Column): Column = split(lower(text), " ")

  /** Unicode normalization — run BEFORE any hash-keyed operator
    * (exact fingerprints, minhash shingles, token stats): composed
    * "é" vs decomposed "e"+U+0301 are different bytes for the same
    * visible text and silently defeat dedup. "NFC" (default) is the
    * canonical lossless dedup key and has a DuckDB oracle twin
    * (`nfc_normalize`); "NFKC" additionally folds compatibility
    * variants (full-width forms, ligatures — lossy, what aggressive
    * crawl dedup uses; spec-pinned, no SQL twin). Codegen'd native
    * call, already-normal text pays one scan and no allocation
    * ([[graft.functions.expressions.UnicodeNormalize]]); also in
    * plain SQL as `unicode_normalize(s, 'NFC')`. */
  def normalizeText(text: Column, form: String = "NFC"): Column =
    org.apache.spark.sql.graft.CatalystBridge.unicodeNormalize(
      text, java.text.Normalizer.Form.valueOf(form.toUpperCase))

  /** token count without materializing the array: chars minus spaces
    * arithmetic is wrong for runs; prefer array size. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** Per-document token statistics.
    * Output: doc_id, n_tokens, n_distinct, n_chars_nospace,
    * avg_token_len, type_token_ratio. */
  def tokenStats(docs: DataFrame, id: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val t = tokens(col(textCol))
    docs.select(
      col(id),
      size(t).cast("long").as("n_tokens"),
      size(array_distinct(t)).cast("long").as("n_distinct"),
      length(regexp_replace(col(textCol), " ", "")).cast("long")
        .as("n_chars_nospace"),
      round(length(regexp_replace(col(textCol), " ", "")).cast("double") /
        size(t), 4).as("avg_token_len"),
      round(size(array_distinct(t)).cast("double") / size(t), 4)
        .as("type_token_ratio"))
  }

  /** Occurrences of `word` as a standalone token, via the
    * length-difference trick on the padded text — O(n) per row, no
    * array explode, portable to any SQL engine. Matching is LITERAL
    * (`replace`, not regex — ADVICE r01: a word like "c++" must not be
    * treated as a pattern). */
  def wordCount(text: Column, word: String): Column = {
    val padded = concat(lit(" "), lower(text), lit(" "))
    val needle = s" $word "
    // overlapping " w w " runs: replace consumes the shared space, so
    // pad spaces first to make every token boundary independent
    val doubled = replace(padded, lit(" "), lit("  "))
    ((length(doubled) - length(replace(doubled, lit(needle), lit("")))) /
      needle.length).cast("long")
  }

  /** Heuristic n-gram/stopword language ID: score a handful of
    * language-marker stopwords and take the argmax, 'und' when no
    * marker hits. A real pipeline would plug fastText here; the
    * operator shape (per-row scoring + argmax) is the point. */
  def langId(docs: DataFrame, id: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val markers = LangMarkers.map { case (lang, words) =>
      lang -> words.map(w => wordCount(col(textCol), w))
        .reduce(_ + _).as(s"score_$lang")
    }
    val scored = docs.select(col(id) +: markers.map(_._2): _*)
    val best = markers.map { case (lang, _) =>
      struct(col(s"score_$lang").as("s"), lit(lang).as("l"))
    }.reduce((a, b) => when(b.getField("s") > a.getField("s"), b).otherwise(a))
    val guess = when(
      greatest(markers.map(m => col(s"score_${m._1}")): _*) > 0,
      best.getField("l")).otherwise(lit("und")).as("lang_guess")
    scored.select(
      (col(id) +: guess +: markers.map(m => col(s"score_${m._1}"))): _*)
  }

  /** language → marker stopwords (ordered; ties resolve to the first) */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of"),
    "es" -> Seq("el", "la", "de"),
    "fr" -> Seq("le", "les", "des"),
    "de" -> Seq("der", "die", "und"))

  /** Quality score in [0,1] from cheap signals: length band, punct
    * ratio, stopword ratio, repetition (type-token ratio). Weights are
    * illustrative; the operator is the per-row scoring pipeline. */
  def qualityScore(docs: DataFrame, id: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val text = col(textCol)
    val t = tokens(text)
    val nTok = size(t).cast("double")
    val nonAlnum = length(regexp_replace(lower(text), "[a-z0-9 ]", ""))
    val punctRatio = nonAlnum.cast("double") / greatest(length(text), lit(1))
    val stopHits = Seq("the", "and", "of", "a", "to")
      .map(w => wordCount(text, w)).reduce(_ + _)
    val stopRatio = stopHits.cast("double") / greatest(nTok, lit(1.0))
    val ttr = size(array_distinct(t)).cast("double") / greatest(nTok, lit(1.0))
    val lenScore = when(nTok >= 20 && nTok <= 2000, 1.0)
      .when(nTok >= 5, 0.5).otherwise(0.0)
    docs.select(
      col(id),
      round(lenScore, 4).as("len_score"),
      round(punctRatio, 4).as("punct_ratio"),
      round(stopRatio, 4).as("stopword_ratio"),
      round(ttr, 4).as("type_token_ratio"),
      round(
        lenScore * 0.4
          + (lit(1.0) - least(punctRatio * 5.0, lit(1.0))) * 0.2
          + least(stopRatio * 4.0, lit(1.0)) * 0.2
          + least(ttr * 2.0, lit(1.0)) * 0.2, 4).as("quality"))
  }

  /** The Gopher quality rules (Rae et al. 2021, appendix A1.1) as one
    * per-row expression projection — the PUBLISHED web-filter recipe,
    * reported per rule so a pipeline can audit WHY a document fell:
    *
    *  - `n_words` in [50, 100000]
    *  - `mean_word_len` in [3, 10]
    *  - `symbol_ratio` ('#' or '…' per word) ≤ 0.1
    *  - `bullet_line_ratio` (lines starting '-'/'•') ≤ 0.9
    *  - `ellipsis_line_ratio` (lines ending '...') ≤ 0.3
    *  - `alpha_word_ratio` (words containing [a-z]) ≥ 0.8
    *  - `n_stop_hits` (of the 8 published stop words) ≥ 2
    *
    * `passes` folds all seven. Zero-word docs get NULL ratios and
    * fail via the word-count rule (`coalesce(..., false)`). Pure
    * per-row arithmetic on the lowercased text — no shuffle, no UDF;
    * every ratio replays in any SQL engine. */
  def gopherRules(docs: DataFrame, id: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val text = lower(col(textCol))
    val words = filter(tokens(text), w => w =!= "")
    val nWords = size(words).cast("long")
    val nWordsD = nullif(nWords, lit(0L)).cast("double")
    val charSum = aggregate(words, lit(0L),
      (acc, w) => acc + length(w).cast("long"))
    val meanLen = charSum.cast("double") / nWordsD
    val hashes = (length(text) - length(replace(text, lit("#"), lit(""))))
      .cast("long")
    val ellipses = ((length(text) -
      length(replace(text, lit("..."), lit("")))) / lit(3)).cast("long")
    val symbolRatio = (hashes + ellipses).cast("double") / nWordsD
    val lines = split(text, "\n")
    val nLines = nullif(size(lines).cast("long"), lit(0L)).cast("double")
    val bulletRatio = size(filter(lines,
      l => l.startsWith("-") || l.startsWith("•")))
      .cast("double") / nLines
    val ellipsisRatio = size(filter(lines, l => l.endsWith("...")))
      .cast("double") / nLines
    val alphaRatio = size(filter(words, w => w.rlike("[a-z]")))
      .cast("double") / nWordsD
    // null-propagating per-word hit: `when(contains, 1).otherwise(0)`
    // would turn a NULL doc's NULL containment into 0, making
    // n_stop_hits the one non-NULL stat of a null document (r16
    // adversarial sweep — the DuckDB replay says NULL)
    val stopHits = Seq("the", "be", "to", "of", "and", "that", "have",
      "with").map(sw => array_contains(words, sw).cast("long"))
      .reduce(_ + _)
    docs.select(
      col(id), nWords.as("n_words"),
      round(meanLen, 4).as("mean_word_len"),
      round(symbolRatio, 4).as("symbol_ratio"),
      round(bulletRatio, 4).as("bullet_line_ratio"),
      round(ellipsisRatio, 4).as("ellipsis_line_ratio"),
      round(alphaRatio, 4).as("alpha_word_ratio"),
      stopHits.as("n_stop_hits"),
      coalesce(
        nWords.between(50L, 100000L) &&
          meanLen.between(3.0, 10.0) &&
          (symbolRatio <= 0.1) &&
          (bulletRatio <= 0.9) &&
          (ellipsisRatio <= 0.3) &&
          (alphaRatio >= 0.8) &&
          (stopHits >= 2L),
        lit(false)).as("passes"))
  }

  /** BPE-ish pre-tokenizer pattern: ASCII letter runs, digit runs, and
    * single non-whitespace punctuation marks — the splitting shape
    * GPT-style BPE vocabularies tokenize over. Deliberately
    * ASCII-scoped: Unicode letter classes (`\p{L}`) differ subtly
    * between Java regex and RE2, so non-ASCII letters count as
    * punctuation here — a documented approximation that is identical
    * in every engine that replays it. The whitespace class is
    * EXPLICIT for the same reason (r16 adversarial sweep): Java's
    * `\s` includes `\x0B` (vertical tab) but RE2's does not, so a
    * VT-carrying doc counted one extra "punctuation" token in the
    * DuckDB replay; the class below IS Java's `\s`, spelled out. */
  val BpeishPattern: String =
    "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \\t\\n\\x0B\\f\\r]"

  /** Token count under [[BpeishPattern]] — the "how many BPE-ish
    * pieces" estimate, vs whitespace [[tokenCount]]. */
  def bpeishTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit(BpeishPattern), lit(0))).cast("long")

  /** Rolling-hash fingerprint: the minimum md5 over the text's k-char
    * windows. With the default `stride = 1` the windows are ALL
    * character k-grams, so the fingerprint is shift-invariant — an
    * insertion/deletion adds/removes a handful of k-grams and changes
    * the fingerprint only if one of them becomes the new minimum (the
    * min-hash half of Schleimer et al. 2003 winnowing). `stride > 1`
    * is the cheaper sampled variant: ~stride× fewer hashes, but
    * windows anchor at absolute offsets, so an indel that is not a
    * stride multiple re-aligns every window — use it only where docs
    * mutate by append. Per-row expression, no explode.
    *
    * Computed by the native one-pass [[graft.functions.expressions
    * .WinnowMin]] (thread-local digest, raw-byte min, one hex encode
    * per row); [[winnowFingerprintHof]] keeps the declarative twin the
    * DuckDB oracle mirrors, and DedupSpec pins their equality. */
  def winnowFingerprint(text: Column, k: Int = 16, stride: Int = 1): Column =
    org.apache.spark.sql.graft.CatalystBridge.winnowMin(text, k, stride)

  /** The declarative higher-order formulation of [[winnowFingerprint]]
    * — the reference implementation (per-window interpreted Substring +
    * Md5; the shape the oracle SQL replays). */
  def winnowFingerprintHof(text: Column, k: Int = 16, stride: Int = 1): Column = {
    val lastIdx = greatest(
      floor((length(text) - lit(k)).cast("double") / stride).cast("int"),
      lit(0))
    array_min(transform(sequence(lit(0), lastIdx),
      i => md5(text.substr(i * stride + 1, lit(k)))))
  }

  /** Gopher-style repetition signals — the quality-filter family that
    * catches degenerate (looping / boilerplate-stuffed) documents:
    * top_token_frac — share of the most frequent token;
    * dup_token_frac — share of tokens whose value occurs >= 2 times;
    * top_bigram_frac — share of the most frequent (non-distinct) bigram.
    * NOT per-row like the rest of this file: frequency concentration
    * needs a within-document group-by, so the shape is two
    * (doc_id, gram)-keyed counts — map-side-combinable, narrow (gram
    * strings never survive past the count), join keyed on doc_id. */
  def repetitionStats(docs: DataFrame, id: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val tokCounts = docs
      .select(col(id), explode(tokens(col(textCol))).as("t"))
      .groupBy(col(id), col("t")).agg(count(lit(1)).as("c"))
    val tokAgg = tokCounts.groupBy(col(id)).agg(
      sum("c").as("n_tokens"),
      max("c").as("top_c"),
      sum(when(col("c") >= 2, col("c")).otherwise(lit(0L))).as("dup_c"))
    val bigramCounts = docs
      .select(col(id), split(lower(col(textCol)), " ").as("toks"))
      .where(size(col("toks")) >= 2)
      .select(col(id), explode(expr(
        "transform(sequence(0, size(toks)-2), i -> concat_ws(' ', toks[i], toks[i+1]))"))
        .as("g"))
      .groupBy(col(id), col("g")).agg(count(lit(1)).as("c"))
    val bigramAgg = bigramCounts.groupBy(col(id)).agg(
      sum("c").as("n_bigrams"), max("c").as("top_big_c"))
    tokAgg.join(bigramAgg, Seq(id), "left").select(
      col(id),
      col("n_tokens").cast("long").as("n_tokens"),
      round(col("top_c").cast("double") / col("n_tokens"), 4)
        .as("top_token_frac"),
      round(col("dup_c").cast("double") / col("n_tokens"), 4)
        .as("dup_token_frac"),
      round(coalesce(
        col("top_big_c").cast("double") / col("n_bigrams"), lit(0.0)), 4)
        .as("top_bigram_frac"))
  }

  /** `floor(1e6·ln(c))` as an exact long — the file's standard ln
    * quantization, applied only to exact integer counts so both
    * engines feed ln() the same value. */
  private def qlnSql(c: String): String =
    s"CAST(floor(1000000 * ln($c)) AS BIGINT)"

  /** Per-document Shannon entropy of the within-doc token distribution
    * — the "information density" quality gate (near-zero entropy =
    * keyword stuffing / boilerplate loops; uniform-random token salad
    * maxes it out), standard alongside the Gopher repetition fractions
    * ([[repetitionStats]] measures concentration of the top item; this
    * measures the WHOLE distribution).
    *
    * Scale shape: a pure per-row fold — `array_sort` the token array,
    * then one `aggregate` HOF pass accumulates run lengths (equal
    * tokens are adjacent after the sort) into `Σ c·qln(c)` and the
    * distinct count. No explode, no shuffle, no per-(doc,token) state
    * off the row: a 100 TB corpus scans once, embarrassingly parallel.
    * [[tokenEntropyRelational]] is the explode+groupBy twin the DuckDB
    * oracle replays (equality spec-pinned).
    *
    * Determinism discipline: with `qln(c) = floor(1e6·ln c)` (ln of an
    * exact integer count — the only double that crosses engines),
    * `entropy_micro = (n·qln(n) − Σ c·qln(c)) div n`, all exact long
    * arithmetic. `Σ c·qln(c) ≤ n·qln(n)` (qln is monotone, c ≤ n), so
    * the numerator is never negative and trunc-div == floor-div in
    * both engines. Identity: H = ln n − (1/n)·Σ c·ln c.
    * NULL text is dropped (the relational twin's explode emits
    * nothing for it — same rule as dsirWeights). */
  def tokenEntropy(docs: DataFrame, id: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val step = "CASE " +
      "WHEN a.prev IS NULL THEN named_struct(" +
      "'prev', x, 'run', 1L, 's', a.s, 'd', 1L) " +
      "WHEN x = a.prev THEN named_struct(" +
      "'prev', x, 'run', a.run + 1L, 's', a.s, 'd', a.d) " +
      "ELSE named_struct('prev', x, 'run', 1L, " +
      s"'s', a.s + a.run * ${qlnSql("a.run")}, 'd', a.d + 1L) END"
    val fin = "CASE WHEN a.prev IS NULL " +
      "THEN named_struct('s', 0L, 'd', 0L) " +
      "ELSE named_struct(" +
      s"'s', a.s + a.run * ${qlnSql("a.run")}, 'd', a.d) END"
    docs.where(col(textCol).isNotNull)
      .select(col(id), tokens(col(textCol)).as("__toks"))
      .select(col(id), size(col("__toks")).cast("long").as("n_tokens"),
        expr("aggregate(array_sort(__toks), " +
          "named_struct('prev', CAST(NULL AS STRING), " +
          "'run', 0L, 's', 0L, 'd', 0L), " +
          s"(a, x) -> $step, a -> $fin)").as("__f"))
      .select(col(id), col("n_tokens"),
        col("__f.d").as("n_distinct"),
        expr("CASE WHEN n_tokens <= 0 THEN 0L ELSE " +
          s"(n_tokens * ${qlnSql("n_tokens")} - __f.s) div n_tokens END")
          .as("entropy_micro"))
  }

  /** Compression-ratio quality gate: per-document raw vs
    * DEFLATE-compressed byte lengths and their ratio — the
    * model-free junk detector curation pipelines run beside the
    * entropy/repetition gates. Both tails are junk: template spam and
    * boilerplate loops compress far below natural prose (ratio → 0),
    * while base64 blobs / random payloads don't compress at all
    * (ratio → 1+). Natural text sits in a band in between; the gate
    * is two thresholds on `deflate_ratio`.
    *
    * Pure per-row native expression
    * ([[graft.functions.expressions.DeflateLen]] — thread-local
    * Deflater, O(8 KB) memory per thread): shuffle-free at any corpus
    * size. Deterministic per (input, level) but NOT SQL-replayable
    * (DuckDB has no deflate) — spec-pinned, not oracle-checked, the
    * same declared boundary as the CDC chunker and image hashes. */
  def compressionStats(docs: DataFrame, id: String = "doc_id",
      textCol: String = "text", level: Int = 6): DataFrame = {
    val raw = octet_length(col(textCol))
    val comp = org.apache.spark.sql.graft.CatalystBridge.deflateLen(
      col(textCol), level)
    docs.select(col(id),
      raw.cast("long").as("raw_bytes"),
      comp.cast("long").as("deflate_bytes"),
      when(raw > 0, round(comp.cast("double") / raw, 4))
        .otherwise(lit(null)).as("deflate_ratio"))
  }

  /** Oracle twin of [[tokenEntropy]]: the explode + (doc, token)
    * groupBy form — identical math on exact longs (order-free sums),
    * replayable in any SQL engine. The per-row fold is the production
    * path; this shape shuffles every token and exists to make the
    * entropy number independently checkable. */
  def tokenEntropyRelational(docs: DataFrame, id: String = "doc_id",
      textCol: String = "text"): DataFrame =
    docs.where(col(textCol).isNotNull)
      .select(col(id), explode(tokens(col(textCol))).as("__t"))
      .groupBy(col(id), col("__t")).agg(count(lit(1)).as("c"))
      .groupBy(col(id)).agg(
        sum("c").cast("long").as("n_tokens"),
        count(lit(1)).as("n_distinct"),
        sum(expr(s"c * ${qlnSql("c")}")).cast("long").as("__s"))
      .select(col(id), col("n_tokens"), col("n_distinct"),
        expr("CASE WHEN n_tokens <= 0 THEN 0L ELSE " +
          s"(n_tokens * ${qlnSql("n_tokens")} - __s) div n_tokens END")
          .as("entropy_micro"))

  /** Email address shape; deliberately simple so Java regex and RE2
    * (DuckDB) agree byte-for-byte on every input. */
  val EmailPattern: String = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Long digit run (account / phone / SSN-ish payloads once separators
    * are ignored). Kept separator-free: separator-tolerant phone
    * patterns are where regex dialects diverge. */
  val LongNumberPattern: String = "[0-9]{6,}"

  /** PII-scrubbed text: emails then long digit runs replaced by typed
    * placeholder tokens. Email first — a local-part digit run must not
    * be half-replaced before the email match sees it. Pure per-row
    * regexp_replace (codegen'd, shuffle-free); replacement is global in
    * both Spark and DuckDB (`'g'` flag there). */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(text, EmailPattern, "[EMAIL]"),
      LongNumberPattern, "[NUM]")

  /** Per-document PII hit counts + scrubbed text. */
  def piiScrub(docs: DataFrame, id: String = "doc_id",
      textCol: String = "text"): DataFrame =
    docs.select(
      col(id),
      regexp_count(col(textCol), lit(EmailPattern)).cast("long")
        .as("n_emails"),
      regexp_count(col(textCol), lit(LongNumberPattern)).cast("long")
        .as("n_longnums"),
      redactPii(col(textCol)).as("redacted"))

  /** Payment-card candidate: a separator-free 13–19 digit run (the
    * PAN length range). Separator-free by design, like
    * [[LongNumberPattern]]: separator-tolerant forms are where regex
    * dialects diverge, and both engines must see the same bytes. A
    * ≥20-digit run yields its greedy 19-digit prefix as a candidate
    * in BOTH engines (leftmost-greedy `{13,19}`) — validation, not
    * the regex, is what rejects it. A PAN EMBEDDED inside a longer
    * digit run is not recovered by THIS greedy pattern (the window
    * misaligns past it) — [[cardWindowsValid]]'s bounded sliding-Luhn
    * scan is the detector for that case (VERDICT r14 #2); the run
    * still redacts wholesale as `[NUM]` either way, so redaction
    * never leaks. Cross-engine agreement on pathological
    * inputs (10k-digit runs → 526 greedy candidates, fused adjacent
    * IBANs, localized digits beside a PAN) verified against DuckDB
    * beyond the board fixtures. */
  val CardCandidatePattern: String = "[0-9]{13,19}"

  /** Maximal digit run long enough to carry a PAN — the window-scan
    * domain of [[cardWindowsValid]]. Unbounded on the right: the
    * embedded case IS a PAN fused into an arbitrarily long
    * timestamp/id run. */
  val DigitRunPattern: String = "[0-9]{13,}"

  /** Issuer-network (IIN) plausibility of a digit window — the
    * public prefix/length ranges of the major card networks (ISO/IEC
    * 7812 assignments as published by the networks): Visa `4` at
    * 13/16/19; Mastercard `51–55` or `2221–2720` at 16; Amex `34/37`
    * at 15; Discover `6011`/`65`/`644–649` at 16–19; JCB `3528–3589`
    * at 16–19; Diners `300–305`/`36`/`38–39` at 14. Luhn alone
    * passes 1-in-10 random windows — over a 10k-digit run that is
    * thousands of false hits; the prefix∧length gate is what makes
    * the sliding scan a usable detector. All comparisons are
    * same-length digit-string compares (lexicographic ≡ numeric), so
    * the DuckDB oracle replays them byte-for-byte. */
  def iinPlausible(w: Column): Column = {
    val len = length(w)
    val p1 = substring(w, 1, 1)
    val p2 = substring(w, 1, 2)
    val p3 = substring(w, 1, 3)
    val p4 = substring(w, 1, 4)
    (p1 === "4" && (len === 13 || len === 16 || len === 19)) ||
      (p2 >= "51" && p2 <= "55" && len === 16) ||
      (p4 >= "2221" && p4 <= "2720" && len === 16) ||
      ((p2 === "34" || p2 === "37") && len === 15) ||
      ((p4 === "6011" || p2 === "65" || (p3 >= "644" && p3 <= "649")) &&
        len >= 16 && len <= 19) ||
      (p4 >= "3528" && p4 <= "3589" && len >= 16 && len <= 19) ||
      ((p3 >= "300" && p3 <= "305" || p2 === "36" || p2 === "38" ||
        p2 === "39") && len === 14)
  }

  /** EMBEDDED-PAN detector (VERDICT r14 #2): the count of sliding
    * windows — every (offset, length ∈ 13..19) substring of every
    * maximal ≥13-digit run — that pass BOTH the Luhn checksum and
    * [[iinPlausible]]. The greedy [[CardCandidatePattern]] misaligns
    * past a PAN fused into a longer timestamp/id run; this scan
    * cannot (it tries every alignment). Bounded work: ≤ 7·len(run)
    * windows, each a ≤19-byte codegen'd Luhn fold — linear in corpus
    * bytes, per-row, shuffle-free. Window counts can overlap (a
    * 16-digit PAN inside a run contributes 1; two fused PANs
    * contribute 2; a window passing both gates by chance — ~0.1% per
    * IIN-shaped window — also counts): this column is a detector for
    * auditors, not an exact PAN parse. NULL text → -1 under the
    * default `spark.sql.legacy.sizeOfNull` (the final `size()` maps
    * the NULL window array to -1, consistent with the sibling
    * size()-based audit columns); [[piiAudit]] selects from
    * non-null-guarded docs, so the sentinel never reaches the audit. */
  def cardWindowsValid(text: Column): Column = {
    val runs = regexp_extract_all(text, lit(DigitRunPattern), lit(0))
    val windows = flatten(transform(runs, r =>
      flatten(transform(sequence(lit(13), lit(19)), l =>
        when(length(r) >= l,
          transform(sequence(lit(0), length(r) - l),
            o => r.substr(o + lit(1), l)))
          .otherwise(array().cast("array<string>"))))))
    size(filter(windows, w => luhnValid(w) && iinPlausible(w)))
      .cast("long")
  }

  /** IPv4 candidate: four dot-separated 1–3 digit octets. Candidates
    * only — `999.1.1.1` matches; octet-range VALIDATION is
    * [[piiAudit]]'s job (kept out of the regex: `25[0-5]|…`
    * alternations are long and easy to mistranscribe across
    * dialects; an integer compare is not). */
  val Ipv4CandidatePattern: String =
    "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"

  /** IBAN candidate: two country letters, two check digits, 11–30
    * alphanumerics (spans the 15–34 registry range). Uppercase,
    * separator-free by design, like the card pattern; the mod-97
    * checksum ([[ibanValid]]) is what rejects IBAN-shaped noise. */
  val IbanCandidatePattern: String = "[A-Z]{2}[0-9]{2}[A-Z0-9]{11,30}"

  /** E.164 international phone shape: `+` then 8–15 digits, no
    * leading zero. The SHAPE count rides [[piiAudit]] as
    * `n_phones_e164`; [[phonePlausible]] is the validation tier on
    * top (assigned country code + published length metadata) and is
    * what feeds `n_phones_valid` and [[hasValidatedPii]]. The
    * national/separator-tolerant formats are deliberately out of
    * scope: that is where regex dialects diverge. */
  val PhoneE164Pattern: String = "\\+[1-9][0-9]{7,14}"

  /** The assigned TWO-digit E.164 country calling codes (ITU-T E.164
    * assignment list, public — the same structure libphonenumber's
    * metadata encodes). `1` and `7` are the only one-digit codes;
    * every other assigned code is three digits and lives in
    * [[PhoneCc3]]. Codes absent here (21, 28, 29, 35, 37, 38, 42,
    * 50, 59, 67–69, 80, 85, 87, 88, 96, 97, 99) head three-digit
    * blocks, which is why longest-prefix matching tries this list
    * before falling through to three digits. */
  val PhoneCc2: Seq[String] = Seq(
    "20", "27", "30", "31", "32", "33", "34", "36", "39", "40", "41",
    "43", "44", "45", "46", "47", "48", "49", "51", "52", "53", "54",
    "55", "56", "57", "58", "60", "61", "62", "63", "64", "65", "66",
    "81", "82", "84", "86", "90", "91", "92", "93", "94", "95", "98")

  /** The assigned THREE-digit E.164 country calling codes (ITU-T
    * E.164 assignment list, public), including the global services
    * (800/808/870/878/881–883/888) — phone-shaped noise under an
    * UNASSIGNED code (e.g. `+999…`) is exactly what this table
    * rejects. */
  val PhoneCc3: Seq[String] = Seq(
    // zone 2 — Africa
    "211", "212", "213", "216", "218", "220", "221", "222", "223",
    "224", "225", "226", "227", "228", "229", "230", "231", "232",
    "233", "234", "235", "236", "237", "238", "239", "240", "241",
    "242", "243", "244", "245", "246", "247", "248", "249", "250",
    "251", "252", "253", "254", "255", "256", "257", "258", "260",
    "261", "262", "263", "264", "265", "266", "267", "268", "269",
    "290", "291", "297", "298", "299",
    // zone 3 — Europe
    "350", "351", "352", "353", "354", "355", "356", "357", "358",
    "359", "370", "371", "372", "373", "374", "375", "376", "377",
    "378", "379", "380", "381", "382", "383", "385", "386", "387",
    "389",
    // zone 4
    "420", "421", "423",
    // zone 5 — Central/South America
    "500", "501", "502", "503", "504", "505", "506", "507", "508",
    "509", "590", "591", "592", "593", "594", "595", "596", "597",
    "598", "599",
    // zone 6 — Pacific
    "670", "672", "673", "674", "675", "676", "677", "678", "679",
    "680", "681", "682", "683", "685", "686", "687", "688", "689",
    "690", "691", "692",
    // zone 8 — East Asia + global services
    "800", "808", "850", "852", "853", "855", "856", "870", "878",
    "880", "881", "882", "883", "886", "888",
    // zone 9 — Middle East / Central + South Asia
    "960", "961", "962", "963", "964", "965", "966", "967", "968",
    "970", "971", "972", "973", "974", "975", "976", "977", "979",
    "992", "993", "994", "995", "996", "998")

  /** Phone-number PLAUSIBILITY over an E.164 candidate (the fifth
    * validated PII class — phones carry no checksum, so the
    * validation tier is libphonenumber-style public metadata instead
    * of arithmetic): longest-prefix country-code match against the
    * ITU assignment tables ([[PhoneCc2]]/[[PhoneCc3]]; an unassigned
    * code like `+999…` fails outright), then the national significant
    * number's length against published bounds — exact for the
    * highest-volume codes (NANP is 10 with `[2-9]` area/exchange
    * leads, per the NANP numbering plan; Russia 10; France/Spain 9;
    * UK 9–10; Germany 6–11; Japan 9–10; China 9–12; India 10), a
    * structural 4–13 elsewhere (E.164 caps totals at 15; no code's
    * published NSN floor is under 4). All substr/length/IN work on
    * digit strings — no regex, so the DuckDB oracle replays it
    * byte-for-byte. Candidates come from [[PhoneE164Pattern]], which
    * guarantees `+` then 8–15 digits. */
  def phonePlausible(p: Column): Column = {
    val d = substring(p, 2, 16) // the digits (strip '+')
    val n = length(d)
    val c1 = substring(d, 1, 1)
    val c2 = substring(d, 1, 2)
    val c3 = substring(d, 1, 3)
    when(c1 === "1",
      n - 1 === 10 &&
        substring(d, 2, 1).between("2", "9") &&
        substring(d, 5, 1).between("2", "9"))
      .when(c1 === "7", n - 1 === 10)
      .when(c2 === "33" || c2 === "34", n - 2 === 9)
      .when(c2 === "44" || c2 === "81", (n - 2).between(9, 10))
      .when(c2 === "49", (n - 2).between(6, 11))
      .when(c2 === "86", (n - 2).between(9, 12))
      .when(c2 === "91", n - 2 === 10)
      .when(c2.isin(PhoneCc2: _*), (n - 2).between(4, 13))
      .otherwise(c3.isin(PhoneCc3: _*) && (n - 3).between(4, 13))
  }

  /** Luhn (mod-10) checksum over an all-digit string: 1-indexed from
    * the RIGHT, every even position's digit doubles (minus 9 past 9),
    * the total must divide by 10. Native codegen'd byte loop
    * ([[graft.functions.expressions.LuhnValid]] — no per-candidate
    * index-array allocation, unlike the equivalent
    * `aggregate(transform(sequence(...)))` higher-order tree), also a
    * SQL function `luhn_valid(s)` under [[graft.GraftExtensions]].
    * Empty or any non-digit byte → FALSE (the [[CardCandidatePattern]]
    * extract guarantees digits, so the audit path never hits it).
    * Oracle-replayable: DuckDB runs the identical arithmetic as
    * `list_sum(list_transform(range(1, length(c)+1), i -> ...)) % 10
    * = 0` over `substr(reverse(c), i, 1)` — see the q_pii_audit
    * oracle. */
  def luhnValid(num: Column): Column =
    org.apache.spark.sql.graft.CatalystBridge.luhnValid(num)

  /** ISO 13616 IBAN mod-97 checksum — [[luhnValid]]'s bank-account
    * sibling (native codegen'd fold,
    * [[graft.functions.expressions.IbanValid]]; SQL face
    * `iban_valid(s)`). Checksum only — the registry's per-country
    * BBAN lengths are deliberately not validated; the
    * [[IbanCandidatePattern]] extract carries the shape. */
  def ibanValid(s: Column): Column =
    org.apache.spark.sql.graft.CatalystBridge.ibanValid(s)

  /** VALIDATED PII audit — the upgrade over [[piiScrub]]'s shape
    * counts: a digit run is only a `card` if it passes the Luhn
    * checksum, an IPv4 shape only counts when every octet ≤ 255.
    * Validation is what separates an account-number-looking noise
    * run from a chargeable PAN — the difference between a PII rate
    * you can alert on and one that cries wolf on every timestamp.
    *
    * Output: id, n_emails, n_card_candidates, n_cards_luhn,
    * n_cards_embedded ([[cardWindowsValid]] — PANs fused inside
    * longer digit runs, which the greedy candidate misses),
    * n_ipv4_candidates, n_ipv4_valid, n_iban_candidates,
    * n_ibans_valid, n_phones_e164 (shape count), n_phones_valid
    * ([[phonePlausible]] — assigned country code + published length
    * metadata, the checksum-less class's validation tier).
    * Entirely per-row expression work (regex extract
    * + nested higher-order functions over ≤ a handful of short
    * candidates per doc): shuffle-free, linear in corpus bytes, and
    * embarrassingly parallel at 100 TB — the scan IS the cost, so it
    * composes free with any other per-row pass. */
  def piiAudit(docs: DataFrame, id: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val cards = regexp_extract_all(col(textCol),
      lit(CardCandidatePattern), lit(0))
    val ips = regexp_extract_all(col(textCol),
      lit(Ipv4CandidatePattern), lit(0))
    val ibans = regexp_extract_all(col(textCol),
      lit(IbanCandidatePattern), lit(0))
    Fan.out(docs).select(
      col(id),
      regexp_count(col(textCol), lit(EmailPattern)).cast("long")
        .as("n_emails"),
      size(cards).cast("long").as("n_card_candidates"),
      size(filter(cards, c => luhnValid(c))).cast("long")
        .as("n_cards_luhn"),
      cardWindowsValid(col(textCol)).as("n_cards_embedded"),
      size(ips).cast("long").as("n_ipv4_candidates"),
      size(filter(ips, ip =>
        forall(split(ip, "\\."), o => o.cast("int") <= 255)))
        .cast("long").as("n_ipv4_valid"),
      size(ibans).cast("long").as("n_iban_candidates"),
      size(filter(ibans, b => ibanValid(b))).cast("long")
        .as("n_ibans_valid"),
      regexp_count(col(textCol), lit(PhoneE164Pattern)).cast("long")
        .as("n_phones_e164"),
      size(filter(regexp_extract_all(col(textCol),
          lit(PhoneE164Pattern), lit(0)), p => phonePlausible(p)))
        .cast("long").as("n_phones_valid"))
  }

  /** [[redactPii]]'s full-surface sibling: emails → `[EMAIL]`, IBAN
    * shapes → `[IBAN]`, long digit runs (card candidates included —
    * they are ≥ 13 digits) → `[NUM]`, then IPv4 shapes → `[IP]`.
    * The IP/IBAN passes are shape-level (regexp_replace cannot
    * checksum): an invalid `999.1.1.1` or a checksum-failing IBAN
    * shape also redacts, which only over-scrubs — never leaks.
    * Ordering matters twice: emails before digit runs (a local-part
    * run must not be half-replaced first) and IBANs before digit
    * runs (an IBAN's interior ≥ 6-digit run must not be cored out
    * to `GB82WEST[NUM]` first — the IBAN must go wholesale); the IP
    * pass cannot interact with either (octets are ≤ 3 digits, below
    * the 6-digit floor, and contain no letters). Closes the recovery
    * loop: [[hasValidatedPii]] is FALSE on this function's output,
    * so a gated-out document re-enters the corpus redacted instead
    * of being lost (pinned by the q_pii_gate board row's
    * n_recovered = n_flagged). */
  def redactPiiAll(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(text, EmailPattern, "[EMAIL]"),
          IbanCandidatePattern, "[IBAN]"),
        LongNumberPattern, "[NUM]"),
      Ipv4CandidatePattern, "[IP]")

  /** TRUE iff the text carries VALIDATED PII — an email shape, a
    * Luhn-valid card run, a Luhn∧IIN-valid window EMBEDDED in a
    * longer digit run ([[cardWindowsValid]] — so a PAN fused into a
    * timestamp/id run trips the gate, VERDICT r14 #2), an octet-valid
    * IPv4, a mod-97-valid IBAN, or a PLAUSIBLE E.164 phone
    * ([[phonePlausible]] — assigned country code + published length
    * bounds; shape-only phone noise under an unassigned code still
    * does not trip the gate) — the row-level predicate under [[piiAudit]] (same
    * candidates, same validation) for gates that must decide per
    * row: pure per-row expression work, shuffle-free, stateless (so
    * it rides streams as-is — see
    * [[graft.streaming.ScdStream.piiStreamGate]]). Candidate-shaped
    * noise (a Luhn-failing digit run, a 999.x.x.x, a checksum-failing
    * IBAN shape) does NOT trip it — that is the point of
    * validating. NULL text → FALSE, not NULL: "carries no PII" is
    * this predicate's truthful answer for an absent payload, and a
    * three-valued result would silently skew every consumer a
    * different way (a WHERE drops the row, a conditional SUM skips
    * it, the oracle's CASE counts its ELSE branch). */
  def hasValidatedPii(text: Column): Column = {
    val cards = regexp_extract_all(text, lit(CardCandidatePattern),
      lit(0))
    val ips = regexp_extract_all(text, lit(Ipv4CandidatePattern),
      lit(0))
    val ibans = regexp_extract_all(text, lit(IbanCandidatePattern),
      lit(0))
    coalesce(
      (regexp_count(text, lit(EmailPattern)) > 0) ||
        exists(cards, c => luhnValid(c)) ||
        (cardWindowsValid(text) > 0) ||
        exists(ips, ip =>
          forall(split(ip, "\\."), o => o.cast("int") <= 255)) ||
        exists(ibans, b => ibanValid(b)) ||
        exists(regexp_extract_all(text, lit(PhoneE164Pattern), lit(0)),
          p => phonePlausible(p)),
      lit(false))
  }

  /** Sentence segmentation on terminator+WHITESPACE boundaries: a
    * sentence ends at a `.!?` run only when whitespace (or
    * end-of-text) follows, so DOTTED TOKENS — emails, IPv4s, decimal
    * numbers, version strings — stay whole inside their sentence
    * (VERDICT r14 #3: the previous every-terminator split cut
    * `user@a.com` / `10.1.2.3` across sentences, making exactly those
    * two PII classes unlocatable at sentence granularity). Mechanics:
    * one `regexp_replace` rewrites `([.!?]+)[ \t\n\r\f]+` to the
    * terminator run plus a `\u0001` sentinel (pre-stripped from the
    * text, so a pathological input cannot forge boundaries), then a
    * plain split on the sentinel; trimmed, empties dropped. No
    * lookbehind/lookahead (RE2 has none) and an explicit whitespace
    * class (Java's `\s` includes `\x0B`; RE2's does not), so the
    * DuckDB oracle replays the split byte-for-byte. The unit below
    * [[graft.operators.Dedup.segmentDedup]]'s lines when boilerplate
    * recurs at sentence granularity, and the natural input for
    * sentence-level PII/quality passes; shuffle-free, per-row.
    * Abbreviation handling ("Dr.") remains a model problem, out of
    * scope by design.
    * Output: id, sent_idx (0-based), n_tokens, sentence. */
  def sentences(docs: DataFrame, id: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val marked = regexp_replace(
      regexp_replace(col(textCol), "\u0001", ""),
      "([.!?]+)[ \t\n\r\f]+", "$1\u0001")
    // a part must carry at least one non-terminator character --
    // terminator-only fragments ("...") are junk, not sentences
    val cleaned = filter(transform(split(marked, "\u0001"),
      s => trim(s)), s => s =!= "" && s.rlike("[^.!?]"))
    docs.select(col(id),
        posexplode(cleaned).as(Seq("sent_idx", "sentence")))
      .select(col(id), col("sent_idx").cast("long").as("sent_idx"),
        size(split(col("sentence"), " ")).cast("long").as("n_tokens"),
        col("sentence"))
  }

  /** Bag-of-words fingerprint: md5 of the sorted distinct token set.
    * Documents that differ only by token order/repetition collide —
    * the standard "near-exact" dedup key one step beyond raw-text
    * equality. NULL text → NULL, explicitly (r15 adversarial sweep):
    * `concat_ws` silently swallows a null array, which made a null
    * document fingerprint-collide with an EMPTY document — absent is
    * not empty, and DuckDB's md5(NULL) = NULL disagreed with the
    * swallowed form on exactly that row. */
  def fingerprint(text: Column): Column =
    when(text.isNull, lit(null).cast("string"))
      .otherwise(md5(concat_ws(" ", array_sort(array_distinct(tokens(text))))))

  /** Top-k characteristic terms per document by smoothed TF-IDF
    * (`tf · ln((N+1)/(df+1))`). Plan shape at scale: explode → one
    * map-side-combinable (doc, term) groupBy for tf; a term-keyed
    * groupBy of THAT (already one row per (doc, term)) for df; the
    * corpus size joins in as a broadcast 1-row aggregate — never a
    * driver-side collect; then a per-doc window cut. Scores are
    * rounded to 4 before ranking (term tie-break) so the cut is
    * engine-replayable. */
  def tfIdfTopTerms(docs: DataFrame, id: String = "doc_id",
      textCol: String = "text", k: Int = 5): DataFrame = {
    val tf = docs.select(col(id), explode(tokens(col(textCol))).as("term"))
      .groupBy(col(id), col("term")).agg(count(lit(1)).as("tf"))
    val docFreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val scored = tf.join(docFreq, "term").crossJoin(broadcast(n))
      .withColumn("tf_idf", round(col("tf") *
        log((col("n_docs") + 1).cast("double") / (col("df") + 1)), 4))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(id)).orderBy(col("tf_idf").desc, col("term"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(col(id), col("rank"), col("term"), col("tf"), col("df"),
        col("tf_idf"))
  }

  /** Unigram log-loss per document — the perplexity-proxy quality
    * filter (the CCNet recipe, with the LM reduced to the corpus' own
    * unigram distribution so the score is fully relational and
    * oracle-replayable): avg over a doc's tokens of
    * −ln(count(token)/total_tokens). Documents whose token mix diverges
    * from the corpus (boilerplate, wrong language, gibberish) score
    * HIGH; fluent in-domain text scores low. In production the unigram
    * table is swapped for a reference-corpus table — the plan is
    * unchanged.
    *
    * Plan: one map-side-combinable token groupBy for corpus counts, a
    * broadcast 1-row total, and a token equi-join folded back per doc
    * — the tf-idf shape. Determinism discipline: per-token −ln p is
    * QUANTIZED to a 1e-6 long grid before summation (a float sum's
    * accumulation order differs across engines; exact long sums
    * don't), one double divide at the end. Residual risk: ln itself
    * may differ by 1 ulp across libms, flipping a floor only when the
    * value sits within ~1e-9 relative of a grid line — vanishingly
    * rare but not impossible, unlike the sum-order hazard this
    * eliminates.
    * Output: id, n_tokens, avg_neg_logp. */
  /** The unigram LM TABLE [[unigramLogLossWith]] scores against:
    * (t, q) with q = the 1e-6-quantized −ln p(t) long — the persisted
    * reference-corpus artifact the scaladoc below promises. One
    * map-side-combinable token groupBy + a broadcast 1-row total. */
  def unigramLm(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val tok = docs.select(explode(tokens(col(textCol))).as("t"))
    val counts = tok.groupBy("t").agg(count(lit(1)).as("c"))
    val total = counts.agg(sum("c").as("total"))
    counts.crossJoin(broadcast(total))
      .select(col("t"),
        floor(-log(col("c").cast("double") / col("total")) * 1000000)
          .cast("long").as("q"))
  }

  /** [[unigramLogLoss]] against an EXTERNAL LM table ([[unigramLm]]
    * output, typically trained on a reference corpus or the train
    * split) — the production quality-filter shape: score incoming
    * documents without re-deriving the distribution from them.
    * Out-of-vocabulary tokens charge the flat `oovQMicros` penalty
    * (quantized −ln p micros; pick ≈ −ln of a sub-vocabulary
    * probability) via a left join — deterministic and replayable.
    * Same output as [[unigramLogLoss]]. */
  def unigramLogLossWith(docs: DataFrame, lm: DataFrame,
      oovQMicros: Long, id: String = "doc_id",
      textCol: String = "text"): DataFrame =
    docs.select(col(id), explode(tokens(col(textCol))).as("t"))
      .join(lm, Seq("t"), "left")
      .select(col(id), coalesce(col("q"), lit(oovQMicros)).as("q"))
      .groupBy(col(id))
      .agg(count(lit(1)).as("n_tokens"),
        round(sum(col("q")).cast("double") /
          (lit(1000000.0) * count(lit(1))), 4).as("avg_neg_logp"))

  /** Token-distribution KL divergence D(P‖Q) between two corpora —
    * the domain-drift check a curation pipeline runs before mixing a
    * new crawl batch into the standing corpus (large KL = the batch's
    * token mix diverges; route to review instead of auto-merge).
    *
    * Estimator: add-1 smoothing over the UNION vocabulary V, so both
    * distributions are strictly positive and the divergence is finite:
    * p_t = (cP_t + 1)/(NP + |V|), q_t likewise; D = Σ_t p_t ln(p_t/q_t).
    * Determinism discipline: each term is quantized to a 1e-12 grid
    * long before the sum (float accumulation order differs across
    * engines; exact long sums don't — |term|·1e12 ≤ ~1e10 and vocab
    * ≤ 1e6 keeps the sum far from overflow), one divide at the end.
    * Plan: two token groupBys (map-side combined), a full-outer join
    * on token, broadcast 1-row totals. Output one row:
    * (n_vocab, kl_nats). */
  def tokenKlDivergence(p: DataFrame, q: DataFrame,
      textCol: String = "text"): DataFrame = {
    def counts(df: DataFrame, as: String): DataFrame =
      df.select(explode(tokens(col(textCol))).as("t"))
        .groupBy("t").agg(count(lit(1)).as(as))
    // lazy checkpoint: the joined vocab table (bounded by |V|) feeds
    // both the totals aggregate and the term computation — without it
    // the two token groupBys + full-outer join execute twice
    val joined = counts(p, "cp").join(counts(q, "cq"), Seq("t"), "full_outer")
      .select(col("t"), coalesce(col("cp"), lit(0L)).as("cp"),
        coalesce(col("cq"), lit(0L)).as("cq"))
      .localCheckpoint(false)
    val totals = joined.agg(sum("cp").as("np"), sum("cq").as("nq"),
      count(lit(1)).as("v"))
    val pt = (col("cp") + 1).cast("double") / (col("np") + col("v"))
    val qt = (col("cq") + 1).cast("double") / (col("nq") + col("v"))
    joined.crossJoin(broadcast(totals))
      .select(col("v"),
        floor(pt * log(pt / qt) * 1e12).cast("long").as("term_q"))
      .groupBy(col("v").as("n_vocab"))
      .agg(round(sum(col("term_q")).cast("double") / 1e12, 6)
        .as("kl_nats"))
  }

  /** Jensen–Shannon divergence between two corpora's token
    * distributions — [[tokenKlDivergence]]'s SYMMETRIC, BOUNDED
    * sibling: JS = ½KL(P‖M) + ½KL(Q‖M) with M = (P+Q)/2, always in
    * [0, ln 2], so one fixed alert threshold works for every corpus
    * pair (raw KL is unbounded and asymmetric — fine for "batch vs
    * standing corpus", wrong for "corpus A vs corpus B" comparisons).
    * Same add-1 smoothing over the union vocabulary and the same
    * 1e-12-grid per-term quantization (both KL terms share one pass
    * over the joined vocab table). Output one row:
    * (n_vocab, js_nats). */
  def jsDivergence(p: DataFrame, q: DataFrame,
      textCol: String = "text"): DataFrame = {
    def counts(df: DataFrame, as: String): DataFrame =
      df.select(explode(tokens(col(textCol))).as("t"))
        .groupBy("t").agg(count(lit(1)).as(as))
    val joined = counts(p, "cp")
      .join(counts(q, "cq"), Seq("t"), "full_outer")
      .select(coalesce(col("cp"), lit(0L)).as("cp"),
        coalesce(col("cq"), lit(0L)).as("cq"))
      .localCheckpoint(false)
    val totals = joined.agg(sum("cp").as("np"), sum("cq").as("nq"),
      count(lit(1)).as("v"))
    val pt = (col("cp") + 1).cast("double") / (col("np") + col("v"))
    val qt = (col("cq") + 1).cast("double") / (col("nq") + col("v"))
    val mt = (pt + qt) / 2
    joined.crossJoin(broadcast(totals))
      .select(col("v"),
        (floor(pt * log(pt / mt) * 1e12).cast("long") +
          floor(qt * log(qt / mt) * 1e12).cast("long")).as("term_q"))
      .groupBy(col("v").as("n_vocab"))
      .agg(round(sum(col("term_q")).cast("double") / 2e12, 6)
        .as("js_nats"))
  }

  /** TextRank keyword extraction (Mihalcea & Tarau, EMNLP 2004):
    * PageRank over the word co-occurrence graph — the unsupervised
    * "what is this corpus about" tagger. Adjacent-token pairs (window
    * 2) become UNDIRECTED edges (both directions, distinct), words map
    * to dense integer ids through the vocab table (PageRank's node
    * space is integral), and [[Graph.pageRank]] runs its exact
    * integer micro-unit rounds — so the oracle replays every round of
    * the word graph, not just the final cut.
    *
    * 100 TB shape: the bigram explode is one corpus scan collapsing
    * straight into a vocab²-bounded DISTINCT edge set; everything
    * after is vocab-bounded, not corpus-bounded — and the vocab ids
    * themselves come from [[Ranks.cumOver]]'s distributed prefix sum
    * over the word table (first-8-byte monotone string proxy), so a
    * crawl-scale noise vocabulary never funnels one row_number task
    * (VERDICT r11 nit; ids stay the exact lexicographic ranks the
    * oracle replays). Hub words are the quality knob, not a scale
    * hazard: `minLen` drops 1-char noise here, and production adds a
    * stopword list / min-df cut before the graph (same plan).
    *
    * Output: kw_rank (1..k by descending score, word ascending on
    * ties), word, score (the 6-decimal PageRank). */
  def textRankKeywords(docs: DataFrame, textCol: String = "text",
      iters: Int = 3, k: Int = 20, minLen: Int = 2): DataFrame = {
    require(iters >= 1 && k >= 1 && minLen >= 1,
      s"textRankKeywords: iters, k, minLen must be >= 1: " +
        s"$iters, $k, $minLen")
    val toks = docs
      .select(tokens(col(textCol)).as("__t"))
      .select(expr(s"filter(__t, t -> length(t) >= $minLen)")
        .as("toks"))
      .where(size(col("toks")) >= 2)
    val pairs = toks.select(explode(expr(
        "transform(sequence(0, size(toks)-2), " +
          "i -> struct(toks[i] AS a, toks[i+1] AS b))")).as("bg"))
      .select(col("bg.a").as("a"), col("bg.b").as("b"))
      .where(col("a") =!= col("b"))
      .localCheckpoint(false) // feeds the vocab AND two id joins
    // vocab from ONE evaluation of pairs (r17): the a/b self-union read
    // the checkpointed pairs twice IN THE SAME STAGE — the second
    // branch's tasks blocked on the BlockManager's per-block lock while
    // the first computed each block (task-metrics receipt: 64 tasks,
    // sumRun 65.7 s vs sumCpu 9.8 s). explode reads it once.
    val vocab = Ranks.cumOver(
        pairs.select(explode(array(col("a"), col("b"))).as("word"))
          .distinct()
          .withColumn("__one", lit(1L)),
        "word", Nil, Seq("__one" -> "wid"))
      .select(col("word"), col("wid"))
      .localCheckpoint(false)
    val ids = pairs
      .join(vocab.select(col("word").as("a"), col("wid").as("sa")), "a")
      .join(vocab.select(col("word").as("b"), col("wid").as("sb")), "b")
    // both edge directions from ONE evaluation of the vocab joins
    // (r17, guide §2.4 — the two-branch union re-ran them per branch)
    val edges = ids.select(explode(array(
        struct(col("sa").as("src"), col("sb").as("dst")),
        struct(col("sb").as("src"), col("sa").as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .distinct()
    val pr = Graph.pageRank(edges, iters = iters)
    val cut = pr.join(vocab.select(col("wid").as("node"), col("word")),
        "node")
      .orderBy(col("rank").desc, col("word")).limit(k)
    val wr = org.apache.spark.sql.expressions.Window
      .orderBy(col("rank").desc, col("word"))
    cut.withColumn("kw_rank", row_number().over(wr).cast("long"))
      .select(col("kw_rank"), col("word"), col("rank").as("score"))
  }

  /** (id?, w1, w2) bigram events of a text column — the inline
    * generator shared by the bigram LM builder and scorer (same
    * projection-collapse rule as [[Dedup.shingles]]: the transform
    * stays under the explode). Docs shorter than 2 tokens emit
    * nothing. */
  private def bigramEvents(docs: DataFrame, keep: Seq[Column],
      textCol: String): DataFrame =
    docs.select(keep :+ tokens(col(textCol)).as("toks"): _*)
      .where(size(col("toks")) >= 2)
      .select(keep :+ explode(expr(
        "transform(sequence(0, size(toks)-2), " +
          "i -> struct(toks[i] AS w1, toks[i+1] AS w2))")).as("__b"): _*)
      .select(keep :+ col("__b.w1").as("w1") :+ col("__b.w2").as("w2"): _*)

  /** Bigram LM table: (w1, w2, q) with q the 1e-6-quantized
    * −ln P(w2|w1), MLE over bigram events (the denominator is the sum
    * of the w1 row-group — map-side-combinable groupBys joined on w1).
    * The conditional-probability upgrade of [[unigramLm]]; same
    * persistable-artifact contract. */
  def bigramLm(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val c12 = bigramEvents(docs, Seq.empty, textCol)
      .groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
    val c1 = c12.groupBy("w1").agg(sum("c12").as("c1"))
    c12.join(c1, "w1")
      .select(col("w1"), col("w2"),
        floor(-log(col("c12").cast("double") / col("c1")) * 1000000)
          .cast("long").as("q"))
  }

  /** Per-document bigram log-loss against an external [[bigramLm]]
    * table — the conditional-probability perplexity proxy (sharper
    * than the unigram score on scrambled-but-common-token text: word
    * SALAD has fluent unigrams and garbage bigrams). Unseen bigrams
    * charge `oovQMicros` flat. Docs shorter than 2 tokens are absent
    * from the output. Output: id, n_bigrams, avg_neg_logp. */
  def bigramLogLossWith(docs: DataFrame, lm: DataFrame,
      oovQMicros: Long, id: String = "doc_id",
      textCol: String = "text"): DataFrame =
    bigramEvents(docs, Seq(col(id)), textCol)
      .join(lm, Seq("w1", "w2"), "left")
      .select(col(id), coalesce(col("q"), lit(oovQMicros)).as("q"))
      .groupBy(col(id))
      .agg(count(lit(1)).as("n_bigrams"),
        round(sum(col("q")).cast("double") /
          (lit(1000000.0) * count(lit(1))), 4).as("avg_neg_logp"))

  def unigramLogLoss(docs: DataFrame, id: String = "doc_id",
      textCol: String = "text"): DataFrame =
    // self-LM delegation: every scored token exists in the LM by
    // construction, so the OOV penalty is unreachable (0 is a
    // sentinel, not a tuning knob)
    unigramLogLossWith(docs, unigramLm(docs, textCol),
      oovQMicros = 0L, id, textCol)

  /** Interpolated Kneser–Ney bigram log-loss — THE standard n-gram
    * smoothing (Kneser & Ney 1995; Chen & Goodman 1999's
    * interpolated form), upgrading [[bigramLogLossWith]]'s flat OOV
    * penalty to the principled backoff: an unseen bigram is scored by
    * how promiscuous its history is (λ(v) = D·N1+(v·)/c(v)) times how
    * many contexts its target CONTINUES (P_cont(w) = N1+(·w)/N1+(··))
    * — "san francisco" inflates c(francisco) but not its continuation
    * count, which is the whole point.
    *
    *   P(w|v) = max(c(vw) − D, 0)/c(v) + D·N1+(v·)/c(v) · N1+(·w)/B
    *
    * with D = 3/4 and B = N1+(··). With the discount a small rational
    * the whole probability is ONE integer rational,
    *
    *   P = (max(4·c(vw) − 3, 0)·B + 3·N1+(v·)·N1+(·w)) / (4·c(v)·B),
    *
    * so the per-event charge q = ⌊−ln(num/den)·1e6⌋ is one double
    * division + one ln over exact longs — the [[unigramLm]]
    * quantization discipline, replayed term for term by the oracle.
    * (num/den carried as longs: 4·c(v)·B must stay under 2^63 — holds
    * to ~10^9 distinct bigrams × 10^9-count histories; shard-train
    * beyond that.) Events whose HISTORY is unseen in `trainDocs` (or
    * whose target never continues anything, making the interpolated
    * mass exactly zero) charge the flat `oovQMicros` — the one place
    * a flat penalty is still honest.
    *
    * Trained on `trainDocs`, scores `scoreDocs` (the
    * text_perplexity_ref split shape). Plan: three map-side-combined
    * groupBys over train bigrams (pair, history, continuation), a
    * broadcast 1-row B, three equi-joins onto score events, one
    * per-doc fold. Output: id, n_bigrams, avg_neg_logp. */
  def kneserNeyLogLoss(scoreDocs: DataFrame, trainDocs: DataFrame,
      oovQMicros: Long, id: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val c12 = bigramEvents(trainDocs, Seq.empty, textCol)
      .groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
      .localCheckpoint(false) // feeds c1, cont, B AND the score join
    val c1 = c12.groupBy("w1")
      .agg(sum("c12").as("c1"), count(lit(1)).as("n1v"))
    val cont = c12.groupBy("w2").agg(count(lit(1)).as("n1w"))
    val bTot = c12.agg(count(lit(1)).as("b"))
    val num = greatest(lit(4) * coalesce(col("c12"), lit(0L)) - 3,
      lit(0L)) * col("b") +
      lit(3) * col("n1v") * coalesce(col("n1w"), lit(0L))
    val den = lit(4) * col("c1") * col("b")
    bigramEvents(scoreDocs, Seq(col(id)), textCol)
      .join(c12, Seq("w1", "w2"), "left")
      .join(c1, Seq("w1"), "left")
      .join(cont, Seq("w2"), "left")
      .crossJoin(broadcast(bTot))
      .select(col(id),
        when(col("c1").isNull || num === 0, lit(oovQMicros))
          .otherwise(floor(-log(num.cast("double") /
            den.cast("double")) * 1000000).cast("long")).as("q"))
      .groupBy(col(id))
      .agg(count(lit(1)).as("n_bigrams"),
        round(sum(col("q")).cast("double") /
          (lit(1000000.0) * count(lit(1))), 4).as("avg_neg_logp"))
  }

  /** Split each document into overlapping token windows — the
    * context-window prep step of a training pipeline (chunk i covers
    * tokens [i·stride, i·stride + maxTokens), stride =
    * maxTokens − overlap; every doc yields ≥ 1 chunk). Pure per-row
    * generator expression: integer chunk-count math (no float ceil —
    * engine-replayable), inline explode over the index sequence, slice
    * + concat for the window. Output: id, chunk_idx, n_chunk_tokens,
    * chunk_text. */
  def chunkText(docs: DataFrame, id: String = "doc_id",
      textCol: String = "text", maxTokens: Int = 32,
      overlap: Int = 8): DataFrame = {
    require(overlap >= 0 && overlap < maxTokens,
      s"need 0 <= overlap < maxTokens: $overlap / $maxTokens")
    val stride = maxTokens - overlap
    val toks = tokens(col(textCol))
    // ceil((n - overlap) / stride) via floor of an exact small-int
    // division (both engines IEEE-identical), min 1
    val nChunks = greatest(
      floor((size(toks) - overlap + (stride - 1)).cast("double") / stride)
        .cast("long"), lit(1L))
    // a NULL doc has no chunks (r16 adversarial sweep: the degenerate
    // min-1 chunk rendered '' in Spark but NULL in DuckDB — absent is
    // not empty); an EMPTY doc keeps its single empty chunk
    val chunked = docs.where(col(textCol).isNotNull)
      .select(col(id), toks.as("__toks"),
        explode(sequence(lit(0L), nChunks - 1)).as("chunk_idx"))
    val window = slice(col("__toks"),
      (col("chunk_idx") * stride + 1).cast("int"), lit(maxTokens))
    chunked.select(col(id), col("chunk_idx"),
      size(window).cast("long").as("n_chunk_tokens"),
      concat_ws(" ", window).as("chunk_text"))
  }

  /** Deterministic hashing-trick document embedding (feature hashing /
    * "hashing vectorizer"): every token lands in bucket
    * `floor(md5frac("b|"+tok)·dim)` with a signed weight derived from a
    * second salt, summed per bucket into a dense `dim`-vector. Bridges
    * the text operators into the vector family (`Similarity`,
    * `Dedup.embeddingNearDups`, `kmeansFit`) with no model artifact.
    *
    * Determinism discipline (same as kmeansFit): weights are QUANTIZED
    * to integers (`floor(frac·2Q)−Q`), summed as exact longs, divided
    * once in double — bucket sums can never diverge across engines by
    * accumulation order. Plan: explode → one map-side-combinable
    * (doc, bucket) groupBy → per-doc assembly via map lookup over a
    * static sequence; no shuffle carries strings past the first
    * groupBy. Output: (id, embedding array<double>). */
  def hashEmbedding(docs: DataFrame, id: String = "doc_id",
      textCol: String = "text", dim: Int = 16): DataFrame = {
    val Q = 1000000L
    val tok = docs.select(col(id), explode(tokens(col(textCol))).as("tok"))
    val bucketed = tok.select(col(id),
      floor(Sketch.md5Fraction(concat(lit("b|"), col("tok"))) * dim)
        .cast("int").as("bk"),
      (floor(Sketch.md5Fraction(concat(lit("w|"), col("tok"))) * (2 * Q))
        .cast("long") - Q).as("w"))
    bucketed.groupBy(col(id), col("bk")).agg(sum("w").as("s"))
      .groupBy(col(id))
      .agg(map_from_entries(collect_list(struct(col("bk"), col("s"))))
        .as("__m"))
      .select(col(id), expr(
        s"transform(sequence(0, ${dim - 1}), " +
          s"i -> coalesce(__m[i], 0L) / ${Q}.0)").as("embedding"))
  }

  /** Per-document coverage of the corpus' top-`vocabSize` token
    * vocabulary: token total, out-of-vocabulary occurrences, and the
    * OOV rate — what a tokenizer-training / data-mixing pipeline
    * watches when sizing a vocabulary.
    *
    * Plan shape: one map-side-combinable token groupBy for corpus
    * frequencies; the vocab cut is a distributed sort+limit
    * (TakeOrdered — no single-partition window) with a (freq desc,
    * token) tie-break so the cut replays identically anywhere; the
    * vocab then BROADCASTS into a left join against the exploded
    * tokens (vocabSize rows, never a corpus shuffle); one final doc
    * groupBy. */
  def vocabCoverage(docs: DataFrame, id: String = "doc_id",
      textCol: String = "text", vocabSize: Int = 65536): DataFrame = {
    val tok = docs.select(col(id), explode(tokens(col(textCol))).as("tok"))
    val vocab = tok.groupBy("tok").agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("tok")).limit(vocabSize)
      .select(col("tok"), lit(1).as("__in"))
    tok.join(broadcast(vocab), Seq("tok"), "left")
      .groupBy(col(id)).agg(
        count(lit(1)).as("n_tokens"),
        sum(when(col("__in").isNull, 1L).otherwise(0L)).as("n_oov"))
      .withColumn("oov_rate",
        round(col("n_oov").cast("double") / col("n_tokens"), 4))
  }

  /** Hashed naive-Bayes text classifier MODEL, trained relationally —
    * the fastText-style linear quality/language gate of a curation
    * pipeline (DCLM-style classifier filtering) with the training loop
    * replaced by two map-side-combinable groupBys: no driver-side
    * optimizer, no model artifact beyond a (bucket, weight) table.
    *
    * Tokens hash into `dim` buckets (same `md5frac("b|"+tok)` bucket
    * hash as [[hashEmbedding]]); per-bucket weight is the add-1
    * smoothed class log-likelihood ratio
    * `ln((cPos+1)/(nPos+dim)) − ln((cNeg+1)/(nNeg+dim))`, quantized to
    * 1e-6 longs (the LM family's determinism discipline). The model is
    * DENSE — all `dim` buckets are materialized so unseen-bucket
    * smoothing mass is IN the table, not a scorer special case — plus
    * a `bucket = -1` row carrying the doc-count class prior.
    * Output: (bk, w_q). */
  def nbModel(docs: DataFrame, isPos: Column, textCol: String = "text",
      dim: Int = 1024): DataFrame = {
    val base = docs.select(isPos.cast("long").as("y"),
      col(textCol).as("__text"))
    val tok = base.select(col("y"), explode(tokens(col("__text"))).as("tok"))
    val counts = tok
      .select(col("y"),
        floor(Sketch.md5Fraction(concat(lit("b|"), col("tok"))) * dim)
          .cast("int").as("bk"))
      .groupBy("bk").agg(sum(col("y")).as("cp"),
        sum(lit(1L) - col("y")).as("cn"))
    val dense = docs.sparkSession.range(dim)
      .select(col("id").cast("int").as("bk"))
      .join(counts, Seq("bk"), "left")
      .select(col("bk"), coalesce(col("cp"), lit(0L)).as("cp"),
        coalesce(col("cn"), lit(0L)).as("cn"))
    val totals = counts.agg(sum("cp").as("np"), sum("cn").as("nn"))
    val w = dense.crossJoin(broadcast(totals)).select(col("bk"),
      floor((log((col("cp") + 1).cast("double") / (col("np") + dim)) -
        log((col("cn") + 1).cast("double") / (col("nn") + dim))) * 1e6)
        .cast("long").as("w_q"))
    val prior = base.agg(sum(col("y")).as("npos"),
      sum(lit(1L) - col("y")).as("nneg"))
      .select(lit(-1).as("bk"),
        floor((log((col("npos") + 1).cast("double")) -
          log((col("nneg") + 1).cast("double"))) * 1e6)
          .cast("long").as("w_q"))
    w.unionByName(prior)
  }

  /** Score documents against a [[nbModel]] table: per-token bucket
    * weights summed as exact longs plus the prior, one divide at the
    * end; `pred` = score > 0. The model (dim+1 rows) BROADCASTS into
    * the exploded-token join — the corpus never shuffles for it; one
    * doc groupBy ends the plan. Output: (id, n_tokens, score, pred). */
  def nbScore(docs: DataFrame, model: DataFrame, id: String = "doc_id",
      textCol: String = "text", dim: Int = 1024): DataFrame = {
    val prior = model.where(col("bk") === -1)
      .select(col("w_q").as("__prior_q"))
    docs.select(col(id), explode(tokens(col(textCol))).as("tok"))
      .select(col(id),
        floor(Sketch.md5Fraction(concat(lit("b|"), col("tok"))) * dim)
          .cast("int").as("bk"))
      .join(broadcast(model.where(col("bk") >= 0)), Seq("bk"))
      .groupBy(col(id))
      .agg(count(lit(1)).as("n_tokens"), sum(col("w_q")).as("__s_q"))
      .crossJoin(broadcast(prior))
      .select(col(id), col("n_tokens"),
        // 6 dp = the quantization grid itself: scores are exact micros,
        // so rounding any COARSER hits exact half-boundaries where
        // Spark (shortest-decimal HALF_UP) and other engines (binary
        // half-away) disagree
        round((col("__s_q") + col("__prior_q")).cast("double") / 1e6, 6)
          .as("score"),
        (col("__s_q") + col("__prior_q") > 0).cast("long").as("pred"))
  }

  /** Composite C4/Gopher-style heuristic document filter. One row per
    * doc: the load-bearing metrics, `keep` (1/0), and `reasons` — the
    * failed rules comma-joined in a FIXED order, empty when kept — the
    * audit shape a curation pipeline reports drop composition with.
    *
    * Rules (each a knob; defaults are Gopher-ish bounds):
    *   - too_short / too_long: whitespace token count outside
    *     [minTokens, maxTokens];
    *   - word_len: mean word length outside
    *     [minMeanWordLen, maxMeanWordLen];
    *   - repetitive_token / repetitive_bigram: top token / bigram
    *     frequency concentration above the cap;
    *   - dup_heavy: fraction of tokens occurring >= 2 times above cap.
    *
    * All thresholds compare the ROUNDED (4 dp) published metrics, so
    * the verdict replays identically from the metric columns alone.
    * Cost: the repetitionStats groupBy is the only shuffle; everything
    * else is per-row codegen. */
  /** Deterministic piece vocabulary for [[wordpieceSegment]]: the top
    * `n` corpus words (≥ 2 codepoints — single codepoints are the
    * tokenizer's implicit fallback) by (count desc, word asc). The
    * bounded `n`-row collect is the sanctioned driver-local finish
    * (kmeans++ precedent): a tokenizer vocabulary is a build-once
    * artifact of bounded size, derived here so the whole query is a
    * pure function of the corpus — production passes its own trained
    * vocab straight to [[wordpieceSegment]] instead. The derivation is
    * one map-side-combinable token groupBy + a TakeOrdered n-row cut. */
  def topWordVocab(docs: DataFrame, n: Int,
      textCol: String = "text"): Seq[String] =
    docs.select(explode(tokens(col(textCol))).as("t"))
      .where(length(col("t")) >= 2)
      .groupBy("t").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("t"))
      .limit(n)
      .collect().map(_.getString(0)).toSeq

  /** Wordpiece inference over every document: greedy longest-match
    * segmentation of each whitespace word against `vocab`, single
    * codepoint as the unmatched fallback — exact token counts and
    * boundaries under a FIXED vocabulary, the tokenize step every
    * training pipeline runs before packing. Executed by the native
    * codegen'd [[graft.functions.expressions.WordpieceSegment]] (one
    * codepoint-trie walk per row, whole-stage-codegen fused); the
    * DuckDB oracle replays the same greedy semantics as a recursive
    * per-position CTE. Purely per-row: no shuffle, no state — the
    * vocab rides into codegen as a plan reference (broadcast-sized by
    * construction).
    *
    * Output: id, n_words, segmented — pieces '|'-joined within words,
    * words ' '-joined (space runs round-trip), so the full
    * segmentation is one hash-checkable string. */
  def wordpieceSegment(docs: DataFrame, vocab: Seq[String],
      id: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.select(col(id),
      size(tokens(col(textCol))).cast("long").as("n_words"),
      org.apache.spark.sql.graft.CatalystBridge.wordpieceSegment(
        lower(col(textCol)), vocab).as("segmented"))

  /** Byte-pair-encoding MERGE TRAINING — the learning half of the
    * tokenization story ([[wordpieceSegment]] is inference under a
    * fixed vocab; this derives the vocab's merge rules from the corpus
    * itself, the Sennrich et al. 2016 algorithm).
    *
    * Scale shape (the same split every production BPE trainer uses —
    * sentencepiece, HF tokenizers): the CORPUS-proportional work is one
    * pass — a word-frequency groupBy — and every training iteration
    * runs over the DISTINCT-WORD table, which Zipf keeps orders of
    * magnitude smaller than the corpus. Per iteration: one
    * map-side-combinable pair-count groupBy over the vocab, a 1-row
    * argmax fetch (the bounded driver finish, like k-means centroids),
    * and one per-word HOF fold applying the merge — no shuffle beyond
    * the pair groupBy, no window anywhere. `merges` sequential jobs are
    * inherent to BPE (rule i+1's counts depend on rule i's rewrite).
    *
    * Merge application is the standard greedy single pass,
    * left-to-right, non-overlapping (aaaa + (a,a) → aa,aa — not
    * aa,a,a), via an `aggregate` HOF whose accumulator rebuilds the
    * symbol array. Ties on pair count break lexicographically (l, r) —
    * deterministic cross-engine; the DuckDB oracle replays every
    * iteration on a '|sym|'-encoded string whose non-overlapping
    * left-to-right `replace` is semantically identical to the fold.
    *
    * Words: whitespace-split, lowercased, restricted to [a-z0-9] (the
    * alphabet guarantee the oracle's encoding relies on), length >= 2.
    *
    * Output: one row per learned rule — (step, lhs, rhs, merged,
    * pair_count), in training order. */
  def bpeTrain(docs: DataFrame, merges: Int, textCol: String = "text",
      minWordLen: Int = 2): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val words = docs
      .select(explode(tokens(col(textCol))).as("w0"))
      .select(regexp_replace(col("w0"), "[^a-z0-9]", "").as("w"))
      .where(length(col("w")) >= minWordLen)
      .groupBy("w").agg(count(lit(1)).as("freq"))
    // initial segmentation: one symbol per character
    var seg = words
      .select(col("freq"), split(col("w"), "(?!^)(?=.)").as("syms"))
      .localCheckpoint()
    val out = Seq.newBuilder[(Int, String, String, String, Long)]
    var step = 1
    var exhausted = false
    while (step <= merges && !exhausted) {
      val best = seg.where(size(col("syms")) >= 2)
        .select(col("freq"), explode(zip_with(
          slice(col("syms"), lit(1), size(col("syms")) - 1),
          slice(col("syms"), lit(2), size(col("syms")) - 1),
          (a, b) => struct(a.as("l"), b.as("r")))).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("freq")).as("c"))
        .orderBy(col("c").desc, col("l"), col("r"))
        .limit(1).collect()
      if (best.isEmpty) exhausted = true
      else {
        val l = best(0).getString(0)
        val r = best(0).getString(1)
        val c = best(0).getLong(2)
        val m = l + r
        out += ((step, l, r, m, c))
        seg = seg
          .withColumn("syms", bpeApplyOne(col("syms"), l, r))
          .localCheckpoint() // one execution per round + flat lineage
        step += 1
      }
    }
    out.result().toDF("step", "lhs", "rhs", "merged", "pair_count")
  }

  /** PRODUCTION-VOCABULARY BPE training (VERDICT r16 #2): one
    * distributed pass, then the merge loop in memory on the driver.
    *
    * [[bpeTrain]] is the cross-engine-verifiable form — every
    * iteration is a Spark job whose pair counts the DuckDB oracle
    * replays — but one job per learned merge makes a 30k-merge
    * production vocabulary ~30k sequential jobs: structurally
    * unreachable, exactly as interpreted inference was before
    * BpeApplyAll. This trainer is the split every production BPE
    * implementation uses (sentencepiece, HF tokenizers): the
    * CORPUS-proportional work is ONE word-frequency groupBy; the
    * merge loop then runs over the bounded distinct-word table with
    * INCREMENTAL pair counts — each merge touches only the words
    * containing its pair (an inverted pair→words index), and the
    * argmax pops from a lazy-deletion priority queue instead of
    * rescanning, so 30k merges take seconds where 30k jobs took
    * hours.
    *
    * Driver-fold bound (the repo's vocab/centroid/manifest rule):
    * the collected table is DISTINCT WORDS, which Zipf keeps orders
    * of magnitude under corpus size; `maxWords` caps it LOUD
    * (default [[BpeTrainMaxWords]]) — at crawl scale prune the long
    * tail first with `minFreq` (a freq-1 garbage string can never
    * win a merge against a real pair, it only costs memory; note a
    * minFreq above 1 is a different corpus than [[bpeTrain]] sees,
    * so equivalence holds at the default only).
    *
    * Algorithm, tie-break (count desc, then (l, r) lexicographic)
    * and the greedy non-overlapping merge application are
    * bit-identical to [[bpeTrain]] — BpeTrainHybridSpec pins
    * row-for-row equality against it, and a from-scratch-recount
    * differential pins the incremental bookkeeping at depth. Output
    * schema identical: (step, lhs, rhs, merged, pair_count). */
  def bpeTrainHybrid(docs: DataFrame, merges: Int,
      textCol: String = "text", minWordLen: Int = 2, minFreq: Long = 1L,
      maxWords: Int = BpeTrainMaxWords): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val wordRows = docs
      .select(explode(tokens(col(textCol))).as("w0"))
      .select(regexp_replace(col("w0"), "[^a-z0-9]", "").as("w"))
      .where(length(col("w")) >= minWordLen)
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .where(col("freq") >= minFreq)
      .limit(maxWords + 1)
      .collect()
    require(wordRows.length <= maxWords,
      s"bpeTrainHybrid: over $maxWords distinct words — raise minFreq " +
        "to prune the long tail (freq-1 strings cannot win merges)")
    val freqs = wordRows.map(_.getLong(1))
    val syms: Array[Array[String]] =
      wordRows.map(_.getString(0).map(_.toString).toArray)
    val counts = new scala.collection.mutable.HashMap[(String, String), Long]()
    val occ = new scala.collection.mutable.HashMap[(String, String),
      scala.collection.mutable.BitSet]()
    // max count first, then LEAST (l, r) — bpeTrain's ORDER BY c DESC, l, r
    val pq = new scala.collection.mutable.PriorityQueue[
      (Long, String, String)]()(new Ordering[(Long, String, String)] {
      def compare(a: (Long, String, String), b: (Long, String, String)): Int = {
        if (a._1 != b._1) java.lang.Long.compare(a._1, b._1)
        else if (a._2 != b._2) b._2.compareTo(a._2)
        else b._3.compareTo(a._3)
      }
    })
    def addPairs(i: Int, sign: Long): Unit = {
      val s = syms(i)
      val f = freqs(i) * sign
      var j = 0
      while (j + 1 < s.length) {
        val p = (s(j), s(j + 1))
        val c = counts.getOrElse(p, 0L) + f
        if (c <= 0L) counts.remove(p) else counts(p) = c
        if (sign > 0)
          occ.getOrElseUpdate(p, new scala.collection.mutable.BitSet()) += i
        j += 1
      }
    }
    var i = 0
    while (i < syms.length) { addPairs(i, 1L); i += 1 }
    counts.foreach { case ((l, r), c) => pq.enqueue((c, l, r)) }
    def applyMerge(s: Array[String], l: String, r: String): Array[String] = {
      val out = new scala.collection.mutable.ArrayBuffer[String](s.length)
      var j = 0
      while (j < s.length) {
        if (j + 1 < s.length && s(j) == l && s(j + 1) == r) {
          out += l + r; j += 2
        } else { out += s(j); j += 1 }
      }
      out.toArray
    }
    val out = Seq.newBuilder[(Int, String, String, String, Long)]
    var step = 1
    var exhausted = false
    while (step <= merges && !exhausted) {
      // lazy deletion: an entry is live iff its count snapshot is
      // still the pair's current count (every change re-enqueues)
      var top: Option[(Long, String, String)] = None
      while (top.isEmpty && pq.nonEmpty) {
        val (c, l, r) = pq.dequeue()
        if (counts.get((l, r)).contains(c)) top = Some((c, l, r))
      }
      top match {
        case None => exhausted = true
        case Some((c, l, r)) =>
          out += ((step, l, r, l + r, c))
          val touched = occ.remove((l, r))
            .getOrElse(new scala.collection.mutable.BitSet())
          val dirty = new scala.collection.mutable.HashSet[(String, String)]()
          touched.foreach { w =>
            val s = syms(w)
            var j = 0
            var has = false
            while (!has && j + 1 < s.length) {
              has = s(j) == l && s(j + 1) == r; j += 1
            }
            if (has) { // stale index entries skip
              var k = 0
              while (k + 1 < s.length) {
                dirty += ((s(k), s(k + 1))); k += 1
              }
              addPairs(w, -1L)
              syms(w) = applyMerge(s, l, r)
              addPairs(w, 1L)
              val ns = syms(w)
              k = 0
              while (k + 1 < ns.length) {
                dirty += ((ns(k), ns(k + 1))); k += 1
              }
            }
          }
          counts.remove((l, r))
          dirty.foreach { p =>
            counts.get(p).foreach(c2 => pq.enqueue((c2, p._1, p._2)))
          }
          step += 1
      }
    }
    out.result().toDF("step", "lhs", "rhs", "merged", "pair_count")
  }

  /** [[bpeTrainHybrid]]'s driver-fold cap: 2M distinct words ≈ a few
    * hundred MB of symbol arrays — past every production vocab run
    * (sentencepiece defaults to ~1M sentences); raise `minFreq`
    * before raising this. */
  val BpeTrainMaxWords: Int = 1 << 21

  /** One BPE merge rule applied to a symbol array — greedy
    * left-to-right single pass, non-overlapping (the merged symbol
    * never re-merges with its left neighbor in the same pass). */
  def bpeApplyOne(syms: Column, l: String, r: String): Column =
    aggregate(syms, array().cast("array<string>"),
      (acc, x) =>
        // try_element_at: NULL (not ANSI error) on the empty
        // accumulator; NULL condition falls through to otherwise
        when(try_element_at(acc, lit(-1)) === lit(l) && x === lit(r),
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(l + r))))
          .otherwise(concat(acc, array(x))))

  /** Segment one (lowercased, [a-z0-9]) word column with a learned
    * merge list, in training order — BPE inference as ONE native
    * codegen'd per-row scan
    * ([[graft.functions.expressions.BpeApplyAll]]), merge-count-
    * independent per word, so a production 30k-merge vocabulary costs
    * the same scan as the board's 3 merges. Bit-identical to
    * [[bpeApplyHof]] (pinned by BpeApplyAllSpec). */
  def bpeApply(word: Column, merges: Seq[(String, String)]): Column =
    org.apache.spark.sql.graft.CatalystBridge.bpeApplyAll(word, merges)

  /** The declarative reference formulation of [[bpeApply]] — rule i's
    * fold feeds rule i+1's, one interpreted `aggregate`-HOF pass per
    * merge rule (the shape the DuckDB oracle replays). Kept as the
    * equivalence baseline; cost and plan size are linear in the merge
    * count, so serving uses the native form. */
  def bpeApplyHof(word: Column, merges: Seq[(String, String)]): Column =
    merges.foldLeft(split(word, "(?!^)(?=.)")) {
      case (syms, (l, r)) => bpeApplyOne(syms, l, r)
    }

  /** Persist a trained BPE merge table — the tokenizer artifact of the
    * build-once/serve-cheap family (tf/sig/pq indexes): train pays the
    * corpus passes once, every ingest batch [[bpeEncodeWith]]s against
    * the parquet merge table. The table is merge-count-sized (KB).
    * Returns the merge count actually learned, from the write itself
    * (early stop can yield fewer than requested). */
  def bpeIndexWrite(docs: DataFrame, merges: Int, path: String,
      textCol: String = "text"): Long =
    graft.functions.CountedWrite(bpeTrain(docs, merges, textCol))(
      _.coalesce(1).write.mode("overwrite").parquet(path))

  /** Load a persisted merge table in training order — a driver-local
    * finish bounded by the MERGE COUNT (tokenizer vocabularies are
    * plan constants, like kmeans centroids). */
  def bpeIndexRead(spark: SparkSession, path: String): Seq[(String, String)] =
    spark.read.parquet(path).orderBy("step")
      .select("lhs", "rhs").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq

  /** [[bpeEncode]] against a persisted merge table. */
  def bpeEncodeWith(docs: DataFrame, indexPath: String,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    bpeEncode(docs, bpeIndexRead(docs.sparkSession, indexPath),
      textCol, idCol)

  /** Corpus BPE INFERENCE under a learned merge list — the serving
    * half of [[bpeTrain]] (train once, encode every ingest batch):
    * per document, the word stream is cleaned exactly as training
    * cleaned it, each word segmented by [[bpeApply]]'s per-row
    * expression chain (no join, no shuffle in the scan — the merges
    * are plan constants, the natural shape for a ≤ vocab-size rule
    * list), and the document reassembled in word order.
    *
    * Output: (idCol, n_words, n_pieces, segmented) — segmented joins
    * each word's pieces with '|' and words with ' '. Documents with
    * no retained word (all words under `minWordLen` after cleaning)
    * are absent, like an empty GROUP BY group. */
  def bpeEncode(docs: DataFrame, merges: Seq[(String, String)],
      textCol: String = "text", idCol: String = "doc_id",
      minWordLen: Int = 2): DataFrame = {
    val w = docs
      .select(col(idCol),
        posexplode(tokens(col(textCol))).as(Seq("pos", "w0")))
      .select(col(idCol), col("pos"),
        regexp_replace(col("w0"), "[^a-z0-9]", "").as("w"))
      .where(length(col("w")) >= minWordLen)
      .withColumn("pieces", bpeApply(col("w"), merges))
    w.groupBy(idCol)
      .agg(count(lit(1)).as("n_words"),
        sum(size(col("pieces"))).as("n_pieces"),
        concat_ws(" ", transform(
          array_sort(collect_list(struct(col("pos"),
            array_join(col("pieces"), "|").as("seg")))),
          s => s.getField("seg"))).as("segmented"))
  }

  /** Parse a GPT-2-style `merges.txt` (HF tokenizers' BPE export —
    * the format a REAL trained tokenizer arrives in): one merge rule
    * per line as `left right` (single space; symbols never contain a
    * raw space — the byte-level alphabet maps it to 'Ġ'), `#…` header
    * lines and blank lines skipped, file order = training order.
    * Returns the same (l, r) list [[bpeEncode]]/[[byteBpeEncode]]
    * consume, so a user can serve under the exact vocabulary their
    * training run uses instead of a corpus-trained approximation.
    * Read through Hadoop FS (works for local/DFS paths alike); merge
    * tables are KB–MB driver constants like every tokenizer artifact
    * here. */
  def gpt2MergesRead(spark: SparkSession, path: String): Seq[(String, String)] = {
    val txt = spark.sparkContext.wholeTextFiles(path).collect()
      .sortBy(_._1).map(_._2).mkString("\n")
    txt.split("\n", -1).iterator
      .map(_.stripSuffix("\r"))
      .filter(l => l.nonEmpty && !l.startsWith("#"))
      .map { l =>
        val parts = l.split(" ", -1)
        require(parts.length == 2 && parts.forall(_.nonEmpty),
          s"gpt2MergesRead: malformed merge line '$l' — expected " +
            "'left right' (single space)")
        (parts(0), parts(1))
      }.toSeq
  }

  /** GPT-2's byte→unicode alphabet map as a column (see
    * [[graft.functions.expressions.ByteLevelChars]]): the string's
    * UTF-8 bytes each become one printable char (space → 'Ġ'), so
    * byte-level merge rules are plain strings and ANY unicode text
    * tokenizes over a closed 256-symbol alphabet. */
  def byteLevelChars(c: Column): Column =
    org.apache.spark.sql.graft.CatalystBridge.byteLevelChars(c)

  /** Byte-level BPE corpus encoding — [[bpeEncode]] under the
    * alphabet a production LLM tokenizer actually uses: pre-tokens
    * are the whitespace-split words with their LEADING SPACE kept
    * (every pre-token after the first re-attaches ' ', which the byte
    * map turns into the 'Ġ' word-boundary marker — the GPT-2
    * convention), each pre-token's UTF-8 bytes map through
    * [[byteLevelChars]], and the loaded merge list applies in one
    * native [[graft.functions.expressions.BpeApplyAll]] scan.
    * Documented simplification vs the full GPT-2 pre-tokenizer: no
    * contraction/category splitting and space RUNS collapse (empty
    * split tokens drop) — the repo's whitespace word model, kept so
    * the DuckDB oracle replays the walk exactly (the full regex needs
    * lookahead RE2 lacks); token budgets on natural text are
    * unaffected, and the merge WALK itself is bit-faithful.
    *
    * No case folding, no alphabet restriction — bytes are bytes
    * (a real tokenizer is case-sensitive; callers wanting the
    * engine's cleaned domain clean the column first). Output:
    * (idCol, n_words, n_pieces, segmented), docs with no retained
    * pre-token absent — [[bpeEncode]]'s contract. */
  def byteBpeEncode(docs: DataFrame, merges: Seq[(String, String)],
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val w = docs
      .select(col(idCol),
        posexplode(split(col(textCol), " ")).as(Seq("pos", "w0")))
      .where(length(col("w0")) >= 1)
      .select(col(idCol), col("pos"),
        byteLevelChars(when(col("pos") === 0, col("w0"))
          .otherwise(concat(lit(" "), col("w0")))).as("w"))
      .withColumn("pieces", bpeApply(col("w"), merges))
    w.groupBy(idCol)
      .agg(count(lit(1)).as("n_words"),
        sum(size(col("pieces"))).as("n_pieces"),
        concat_ws(" ", transform(
          array_sort(collect_list(struct(col("pos"),
            array_join(col("pieces"), "|").as("seg")))),
          s => s.getField("seg"))).as("segmented"))
  }

  /** token → hashed-unigram bucket in [0, buckets): the feature hash
    * DSIR scores against. The "ds|" prefix decorrelates it from the
    * engine's other md5-fraction draws (sampling "ws|"/"em|", minhash
    * bands) so reusing one id/token column across operators never
    * couples their randomness. */
  private def dsirBucket(t: Column, buckets: Int): Column =
    floor(Sketch.md5Fraction(concat(lit("ds|"), t)) * buckets).cast("long")

  /** DSIR bucket-weight TABLE (Xie et al., NeurIPS 2023 "Data
    * Selection for Language Models via Importance Resampling"): for
    * every hashed-unigram bucket b seen in the raw pool, the quantized
    * log importance ratio
    *
    *   wq(b) = floor( [ ln p_tgt(b) − ln p_raw(b) ] · 1e6 )
    *
    * under two add-1-smoothed hashed bag-of-unigrams LMs:
    * p(b) = (c(b)+1)/(N+B). This is the persistable artifact a
    * production deployment trains ONCE (target = the trusted
    * high-quality corpus, raw = the crawl pool — a sample of each
    * suffices) and reuses to score every incoming batch via
    * [[dsirWeights]]'s scoring join — the hashed-LM variant of the
    * [[unigramLm]] / [[unigramLogLossWith]] split.
    *
    * Plan: one token-explode + bucket groupBy per side (map-side
    * combinable — at most B partial rows per mapper), broadcast 1-row
    * totals, and a left join of raw buckets against target buckets
    * (both ≤ B rows). Output: (b, wq) with ≤ `buckets` rows — bounded
    * by B regardless of corpus size, hence broadcastable at any scale.
    * Determinism: the per-bucket term is quantized to a 1e-6 grid
    * long; the only doubles that cross engines are ln() inputs built
    * from exact integer counts. */
  /** (bucket, count) of a corpus' tokens — the one count pipeline both
    * the relational weight table and the driver-local scorer consume
    * (a single definition keeps their bit-equality structural). */
  private def dsirBucketCounts(df: DataFrame, buckets: Int,
      textCol: String, as: String): DataFrame =
    df.select(explode(tokens(col(textCol))).as("t"))
      .select(dsirBucket(col("t"), buckets).as("b"))
      .groupBy("b").agg(count(lit(1)).as(as))

  def dsirBucketWeights(raw: DataFrame, target: DataFrame,
      buckets: Int = 4096, textCol: String = "text"): DataFrame = {
    require(buckets >= 2, s"dsir: buckets must be >= 2, got $buckets")
    val rc = dsirBucketCounts(raw, buckets, textCol, "cr")
    val tc = dsirBucketCounts(target, buckets, textCol, "ct")
    val nr = rc.agg(sum("cr").as("nr"))
    val nt = tc.agg(sum("ct").as("nt"))
    rc.join(tc, Seq("b"), "left")
      .crossJoin(broadcast(nr)).crossJoin(broadcast(nt))
      .select(col("b"),
        floor((log((coalesce(col("ct"), lit(0L)) + 1.0) /
            (col("nt") + buckets)) -
          log((col("cr") + 1.0) / (col("nr") + buckets))) * 1000000)
          .cast("long").as("wq"))
  }

  /** Driver-local [[graft.functions.expressions.DsirScorer]] from the
    * same counts as [[dsirBucketWeights]], extended to ALL `buckets`
    * slots (absent raw buckets take the cr = 0 default — required to
    * score documents the raw sample never saw, i.e. the streaming
    * gate). The two ≤ B-row collects are the sanctioned bounded
    * driver-local finish; in production both sides are typically
    * trained on samples. Arithmetic is kept in the exact op order of
    * the relational formulation so the two paths stay bit-identical. */
  def dsirScorer(raw: DataFrame, target: DataFrame, buckets: Int = 4096,
      textCol: String = "text")
      : graft.functions.expressions.DsirScorer = {
    def collected(df: DataFrame): Map[Int, Long] =
      dsirBucketCounts(df, buckets, textCol, "c")
        .collect().map(r => r.getLong(0).toInt -> r.getLong(1)).toMap
    val rc = collected(raw)
    val tc = collected(target)
    val nr = rc.values.sum
    val nt = tc.values.sum
    val w = Array.tabulate(buckets) { b =>
      math.floor((math.log((tc.getOrElse(b, 0L) + 1.0) / (nt + buckets)) -
        math.log((rc.getOrElse(b, 0L) + 1.0) / (nr + buckets))) *
        1000000).toLong
    }
    graft.functions.expressions.DsirScorer(buckets, w)
  }

  /** DSIR importance weights + deterministic Gumbel-top-k selection:
    * score every raw-pool document by how target-like its hashed
    * bag-of-unigrams is — logw(d) = Σ_tokens wq(bucket(t))/1e6 against
    * [[dsirScorer]]'s weight table — and emit the k docs DSIR's
    * importance resampling selects. Sampling WITHOUT replacement
    * ∝ w(d) is exactly the Gumbel-top-k: sel(d) = logw(d) + G(d) with
    * G = −ln(−ln u); replacing the RNG with the id-hash fraction u
    * makes the selected set a pure function of (corpus, target, B, k)
    * — reproducible across runs, partitionings, and engines (the
    * DuckDB oracle replays the full selection).
    *
    * Plan: scoring is the native per-row
    * [[graft.functions.expressions.DsirScore]] — the bounded weight
    * table rides into codegen as a plan reference, so the scan has NO
    * explode, NO join, and NO shuffle (the relational twin explodes a
    * row per token and re-groups per doc; the oracle still replays
    * that formulation and the spec pins equality). The k-row cut is a
    * global sort-limit, which Spark plans as TakeOrdered —
    * per-partition partial top-k, no single-task sort. Only the two
    * bounded LM-count aggregations shuffle, and those move ≤ B rows
    * per mapper. Ties in the quantized score (prob ~2⁻³²) break by
    * id, keeping the cut total.
    *
    * Output: id, n_tokens, logw_nats (4 dp), sel_score (4 dp), best
    * first. */
  def dsirWeights(raw: DataFrame, target: DataFrame, buckets: Int = 4096,
      k: Int = 50, id: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val sc = dsirScorer(raw, target, buckets, textCol)
    // u = 0 (md5 prefix 00000000, prob 2^-32) would send -ln(-ln u)
    // to ln(0), which Spark nulls and other engines -inf — pin the
    // draw to the grid's smallest positive cell in BOTH engines
    val u = greatest(
      Sketch.md5Fraction(concat(lit("dg|"), col(id).cast("string"))),
      lit(1.0 / 4294967296.0))
    val gq = floor(negate(log(negate(log(u)))) * 1000000).cast("long")
    // NULL text matches the relational/oracle semantics (explode of a
    // null token array emits nothing): the doc is dropped, not ranked
    // with null scores (DESC sorts nulls last — they'd pad a small
    // corpus's selected set with garbage rows)
    raw.where(col(textCol).isNotNull)
      .select(col(id),
        size(tokens(col(textCol))).cast("long").as("n_tokens"),
        org.apache.spark.sql.graft.CatalystBridge.dsirScore(
          lower(col(textCol)), sc).as("__swq"))
      .select(col(id), col("n_tokens"), col("__swq"),
        (col("__swq") + gq).as("__sq"))
      .orderBy(col("__sq").desc, col(id))
      .limit(k)
      .select(col(id), col("n_tokens"),
        round(col("__swq").cast("double") / 1000000.0, 4).as("logw_nats"),
        round(col("__sq").cast("double") / 1000000.0, 4).as("sel_score"))
  }

  def heuristicFilter(docs: DataFrame, id: String = "doc_id",
      textCol: String = "text", minTokens: Int = 25, maxTokens: Int = 5000,
      minMeanWordLen: Double = 3.0, maxMeanWordLen: Double = 10.0,
      maxTopTokenFrac: Double = 0.15, maxTopBigramFrac: Double = 0.12,
      maxDupTokenFrac: Double = 0.95): DataFrame = {
    val text = col(textCol)
    val nt = size(tokens(text)).cast("double")
    val mwl = length(translate(text, " ", "")).cast("double") /
      greatest(nt, lit(1.0))
    val perRow = docs.select(col(id), round(mwl, 4).as("mean_word_len"))
    val joined = perRow.join(repetitionStats(docs, id, textCol), Seq(id))
    val reasons = concat_ws(",",
      when(col("n_tokens") < minTokens, "too_short"),
      when(col("n_tokens") > maxTokens, "too_long"),
      when(col("mean_word_len") < minMeanWordLen ||
        col("mean_word_len") > maxMeanWordLen, "word_len"),
      when(col("top_token_frac") > maxTopTokenFrac, "repetitive_token"),
      when(col("top_bigram_frac") > maxTopBigramFrac, "repetitive_bigram"),
      when(col("dup_token_frac") > maxDupTokenFrac, "dup_heavy"))
    joined.select(
      col(id), col("n_tokens"), col("mean_word_len"),
      col("top_token_frac"), col("top_bigram_frac"), col("dup_token_frac"),
      reasons.as("reasons"),
      when(reasons === "", 1L).otherwise(0L).as("keep"))
  }
}
