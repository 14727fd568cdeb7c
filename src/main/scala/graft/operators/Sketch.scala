package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Cardinality sketches for distinct-count at scale.
  *
  * Two tiers:
  *   - production: Spark's built-in `approx_count_distinct` (HLL++,
  *     mergeable partial aggregates, one map-side-combined shuffle) —
  *     use it when the estimate only needs to be self-consistent;
  *   - cross-engine deterministic: [[kmvDistinct]], a K-Minimum-Values
  *     sketch (Bar-Yossef et al. 2002) built from md5 fractions, which
  *     any SQL engine reproduces bit-for-bit — so the DuckDB oracle can
  *     verify it (HLL implementations differ across engines and can't
  *     be oracled).
  */
object Sketch {

  /** hash fraction in [0,1): first 8 hex chars of md5 as a 32-bit
    * integer over 2^32 — the engine's deterministic randomness source
    * (minhash bands, simhash, embeddings, sampling, KMV). Computed by
    * the native [[graft.functions.expressions.Md5Fraction]];
    * [[md5FractionHof]] keeps the per-hex-digit horner twin the DuckDB
    * oracle mirrors, and SketchSpec pins their equality. */
  def md5Fraction(v: Column): Column =
    org.apache.spark.sql.graft.CatalystBridge.md5Fraction(v.cast("string"))

  /** `md5()` with a thread-local digest (identical output) — for the
    * per-shingle/per-token hot paths; see
    * [[graft.functions.expressions.Md5Hex]]. */
  def md5Hex(v: Column): Column =
    org.apache.spark.sql.graft.CatalystBridge.md5Hex(v)

  /** The declarative per-digit horner formulation of [[md5Fraction]] —
    * the exact arithmetic any engine reruns (the oracle SQL's shape). */
  def md5FractionHof(v: Column): Column = {
    val h = md5(v.cast("string"))
    val value = (0 until 8).map { i =>
      (instr(lit("0123456789abcdef"), substring(h, i + 1, 1)) - 1)
        .cast("double") * math.pow(16.0, 7 - i)
    }.reduce(_ + _)
    value / 4294967296.0
  }

  /** KMV distinct-count estimate per group: with U_k the k-th smallest
    * distinct hash fraction, estimate = (k-1)/U_k; exact count when a
    * group has < k distinct values.
    *
    * Plan shape: distinct (group, value) → hash → bounded-heap bottom-k
    * per group ([[graft.functions.expressions.BoundedTopK]] on the
    * negated hash — k-entry state, map-side partial, no per-group
    * sort). The heap's descending array ends at its minimum, i.e. the
    * k-th smallest hash — the only order statistic the estimator
    * reads, so ties in hfrac (impossible for distinct md5 inputs
    * anyway) cannot affect the output and the window-rank oracle
    * replays it exactly. Output: group col, n_kept, est_distinct. */
  def kmvDistinct(df: DataFrame, groupCol: String, valueCol: String,
      k: Int = 64): DataFrame = {
    val hashed = df.select(col(groupCol), col(valueCol)).distinct()
      .withColumn("hfrac", md5Fraction(col(valueCol)))
    hashed
      .groupBy(col(groupCol))
      .agg(org.apache.spark.sql.graft.CatalystBridge.topK(
        struct(negate(col("hfrac")).as("nh")), k).as("__bk"))
      .select(col(groupCol),
        size(col("__bk")).cast("long").as("n_kept"),
        negate(element_at(col("__bk"), -1).getField("nh")).as("kth"))
      .select(col(groupCol), col("n_kept"),
        round(when(col("n_kept") < k, col("n_kept").cast("double"))
          .otherwise(lit((k - 1).toDouble) / col("kth")), 4)
          .as("est_distinct"))
  }

  /** KMV set-operation sketch (Bar-Yossef et al. 2002; Beyer et al.
    * SIGMOD 2007 "On synopses for distinct value estimation"):
    * estimate |A|, |B|, |A∪B|, |A∩B| and the Jaccard similarity of the
    * DISTINCT value sets of two inputs WITHOUT joining them at full
    * width — the corpus-overlap probe ("how much of this crawl do we
    * already have?") at a scale where the exact distinct-join is the
    * thing you cannot afford.
    *
    * Each side: distinct values → md5-fraction hash → global bottom-k
    * by (hash, value). The bottom-k is a sort-limit, which Spark plans
    * as TakeOrdered with per-partition partial top-k — no single-task
    * window, no full sort, and the only shuffle per side is the
    * distinct. Everything past the two k-row sketches is sketch-local
    * (≤ 3k rows; the semi-joins and final cross-join all run against
    * broadcast-sized one-row/k-row inputs).
    *
    * Estimators: est|X| = (k−1)/U_k with U_k the k-th smallest hash
    * (exact n_kept when a side has < k distinct values); with
    * K = bottom-k of S_A ∪ S_B, jaccard = |K ∩ S_A ∩ S_B| / |K| and
    * est|A∩B| = jaccard · est|A∪B| — the standard KMV set-operation
    * composition. All randomness is the md5 fraction with a (hash,
    * value) tie-break, so any SQL engine replays the sketch — and the
    * estimates — bit-for-bit (the DuckDB oracle recomputes them, not
    * just the exact counts).
    *
    * Output: ONE row — n_kept_a, n_kept_b, n_kept_union, n_common,
    * est_a, est_b, est_union, est_jaccard, est_intersection (estimates
    * rounded to 4dp). */
  /** The bottom-k KMV sketch of `df`'s distinct `valueCol` set as a
    * k-row (v, hfrac) DataFrame — the persistable artifact a
    * production deployment stores per corpus and feeds to
    * [[kmvOverlap]]-style set operations without rescanning. Plans as
    * TakeOrderedAndProject: per-partition partial top-k, no window,
    * no full sort (PlanShapeSpec locks this). */
  def kmvSketch(df: DataFrame, valueCol: String, k: Int): DataFrame = df
    .select(col(valueCol).cast("string").as("v"))
    .where(col("v").isNotNull).distinct()
    .withColumn("hfrac", md5Fraction(col("v")))
    .orderBy(col("hfrac"), col("v")).limit(k)

  /** Merge KMV sketches: bottom-k of the DISTINCT union of sketch
    * rows. EXACTLY the corpus sketch — every global bottom-k value is
    * in its own shard's bottom-k (its hash ranks at least as well
    * within a subset), so the union loses nothing and re-cutting
    * restores the invariant: bottomk(∪ₛ bottomkₛ) = bottomk(∪ₛ Sₛ).
    * The mergeability contract that lets per-shard sketches persist
    * and roll up nightly without re-reading any shard (the
    * [[countMin]] rollup's order-statistics twin — there the grids
    * ADD, here the bottom-k re-cuts). Input: unioned (v, hfrac) rows
    * from [[kmvSketch]] calls. */
  def kmvMerge(sketches: DataFrame, k: Int): DataFrame =
    sketches.select(col("v"), col("hfrac")).distinct()
      .orderBy(col("hfrac"), col("v")).limit(k)

  /** Heavy hitters via the native Misra–Gries aggregate
    * ([[graft.functions.expressions.MisraGries]]), verified against
    * exact counts — the q_approx_distinct_hll scheme: emit the exact
    * answer plus flags asserting the sketch honored its published
    * bound, so the oracle fully verifies the row.
    *
    * Emits every value whose EXACT count strictly exceeds n/(k+1)
    * (n = total non-null rows) — precisely the set Misra–Gries
    * guarantees to surface — with `mg_found` (present in the sketch)
    * and `mg_within_bound` (exact − n/(k+1) <= sketch <= exact). Both
    * are always true when the sketch is correct; the oracle replays
    * the exact side and pins the flags to literal true.
    *
    * Plan shape: ONE pass with bounded k-entry state builds the
    * sketch (map-side combined, k rows per partition to one reducer);
    * the exact side here exists only because this is the verification
    * harness — production callers read the sketch map alone and never
    * pay the per-distinct-value shuffle. All comparisons are exact
    * long arithmetic (count·(k+1) vs n), no division. */
  def heavyHitters(df: DataFrame, valueCol: String, k: Int): DataFrame = {
    val vals = df.select(col(valueCol).cast("string").as("v"))
      .where(col("v").isNotNull)
    val sketch = vals.agg(
      count(lit(1)).as("n_total"),
      org.apache.spark.sql.graft.CatalystBridge.freqItems(col("v"), k)
        .as("mg"))
    val exact = vals.groupBy("v").agg(count(lit(1)).as("n_exact"))
    val mgCount = element_at(col("mg"), col("v"))
    exact.crossJoin(broadcast(sketch))
      .where(col("n_exact") * (k + 1) > col("n_total"))
      .select(col("v"), col("n_exact"),
        mgCount.isNotNull.as("mg_found"),
        (mgCount.isNotNull && mgCount <= col("n_exact") &&
          (col("n_exact") - mgCount) * (k + 1) <= col("n_total"))
          .as("mg_within_bound"))
      .orderBy(col("n_exact").desc, col("v"))
  }

  /** The native Count-Min sketch aggregate
    * ([[graft.functions.expressions.CountMin]]): a depth×width long
    * grid, order-independent (pure per-cell sums over the md5 `cm|`
    * cell assignment), mergeable by addition — per-shard sketches
    * roll up to the corpus sketch without rescanning. */
  def countMin(c: Column, depth: Int, width: Int): Column =
    org.apache.spark.sql.graft.CatalystBridge.countMin(c, depth, width)

  /** Point-frequency estimate from a [[countMin]] grid: `min` over the
    * key's `depth` cells — plain codegen'd column functions
    * (element_at + the native md5 fraction), no UDF. `key` must be the
    * SAME string rendering the sketch was built over. Always ≥ the
    * true count; the overshoot is other keys' mass colliding into the
    * key's cells. */
  def countMinEstimate(sketch: Column, key: Column, depth: Int,
      width: Int): Column = {
    val cells = (0 until depth).map { j =>
      element_at(sketch,
        (lit(j * width) +
          floor(md5Fraction(concat(lit(s"cm|$j|"), key)) * width))
          .cast("int") + 1)
    }
    if (cells.length == 1) cells.head else least(cells: _*)
  }

  def kmvOverlap(a: DataFrame, b: DataFrame, valueCol: String,
      k: Int = 256): DataFrame = {
    require(k >= 2, s"kmvOverlap: k must be >= 2, got $k")
    // localCheckpoint: each sketch feeds the union AND a semi-join; at
    // k rows the checkpoint is free and saves re-deriving the distinct
    val sa = kmvSketch(a, valueCol, k).localCheckpoint(false)
    val sb = kmvSketch(b, valueCol, k).localCheckpoint(false)
    val su = sa.union(sb).distinct()
      .orderBy(col("hfrac"), col("v")).limit(k)
      .localCheckpoint(false)
    val common = su
      .join(sa.select("v"), Seq("v"), "left_semi")
      .join(sb.select("v"), Seq("v"), "left_semi")
    def est(n: Column, kth: Column): Column =
      when(n < k, n.cast("double")).otherwise(lit((k - 1).toDouble) / kth)
    val aggA = sa.agg(count(lit(1)).as("n_kept_a"), max("hfrac").as("kth_a"))
    val aggB = sb.agg(count(lit(1)).as("n_kept_b"), max("hfrac").as("kth_b"))
    val aggU = su.agg(count(lit(1)).as("n_kept_union"),
      max("hfrac").as("kth_u"))
    val aggC = common.agg(count(lit(1)).as("n_common"))
    val jac = col("n_common").cast("double") /
      greatest(col("n_kept_union"), lit(1L)).cast("double")
    aggA.crossJoin(aggB).crossJoin(aggU).crossJoin(aggC).select(
      col("n_kept_a"), col("n_kept_b"), col("n_kept_union"), col("n_common"),
      round(est(col("n_kept_a"), col("kth_a")), 4).as("est_a"),
      round(est(col("n_kept_b"), col("kth_b")), 4).as("est_b"),
      round(est(col("n_kept_union"), col("kth_u")), 4).as("est_union"),
      round(jac, 4).as("est_jaccard"),
      round(jac * est(col("n_kept_union"), col("kth_u")), 4)
        .as("est_intersection"))
  }
}
