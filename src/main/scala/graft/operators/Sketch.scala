package graft.operators

import org.apache.spark.sql.expressions.Window
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
    * Plan shape: distinct (group, value) → hash → per-group rank →
    * keep k smallest. The rank is a per-group sort of distinct hashes;
    * at extreme scale prefer `approx_count_distinct` (no sort) — KMV's
    * role here is the deterministic, engine-portable estimate.
    * Output: group col, n_kept, est_distinct. */
  def kmvDistinct(df: DataFrame, groupCol: String, valueCol: String,
      k: Int = 64): DataFrame = {
    val hashed = df.select(col(groupCol), col(valueCol)).distinct()
      .withColumn("hfrac", md5Fraction(col(valueCol)))
    val w = Window.partitionBy(col(groupCol)).orderBy(col("hfrac"))
    hashed
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= k)
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_kept"),
        max(when(col("rn") === k, col("hfrac"))).as("kth"))
      .select(col(groupCol), col("n_kept"),
        round(when(col("n_kept") < k, col("n_kept").cast("double"))
          .otherwise(lit((k - 1).toDouble) / col("kth")), 4)
          .as("est_distinct"))
  }
}
