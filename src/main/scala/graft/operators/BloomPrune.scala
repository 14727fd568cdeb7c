package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.CatalystBridge

/** Bloom-pruned semi-join — the scale shape for "keep probe rows whose
  * key exists in a large build set" when the build side is far too big
  * to broadcast and the probe side is far too big to shuffle in full.
  *
  * A plain left-semi join shuffles EVERY probe row on the key; at
  * 100 TB most of those rows don't match and the shuffle is pure
  * waste. Here the build side is first folded into a bloom filter
  * (Catalyst's `BloomFilterAggregate` — mergeable partial sketches,
  * one tiny binary result; the same machinery Spark's AQE
  * `InjectRuntimeFilter` uses, which only fires on its own cost
  * heuristics — this operator makes the pruning explicit and
  * unconditional). The bloom rides a scalar subquery, so each executor
  * tests `might_contain(xxhash64(key))` BEFORE the exchange and only
  * matches + false positives are shuffled into the exact semi-join
  * that removes the false positives. Blooms have no false negatives,
  * so the result is row-identical to the plain semi-join — the oracle
  * replays it as `WHERE key IN (SELECT …)`.
  *
  * `expectedItems` sizes the filter (~9.6 bits/item at the default
  * 3% FPP — 1M keys ≈ 1.2 MB); undersizing only raises the FP rate
  * (more waste shuffled), never breaks correctness. */
object BloomPrune {

  def bloomSemiJoin(probe: DataFrame, build: DataFrame, key: String,
      expectedItems: Long = 1000000L): DataFrame = {
    require(expectedItems > 0, s"expectedItems must be > 0: $expectedItems")
    val bloom = build.where(col(key).isNotNull)
      .agg(CatalystBridge.bloomFilterAgg(xxhash64(col(key)), expectedItems)
        .as("bf"))
    // empty build side → NULL bloom → might_contain NULL: no key can
    // match, so the test folds to false
    val pruned = probe.where(coalesce(CatalystBridge.bloomMightContain(
      CatalystBridge.scalarSubquery(bloom), xxhash64(col(key))), lit(false)))
    // exact verify: distinct build keys (map-side combinable) against
    // the pruned probe only — false positives die here
    pruned.join(build.select(col(key)).distinct(), Seq(key), "left_semi")
  }

  /** The complement: probe rows whose key is definitely NOT in the
    * build set can skip the exact join entirely (bloom "no" is
    * certain), so the anti-join's exchange carries only the bloom's
    * "maybe" rows. Row-identical to a plain left-anti join. NULL keys
    * are kept, matching Spark's left-anti NULL semantics. */
  def bloomAntiJoin(probe: DataFrame, build: DataFrame, key: String,
      expectedItems: Long = 1000000L): DataFrame = {
    require(expectedItems > 0, s"expectedItems must be > 0: $expectedItems")
    val bloom = build.where(col(key).isNotNull)
      .agg(CatalystBridge.bloomFilterAgg(xxhash64(col(key)), expectedItems)
        .as("bf"))
    val maybe = coalesce(CatalystBridge.bloomMightContain(
      CatalystBridge.scalarSubquery(bloom), xxhash64(col(key))), lit(false))
    val certainNo = probe.where(col(key).isNull || !maybe)
    val candidates = probe.where(col(key).isNotNull && maybe)
      .join(build.select(col(key)).distinct(), Seq(key), "left_anti")
    certainNo.unionByName(candidates)
  }
}
