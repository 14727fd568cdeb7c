package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LeafNode, Project}

/** Scale-adaptive scan fan-out for HEAVY per-row expression chains
  * (r17, optimization guide §2.2 "make partitioning scale-adaptive —
  * derive from input size — rather than a constant").
  *
  * Problem: a small corpus often arrives as a handful of parquet row
  * groups (the repo's fixtures are single-row-group files), so the
  * file source hands Spark fewer input splits than the session has
  * cores and the whole tokenize/shingle/md5/regex chain runs on ONE
  * core — profiled 1.8 s single-task stages under the dedup rows at
  * sf0.1 on local[32].
  *
  * [[out]] round-robins such a scan to `defaultParallelism` BEFORE the
  * per-row work, under two gates that make it exactly the identity at
  * production scale:
  *
  *   1. plan shape: only plain scans (leaf relations under narrow
  *      Project/Filter) are considered — a frame with upstream
  *      exchanges is already partitioned by the engine, and probing
  *      its partition count would force AQE stage materialization at
  *      plan-build time;
  *   2. split count: the scan must present FEWER partitions than the
  *      session's parallelism — at 100 TB every scan has orders of
  *      magnitude more row groups than cores, so the fan-out never
  *      injects a blanket shuffle of a large input.
  *
  * Applied ONLY at the entry of operators whose downstream is heavy
  * per-row compute (shingling, signature hashing, PII regex banks,
  * window hashing): measured at sf0.1/32 cores, fanning those rows out
  * took q_pii_audit 1.74 → 0.71 s and dedup_minhash_lsh 2.54 → 1.56 s,
  * while the SAME fan-out applied at the table reader regressed the
  * light text rows (text_tfidf 0.59 → 1.26, q_rrf_fusion 1.38 → 2.60:
  * 32 near-empty partitions add per-task overhead to every downstream
  * stage of a short query) — which is why this lives in the heavy
  * operators, not in the scan helper. Only row DISTRIBUTION changes;
  * every operator here is partition-order-independent (exact-replay
  * discipline). */
private[graft] object Fan {
  def out(df: DataFrame): DataFrame = {
    val narrowOverLeaf = df.queryExecution.optimizedPlan.collect { p => p }
      .forall {
        case _: Project | _: Filter | _: LeafNode => true
        case _ => false
      }
    if (!narrowOverLeaf) df
    else {
      val target = df.sparkSession.sparkContext.defaultParallelism
      if (df.rdd.getNumPartitions < target) df.repartition(target) else df
    }
  }
}
