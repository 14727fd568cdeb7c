package graft

/** Plan-shape locks for flagship queries — the properties that make
  * them scale are asserted, not assumed, so a refactor that silently
  * introduces a cartesian product, an extra fact shuffle, or a lost
  * broadcast fails CI rather than a future bench. (The SCD read path
  * has its own deeper locks in PushdownSpec.) */
class PlanShapeSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def planOf(q: String): String =
    SparkEntry.queries(q)(spark, dir).queryExecution.executedPlan.toString

  private def count(plan: String, token: String): Int =
    token.r.findAllIn(plan).length

  test("q5 star join: no cartesian, dimensions broadcast") {
    val p = planOf("q5_local_volume")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p)
    assert(count(p, "BroadcastExchange") >= 4, p) // 4 dims + maybe orders
  }

  test("interval join query: equi-join on the cell, no nested loop") {
    val p = planOf("q_interval_join")
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"), p)
    assert(p.contains("__cell"), p)
  }

  test("k-means assignment: centroids broadcast, corpus never shuffles for them") {
    val p = planOf("sim_kmeans")
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastExchange"), p) // the k-row centroid side
    assert(!p.contains("CartesianProduct"), p)
  }

  test("minhash pipeline: candidate generation is join-based, not all-pairs") {
    val p = planOf("dedup_minhash_lsh")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("flagship queries keep whole-stage codegen in the scan-side hot path") {
    // a non-codegen expression in the per-row path would drop these spans
    for (q <- Seq("q1_pricing_summary", "text_stats", "text_langid")) {
      val p = SparkEntry.queries(q)(spark, dir)
        .queryExecution.executedPlan.toString
      assert(p.contains("WholeStageCodegen") || p.contains("isFinalPlan=false"),
        s"$q lost codegen:\n$p")
    }
  }
}
