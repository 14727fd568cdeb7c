package graft

/** Guards the driver's t1 smoke gate: `SparkEntry.entry` must run at
  * sf0.001 and return rows. */
class EntrySmokeSpec extends SparkSpec {
  test("entry() returns rows at sf0.001") {
    val df = SparkEntry.entry(spark)
    assert(df.count() > 0)
  }

  test("every declared query has either an oracle or a doc'd reason") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    // the HLL sketch is the single intentionally-unoracled query
    // (cross-engine HLL implementations differ)
    assert(missing == Set("q_approx_distinct_hll"), s"unexpected: $missing")
    // no orphan oracle entries either
    assert((SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet).isEmpty)
  }
}
