package graft

/** Guards the driver's t1 smoke gate: `SparkEntry.entry` must run at
  * sf0.001 and return rows. */
class EntrySmokeSpec extends SparkSpec {
  test("entry() returns rows at sf0.001") {
    val df = SparkEntry.entry(spark)
    assert(df.count() > 0)
  }

  test("every declared query has an oracle") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing.isEmpty, s"unoracled queries: $missing")
    // no orphan oracle entries either
    assert((SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet).isEmpty)
  }
}
