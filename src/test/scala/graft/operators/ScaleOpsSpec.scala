package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Specs for the scale-technique operators: salted join equivalence and
  * deterministic hash sampling/splits. */
class ScaleOpsSpec extends SparkSpec {

  import spark.implicits._

  test("saltedJoin is row-identical to the plain join (incl. skewed key)") {
    // heavy skew: 900 of 1000 probe rows hit key 7; the rest spread
    // over keys 1..50 (all matching)
    val probe = (1 to 1000).map(i =>
      (if (i <= 900) 7L else (i % 50 + 1).toLong, i.toLong)).toDF("k", "pid")
    val build = (1L to 50L).map(k => (k, s"v$k")).toDF("k", "payload")
    val plain = probe.join(build, Seq("k")).select("k", "pid", "payload")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    val salted = SkewJoin.saltedJoin(probe, build, "k", "pid", nSalt = 8)
      .select("k", "pid", "payload")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(salted == plain && plain.size == 1000)
  }

  test("hashSample is deterministic and roughly proportional") {
    val df = (1L to 2000L).toDF("id")
    val s1 = Sampling.hashSample(df, col("id"), 0.25)
      .collect().map(_.getLong(0)).toSet
    val s2 = Sampling.hashSample(df, col("id"), 0.25)
      .collect().map(_.getLong(0)).toSet
    assert(s1 == s2) // identical membership run to run
    assert(s1.size > 400 && s1.size < 600) // ~500 expected
    // monotone: a larger fraction strictly contains a smaller one
    val s3 = Sampling.hashSample(df, col("id"), 0.5)
      .collect().map(_.getLong(0)).toSet
    assert(s1.subsetOf(s3))
  }

  test("splitAssign partitions every row exactly once with ~weights") {
    val df = (1L to 2000L).toDF("id")
    val split = Sampling.splitAssign(df, col("id"),
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    val counts = split.groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum == 2000)
    assert(counts("train") > 1500 && counts("val") > 100 && counts("test") > 100)
  }
}
