package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** `ScdMerge.snapshotDiff` — the CDC extract between two snapshots. */
class SnapshotDiffSpec extends SparkSpec {

  import spark.implicits._

  test("classifies insert / update / delete and drops unchanged") {
    val before = Seq(
      (1L, "a"), (2L, "b"), (3L, "c"), (4L, null.asInstanceOf[String]))
      .toDF("k", "v")
    val after = Seq(
      (1L, "a"),           // unchanged -> dropped
      (2L, "B"),           // update
      (4L, "d"),           // NULL -> value is an update
      (5L, "e"))           // insert; 3 deleted
      .toDF("k", "v")
    val d = ScdMerge.snapshotDiff(before, after, "k")
      .select("change_type", "k", "v")
    val got = d.collect()
      .map(r => (r.getLong(1), r.getString(0),
        if (r.isNullAt(2)) null else r.getString(2))).toSet
    assert(got == Set(
      (2L, "U", "B"),
      (3L, "D", "c"), // pre-image
      (4L, "U", "d"),
      (5L, "I", "e")))
  }

  test("value -> NULL transition is a U carrying the null post-image") {
    val before = Seq((1L, "x")).toDF("k", "v")
    val after = Seq((1L, null.asInstanceOf[String])).toDF("k", "v")
    val rows = ScdMerge.snapshotDiff(before, after, "k").collect()
    assert(rows.length == 1)
    assert(rows(0).getString(0) == "U" && rows(0).isNullAt(2))
  }

  test("upsert output diffs back to exactly the staged changes") {
    val dim = (1L to 100L).map(k => (k, s"v$k", k * 10.0))
      .toDF("k", "name", "bal")
    val staged = Seq((7L, "v7", 999.0), (200L, "new", 1.0))
      .toDF("k", "name", "bal")
    val merged = ScdMerge.upsert(dim, staged, "k")
    val d = ScdMerge.snapshotDiff(dim, merged, "k")
    val got = d.select("change_type", "k").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == Set(("U", 7L), ("I", 200L)))
  }

  test("identical snapshots diff to zero rows") {
    val dim = (1L to 50L).map(k => (k, s"v$k")).toDF("k", "v")
    assert(ScdMerge.snapshotDiff(dim, dim, "k").isEmpty)
  }

  test("column-set mismatch is rejected up front") {
    val a = Seq((1L, "x")).toDF("k", "v")
    val b = Seq((1L, "x", 2.0)).toDF("k", "v", "extra")
    intercept[IllegalArgumentException] {
      ScdMerge.snapshotDiff(a, b, "k")
    }
  }
}
