package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** `Dedup.segmentDedup` / `lineDedup` — CCNet-style line-level corpus
  * dedup with in-order reassembly. */
class LineDedupSpec extends SparkSpec {

  import spark.implicits._

  test("boilerplate lines are removed everywhere, order preserved") {
    val docs = Seq(
      (1L, "unique one\nCOPYRIGHT FOOTER\nunique two"),
      (2L, "COPYRIGHT FOOTER\nother text"),
      (3L, "only original content")).toDF("doc_id", "text")
    val out = Dedup.lineDedup(docs).orderBy("doc_id").collect()
    assert(out.map(_.getString(1)).toSeq == Seq(
      "unique one\nunique two", "other text", "only original content"))
    assert(out.map(_.getLong(3)).toSeq == Seq(1L, 1L, 0L))
  }

  test("a fully-boilerplate doc survives as empty text") {
    val docs = Seq(
      (1L, "dup line"), (2L, "dup line"), (3L, "keep me"))
      .toDF("doc_id", "text")
    val out = Dedup.lineDedup(docs).orderBy("doc_id").collect()
    assert(out.map(_.getString(1)).toSeq == Seq("", "", "keep me"))
    assert(out.map(_.getLong(2)).toSeq == Seq(1L, 1L, 1L)) // n_segments
  }

  test("duplicate segments WITHIN one doc do not count toward df") {
    // "x y" repeats twice in doc 1 only: df = 1 distinct doc -> kept
    val docs = Seq(
      (1L, "x y\nmiddle\nx y"), (2L, "unrelated")).toDF("doc_id", "text")
    val out = Dedup.lineDedup(docs).orderBy("doc_id").collect()
    assert(out(0).getString(1) == "x y\nmiddle\nx y")
    assert(out(0).getLong(3) == 0L)
  }

  test("tokenWindows segments into w-token windows, last short") {
    val segs = Seq(Tuple1("a b c d e")).toDF("text")
      .select(Dedup.tokenWindows(col("text"), 2).as("s"))
      .collect()(0).getSeq[String](0)
    assert(segs == Seq("a b", "c d", "e"))
  }

  test("minDf raises the boilerplate bar") {
    val docs = Seq(
      (1L, "shared\na"), (2L, "shared\nb"), (3L, "shared\nc"))
      .toDF("doc_id", "text")
    val df3 = Dedup.lineDedup(docs, minDf = 3).orderBy("doc_id").collect()
    assert(df3.map(_.getString(1)).toSeq == Seq("a", "b", "c"))
    val df4 = Dedup.lineDedup(docs, minDf = 4).orderBy("doc_id").collect()
    assert(df4.map(_.getLong(3)).sum == 0L)
  }
}
