package graft.operators

import graft.SparkSpec

/** Behavioral specs for BM25 retrieval on a crafted corpus: scores are
  * checked against the formula computed directly in doubles (the same
  * IEEE ops the operator quantizes to the 1e-6 grid), ranking and
  * matched-term counts against hand reasoning. */
class RetrievalSpec extends SparkSpec {

  private def corpus = {
    import spark.implicits._
    Seq(
      (1L, "apple banana"),
      (2L, "apple apple cherry"),
      (3L, "durian egg fig"))
      .toDF("doc_id", "text")
  }

  private def queryDf(qs: (Long, String)*) = {
    import spark.implicits._
    qs.toDF("query_id", "qtext")
  }

  // the operator's exact arithmetic, unquantized
  private def bm25(tf: Long, df: Long, dl: Long, nDocs: Long,
      avgdl: Double, k1: Double = 1.2, b: Double = 0.75): Double =
    math.log(1.0 + (nDocs - df + 0.5) / (df + 0.5)) *
      ((tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * dl / avgdl)))

  test("single-term query: tf wins, non-matching doc absent, score exact") {
    val rows = Retrieval.bm25TopK(corpus, queryDf(1L -> "apple"))
      .collect().map(r => (r.getAs[Long]("rank"), r.getAs[Long]("doc_id"),
        r.getAs[Double]("bm25"), r.getAs[Long]("n_terms")))
    assert(rows.map(t => (t._1, t._2, t._4)).toSeq ==
      Seq((1L, 2L, 1L), (2L, 1L, 1L)))  // doc 3 never matches
    // quantize-floor (1e-6) + round-to-4dp keeps the reported score
    // within 1.1e-4 of the raw double formula
    val avgdl = (2 + 3 + 3) / 3.0
    assert(math.abs(rows.find(_._2 == 2L).get._3 -
      bm25(2, 2, 3, 3, avgdl)) < 1.1e-4)
    assert(math.abs(rows.find(_._2 == 1L).get._3 -
      bm25(1, 2, 2, 3, avgdl)) < 1.1e-4)
  }

  test("multi-term query: per-term contributions add, n_terms counts matches") {
    val rows = Retrieval.bm25TopK(corpus, queryDf(1L -> "apple cherry"))
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_terms")))
      .toMap
    assert(rows == Map(2L -> 2L, 1L -> 1L))
  }

  test("query batch ranks independently; k caps each query's list") {
    val out = Retrieval.bm25TopK(corpus,
      queryDf(1L -> "apple", 2L -> "banana durian"), k = 1)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("rank"),
        r.getAs[Long]("doc_id")))
    assert(out.length == 2 && out.toSet.map((t: (Long, Long, Long)) => t._1)
      == Set(1L, 2L))
    assert(out.forall(_._2 == 1L))
  }

  test("bm25TopKWith reuses a persisted tf index, same answer") {
    import org.apache.spark.sql.functions._
    val tf = corpus
      .select(col("doc_id"), explode(TextAnalysis.tokens(col("text"))).as("t"))
      .groupBy(col("doc_id"), col("t")).agg(count(lit(1)).as("tf"))
    val a = Retrieval.bm25TopK(corpus, queryDf(1L -> "apple cherry"))
      .collect().toSet
    val b = Retrieval.bm25TopKWith(tf, queryDf(1L -> "apple cherry"))
      .collect().toSet
    assert(a == b)
  }

  test("tf index parquet artifact: on-disk round-trip serves the inline answer") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-tfidx").toString + "/tf"
    Retrieval.tfIndexWrite(corpus, dir)
    // drop every cached/persisted block: the artifact must carry the
    // whole state on disk, like a fresh serving application
    spark.sharedState.cacheManager.clearCache()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    val inline = Retrieval.bm25TopK(corpus, queryDf(1L -> "apple cherry"))
      .collect().toSet
    val served = Retrieval.bm25TopKWith(Retrieval.tfIndexRead(spark, dir),
      queryDf(1L -> "apple cherry")).collect().toSet
    assert(served == inline)
  }

  test("phraseMatch: consecutive positions, overlap counting, 3-term chain") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a a a"),              // "a a" twice (OVERLAPPING)
      (2L, "x a y a"),            // terms present, never adjacent
      (3L, "big hash join now hash join"), // 2 occurrences
      (4L, "hash Join day"),      // case-folds -> 1
      (5L, "join hash"))          // wrong order -> 0
      .toDF("doc_id", "text")
    val aa = Retrieval.phraseMatch(docs, "a a").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(aa == Set((1L, 2L)))
    val hj = Retrieval.phraseMatch(docs, "Hash Join").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(hj == Set((3L, 2L), (4L, 1L)))
    // 3-term chain anchors every term at its offset
    val three = Retrieval.phraseMatch(docs, "big hash join").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(three == Set((3L, 1L)))
    // absent phrase -> empty, not an error
    assert(Retrieval.phraseMatch(docs, "never here").count() == 0)
  }
}
