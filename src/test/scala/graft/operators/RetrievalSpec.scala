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

  test("rrfFuse: integer grid addends, both-runs docs outrank, id tie-break") {
    import spark.implicits._
    def run(rows: (Long, Long, Long)*) =
      rows.toDF("query_id", "doc_id", "rank")
    // doc 20 is rank 2 in BOTH runs; docs 10/30 are rank 1 in one run
    val a = run((1L, 10L, 1L), (1L, 20L, 2L), (1L, 40L, 3L))
    val b = run((1L, 30L, 1L), (1L, 20L, 2L), (1L, 50L, 3L))
    val got = Retrieval.rrfFuse(Seq("a" -> a, "b" -> b), k = 5)
      .orderBy("rank")
      .collect()
      .map(r => (r.getAs[Long]("rank"), r.getAs[Long]("doc_id"),
        r.getAs[Long]("rrf_e12"), r.getAs[Long]("n_sources")))
    val w = (r: Long) => 1000000000000L / (60L + r)
    // 20: 2/(60+2); beats a single rank-1 doc: 2/62 > 1/61
    assert(got.head == ((1L, 20L, 2 * w(2), 2L)))
    // 10 vs 30: identical score 1/61 -> smaller doc id first
    assert(got(1) == ((2L, 10L, w(1), 1L)))
    assert(got(2) == ((3L, 30L, w(1), 1L)))
    assert(got(3) == ((4L, 40L, w(3), 1L)))
    assert(got(4) == ((5L, 50L, w(3), 1L)))
  }

  test("rrfFuse: single run preserves its ranking order") {
    import spark.implicits._
    val a = Seq((1L, 7L, 1L), (1L, 3L, 2L), (1L, 9L, 3L),
      (2L, 5L, 1L), (2L, 6L, 2L))
      .toDF("query_id", "doc_id", "rank")
    val got = Retrieval.rrfFuse(Seq("only" -> a), k = 10)
      .select("query_id", "rank", "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((1L, 1L, 7L), (1L, 2L, 3L), (1L, 3L, 9L),
      (2L, 1L, 5L), (2L, 2L, 6L)))
  }
}
