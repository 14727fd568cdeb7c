package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** `TextAnalysis.nbModel` / `nbScore` — the relational hashed
  * naive-Bayes classifier gate. */
class NbClassifierSpec extends SparkSpec {

  import spark.implicits._

  private val docs = Seq(
    (1L, "good clean prose with the marker", 1),
    (2L, "more the quality text here", 1),
    (3L, "the best writing around", 1),
    (4L, "spam junk garbage noise", 0),
    (5L, "junk noise spam words", 0),
    (6L, "garbage spam noise heap", 0))
    .toDF("doc_id", "text", "y")

  test("model is dense: dim buckets + prior row, all weights finite") {
    val m = TextAnalysis.nbModel(docs, col("y") === 1, dim = 64)
    assert(m.count() == 65)
    assert(m.where(col("bk") === -1).count() == 1)
    // smoothing keeps every weight finite (no token in a bucket ->
    // the two smoothed likelihoods differ only by class totals)
    assert(m.where(col("w_q").isNull).count() == 0)
  }

  test("scores separate the classes the model was trained on") {
    val m = TextAnalysis.nbModel(docs, col("y") === 1, dim = 64)
    val scored = TextAnalysis.nbScore(docs, m, dim = 64)
      .join(docs.select(col("doc_id"), col("y")), Seq("doc_id"))
    val rows = scored.collect()
    assert(rows.length == 6)
    rows.foreach { r =>
      assert(r.getLong(r.fieldIndex("pred")) ==
        r.getInt(r.fieldIndex("y")).toLong,
        s"doc ${r.getLong(0)} misclassified on its own training set")
    }
  }

  test("marker token carries positive weight, spam token negative") {
    val dim = 64
    val m = TextAnalysis.nbModel(docs, col("y") === 1, dim = dim)
    def bucketOf(tok: String): Int =
      Seq(tok).toDF("t")
        .select(floor(Sketch.md5Fraction(concat(lit("b|"), col("t"))) * dim)
          .cast("int")).collect()(0).getInt(0)
    val w = m.collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(w(bucketOf("the")) > 0)
    assert(w(bucketOf("spam")) < 0)
  }

  test("unseen-bucket smoothing mass lives in the dense model") {
    // a scoring doc whose tokens never occurred in training still gets
    // a finite score (every bucket exists in the table)
    val m = TextAnalysis.nbModel(docs, col("y") === 1, dim = 64)
    val novel = Seq((9L, "zzz qqq www")).toDF("doc_id", "text")
    val s = TextAnalysis.nbScore(novel, m, dim = 64).collect()
    assert(s.length == 1 && !s(0).isNullAt(2))
  }
}
