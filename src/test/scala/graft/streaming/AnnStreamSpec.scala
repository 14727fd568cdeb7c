package graft.streaming

import graft.SparkSpec
import graft.operators.Similarity
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming ANN matcher: stream-static IVF probe with zero streaming
  * state. Fixture: two well-separated cosine clusters; the index is
  * built over the corpus with kmeans-trained centroids. */
class AnnStreamSpec extends SparkSpec {

  import spark.implicits._

  private def corpus = Seq(
    (1L, Array(1.0, 0.0, 0.0, 0.0)),
    (2L, Array(0.9, 0.1, 0.0, 0.0)),
    (3L, Array(0.0, 1.0, 0.0, 0.0)),
    (4L, Array(0.1, 0.9, 0.0, 0.0)))
    .toDF("vec_id", "embedding")

  test("annMatchStream — stream probes the static IVF index, stateless") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val cents = Similarity.kmeansFit(corpus, k = 2, iters = 2)
    val index = AnnStream.annIndex(corpus, cents).localCheckpoint()
    val ms = MemoryStream[(Long, Seq[Double])]
    val out = AnnStream.annMatchStream(
      ms.toDF().toDF("vec_id", "embedding"), index, cents, nProbe = 1)
    assert(out.isStreaming)
    // zero streaming state: no aggregate/dedup over the stream side,
    // exactly one stream-static join
    val lp = out.queryExecution.analyzed
    assert(lp.collect {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate
        if a.isStreaming => a
    }.isEmpty, "annMatchStream grew streaming state")
    val q = out.writeStream.format("memory").queryName("ann")
      .outputMode("append").start()
    try {
      ms.addData(
        (100L, Seq(0.95, 0.05, 0.0, 0.0)), // cluster A probe
        (200L, Seq(0.0, 0.0, 1.0, 0.0)))   // orthogonal to everything
      q.processAllAvailable()
      val got = spark.table("ann")
        .select("vec_id", "corpus_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      // the A-cluster probe matches both A-cluster corpus vectors and
      // nothing from cluster B; the orthogonal probe matches nothing
      assert(got == Set((100L, 1L), (100L, 2L)), got.toString)
    } finally q.stop()
  }

  test("decontaminateSemanticStreamGate — semantic twin blocked at ingest, rejected ≡ batch scrub, zero-norm passes") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val cents = Similarity.kmeansFit(corpus, k = 2, iters = 2)
    // one benchmark item near cluster A (a "reworded" eval question:
    // no text shared, embedding within τ of the A-cluster docs)
    val bench = Seq((100L, Array(0.95, 0.08, 0.0, 0.0)))
      .toDF("vec_id", "embedding")
    val ms = MemoryStream[(Long, Seq[Double])]
    val gated = AnnStream.decontaminateSemanticStreamGate(
      ms.toDF().toDF("vec_id", "embedding"), bench, cents,
      nProbe = 2, threshold = 0.95)
    assert(gated.isStreaming)
    // stateless: no streaming aggregate — one stream-static anti join
    assert(gated.queryExecution.analyzed.collect {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate
        if a.isStreaming => a
    }.isEmpty, "gate grew streaming state")
    val q = gated.writeStream.format("memory").queryName("semgate")
      .outputMode("append").start()
    try {
      ms.addData(
        (1L, Seq(1.0, 0.0, 0.0, 0.0)),  // cos vs bench ≈ 0.996: block
        (3L, Seq(0.0, 1.0, 0.0, 0.0)),  // cluster B: passes
        (9L, Seq(0.0, 0.0, 0.0, 0.0)))  // zero-norm: passes (NULL cos)
      q.processAllAvailable()
      val kept = spark.table("semgate").select("vec_id").collect()
        .map(_.getLong(0)).toSet
      assert(kept == Set(3L, 9L), kept.toString)
    } finally q.stop()
    // the REJECTED set equals the batch scrub's contaminated set at
    // equal (cents, nProbe, τ) — same cells, same exact cosine
    val batchFlags = graft.operators.Dedup.decontaminateSemantic(
        corpus, bench, cents, nProbe = 2, threshold = 0.95)
      .where(col("contaminated") === 1).select("vec_id")
      .collect().map(_.getLong(0)).toSet
    val ms2 = MemoryStream[(Long, Seq[Double])]
    val gated2 = AnnStream.decontaminateSemanticStreamGate(
      ms2.toDF().toDF("vec_id", "embedding"), bench, cents,
      nProbe = 2, threshold = 0.95)
    val q2 = gated2.writeStream.format("memory").queryName("semgate2")
      .outputMode("append").start()
    try {
      ms2.addData(corpus.collect()
        .map(r => (r.getLong(0), r.getSeq[Double](1))).toSeq: _*)
      q2.processAllAvailable()
      val kept2 = spark.table("semgate2").select("vec_id").collect()
        .map(_.getLong(0)).toSet
      val all = corpus.collect().map(_.getLong(0)).toSet
      assert(kept2 == all -- batchFlags,
        s"kept $kept2 vs batch flags $batchFlags")
      assert(batchFlags.nonEmpty, "fixture must flag something")
    } finally q2.stop()
  }

  test("annMatchStream — multi-probe never duplicates a pair") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val cents = Similarity.kmeansFit(corpus, k = 2, iters = 2)
    val index = AnnStream.annIndex(corpus, cents).localCheckpoint()
    val ms = MemoryStream[(Long, Seq[Double])]
    // nProbe = all cells: every (stream, corpus) pair is examined at
    // most once because each corpus vector lives in ONE cell
    val out = AnnStream.annMatchStream(
      ms.toDF().toDF("vec_id", "embedding"), index, cents,
      nProbe = 2, minCosine = 0.0)
    val q = out.writeStream.format("memory").queryName("ann2")
      .outputMode("append").start()
    try {
      ms.addData((100L, Seq(0.7, 0.7, 0.0, 0.0))) // between the clusters
      q.processAllAvailable()
      val rows = spark.table("ann2")
        .select("vec_id", "corpus_id").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      assert(rows.length == rows.distinct.length, rows.mkString(", "))
      assert(rows.length == 4) // all corpus vectors, once each
    } finally q.stop()
  }

  test("annMatchStream — parameter validation") {
    val cents = Similarity.kmeansFit(corpus, k = 2, iters = 2)
    val index = AnnStream.annIndex(corpus, cents)
    intercept[IllegalArgumentException] {
      AnnStream.annMatchStream(corpus, index, cents, nProbe = 3)
    }
    intercept[IllegalArgumentException] {
      AnnStream.annMatchStream(corpus, index, cents.limit(0))
    }
  }
}
