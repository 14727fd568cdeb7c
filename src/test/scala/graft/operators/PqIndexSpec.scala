package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The persisted-PQ-index contract: the artifact is plain parquet on
  * disk, a session with NO block-manager state from the build can
  * serve from it, and serving from the artifact returns exactly what
  * the inline build-and-serve path returns. */
class PqIndexSpec extends SparkSpec {

  private lazy val emb = Similarity.l2Normalize(
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet"))
  private lazy val queries = emb.where(col("vec_id") < 10)

  private def served(books: org.apache.spark.sql.DataFrame,
      encoded: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Long, Long)] = {
    val dts = Similarity.pqDistanceTables(queries, books)
    Similarity.pqTopKWith(encoded, dts, 5)
      .orderBy("query_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
  }

  test("pqIndexWrite/Read: artifact survives a fresh session; equals inline path") {
    val path = java.nio.file.Files
      .createTempDirectory("graft-pqindex").toString
    // the inline (rebuild-every-run) reference ranking
    val inline = Similarity.pqTopK(emb, queries, 5)
      .orderBy("query_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq

    Similarity.pqIndexWrite(emb, path)
    // the artifact is real files, not session state
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$path/codebook/_SUCCESS")))
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$path/encoded/_SUCCESS")))

    // drop every persisted/checkpointed block the build may have left
    // behind: if serving still works, it is reading parquet, not
    // block-manager residue
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))

    // a brand-new session (fresh state) serves from the artifact
    val s2 = spark.newSession()
    val (books, encoded) = Similarity.pqIndexRead(s2, path)
    assert(books.count() == 8 * 16)
    assert(served(books, encoded) == inline)
  }

  test("pqIndexAppend: restart-grown index equals rebuilt-with-same-codebook") {
    val path = java.nio.file.Files
      .createTempDirectory("graft-pqappend").toString
    val initial = emb.where(col("vec_id") % 5 =!= 0)
    val batch = emb.where(col("vec_id") % 5 === 0)
    Similarity.pqIndexWrite(initial, path)
    // RESTART: the append runs in a fresh session that never saw the
    // build — the nightly-growth contract (artifact is plain parquet)
    val s2 = spark.newSession()
    Similarity.pqIndexAppend(
      Similarity.l2Normalize(
        s2.read.parquet("/root/testdata/sf0.001/embeddings.parquet"))
        .where(col("vec_id") % 5 === 0), path)
    val (books, encoded) = Similarity.pqIndexRead(s2, path)
    // rebuilt reference: whole corpus encoded against the SAME frozen
    // (persisted) codebook in one shot
    val rebuilt = Similarity.pqEncode(emb, books)
    val dts = Similarity.pqDistanceTables(queries, books)
    def rank(enc: org.apache.spark.sql.DataFrame) =
      Similarity.pqTopKWith(enc, dts, 5).orderBy("query_id", "rank")
        .collect().map(_.toSeq).toSeq
    assert(encoded.count() == emb.count())
    assert(rank(encoded) == rank(rebuilt))
    // a second append of the same ids must be refused, not doubled
    val e = intercept[IllegalArgumentException] {
      Similarity.pqIndexAppend(batch, path)
    }
    assert(e.getMessage.contains("overlap"), e.getMessage)
  }

  test("tfIndexAppend / signatureIndexAppend: appended equals rebuilt; overlap refused") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val a = docs.where(col("doc_id") % 3 =!= 0)
    val b = docs.where(col("doc_id") % 3 === 0)
    val tfPath = java.nio.file.Files
      .createTempDirectory("graft-tfappend").toString + "/tf"
    Retrieval.tfIndexWrite(a, tfPath)
    Retrieval.tfIndexAppend(b, tfPath)
    def tfKey(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    val rebuilt = java.nio.file.Files
      .createTempDirectory("graft-tfrebuild").toString + "/tf"
    Retrieval.tfIndexWrite(docs, rebuilt)
    assert(tfKey(Retrieval.tfIndexRead(spark, tfPath)) ==
      tfKey(Retrieval.tfIndexRead(spark, rebuilt)))
    intercept[IllegalArgumentException] {
      Retrieval.tfIndexAppend(b, tfPath)
    }
    val sigPath = java.nio.file.Files
      .createTempDirectory("graft-sigappend").toString + "/sig"
    Dedup.signatureIndexWrite(a, sigPath)
    Dedup.signatureIndexAppend(b, sigPath)
    val sigRebuilt = java.nio.file.Files
      .createTempDirectory("graft-sigrebuild").toString + "/sig"
    Dedup.signatureIndexWrite(docs, sigRebuilt)
    assert(tfKey(Dedup.signatureIndexRead(spark, sigPath)) ==
      tfKey(Dedup.signatureIndexRead(spark, sigRebuilt)))
    intercept[IllegalArgumentException] {
      Dedup.signatureIndexAppend(b, sigPath)
    }
  }

  test("signatureIndexWrite/Read: incremental pairs from the persisted index equal inline") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val corpus = docs.where(col("doc_id") % 2 === 0)
    val batch = docs.where(col("doc_id") % 2 === 1)
    def key(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val inline = key(Dedup.minhashLshPairsIncremental(corpus, batch,
      threshold = 0.8))
    val path = java.nio.file.Files
      .createTempDirectory("graft-sigindex").toString + "/sig"
    Dedup.signatureIndexWrite(corpus, path)
    val s2 = spark.newSession()
    val fromDisk = key(Dedup.minhashLshPairsIncremental(
      s2.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .where(col("doc_id") % 2 === 0),
      s2.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .where(col("doc_id") % 2 === 1),
      threshold = 0.8,
      corpusSigs = Some(Dedup.signatureIndexRead(s2, path))))
    assert(fromDisk == inline)
  }
}
