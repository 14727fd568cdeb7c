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
