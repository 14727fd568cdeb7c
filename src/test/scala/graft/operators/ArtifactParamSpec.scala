package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The stored-build-parameter contract on EVERY persisted dedup
  * artifact family (VERDICT r14 #1): the artifact records the params
  * it was built with, and every consumer that re-shingles fresh text
  * against it fails LOUD on a mismatch — a w=3-built index probed at
  * w=5 would otherwise return zero candidates silently, the exact
  * inverse of the family's documented no-false-negative bias. Also
  * pins the legacy escape hatch (pre-r15 artifacts without metadata
  * columns read unvalidated) and that metadata never leaks into
  * result schemas. The decontamination index's own contract (the r14
  * template) is pinned in DedupSpec. */
class ArtifactParamSpec extends SparkSpec {

  private val filler = "the quick brown fox jumps over the lazy dog " * 6

  private def docs = {
    import spark.implicits._
    Seq(
      (1L, filler + "alpha beta gamma delta epsilon zeta"),
      (2L, filler + "alpha beta gamma delta epsilon eta"),
      (3L, filler + "alpha beta gamma delta epsilon zeta"),
      (4L, "completely different words entirely unrelated to anything " +
        "else here painting sculpture architecture music dance poetry"),
      (5L, "lorem ipsum dolor sit amet consectetur adipiscing elit sed " +
        "do eiusmod tempor incididunt ut labore et dolore magna aliqua"))
      .toDF("doc_id", "text")
  }

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString + "/idx"

  // ---------------------------------------------------------------- jaccard

  test("jaccard artifact: every w-taking consumer rejects a w mismatch") {
    val path = tmp("jac_w")
    Dedup.jaccardIndexWrite(docs.where(col("doc_id") <= 3), path, w = 3)
    val batch = docs.where(col("doc_id") > 3)
    for ((name, probe) <- Seq[(String, () => Any)](
      ("jaccardJoinIncremental",
        () => Dedup.jaccardJoinIncremental(batch, path, w = 5)),
      ("containmentJoinIncremental",
        () => Dedup.containmentJoinIncremental(batch, path, w = 5)),
      ("decontaminateNearIndexed",
        () => Dedup.decontaminateNearIndexed(batch, path, w = 5)),
      ("jaccardIndexAppend",
        () => Dedup.jaccardIndexAppend(batch, path, w = 5)))) {
      val e = intercept[IllegalArgumentException](probe())
      assert(e.getMessage.contains("built with w = 3") &&
        e.getMessage.contains("w = 5") &&
        e.getMessage.contains(name), s"$name: ${e.getMessage}")
    }
  }

  test("jaccard artifact: matching w serves results identical to inline") {
    val path = tmp("jac_ok")
    val corpus = docs.where(col("doc_id") % 2 === 1)
    val batch = docs.where(col("doc_id") % 2 === 0)
    Dedup.jaccardIndexWrite(corpus, path, w = 4)
    val inc = Dedup.jaccardJoinIncremental(batch, path, w = 4,
      threshold = 0.8).collect().map(_.toString).sorted.toSeq
    val inline = Dedup.jaccardJoin(docs, w = 4, threshold = 0.8)
      .where(col("id_a") % 2 === 0 || col("id_b") % 2 === 0)
      .collect().map(_.toString).sorted.toSeq
    assert(inc == inline, s"$inc vs $inline")
    // metadata never leaks into result schemas
    assert(!inc.exists(_.contains("num_hashes")))
    assert(Dedup.jaccardJoinIndexed(spark, path, threshold = 0.8)
      .columns.toSeq ==
      Seq("id_a", "id_b", "n_common", "n_a", "n_b", "jaccard"))
  }

  test("jaccard artifact: write returns the doc count without re-reading") {
    val path = tmp("jac_n")
    // docs with >= w tokens only; all five fixtures qualify at w=3
    assert(Dedup.jaccardIndexWrite(docs, path, w = 3) == 5L)
  }

  test("jaccard artifact: pre-r15 format v1 fails LOUD with a rebuild message") {
    // a v1 artifact: df table without dictionary ids, docs with
    // STRING shingle arrays — v1 strings cannot join v2 id streams,
    // so a silent read would return zero pairs; the format check
    // must refuse instead
    val path = tmp("jac_legacy")
    val corpus = docs.where(col("doc_id") <= 3)
    val sh = Dedup.shingles(corpus, w = 3)
    val dfreq = sh.groupBy("shingle").agg(count(lit(1)).as("df"))
    dfreq.write.parquet(s"$path/df")
    sh.join(dfreq, Seq("shingle")).groupBy(col("doc_id"))
      .agg(array_sort(collect_list(struct(col("df"), col("shingle"))))
        .as("ord"))
      .select(col("doc_id"),
        expr("transform(ord, x -> x.shingle)").as("sharr"),
        size(col("ord")).cast("long").as("sz"))
      .write.parquet(s"$path/docs")
    val batch = docs.where(col("doc_id") > 3)
    for ((name, probe) <- Seq[(String, () => Any)](
      ("jaccardJoinIncremental",
        () => Dedup.jaccardJoinIncremental(batch, path, w = 3)),
      ("containmentJoinIndexed",
        () => Dedup.containmentJoinIndexed(spark, path)),
      ("jaccardJoinIndexed",
        () => Dedup.jaccardJoinIndexed(spark, path)),
      ("decontaminateNearIndexed",
        () => Dedup.decontaminateNearIndexed(batch, path, w = 3)),
      ("jaccardIndexAppend",
        () => Dedup.jaccardIndexAppend(batch, path, w = 3)))) {
      val e = intercept[IllegalArgumentException](probe())
      assert(e.getMessage.contains("format v1") &&
        e.getMessage.contains("rebuild"), s"$name: ${e.getMessage}")
    }
  }

  test("jaccard artifact: append persists dictionary ids for new vocabulary") {
    val path = tmp("jac_grow")
    Dedup.jaccardIndexWrite(docs.where(col("doc_id") <= 2), path, w = 3)
    val before = spark.read.parquet(s"$path/df").count()
    // doc 4 has vocabulary the 1-2 corpus has never seen
    Dedup.jaccardIndexAppend(docs.where(col("doc_id") === 4), path)
    val dict = spark.read.parquet(s"$path/df")
    assert(dict.count() > before, "new vocabulary must land in the dict")
    // every id unique, new rows carry df 0 and the build w
    assert(dict.select("sid").distinct().count() == dict.count())
    assert(dict.where(col("df") === 0).select("w").distinct()
      .collect().map(_.getInt(0)).toSeq == Seq(3))
    // appended ≡ rebuilt, served across a fresh read (ids persisted)
    val rebuilt = tmp("jac_grow_rb")
    Dedup.jaccardIndexWrite(docs.where(col("doc_id") <= 4 &&
      col("doc_id") =!= 3), rebuilt, w = 3)
    def pairs(p: String) = Dedup.jaccardJoinIncremental(
      docs.where(col("doc_id") === 5), p, w = 3, threshold = 0.1)
      .collect().map(_.toString).sorted.toSeq
    assert(pairs(path) == pairs(rebuilt))
  }

  // -------------------------------------------------------------- signature

  test("signature artifact: read validates both w and num_hashes") {
    val path = tmp("sig_w")
    Dedup.signatureIndexWrite(docs, path, w = 3, numHashes = 16)
    val wErr = intercept[IllegalArgumentException](
      Dedup.signatureIndexRead(spark, path, w = 5, numHashes = 16))
    assert(wErr.getMessage.contains("built with w = 3") &&
      wErr.getMessage.contains("w = 5"), wErr.getMessage)
    val hErr = intercept[IllegalArgumentException](
      Dedup.signatureIndexRead(spark, path, w = 3, numHashes = 8))
    assert(hErr.getMessage.contains("num_hashes = 16") &&
      hErr.getMessage.contains("num_hashes = 8"), hErr.getMessage)
    // matching read: metadata stripped, schema is the signature shape
    val ok = Dedup.signatureIndexRead(spark, path, w = 3, numHashes = 16)
    assert(ok.columns.toSeq == "doc_id" +: (0 until 16).map(i => s"m$i"))
  }

  test("signature artifact: append-first bootstraps a stamped artifact") {
    // ADVICE r15: an absent path must bootstrap (like a first write),
    // not throw PATH_NOT_FOUND on the validation read
    val path = tmp("sig_boot")
    Dedup.signatureIndexAppend(docs.where(col("doc_id") <= 3), path,
      w = 3, numHashes = 16)
    val got = Dedup.signatureIndexRead(spark, path, w = 3, numHashes = 16)
    assert(got.count() == 3)
    // the bootstrap stamped the params: a mismatched follow-up append
    // validates against them like any pre-existing artifact
    val e = intercept[IllegalArgumentException](
      Dedup.signatureIndexAppend(docs.where(col("doc_id") > 3), path,
        w = 5, numHashes = 16))
    assert(e.getMessage.contains("built with w = 3"), e.getMessage)
  }

  test("signature artifact: append validates and keeps one schema") {
    val path = tmp("sig_app")
    Dedup.signatureIndexWrite(docs.where(col("doc_id") <= 3), path,
      w = 3, numHashes = 16)
    val batch = docs.where(col("doc_id") > 3)
    val e = intercept[IllegalArgumentException](
      Dedup.signatureIndexAppend(batch, path, w = 5, numHashes = 16))
    assert(e.getMessage.contains("signatureIndexAppend") &&
      e.getMessage.contains("built with w = 3"), e.getMessage)
    Dedup.signatureIndexAppend(batch, path, w = 3, numHashes = 16)
    // appended rows carry the same metadata — a later read validates
    val all = Dedup.signatureIndexRead(spark, path, w = 3,
      numHashes = 16)
    assert(all.count() == 5)
    assert(spark.read.parquet(path)
      .select("w", "num_hashes").distinct().collect()
      .map(r => (r.getInt(0), r.getInt(1))).toSeq == Seq((3, 16)))
  }

  test("signature artifact: appended index ≡ rebuilt index (pairs)") {
    val path = tmp("sig_eq")
    Dedup.signatureIndexWrite(docs.where(col("doc_id") <= 2), path)
    Dedup.signatureIndexAppend(docs.where(col("doc_id") === 3), path)
    val rebuilt = tmp("sig_rb")
    Dedup.signatureIndexWrite(docs.where(col("doc_id") <= 3), rebuilt)
    val corpus = docs.where(col("doc_id") <= 3)
    val batch = docs.where(col("doc_id") > 3)
    def pairs(p: String) = Dedup.minhashLshPairsIncremental(
      corpus, batch,
      corpusSigs = Some(Dedup.signatureIndexRead(spark, p)))
      .collect().map(_.toString).sorted.toSeq
    assert(pairs(path) == pairs(rebuilt))
  }

  test("empty inputs: counted writes return 0 and an empty artifact grows by append") {
    import spark.implicits._
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val base = java.nio.file.Files
      .createTempDirectory("jac_empty").toString
    // the Observation-counted writes must complete (not hang) and
    // report 0 on empty / sub-w inputs
    assert(Dedup.jaccardIndexWrite(empty, s"$base/idx", w = 3) == 0L)
    assert(Dedup.decontaminationIndexWrite(empty, s"$base/grams") == 0L)
    // appending real docs to the empty artifact exercises the
    // null-maxSid numbering path: ids start at 0, artifact serves
    Dedup.jaccardIndexAppend(docs.where(col("doc_id") <= 3),
      s"$base/idx", w = 3)
    val dict = spark.read.parquet(s"$base/idx/df")
    assert(dict.count() > 0 &&
      dict.agg(min("sid")).head().getLong(0) == 0L)
    assert(Dedup.jaccardJoinIndexed(spark, s"$base/idx",
      threshold = 0.8).collect().map(_.toString).sorted.toSeq ==
      Dedup.jaccardJoin(docs.where(col("doc_id") <= 3),
        threshold = 0.8).collect().map(_.toString).sorted.toSeq)
  }

  test("signature artifact: legacy (no metadata) reads and appends as-is") {
    val path = tmp("sig_legacy")
    Dedup.minHashSignatures(
      Dedup.shingles(docs.where(col("doc_id") <= 3), w = 3), numHashes = 16)
      .write.parquet(path)
    // any declared params are accepted (unvalidated)
    assert(Dedup.signatureIndexRead(spark, path, w = 5).count() == 3)
    // append to a legacy artifact stays metadata-free: one schema
    Dedup.signatureIndexAppend(docs.where(col("doc_id") > 3), path)
    assert(!spark.read.parquet(path).columns.contains("w"))
    assert(spark.read.parquet(path).count() == 5)
  }
}
