package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Behavioral specs for the dedup family on crafted fixtures: known
  * duplicates must surface, known-distinct docs must not. */
class DedupSpec extends SparkSpec {

  private val base = "the quick brown fox jumps over the lazy dog " * 8

  private def docs = {
    import spark.implicits._
    Seq(
      (1L, base + "alpha beta gamma delta epsilon zeta"),
      (2L, base + "alpha beta gamma delta epsilon eta"), // near-dup of 1
      (3L, base + "alpha beta gamma delta epsilon zeta"), // exact dup of 1
      (4L, "completely different words entirely unrelated to anything " +
        "else here painting sculpture architecture music dance poetry " +
        "theatre cinema literature philosophy history geography"),
      (5L, "lorem ipsum dolor sit amet consectetur adipiscing elit sed " +
        "do eiusmod tempor incididunt ut labore et dolore magna aliqua"))
      .toDF("doc_id", "text")
  }

  test("exactGroups groups identical fingerprints, min id survives") {
    val fp = docs.select(col("doc_id"),
      TextAnalysis.fingerprint(col("text")).as("k"))
    val groups = Dedup.exactGroups(fp, col("k"))
      .collect().map(r => (r.getAs[Long]("keep_id"), r.getAs[Long]("n_dups")))
      .toSet
    assert(groups.contains((1L, 2L))) // docs 1 and 3 collapse, keep 1
    assert(groups.count(_._2 == 1L) == 3) // 2, 4, 5 unique
  }

  test("jaccardPairs finds the near-dup pair and the exact pair only") {
    val pairs = Dedup.jaccardPairs(docs, threshold = 0.8)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 3L)) && pairs.contains((1L, 2L)) &&
      pairs.contains((2L, 3L)))
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("minhashLshPairs recalls the same pairs as exact jaccard here") {
    val exact = Dedup.jaccardPairs(docs, threshold = 0.8)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.minhashLshPairs(docs, threshold = 0.8)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh == exact)
  }

  test("simhashPairs: exact dup at hamming 0; unrelated docs absent") {
    val got = Dedup.simhashPairs(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byPair = got.map(t => (t._1, t._2) -> t._3).toMap
    assert(byPair.get((1L, 3L)).contains(0L))
    assert(!byPair.keySet.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("simHash packs to a long, deterministic, equal for identical docs") {
    val hs = Dedup.simHash(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hs(1L) == hs(3L)) // identical docs, identical signature
    assert(hs(1L) != hs(4L))
    val again = Dedup.simHash(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(again == hs)
  }

  test("winnowFingerprint = min md5 over ALL character k-grams (shift-invariant form)") {
    import spark.implicits._
    val s = "the quick brown fox jumps over the lazy dog"
    val expected = (0 to s.length - 16).map(i =>
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.substring(i, i + 16).getBytes("UTF-8"))
        .map("%02x".format(_)).mkString).min
    val got = Seq(s).toDF("text")
      .select(TextAnalysis.winnowFingerprint(col("text")))
      .collect().head.getString(0)
    assert(got == expected)
    // a pure append keeps every existing k-gram: fingerprint can only
    // stay or become the min of a superset
    val appended = Seq(s + " extra suffix").toDF("text")
      .select(TextAnalysis.winnowFingerprint(col("text")))
      .collect().head.getString(0)
    assert(appended <= got)
  }

  test("embeddingNearDups with default sign-LSH blocking finds near vectors") {
    import spark.implicits._
    val e = Seq(
      (1L, Array(1.0f, 0.5f, -0.2f, 0.8f)),
      (2L, Array(0.99f, 0.52f, -0.19f, 0.81f)), // near-dup of 1
      (3L, Array(-1.0f, 0.5f, 0.2f, -0.8f)),
      (4L, Array(0.1f, -0.9f, 0.4f, 0.0f)))
      .toDF("vec_id", "embedding")
    val pairs = Dedup.embeddingNearDups(e, threshold = 0.99, bits = 4)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)))
  }
}
