package graft.operators

import graft.functions.VectorFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines, from exact to
  * fuzzy: hash-groupBy, MinHash+LSH banding, SimHash, n-gram Jaccard,
  * and embedding-cosine near-dup.
  *
  * Scale design (the 100 TB story):
  *   - exact/fingerprint dedup is one hash-partitioned groupBy on the
  *     dedup key — the single unavoidable shuffle, map-side combined.
  *   - all-pairs Jaccard is O(n²) and only exists here as the
  *     correctness oracle for small candidate sets; the scale path is
  *     MinHash→LSH bands→bucket join, which shuffles each doc a
  *     constant number of times (one row per band) and only pairs
  *     documents that collide in a band. Band-bucket skew (a
  *     degenerate bucket with k docs → k² pairs) is the known hot
  *     spot; `lshCandidates` caps bucket width defensively.
  *   - SimHash reduces each doc to a short bit string; near-dup =
  *     small Hamming distance, found by banding the bits (pigeonhole:
  *     d ≤ 3 over 4 bands ⇒ at least one band equal).
  *   - embedding near-dup blocks on a deterministic key before the
  *     quadratic cosine check.
  *
  * Everything is built from engine-portable primitives (md5, string
  * ops, higher-order array functions) so the DuckDB oracle can replay
  * each operator in plain SQL.
  */
object Dedup {

  /** w-token shingles of the lowercased text, distinct per document.
    * Output: (id, shingle) exploded — the input to Jaccard/MinHash. */
  def shingles(docs: DataFrame, id: String = "doc_id",
      textCol: String = "text", w: Int = 3): DataFrame = {
    val refs = (0 until w).map(k => s"toks[i+$k]").mkString(", ")
    docs
      .select(col(id), split(lower(col(textCol)), " ").as("toks"))
      .where(size(col("toks")) >= w)
      .select(col(id), explode(array_distinct(expr(
        s"transform(sequence(0, size(toks)-$w), i -> concat_ws(' ', $refs))")))
        .as("shingle"))
  }

  /** Exact dedup via hash-groupBy on a key expression (raw text, a
    * normalized form, or `TextAnalysis.fingerprint`). Keeps the
    * smallest id as the canonical survivor — deterministic, and
    * min/count are map-side-combinable so the shuffle carries one row
    * per (partition, key). Output: key, keep_id, n_dups. */
  def exactGroups(docs: DataFrame, key: Column, id: String = "doc_id"): DataFrame =
    docs.groupBy(key.as("dedup_key"))
      .agg(min(col(id)).as("keep_id"), count(lit(1)).as("n_dups"))

  /** All candidate pairs' exact shingle-Jaccard similarity, restricted
    * to pairs sharing >= 1 shingle (the join prunes disjoint pairs).
    * Output: id_a < id_b, n_common, n_a, n_b, jaccard.
    * O(pairs-with-overlap) — the oracle path, not the scale path. */
  def jaccardPairs(docs: DataFrame, id: String = "doc_id",
      textCol: String = "text", w: Int = 3,
      threshold: Double = 0.0): DataFrame = {
    val sh = shingles(docs, id, textCol, w)
    val sizes = sh.groupBy(col(id)).agg(count(lit(1)).as("sz"))
    val a = sh.select(col(id).as("id_a"), col("shingle"))
    val b = sh.select(col(id).as("id_b"), col("shingle"))
    val common = a.join(b, Seq("shingle"))
      .where(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("n_common"))
    common
      .join(sizes.withColumnRenamed("sz", "n_a"),
        common("id_a") === sizes(id)).drop(id)
      .join(sizes.withColumnRenamed("sz", "n_b"),
        col("id_b") === sizes(id)).drop(id)
      .withColumn("jaccard",
        col("n_common").cast("double") /
          (col("n_a") + col("n_b") - col("n_common")))
      .where(col("jaccard") >= threshold)
  }

  /** MinHash signatures: numHashes independent permutations simulated
    * by min(md5(seed || shingle)). Output: id, m0..m{k-1}.
    * One groupBy over the exploded shingles; each min is map-side
    * combinable. */
  def minHashSignatures(sh: DataFrame, id: String = "doc_id",
      numHashes: Int = 16): DataFrame =
    sh.groupBy(col(id)).agg(
      min(md5(concat(lit("0|"), col("shingle")))).as("m0"),
      (1 until numHashes).map(i =>
        min(md5(concat(lit(s"$i|"), col("shingle")))).as(s"m$i")): _*)

  /** LSH banding: hash `rowsPerBand` consecutive signature components
    * per band; docs sharing any band key are candidates. Output:
    * id_a < id_b distinct candidate pairs. `maxBucket` drops
    * degenerate buckets (skew guard: a k-doc bucket costs k²). */
  def lshCandidates(sigs: DataFrame, id: String = "doc_id",
      numHashes: Int = 16, bands: Int = 4,
      maxBucket: Int = 1000): DataFrame = {
    val rowsPerBand = numHashes / bands
    val bandKeys = (0 until bands).map { b =>
      val parts = (0 until rowsPerBand).map(r => col(s"m${b * rowsPerBand + r}"))
      struct(lit(b).as("band"), md5(concat(parts: _*)).as("bkey"))
    }
    val exploded = sigs.select(col(id),
        explode(array(bandKeys: _*)).as("bk"))
      .select(col(id), col("bk.band").as("band"), col("bk.bkey").as("bkey"))
    val pruned = exploded
      .withColumn("bucket_n",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window
          .partitionBy("band", "bkey")))
      .where(col("bucket_n") <= maxBucket)
    val l = pruned.select(col("band"), col("bkey"), col(id).as("id_a"))
    val r = pruned.select(col("band"), col("bkey"), col(id).as("id_b"))
    l.join(r, Seq("band", "bkey"))
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
  }

  /** Full MinHash-LSH near-dup pipeline: shingle → minhash → band →
    * candidate pairs → exact-Jaccard verification >= threshold.
    * The verification joins shingles only for candidate pairs, so the
    * quadratic blowup never materializes. Output like jaccardPairs. */
  def minhashLshPairs(docs: DataFrame, id: String = "doc_id",
      textCol: String = "text", w: Int = 3, numHashes: Int = 16,
      bands: Int = 4, threshold: Double = 0.8): DataFrame = {
    val sh = shingles(docs, id, textCol, w)
    val cands = lshCandidates(minHashSignatures(sh, id, numHashes), id,
      numHashes, bands)
    val sizes = sh.groupBy(col(id)).agg(count(lit(1)).as("sz"))
    val shA = sh.select(col(id).as("id_a"), col("shingle"))
    val shB = sh.select(col(id).as("id_b"), col("shingle"))
    val common = cands.join(shA, Seq("id_a")).join(shB, Seq("id_b", "shingle"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("n_common"))
    common
      .join(sizes.withColumnRenamed("sz", "n_a"),
        common("id_a") === sizes(id)).drop(id)
      .join(sizes.withColumnRenamed("sz", "n_b"),
        col("id_b") === sizes(id)).drop(id)
      .withColumn("jaccard",
        col("n_common").cast("double") /
          (col("n_a") + col("n_b") - col("n_common")))
      .where(col("jaccard") >= threshold)
  }

  /** SimHash over tokens: bit b is the sign of Σ_tokens (2·hbit−1)
    * where hbit = parity of hex digit b of md5(token). Output: id,
    * simhash ('0'/'1' string of length `bits`, MSB first). Narrow +
    * one groupBy. */
  def simHash(docs: DataFrame, id: String = "doc_id",
      textCol: String = "text", bits: Int = 16): DataFrame = {
    val tok = docs.select(col(id),
      explode(split(lower(col(textCol)), " ")).as("t"))
      .withColumn("h", md5(col("t")))
    val bitSums = tok.groupBy(col(id)).agg(
      sum(hexDigitParity(col("h"), 0) * 2 - 1).as("b0"),
      (1 until bits).map(b =>
        sum(hexDigitParity(col("h"), b) * 2 - 1).as(s"b$b")): _*)
    bitSums.select(col(id),
      concat((0 until bits).map(b =>
        when(col(s"b$b") >= 0, "1").otherwise("0")): _*).as("simhash"))
  }

  /** parity (0/1) of hex digit `pos` of a lowercase hex string —
    * instr-based so any SQL engine can replay it */
  private def hexDigitParity(hexStr: Column, pos: Int): Column =
    ((instr(lit("0123456789abcdef"), substring(hexStr, pos + 1, 1)) - 1) % 2)
      .cast("int")

  /** Hamming distance between equal-length bit strings. */
  def hamming(a: Column, b: Column, bits: Int): Column =
    (0 until bits).map(i =>
      when(substring(a, i + 1, 1) =!= substring(b, i + 1, 1), 1).otherwise(0))
      .reduce(_ + _)

  /** SimHash near-dup pairs with Hamming distance <= maxDist, found by
    * banding the bit string (pigeonhole over maxDist+1 bands). */
  def simhashPairs(docs: DataFrame, id: String = "doc_id",
      textCol: String = "text", bits: Int = 16,
      maxDist: Int = 3): DataFrame = {
    val bands = maxDist + 1
    val width = bits / bands
    val sh = simHash(docs, id, textCol, bits)
    val banded = sh.select(col(id), col("simhash"),
      explode(array((0 until bands).map(b =>
        struct(lit(b).as("band"),
          substring(col("simhash"), b * width + 1, width).as("bkey"))): _*))
        .as("bk"))
      .select(col(id), col("simhash"), col("bk.band").as("band"),
        col("bk.bkey").as("bkey"))
    val l = banded.select(col("band"), col("bkey"), col(id).as("id_a"),
      col("simhash").as("sh_a"))
    val r = banded.select(col("band"), col("bkey"), col(id).as("id_b"),
      col("simhash").as("sh_b"))
    l.join(r, Seq("band", "bkey")).where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("sh_a"), col("sh_b")).distinct()
      .withColumn("hamming", hamming(col("sh_a"), col("sh_b"), bits).cast("long"))
      .where(col("hamming") <= maxDist)
      .select("id_a", "id_b", "hamming")
  }

  /** Embedding-cosine near-duplicate pairs, blocked on a deterministic
    * key (at scale: an LSH/IVF bucket; here any low-cardinality
    * column) so the pairwise check is bucket-local. */
  def embeddingNearDups(embs: DataFrame, blockKey: Column,
      id: String = "vec_id", vecCol: String = "embedding",
      threshold: Double = 0.9): DataFrame = {
    val withKey = embs.select(col(id), col(vecCol), blockKey.as("bk"))
    val l = withKey.select(col("bk"), col(id).as("id_a"), col(vecCol).as("v_a"))
    val r = withKey.select(col("bk"), col(id).as("id_b"), col(vecCol).as("v_b"))
    l.join(r, Seq("bk")).where(col("id_a") < col("id_b"))
      .withColumn("cosine", VectorFunctions.cosine(col("v_a"), col("v_b")))
      .where(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), col("cosine"))
  }
}
