package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Behavioral specs for k-means centroid training on a fixture with
  * two obvious cosine clusters, adversarially id-ordered (the lowest
  * ids all sit in cluster A, the failure mode of naive lowest-id
  * seeding) — proving both the k-means++ maximin init and Lloyd
  * iteration do real work. */
class SimilaritySpec extends SparkSpec {

  private def vecs = {
    import spark.implicits._
    Seq(
      (1L, Array(1.0f, 0.0f, 0.0f, 0.0f)), // cluster A (seed)
      (2L, Array(0.9f, 0.1f, 0.0f, 0.0f)), // cluster A (seed)
      (3L, Array(0.95f, 0.05f, 0.0f, 0.0f)), // cluster A
      (4L, Array(0.0f, 1.0f, 0.0f, 0.0f)), // cluster B
      (5L, Array(0.1f, 0.9f, 0.0f, 0.0f)), // cluster B
      (6L, Array(0.0f, 0.95f, 0.05f, 0.0f))) // cluster B
      .toDF("vec_id", "embedding")
  }

  test("kmeansFit separates the two cosine clusters from bad seeds") {
    val cents = Similarity.kmeansFit(vecs, k = 2, iters = 2)
    assert(cents.count() == 2)
    val byId = Similarity.assignCells(vecs, cents)
      .select("vec_id", "cid").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Set(1L, 2L, 3L).map(byId) .size == 1, "cluster A split")
    assert(Set(4L, 5L, 6L).map(byId).size == 1, "cluster B split")
    assert(byId(1L) != byId(4L), "clusters collapsed")
  }

  test("k-means++ init spreads seeds across clusters (maximin recall)") {
    val seeds = Similarity.kmeansPlusPlusInit(vecs, k = 2)
      .collect().map(_.getLong(0)).toSet
    assert(seeds.size == 2)
    // greedy maximin must land one seed per cluster whichever vector
    // the hash rank picks first — lowest-id seeding would pick {1, 2}
    assert(seeds.exists(_ <= 3L) && seeds.exists(_ >= 4L), s"seeds: $seeds")
    // pure function of (ids, vectors): layout-independent
    val again = Similarity.kmeansPlusPlusInit(vecs.repartition(5), k = 2)
      .collect().map(_.getLong(0)).toSet
    assert(seeds == again)
  }

  test("k-means++ init survives zero-norm vectors and never seeds them") {
    import spark.implicits._
    val withZero = vecs.unionByName(
      Seq((0L, Array(0.0f, 0.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding"))
    // id 0 hashes ahead of several rows — without the norm filter the
    // driver greedy would compute 0/0 → NaN and crash
    val seeds = Similarity.kmeansPlusPlusInit(withZero, k = 2)
      .collect().map(_.getLong(0)).toSet
    assert(!seeds.contains(0L) && seeds.size == 2)
  }

  test("centroid coordinates are exact quantized means") {
    // one iteration from one seed: centroid = mean of ALL vectors,
    // computed as sum(floor(x*1e4))/(1e4*n) — exactly reproducible
    val cents = Similarity.kmeansFit(vecs, k = 1, iters = 1)
    val cvec = cents.select("cvec").head().getSeq[Double](0)
    val cols = vecs.collect().map(_.getSeq[Float](1))
    val want = (0 until 4).map { i =>
      cols.map(v => math.floor(v(i).toDouble * 10000).toLong).sum
        .toDouble / (10000.0 * cols.length)
    }
    assert(cvec == want)
  }

  test("assignCells broadcasts centroids — no corpus-side shuffle") {
    val cents = Similarity.kmeansFit(vecs, k = 2, iters = 1)
    val plan = Similarity.assignCells(vecs, cents)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastExchange"), plan)
  }

  test("kmeansFit is partition-independent (quantized-mean determinism)") {
    def fit(df: org.apache.spark.sql.DataFrame) =
      Similarity.kmeansFit(df, k = 2, iters = 2).collect()
        .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val a = fit(vecs)
    val b = fit(vecs.repartition(7))
    val c = fit(vecs.coalesce(1))
    // bit-identical centroids whatever the physical layout — exact
    // long sums have no accumulation order
    assert(a == b && a == c)
  }

  test("assignCells rejects a non-numeric centroid id up front") {
    import spark.implicits._
    val strCents = Seq(("a", Array(1.0, 0.0, 0.0, 0.0)))
      .toDF("cid", "cvec")
    val e = intercept[IllegalArgumentException] {
      Similarity.assignCells(vecs, strCents)
    }
    assert(e.getMessage.contains("NUMERIC centroid id"), e.getMessage)
  }

  test("kmeansPlusPlusInit names the zero-norm failure, not 'empty corpus'") {
    import spark.implicits._
    val zeros = Seq((1L, Array(0.0f, 0.0f)), (2L, Array(0.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      Similarity.kmeansPlusPlusInit(zeros, k = 1)
    }
    assert(e.getMessage.contains("zero-norm"), e.getMessage)
  }

  // ---- product quantization ------------------------------------------

  /** 8-dim fixture for PQ with m=2 (two 4-dim subspaces), k=2. */
  private def pqVecs = {
    import spark.implicits._
    Seq(
      (1L, Array(1.0f, 0.0f, 0.1f, 0.0f, 0.0f, 0.9f, 0.0f, 0.1f)),
      (2L, Array(0.9f, 0.1f, 0.0f, 0.0f, 0.1f, 1.0f, 0.0f, 0.0f)),
      (3L, Array(0.0f, 1.0f, 0.0f, 0.1f, 0.9f, 0.0f, 0.1f, 0.0f)),
      (4L, Array(0.1f, 0.9f, 0.1f, 0.0f, 1.0f, 0.0f, 0.0f, 0.1f)),
      (5L, Array(0.0f, 0.1f, 1.0f, 0.9f, 0.0f, 0.1f, 0.9f, 1.0f)),
      (6L, Array(0.1f, 0.0f, 0.9f, 1.0f, 0.1f, 0.0f, 1.0f, 0.9f)))
      .toDF("vec_id", "embedding")
  }

  private def dotD(a: Seq[Double], b: Seq[Double]): Double =
    a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + x * y }

  private def microD(a: Seq[Double], b: Seq[Double]): Long =
    math.floor(1000000.0 *
      (dotD(a, a) - 2.0 * dotD(a, b) + dotD(b, b))).toLong

  test("PQ encode picks the exact argmin codeword per subspace") {
    val books = Similarity.pqCodebooks(pqVecs, m = 2, k = 2, dim = 8)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getSeq[Double](2))
      .toMap
    assert(books.size == 4, s"expected 2 subs x 2 codes, got $books")
    val enc = Similarity.pqEncode(pqVecs, Similarity.pqCodebooks(pqVecs,
        m = 2, k = 2, dim = 8), m = 2, k = 2, dim = 8)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val raw = pqVecs.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble)).toMap
    for ((id, v) <- raw; s <- 0 until 2) {
      val sv = v.slice(s * 4, s * 4 + 4)
      // argmin over exact-long micro distances, ties to the lowest code
      val want = (0 until 2).minBy(c => (microD(sv, books((s, c))), c))
      assert(enc(id)(s) == want, s"vec $id sub $s: ${enc(id)(s)} != $want")
    }
  }

  test("PQ ADC distance is the exact sum of table lookups") {
    val books = Similarity.pqCodebooks(pqVecs, m = 2, k = 2, dim = 8)
    val enc = Similarity.pqEncode(pqVecs, books, m = 2, k = 2, dim = 8)
    val dts = Similarity.pqDistanceTables(
      pqVecs.where(col("vec_id") <= 2), books, m = 2, k = 2, dim = 8)
    val got = Similarity.pqTopKWith(enc, dts, topK = 10, m = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(3)).toMap
    val bookMap = books.collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getSeq[Double](2)).toMap
    val codes = enc.collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val raw = pqVecs.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble)).toMap
    for (q <- Seq(1L, 2L); n <- raw.keys if n != q) {
      val want = (0 until 2).map { s =>
        microD(raw(q).slice(s * 4, s * 4 + 4), bookMap((s, codes(n)(s))))
      }.sum
      assert(got((q, n)) == want, s"adist($q,$n): ${got((q, n))} != $want")
    }
  }

  test("PQ rerank with a full-corpus shortlist equals brute force") {
    val got = Similarity.pqTopKRerank(pqVecs, pqVecs.where(col("vec_id") <= 2),
        topK = 3, shortlist = 10, m = 2, k = 2, dim = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSet
    val want = Similarity.bruteForceTopK(pqVecs,
        pqVecs.where(col("vec_id") <= 2), k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSet
    // a shortlist covering the whole corpus makes the exact re-rank
    // decide everything: PQ compression must drop out entirely
    assert(got == want, s"got $got\nwant $want")
  }

  test("pqEncode fails fast on a malformed codebook") {
    // wrong row count: the dense (sub, code) addressing would silently
    // read the wrong codewords — must die with the row-count message
    val short = Similarity.pqCodebooks(pqVecs, m = 2, k = 2, dim = 8).limit(3)
    val e = intercept[Exception] {
      Similarity.pqEncode(pqVecs, short, m = 2, k = 2, dim = 8).collect()
    }
    assert(e.getMessage.contains("m*k") ||
      Option(e.getCause).exists(_.getMessage.contains("m*k")), e.getMessage)
  }

  test("pqCodebooksTrained: m*k rows kept, trained books re-encode exactly") {
    val trained = Similarity.pqCodebooksTrained(pqVecs, m = 2, k = 2,
      dim = 8, iters = 2)
    val rows = trained.collect()
    // Lloyd rounds must preserve the dense m*k layout (empty codes
    // keep their previous codeword), or pqEncode's addressing breaks
    assert(rows.map(r => (r.getInt(0), r.getInt(1))).toSet ==
      (for (s <- 0 until 2; c <- 0 until 2) yield (s, c)).toSet)
    // the trained centroid of each assigned group is the exact
    // quantized mean: re-assigning with the trained books must agree
    // with a driver-local replay of one more assignment
    val bookMap = rows.map(r =>
      (r.getInt(0), r.getInt(1)) -> r.getSeq[Double](2)).toMap
    val enc = Similarity.pqEncode(pqVecs, trained, m = 2, k = 2, dim = 8)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val raw = pqVecs.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble)).toMap
    for ((id, v) <- raw; s <- 0 until 2) {
      val sv = v.slice(s * 4, s * 4 + 4)
      val want = (0 until 2).minBy(c => (microD(sv, bookMap((s, c))), c))
      assert(enc(id)(s) == want, s"vec $id sub $s: ${enc(id)(s)} != $want")
    }
    // determinism: a second fit reproduces the same codebook bits
    val again = Similarity.pqCodebooksTrained(pqVecs, m = 2, k = 2,
      dim = 8, iters = 2).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getSeq[Double](2)).toMap
    assert(again == bookMap)
  }

  test("PQ encode is partition-independent") {
    val books = Similarity.pqCodebooks(pqVecs, m = 2, k = 2, dim = 8)
    def codes(df: org.apache.spark.sql.DataFrame) =
      Similarity.pqEncode(df, books, m = 2, k = 2, dim = 8)
        .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(codes(pqVecs) == codes(pqVecs.repartition(7)))
  }

  test("SQ8: grid bounds, code range, flat dims, exact replay vs plain Scala") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    val dim = 6
    val data = (0L until 30L).map(i =>
      // dim 5 is FLAT (constant) — must encode 0, never divide by 0
      (i, Array.fill(dim - 1)(rnd.nextFloat() * 4f - 2f) :+ 1.5f))
    val df = data.toDF("vec_id", "embedding")
    val grid = Similarity.sqGrid(df).collect()
      .map(r => r.getInt(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(grid.size == dim)
    assert(grid(dim - 1)._1 == grid(dim - 1)._2) // flat dim
    val enc = Similarity.sqEncode(df, Similarity.sqGrid(df), dim = dim)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(enc.values.forall(cs =>
      cs.length == dim && cs.forall(c => c >= 0 && c <= 255)))
    assert(enc.values.forall(_.last == 0)) // flat dim encodes 0
    // plain-Scala replay of encode + asymmetric ADC
    val vecs = data.map { case (i, a) => i -> a.map(_.toDouble) }.toMap
    def code(d: Int, x: Double): Int = {
      val (lo, hi) = grid(d)
      if (hi == lo) 0
      else math.max(0, math.min(255,
        math.floor((x - lo) / (hi - lo) * 256).toInt))
    }
    for ((i, v) <- vecs)
      assert(enc(i) == v.zipWithIndex.map { case (x, d) => code(d, x) }
        .toSeq, s"codes for $i")
    def adist(q: Array[Double], cs: Seq[Int]): Long =
      (0 until dim).map { d =>
        val (lo, hi) = grid(d)
        val recon = lo + (cs(d) + 0.5) * (hi - lo) / 256
        math.floor(1000000.0 * (q(d) - recon) * (q(d) - recon)).toLong
      }.sum
    val got = Similarity.sqTopK(df, df.where(col("vec_id") < 3), 4,
      dim = dim).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    for (q <- 0L until 3L) {
      val want = vecs.keys.filter(_ != q).toSeq
        .map(n => (n, adist(vecs(q), enc(n))))
        .sortBy { case (n, d) => (d, n) }.take(4)
      val gotQ = got.filter(_._1 == q).sortBy(_._3)
        .map(r => (r._2, r._4)).toSeq
      assert(gotQ == want, s"query $q: $gotQ vs $want")
    }
    // the quantized ranking tracks the exact one: top-1 by SQ8 is in
    // the exact top-3 for every query (coarse but real fidelity)
    val exact = Similarity.bruteForceTopK(
      Similarity.l2Normalize(df), Similarity.l2Normalize(
        df.where(col("vec_id") < 3)), 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
      .groupBy(_._1).map { case (k, g) => k -> g.map(_._2).toSet }
    val sqTop1 = got.filter(_._3 == 1L).map(r => r._1 -> r._2).toMap
    // L2-on-raw vs cosine orderings differ in general; on this
    // centered fixture they should mostly agree — assert non-empty
    // intersection per query rather than equality
    assert(sqTop1.count { case (q, n) => exact(q).contains(n) } >= 2,
      s"$sqTop1 vs $exact")
  }

  test("SQ8 encode fails fast on NULL/NaN coordinates (never a silent 255)") {
    import spark.implicits._
    val bad = Seq((1L, Array(0.5f, Float.NaN)), (2L, Array(0.1f, 0.2f)))
      .toDF("vec_id", "embedding")
    val clean = bad.where(col("vec_id") === 2L)
    val e = intercept[Exception] {
      Similarity.sqEncode(bad, Similarity.sqGrid(clean), dim = 2)
        .collect()
    }
    assert(e.getMessage.contains("NULL or NaN"), e.getMessage)
  }

  test("SQ8 index: artifact round-trip serves bit-equal to the inline build") {
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    val df = (0L until 25L).map(i =>
      (i, Array.fill(6)(rnd.nextFloat() * 2f - 1f)))
      .toDF("vec_id", "embedding")
    val dir = java.nio.file.Files
      .createTempDirectory("sq_idx").toString + "/idx"
    Similarity.sqIndexWrite(df, dir, dim = 6)
    val (grid, enc) = Similarity.sqIndexRead(spark, dir)
    val served = Similarity.sqTopKWith(enc, grid,
        df.where(col("vec_id") < 3), 4, dim = 6)
      .collect().map(_.toString).sorted.toList
    val inline = Similarity.sqTopK(df, df.where(col("vec_id") < 3), 4,
        dim = 6)
      .collect().map(_.toString).sorted.toList
    assert(served == inline)
  }

  test("cluster-blocked near-dups stay within clusters") {
    val cents = Similarity.kmeansFit(vecs, k = 2, iters = 2)
    val withCid = Similarity.assignCells(vecs, cents)
      .select(col("vec_id"), col("embedding"), col("cid"))
    val pairs = Dedup.embeddingNearDups(withCid, col("cid"), "vec_id",
        "embedding", threshold = 0.9)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)) && pairs.contains((4L, 5L)))
    // cross-cluster pairs are never emitted, whatever their cosine
    assert(pairs.forall { case (a, b) => (a <= 3L) == (b <= 3L) })
  }
}
