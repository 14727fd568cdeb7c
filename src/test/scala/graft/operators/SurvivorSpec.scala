package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Behavioral specs for quality-aware survivor selection, leakage-safe
  * splits, and the KMV set-operation sketch — the round-5 cluster-level
  * curation additions. */
class SurvivorSpec extends SparkSpec {

  // pairs forming clusters {1,2,3} and {5,6}; 4 and 7 are singletons
  private def pairs = {
    import spark.implicits._
    Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("id_a", "id_b")
  }

  private def docs = {
    import spark.implicits._
    (1L to 7L).toDF("doc_id")
  }

  private def quality(q: (Long, Double)*) = {
    import spark.implicits._
    q.toDF("doc_id", "quality")
  }

  test("survivorSelection keeps the highest-quality doc per cluster") {
    val q = quality(1L -> 0.2, 2L -> 0.9, 3L -> 0.5, 4L -> 0.1,
      5L -> 0.3, 6L -> 0.8, 7L -> 0.0)
    val out = Dedup.survivorSelection(docs, pairs, q)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("cluster_id"), r.getAs[Long]("survivor_id"),
          r.getAs[Boolean]("is_survivor"))).toMap
    assert(out(1L) == ((1L, 2L, false)))
    assert(out(2L) == ((1L, 2L, true))) // best quality in {1,2,3}
    assert(out(3L) == ((1L, 2L, false)))
    assert(out(4L) == ((4L, 4L, true))) // singleton survives itself
    assert(out(6L) == ((5L, 6L, true))) // best quality in {5,6}
    assert(out(5L) == ((5L, 6L, false)))
    assert(out(7L) == ((7L, 7L, true)))
  }

  test("survivorSelection breaks quality ties on the smallest id") {
    val q = quality(1L -> 0.5, 2L -> 0.5, 3L -> 0.5, 4L -> 0.5,
      5L -> 0.5, 6L -> 0.5, 7L -> 0.5)
    val winners = Dedup.survivorSelection(docs, pairs, q)
      .where(col("is_survivor"))
      .collect().map(_.getAs[Long]("survivor_id")).toSet
    assert(winners == Set(1L, 4L, 5L, 7L))
  }

  test("leakageSafeSplit never puts a pair across a split boundary") {
    import spark.implicits._
    // a larger random-ish pair set: chains of consecutive ids
    val manyPairs = (1L until 200L by 2)
      .map(i => (i, i + 1)).toDF("id_a", "id_b")
    val manyDocs = (1L to 220L).toDF("doc_id")
    val split = Sampling.leakageSafeSplit(manyDocs, manyPairs,
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .select("doc_id", "split")
    val crossing = manyPairs
      .join(split.as("sa"), col("id_a") === col("sa.doc_id"))
      .join(split.as("sb"), col("id_b") === col("sb.doc_id"))
      .where(col("sa.split") =!= col("sb.split"))
      .count()
    assert(crossing == 0L)
    // all three splits are actually populated at this size
    assert(split.select("split").distinct().count() == 3L)
  }

  test("leakageSafeSplit singletons keep plain splitAssign behavior") {
    import spark.implicits._
    val lonelyDocs = (1000L to 1100L).toDF("doc_id")
    val noPairs = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    val got = Sampling.leakageSafeSplit(lonelyDocs, noPairs,
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .select("doc_id", "split")
    val want = Sampling.splitAssign(lonelyDocs, col("doc_id"),
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
  }

  test("kmvOverlap is exact below k and nails disjoint/identical sets") {
    import spark.implicits._
    val a = (1 to 50).map(i => s"tok$i").toDF("v")
    val sameAsA = (1 to 50).map(i => s"tok$i").toDF("v")
    val disjoint = (100 to 130).map(i => s"tok$i").toDF("v")
    val ident = Sketch.kmvOverlap(a, sameAsA, "v", k = 256).head()
    assert(ident.getAs[Long]("n_kept_a") == 50L)
    assert(ident.getAs[Double]("est_jaccard") == 1.0)
    assert(ident.getAs[Double]("est_intersection") == 50.0)
    val disj = Sketch.kmvOverlap(a, disjoint, "v", k = 256).head()
    assert(disj.getAs[Double]("est_jaccard") == 0.0)
    assert(disj.getAs[Double]("est_intersection") == 0.0)
    assert(disj.getAs[Double]("est_union") == 81.0)
  }

  test("kmvOverlap partial overlap is exact when everything fits in k") {
    import spark.implicits._
    val a = (1 to 60).map(i => s"w$i").toDF("v")
    val b = (41 to 100).map(i => s"w$i").toDF("v")
    val r = Sketch.kmvOverlap(a, b, "v", k = 256).head()
    assert(r.getAs[Double]("est_a") == 60.0)
    assert(r.getAs[Double]("est_b") == 60.0)
    assert(r.getAs[Double]("est_union") == 100.0)
    assert(r.getAs[Double]("est_intersection") == 20.0)
    assert(r.getAs[Double]("est_jaccard") == 0.2)
  }

  test("kmvOverlap estimation path lands near truth at k << n") {
    import spark.implicits._
    // |A| = 4000, |B| = 4000, |A∩B| = 2000 → union 6000, J = 1/3
    val a = (1 to 4000).map(i => s"item$i").toDF("v")
    val b = (2001 to 6000).map(i => s"item$i").toDF("v")
    val r = Sketch.kmvOverlap(a, b, "v", k = 256).head()
    assert(r.getAs[Long]("n_kept_a") == 256L)
    def within(got: Double, truth: Double, tol: Double) =
      math.abs(got - truth) <= truth * tol
    assert(within(r.getAs[Double]("est_a"), 4000, 0.25))
    assert(within(r.getAs[Double]("est_union"), 6000, 0.25))
    assert(within(r.getAs[Double]("est_jaccard"), 1.0 / 3, 0.35))
    assert(within(r.getAs[Double]("est_intersection"), 2000, 0.45))
  }

  test("kmvMerge: per-shard bottom-ks re-cut EXACTLY to the corpus sketch") {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    // duplicate values across shards on purpose: the distinct-union
    // must collapse them before the re-cut
    val vals = (1 to 3000).map(_ => rnd.nextInt(800))
      .zipWithIndex.map { case (v, i) => (v.toString, i % 5) }
      .toDF("v", "shard")
    for (k <- Seq(16, 64)) {
      def rows(f: org.apache.spark.sql.DataFrame) =
        f.orderBy("hfrac", "v").collect()
          .map(r => (r.getString(0), r.getDouble(1))).toList
      val single = rows(Sketch.kmvSketch(vals, "v", k))
      val merged = rows(Sketch.kmvMerge(
        (0 until 5).map(sh => Sketch.kmvSketch(
          vals.where(col("shard") === sh), "v", k))
          .reduce(_ unionByName _), k))
      assert(merged == single, s"k=$k diverged")
    }
  }

  test("curriculumTiers: monotone in score, 0-based, bands near n/tiers") {
    import spark.implicits._
    // scores 0..899 uniformly: cuts land near 300 and 600 (within the
    // sketch's bucket-low tolerance), tiers monotone in the score
    val scored = (0 until 900).map(i => (i.toLong, i.toLong))
      .toDF("doc_id", "d")
    val got = Sampling.curriculumTiers(scored, "d", nTiers = 3)
      .select("d", "tier").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
    assert(got.map(_._2).distinct.sorted.sameElements(Array(0L, 1L, 2L)))
    // monotone: tier never decreases as the score grows
    assert(got.map(_._2).zip(got.map(_._2).tail).forall(p => p._1 <= p._2))
    // each band holds n/3 within the 2^-b relative cut tolerance
    val sizes = got.groupBy(_._2).view.mapValues(_.length).toMap
    sizes.values.foreach(n => assert(math.abs(n - 300) <= 300 / 16,
      s"band sizes $sizes stray past the sketch tolerance"))
    // degenerate corpus: every score equal -> everything in the top tier
    val flat = (0 until 50).map(i => (i.toLong, 7L)).toDF("doc_id", "d")
    val tiers = Sampling.curriculumTiers(flat, "d", nTiers = 3)
      .select("tier").distinct().collect().map(_.getLong(0)).toSet
    assert(tiers == Set(2L))
  }

  test("quantileNormalize: monotone per stratum, extremes map to extremes") {
    import spark.implicits._
    // source A scores 1..10, source B scores 101..200: after
    // normalization both spread over the GLOBAL value range
    val rows = ((1 to 10).map(v => ("A", v.toLong)) ++
      (101 to 200).map(v => ("B", v.toLong))).toDF("src", "v")
    val got = Sampling.quantileNormalize(rows, col("src"), col("v"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(3)).toMap
    // each stratum's max sits at rank fraction 1 -> global max (200)
    assert(got(("A", 10L)) == 200L && got(("B", 200L)) == 200L)
    // monotone within each stratum
    for (s <- Seq("A", "B")) {
      val vs = got.keys.filter(_._1 == s).map(_._2).toSeq.sorted
      val ns = vs.map(v => got((s, v)))
      assert(ns.zip(ns.tail).forall(p => p._1 <= p._2), s"$s: $ns")
    }
    // A's median (rank 5/10) lands at the global ~50th percentile
    // value: rg = ceil(5 * 110 / 10) = 55 -> global value #55 = 145
    assert(got(("A", 5L)) == 145L)
  }

  test("percentileRank: exact mid-rank percentiles, ties share, monotone") {
    import spark.implicits._
    // 1,2,2,3: average ranks 1, 2.5, 2.5, 4; Hazen pct = (r̄−½)/n
    // -> 12.5 %, 50 % (the tied pair), 87.5 %
    val got = Sampling.percentileRank(
      Seq(1L, 2L, 2L, 3L).toDF("v"), col("v"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(got(1L) == (1L, 125000L), got.toString)   // (2*1-1)*5e5/4
    assert(got(2L) == (2L, 500000L), got.toString)   // (2*3-2)*5e5/4
    assert(got(3L) == (1L, 875000L), got.toString)   // (2*4-1)*5e5/4
    // monotone + bounded on a random column with duplicates
    val rnd = new scala.util.Random(5)
    val vals = (0 until 700).map(_ => rnd.nextInt(90).toLong)
    val pr = Sampling.percentileRank(vals.toDF("v"), col("v"))
      .orderBy("v").collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(pr.map(_._2).zip(pr.map(_._2).tail).forall(p => p._1 < p._2))
    assert(pr.forall(p => p._2 >= 0L && p._2 < 1000000L))
  }
}
