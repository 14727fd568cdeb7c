package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[Graph]]: PageRank in exact micro-units — pinned against a
  * driver-side integer replay of the same recurrence (the same
  * arithmetic the DuckDB oracle runs), plus the structural properties
  * a rank must satisfy. */
class GraphSpec extends SparkSpec {

  import spark.implicits._

  /** Reference implementation: the identical integer micro-unit
    * recurrence, computed in plain Scala maps. */
  private def refPageRank(edges: Seq[(Long, Long)], iters: Int,
      dampingPct: Int): Map[Long, Double] = {
    val e = edges.filter(p => p._1 != p._2).distinct
    val nodes = (e.map(_._1) ++ e.map(_._2)).distinct
    val n = nodes.size
    val outdeg = e.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    val initU = 1000000L / n
    val baseU = (100L - dampingPct) * 10000L / n
    var ranks = nodes.map(_ -> initU).toMap
    for (_ <- 1 to iters) {
      val in = e.groupBy(_._2)
      ranks = nodes.map { v =>
        val s = in.getOrElse(v, Nil).map { case (u, _) =>
          ranks(u) * dampingPct / (outdeg(u) * 100)
        }.sum
        v -> (baseU + s)
      }.toMap
    }
    ranks.map { case (k, u) =>
      k -> BigDecimal(u / 1e6).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble
    }
  }

  test("pageRank equals the integer replay on a known graph") {
    // 1 and 2 cite each other; both cite 3 (a sink); 4 cites 1
    val edges = Seq((1L, 2L), (2L, 1L), (1L, 3L), (2L, 3L), (4L, 1L))
    val got = Graph.pageRank(edges.toDF("src", "dst"), iters = 5)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val want = refPageRank(edges, iters = 5, dampingPct = 85)
    assert(got == want, s"got $got want $want")
    // sink 3 collects the most rank; 4 (no in-links) the least
    assert(got(3L) > got(1L) && got(1L) > got(4L), got.toString)
    // duplicate edges and self-loops change nothing
    val noisy = edges ++ Seq((1L, 2L), (3L, 3L))
    val got2 = Graph.pageRank(noisy.toDF("src", "dst"), iters = 5)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got2 == got)
  }

  test("pageRank structural properties on a hash-derived graph") {
    val edges = (0 until 400).map { i =>
      val h = s"g$i".hashCode
      ((h & 0x7fffffff) % 50L, ((h >> 8) & 0x7fffffff) % 50L)
    }.filter(p => p._1 != p._2)
    val df = Graph.pageRank(edges.toDF("src", "dst"), iters = 4)
    val rows = df.collect().map(r => r.getLong(0) -> r.getDouble(1))
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    assert(rows.length == nodes.size, "one rank per node")
    assert(rows.forall(_._2 > 0), "every rank positive (teleport floor)")
    // total mass <= 1 (dangling loss + floor truncation only)
    assert(rows.map(_._2).sum <= 1.0 + 1e-9)
    assert(rows.toMap == refPageRank(edges, 4, 85))
  }

  test("personalizedPageRank: mass concentrates near the seed set") {
    // a 0->1->2->3->4 chain plus a disconnected 10->11: seeding {0}
    // must rank the chain and zero out the far component's teleport
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L),
      (10L, 11L))
    val pr = Graph.personalizedPageRank(edges.toDF("src", "dst"),
      Seq(0L).toDF("node"), iters = 8)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(pr(0L) > pr(1L) && pr(1L) > pr(2L), pr.toString)
    assert(pr(10L) == 0.0 && pr(11L) == 0.0,
      s"unreachable nodes must hold zero mass: $pr")
    // uniform-seed personalization over ALL nodes == plain pageRank
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    val uni = Graph.personalizedPageRank(edges.toDF("src", "dst"),
      nodes.toDF("node"), iters = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val plain = Graph.pageRank(edges.toDF("src", "dst"), iters = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(uni == plain, s"uniform seeds diverged: $uni vs $plain")
  }

  test("hits: integer replay, max-normalized, hub/authority split") {
    // 1 and 2 both point at 3 and 4 (hubs); 3,4 point nowhere
    val edges = Seq((1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (5L, 1L))
    def refHits(iters: Int): Map[Long, (Double, Double)] = {
      val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
      var hub = nodes.map(_ -> 1000000L).toMap
      var auth = nodes.map(_ -> 1000000L).toMap
      def norm(m: Map[Long, Long]): Map[Long, Long] = {
        val mx = m.values.max
        m.map { case (k, v) => k -> v * 1000000L / mx }
      }
      for (_ <- 1 to iters) {
        auth = norm(nodes.map(v =>
          v -> edges.filter(_._2 == v).map(e => hub(e._1)).sum).toMap)
        hub = norm(nodes.map(v =>
          v -> edges.filter(_._1 == v).map(e => auth(e._2)).sum).toMap)
      }
      def d6(u: Long) = BigDecimal(u / 1e6).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble
      nodes.map(v => v -> (d6(auth(v)), d6(hub(v)))).toMap
    }
    val got = Graph.hits(edges.toDF("src", "dst"), iters = 2)
      .collect().map(r =>
        r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(got == refHits(2), s"got $got want ${refHits(2)}")
    // 3/4 are the top authorities; 1/2 the top hubs; max of each = 1
    assert(got(3L)._1 == 1.0 && got(4L)._1 == 1.0)
    assert(got(1L)._2 == 1.0 && got(2L)._2 == 1.0)
    assert(got(5L)._1 < got(3L)._1 && got(5L)._2 < got(1L)._2)
  }

  test("triangles: known graphs and a brute-force random pin") {
    def count(edges: Seq[(Long, Long)]): (Long, Long) = {
      val r = Graph.triangles(edges.toDF("src", "dst")).head
      (r.getLong(0), r.getLong(1))
    }
    // K4 has 4 triangles; its oriented wedge count is 6 (one per
    // vertex pair through their common smaller neighbor... exact
    // value pinned by the brute force below, asserted literally here)
    val k4 = for {
      i <- 0L to 3L; j <- 0L to 3L if i < j
    } yield (i, j)
    assert(count(k4)._2 == 4L, count(k4).toString)
    // a 4-cycle has wedges but zero triangles
    val c4 = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L))
    val (w4, t4) = count(c4)
    assert(t4 == 0L && w4 > 0L, s"($w4, $t4)")
    // duplicate / reversed / self-loop edges change nothing
    assert(count(k4 ++ k4.map(_.swap) ++ Seq((2L, 2L))) == count(k4))
    // random graph vs brute-force triple enumeration
    val rnd = new scala.util.Random(7)
    val edges = (1 to 120).map(_ =>
      (rnd.nextInt(15).toLong, rnd.nextInt(15).toLong))
      .filter(p => p._1 != p._2)
    val und = edges.map(p =>
      (math.min(p._1, p._2), math.max(p._1, p._2))).distinct
    val undSet = und.toSet
    val nodes = und.flatMap(p => Seq(p._1, p._2)).distinct.sorted
    val brute = (for {
      i <- nodes; j <- nodes if i < j; k <- nodes if j < k
      if undSet((i, j)) && undSet((j, k)) && undSet((i, k))
    } yield 1).size.toLong
    assert(count(edges)._2 == brute, s"got ${count(edges)} want $brute")
  }

  test("localClustering: known values, NULL under degree 2, brute-force pin") {
    // triangle 0-1-2 plus a pendant 3 attached to 0:
    // lcc(1)=lcc(2)=1.0; lcc(0)=2*1/(3*2)=1/3; lcc(3) NULL (deg 1)
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 0L), (0L, 3L))
    val got = Graph.localClustering(edges.toDF("src", "dst"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(got(1L) == ((2L, 1L, Some(1.0))), got.toString)
    assert(got(2L) == ((2L, 1L, Some(1.0))), got.toString)
    assert(got(0L) == ((3L, 1L, Some(0.333333))), got.toString)
    assert(got(3L) == ((1L, 0L, None)), got.toString)
    // per-node counts sum to 3x the census total on a random graph
    val rnd = new scala.util.Random(11)
    val re = (1 to 150).map(_ =>
      (rnd.nextInt(12).toLong, rnd.nextInt(12).toLong))
      .filter(p => p._1 != p._2)
    val total = Graph.triangles(re.toDF("src", "dst"))
      .head.getLong(1)
    val perNode = Graph.localClustering(re.toDF("src", "dst"))
      .agg(sum("n_triangles")).head.getLong(0)
    assert(perNode == 3 * total, s"$perNode vs 3*$total")
  }

  test("kCore: multi-round peel, empty core, brute-force random pin") {
    // K4 (nodes 0-3) + a tail 3-4-5-6: k=3 keeps exactly the K4, and
    // the tail peels over MULTIPLE rounds (6 first, then 5, then 4)
    val k4 = for (i <- 0L to 3L; j <- (i + 1) to 3L) yield (i, j)
    val tail = Seq((3L, 4L), (4L, 5L), (5L, 6L))
    val edges = (k4 ++ tail).toDF("src", "dst")
    val got = Graph.kCore(edges, k = 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(0L -> 3L, 1L -> 3L, 2L -> 3L, 3L -> 3L), got.toString)
    // no 4-core exists -> empty result
    assert(Graph.kCore(edges, k = 4).isEmpty)
    // brute-force pin on a random multigraph (dups + self-loops mixed in)
    val rnd = new scala.util.Random(23)
    val re = (1 to 120).map(_ =>
      (rnd.nextInt(15).toLong, rnd.nextInt(15).toLong))
    def brute(k: Int): Map[Long, Long] = {
      var es = re.filter(p => p._1 != p._2)
        .map(p => (p._1 min p._2, p._1 max p._2)).toSet
      var changed = true
      while (changed) {
        val deg = es.toSeq.flatMap(e => Seq(e._1, e._2))
          .groupBy(identity).map { case (n, v) => n -> v.size.toLong }
        val low = deg.filter(_._2 < k).keySet
        changed = low.nonEmpty
        es = es.filter(e => !low(e._1) && !low(e._2))
      }
      es.toSeq.flatMap(e => Seq(e._1, e._2)).groupBy(identity)
        .map { case (n, v) => n -> v.size.toLong }
    }
    for (k <- Seq(2, 4, 6)) {
      val spark_ = Graph.kCore(re.toDF("src", "dst"), k = k).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(spark_ == brute(k), s"k=$k: $spark_ vs ${brute(k)}")
    }
  }

  test("randomWalks: edges followed, sinks end walks, fully deterministic") {
    // 1 -> {2, 3}, 2 -> 4; 3 and 4 are sinks
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 4L)).toDF("src", "dst")
    val got = Graph.randomWalks(edges, length = 3, walksPerNode = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getString(3))).toMap
    assert(got.size == 8) // 4 nodes x 2 reps
    // sinks never move
    assert(got((3L, 1L)) == ((1L, "3")) && got((4L, 2L)) == ((1L, "4")))
    // every consecutive hop is a real edge, first token is the start
    val edgeSet = Set((1L, 2L), (1L, 3L), (2L, 4L))
    got.foreach { case ((start, _), (len, path)) =>
      val ns = path.split(" ").map(_.toLong)
      assert(ns.length == len && ns.head == start, path)
      ns.sliding(2).filter(_.length == 2).foreach(p =>
        assert(edgeSet((p(0), p(1))), s"bogus hop in $path"))
    }
    // a walk from 2 must reach 4 (single out-edge) then stop
    assert(got((2L, 1L)) == ((2L, "2 4")))
    // rerun is bit-identical (no RNG state anywhere)
    val again = Graph.randomWalks(edges, length = 3, walksPerNode = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getString(3))).toMap
    assert(again == got)
    // larger hash-shaped graph: reps diverge somewhere (draws differ)
    val rnd = new scala.util.Random(5)
    val re = (1 to 200).map(_ =>
      (rnd.nextInt(20).toLong, rnd.nextInt(20).toLong))
      .filter(p => p._1 != p._2).toDF("src", "dst")
    val w = Graph.randomWalks(re, length = 5, walksPerNode = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getString(3))
    val byStart = w.groupBy(_._1._1).view.mapValues(_.map(_._2).distinct)
    assert(byStart.values.exists(_.size > 1), "all reps identical — draws not rep-seeded")
  }

  test("labelPropagation: known communities, replay pin, determinism") {
    // two triangles bridged by 3-4: LPA must split them
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (4L, 5L), (5L, 6L), (4L, 6L), (3L, 4L)).toDF("src", "dst")
    val got = Graph.labelPropagation(edges, iters = 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // hand-replayed synchronous rounds (min-label tiebreak):
    // l3 = {1,2,3}->1, {4,5,6}->3
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      4L -> 3L, 5L -> 3L, 6L -> 3L), got.toString)

    // brute-force replay on a random graph: the identical synchronous
    // recurrence in plain Scala maps
    def brute(es: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
      val und = es.filter(p => p._1 != p._2)
        .map(p => (p._1 min p._2, p._1 max p._2)).distinct
      val adj = (und ++ und.map(_.swap)).groupBy(_._1)
        .map { case (n, v) => n -> v.map(_._2) }
      var lbl = adj.keys.map(n => n -> n).toMap
      for (_ <- 1 to iters) {
        lbl = adj.map { case (n, nbrs) =>
          val counts = nbrs.map(lbl).groupBy(identity)
            .map { case (l, v) => (l, v.size) }
          n -> counts.toSeq.maxBy { case (l, c) => (c, -l) }._1
        }
      }
      lbl
    }
    val rnd = new scala.util.Random(31)
    val re = (1 to 150).map(_ =>
      (rnd.nextInt(25).toLong, rnd.nextInt(25).toLong))
    for (iters <- Seq(1, 2, 4)) {
      val sp = Graph.labelPropagation(re.toDF("src", "dst"), iters = iters)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(sp == brute(re, iters), s"iters=$iters")
    }
    // rerun + repartition invariance (no order-dependence anywhere)
    val again = Graph.labelPropagation(
      re.toDF("src", "dst").repartition(13), iters = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(again == brute(re, 4))
  }

  test("pageRank warm-start: resume(k) over an i-round artifact ≡ cold(i+k)") {
    val rnd = new scala.util.Random(17)
    val edges = (1 to 300).map(_ =>
      (rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      .filter(p => p._1 != p._2)
    val dir = java.nio.file.Files.createTempDirectory("pridx").toString
    Graph.pageRankIndexWrite(edges.toDF("src", "dst"), dir, iters = 2)
    def ranks(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // integer-exact state → bit-identical continuation, several k
    for (k <- Seq(0, 1, 3)) {
      val warm = ranks(Graph.pageRankResume(spark, dir, iters = k))
      val cold = ranks(Graph.pageRank(edges.toDF("src", "dst"),
        iters = 2 + k))
      assert(warm == cold, s"warm($k) != cold(${2 + k})")
    }
    // resume(0) just renders the stored state — covered above (k = 0
    // matches cold(2)); a crossing checkpoint boundary (k = 3 spans
    // round 4) must not change values either (asserted above)
  }

  test("personalizedPageRank: absent seed ids don't swallow teleport mass") {
    // seed 777 appears nowhere in the graph — the teleport denominator
    // must renormalize over the PRESENT seeds ({0}), not the raw seed
    // count, or 777's share of mass silently vanishes (ADVICE r9)
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L))
    def run(seeds: Seq[Long]) =
      Graph.personalizedPageRank(edges.toDF("src", "dst"),
        seeds.toDF("node"), iters = 4)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(run(Seq(0L, 777L)) == run(Seq(0L)),
      "ghost seed changed the rank distribution")
    // an all-absent seed set is an error, not a silent zero field
    val err = intercept[IllegalArgumentException] {
      Graph.personalizedPageRank(edges.toDF("src", "dst"),
        Seq(777L).toDF("node"), iters = 1).collect()
    }
    assert(err.getMessage.contains("no seed id"), err.getMessage)
  }

  test("hits: renormalization survives a hub with >9.2M in-edges") {
    // r·1e6 wraps a signed long once a node's summed in-score passes
    // ~9.22e12 — i.e. in-degree ≳ 9.22M at the 1e6 micro-unit ceiling.
    // 9.3M distinct sources all pointing at node 0 cross that line on
    // the very first half-step; the decimal(38,0) renorm (ADVICE r9)
    // must keep every score in [0, 1] with the hub's auth exactly 1.
    val hubEdges = spark.range(9300000L)
      .select((col("id") + 10).as("src"), lit(0L).as("dst"))
    val res = Graph.hits(hubEdges, iters = 1).localCheckpoint(false)
    val r = res.agg(min(col("auth")), max(col("auth")), min(col("hub")),
      max(col("hub"))).head()
    assert(r.getDouble(0) >= 0.0 && r.getDouble(1) <= 1.0,
      s"auth out of [0,1]: $r")
    assert(r.getDouble(2) >= 0.0 && r.getDouble(3) <= 1.0,
      s"hub out of [0,1]: $r")
    val hub0 = res.where(col("node") === 0L).head()
    assert(hub0.getDouble(1) == 1.0, s"hub node auth != 1: $hub0")
  }

  test("degreeStats: full-outer merge, zero-filled") {
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L)).toDF("src", "dst")
    val got = Graph.degreeStats(edges).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
      .toList
    assert(got == List((1L, 2L, 0L), (2L, 1L, 1L), (3L, 0L, 2L)), got)
  }

  test("pageRankWeighted: uniform weights ≡ pageRank; replay pin; parallel edges sum") {
    val edges = Seq((0L, 1L), (0L, 2L), (1L, 2L), (2L, 0L), (3L, 2L))
      .toDF("src", "dst")
    val uni = edges.withColumn("w", lit(5L))
    def rows(f: org.apache.spark.sql.DataFrame) =
      f.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // equal weights cancel: wsum = outdeg·w, contribution identical
    assert(rows(Graph.pageRankWeighted(uni, iters = 3)) ==
      rows(Graph.pageRank(edges, iters = 3)))
    // weighted replay against plain-Scala integer recurrence
    val we = Seq((0L, 1L, 3L), (0L, 2L, 1L), (1L, 2L, 2L),
      (2L, 0L, 4L), (3L, 2L, 1L))
    val got = rows(Graph.pageRankWeighted(we.toDF("src", "dst", "w"),
      iters = 3))
    val nodes = Seq(0L, 1L, 2L, 3L)
    val wsum = we.groupBy(_._1).map { case (k, g) => k -> g.map(_._3).sum }
    var rank = nodes.map(_ -> 1000000L / 4).toMap
    for (_ <- 1 to 3) {
      val contrib = we.map { case (s, d, w) =>
        d -> (rank(s) * 85 * w) / (wsum(s) * 100)
      }.groupBy(_._1).map { case (k, g) => k -> g.map(_._2).sum }
      rank = nodes.map(n =>
        n -> (150000L / 4 + contrib.getOrElse(n, 0L))).toMap
    }
    val want = rank.map { case (k, v) =>
      k -> BigDecimal(v / 1e6).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    assert(got == want, s"$got vs $want")
    // parallel edges sum their weights; w <= 0 dropped
    val par = Seq((0L, 1L, 2L), (0L, 1L, 1L), (0L, 2L, 3L),
      (1L, 0L, 1L), (2L, 0L, 0L))
    val got2 = rows(Graph.pageRankWeighted(par.toDF("src", "dst", "w"),
      iters = 2))
    val merged = Seq((0L, 1L, 3L), (0L, 2L, 3L), (1L, 0L, 1L))
    assert(got2 == rows(Graph.pageRankWeighted(
      merged.toDF("src", "dst", "w"), iters = 2)))
  }

  test("cooccurrenceProjection: pair counts, hub cap, min support, hook") {
    // users 1,2 share items {10,11}; user 3 touches {10,12};
    // user 9 is a hub over {20..24} and must be dropped at maxDegree 4
    val inc = (Seq((1L, 10L), (1L, 11L), (2L, 10L), (2L, 11L),
      (3L, 10L), (3L, 12L)) ++ (20L to 24L).map(i => (9L, i)))
      .toDF("actor", "item")
    var dropped = -1L
    val got = Graph.cooccurrenceProjection(inc, maxDegree = 4,
        minCount = 1, droppedActors = dropped = _)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(dropped == 1L)
    // hub pairs absent; co-counts exact
    assert(got == Map((10L, 11L) -> 2L, (10L, 12L) -> 1L),
      got.toString)
    assert(!got.keys.exists { case (a, b) => a >= 20L || b >= 20L })
    // min support prunes the singleton pair
    val strict = Graph.cooccurrenceProjection(inc, maxDegree = 4,
        minCount = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(strict == Set((10L, 11L)))
    // duplicate incidence rows don't inflate counts
    val dup = Graph.cooccurrenceProjection(
      inc.unionByName(inc), maxDegree = 4, minCount = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(dup == got)
  }

  test("bfsHops: level order, first-hop wins, maxHops cap, isolated seed") {
    // 0→1→2→3→4 chain plus shortcut 0→3; node 9 is a seed with no
    // edges; 7→8 is unreachable from the seeds
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L), (0L, 3L),
      (7L, 8L)).toDF("src", "dst")
    val seeds = Seq(0L, 9L).toDF("node")
    val got = Graph.bfsHops(edges, seeds, maxHops = 4).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    // 3 is reached at hop 1 through the shortcut, never re-labeled 3
    assert(got == Map(0L -> 0, 9L -> 0, 1L -> 1, 3L -> 1, 2L -> 2,
      4L -> 2), got.toString)
    // cap: with maxHops = 1 only the first level appears
    val capped = Graph.bfsHops(edges, seeds, maxHops = 1).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(capped == Map(0L -> 0, 9L -> 0, 1L -> 1, 3L -> 1),
      capped.toString)
    // maxHops = 0: just the seeds
    val zero = Graph.bfsHops(edges, seeds, maxHops = 0).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(zero == Map(0L -> 0, 9L -> 0), zero.toString)
  }

  test("bfsHops: brute-force random pin (frontier ≡ dense levels)") {
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 3) {
      val n = 20
      val edges = (1 to 60).map(_ =>
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(p => p._1 != p._2).distinct
      val seeds = Seq(0L, 1L)
      // dense reference: level-by-level set expansion
      var vis = seeds.map(_ -> 0).toMap
      var frontier = seeds.toSet
      for (h <- 1 to 5) {
        val next = edges.filter(e => frontier.contains(e._1)).map(_._2)
          .toSet -- vis.keySet
        vis = vis ++ next.map(_ -> h)
        frontier = next
      }
      val got = Graph.bfsHops(edges.toDF("src", "dst"),
        seeds.toDF("node"), maxHops = 5).collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(got == vis, s"trial $trial: $got vs $vis")
    }
  }

  test("ssspWeighted: cheaper long path beats expensive shortcut; unreached absent") {
    // 0→3 direct costs 10; 0→1→2→3 costs 1+1+1 = 3 but needs 3 rounds
    val edges = Seq((0L, 3L, 10L), (0L, 1L, 1L), (1L, 2L, 1L),
      (2L, 3L, 1L), (8L, 9L, 1L)).toDF("src", "dst", "w")
    val seeds = Seq(0L).toDF("node")
    def run(rounds: Int): Map[Long, Long] =
      Graph.ssspWeighted(edges, seeds, rounds = rounds).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // after 1 round only the direct relaxations exist
    assert(run(1) == Map(0L -> 0L, 3L -> 10L, 1L -> 1L), run(1).toString)
    // converged: the 3-edge path wins; 8,9 never reached
    assert(run(6) == Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 3L),
      run(6).toString)
    // parallel edges keep the min weight
    val multi = Seq((0L, 1L, 5L), (0L, 1L, 2L)).toDF("src", "dst", "w")
    assert(Graph.ssspWeighted(multi, seeds, rounds = 2).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap ==
      Map(0L -> 0L, 1L -> 2L))
    // negative weights rejected up front
    val neg = Seq((0L, 1L, -1L)).toDF("src", "dst", "w")
    assertThrows[IllegalArgumentException] {
      Graph.ssspWeighted(neg, seeds, rounds = 2)
    }
  }

  test("ssspWeighted: brute-force random pin (delta ≡ dense Bellman-Ford)") {
    val rnd = new scala.util.Random(13)
    for (trial <- 1 to 3) {
      val n = 15
      val edges = (1 to 40).map(_ => (rnd.nextInt(n).toLong,
        rnd.nextInt(n).toLong, (1L + rnd.nextInt(9)).toLong))
        .filter(e => e._1 != e._2)
        .groupBy(e => (e._1, e._2))
        .map { case ((s, d), g) => (s, d, g.map(_._3).min) }.toSeq
      val seeds = Seq(0L, 5L)
      val rounds = 4
      // dense reference: full relaxation each round
      var dist = seeds.map(_ -> 0L).toMap
      for (_ <- 1 to rounds) {
        val relax = edges.flatMap { case (s, d, w) =>
          dist.get(s).map(ds => d -> (ds + w))
        }
        dist = (dist.toSeq ++ relax).groupBy(_._1)
          .map { case (k, g) => k -> g.map(_._2).min }
      }
      val got = Graph.ssspWeighted(edges.toDF("src", "dst", "w"),
        seeds.toDF("node"), rounds = rounds).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == dist, s"trial $trial: $got vs $dist")
    }
  }
}
