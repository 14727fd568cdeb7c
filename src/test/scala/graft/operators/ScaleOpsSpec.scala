package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Specs for the scale-technique operators: salted join equivalence and
  * deterministic hash sampling/splits. */
class ScaleOpsSpec extends SparkSpec {

  import spark.implicits._

  test("saltedJoin is row-identical to the plain join (incl. skewed key)") {
    // heavy skew: 900 of 1000 probe rows hit key 7; the rest spread
    // over keys 1..50 (all matching)
    val probe = (1 to 1000).map(i =>
      (if (i <= 900) 7L else (i % 50 + 1).toLong, i.toLong)).toDF("k", "pid")
    val build = (1L to 50L).map(k => (k, s"v$k")).toDF("k", "payload")
    val plain = probe.join(build, Seq("k")).select("k", "pid", "payload")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    val salted = SkewJoin.saltedJoin(probe, build, "k", "pid", nSalt = 8)
      .select("k", "pid", "payload")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(salted == plain && plain.size == 1000)
  }

  test("hashSample is deterministic and roughly proportional") {
    val df = (1L to 2000L).toDF("id")
    val s1 = Sampling.hashSample(df, col("id"), 0.25)
      .collect().map(_.getLong(0)).toSet
    val s2 = Sampling.hashSample(df, col("id"), 0.25)
      .collect().map(_.getLong(0)).toSet
    assert(s1 == s2) // identical membership run to run
    assert(s1.size > 400 && s1.size < 600) // ~500 expected
    // monotone: a larger fraction strictly contains a smaller one
    val s3 = Sampling.hashSample(df, col("id"), 0.5)
      .collect().map(_.getLong(0)).toSet
    assert(s1.subsetOf(s3))
  }

  test("splitAssign partitions every row exactly once with ~weights") {
    val df = (1L to 2000L).toDF("id")
    val split = Sampling.splitAssign(df, col("id"),
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    val counts = split.groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum == 2000)
    assert(counts("train") > 1500 && counts("val") > 100 && counts("test") > 100)
  }

  test("weightedSample: deterministic, partition-independent, k per stratum") {
    val docs = (1 to 200).map(i =>
      (s"s${i % 3}", i.toLong, (i % 17 + 1).toLong)).toDF("src", "id", "w")
    def sample(df: org.apache.spark.sql.DataFrame) =
      Sampling.weightedSample(df, col("src"), col("id"), col("w"), k = 10)
        .select("src", "rank", "id").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val a = sample(docs)
    assert(a == sample(docs.repartition(5)), "layout changed the sample")
    assert(a.groupBy(_._1).forall(_._2.size == 10))
    // weighting is real: the weighted sample differs from uniform (w=1)
    val uniform = sample(docs.withColumn("w", lit(1L)))
    assert(a.map(_._3) != uniform.map(_._3))
  }

  test("weightedSample heap path == window path (string ids fall back)") {
    val docs = (1 to 200).map(i =>
      (s"s${i % 3}", i.toLong, (i % 17 + 1).toLong)).toDF("src", "id", "w")
    // numeric id -> heap path
    val heap = Sampling.weightedSample(docs, col("src"), col("id"),
        col("w"), k = 10)
      .select("src", "rank", "id", "w").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    // string id -> window fallback. cast("string") keeps the hash
    // input text identical, so the A-Res keys — and therefore the
    // sample and ranks — must match exactly (the id tie-break is
    // never exercised: keys are distinct).
    val sdocs = docs.withColumn("id", col("id").cast("string"))
    val win = Sampling.weightedSample(sdocs, col("src"), col("id"),
        col("w"), k = 10)
      .select("src", "rank", "id", "w").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2).toLong,
        r.getLong(3)))
      .toSet
    assert(heap == win)
    assert(heap.groupBy(_._1).forall(_._2.size == 10))
  }

  test("stratifiedSample downsamples each stratum at its own rate") {
    val df = (1L to 3000L).toDF("id")
      .withColumn("src", concat(lit("s"), col("id") % 3))
    val mixed = Sampling.stratifiedSample(df, col("id"), col("src"),
      Map("s0" -> 0.2, "s1" -> 0.7))
    val counts = mixed.groupBy("src").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("s0") > 120 && counts("s0") < 280) // ~200 of 1000
    assert(counts("s1") > 600 && counts("s1") < 800) // ~700
    assert(counts("s2") == 1000) // defaultRate keeps everything
    // rate 0 removes a stratum entirely; membership is hash-monotone
    val none = Sampling.stratifiedSample(df, col("id"), col("src"),
      Map("s0" -> 0.0))
    assert(none.where(col("src") === "s0").isEmpty)
    val small = Sampling.stratifiedSample(df, col("id"), col("src"),
      Map("s0" -> 0.1)).where(col("src") === "s0")
      .collect().map(_.getLong(0)).toSet
    val big = Sampling.stratifiedSample(df, col("id"), col("src"),
      Map("s0" -> 0.2)).where(col("src") === "s0")
      .collect().map(_.getLong(0)).toSet
    assert(small.subsetOf(big))
  }

  test("quotaSample hits target mixture, drops unlisted strata, nests") {
    // strata of very different sizes: s0=1500, s1=1000, s2=500
    val df = (1L to 3000L).toDF("id")
      .withColumn("src", when(col("id") <= 1500, "s0")
        .when(col("id") <= 2500, "s1").otherwise("s2"))
    val out = Sampling.quotaSample(df, col("id"), col("src"),
      Map("s0" -> 0.25, "s1" -> 0.25, "s2" -> 0.5), targetRows = 800L)
    val counts = out.groupBy("src").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // targets: 200/200/400 despite populations 1500/1000/500
    assert(counts("s0") > 140 && counts("s0") < 260, counts.toString)
    assert(counts("s1") > 140 && counts("s1") < 260, counts.toString)
    assert(counts("s2") > 330 && counts("s2") < 470, counts.toString)
    // under-populated stratum caps at rate 1 (never over-samples)
    val capped = Sampling.quotaSample(df, col("id"), col("src"),
      Map("s2" -> 1.0), targetRows = 2000L)
    assert(capped.count() == 500)
    assert(capped.agg(max("keep_rate")).head().getDouble(0) == 1.0)
    // unlisted strata drop out
    assert(out.where(!col("src").isin("s0", "s1", "s2")).isEmpty)
    val only = Sampling.quotaSample(df, col("id"), col("src"),
      Map("s1" -> 1.0), targetRows = 100L)
    assert(only.where(col("src") =!= "s1").isEmpty)
    // nesting: halving the target keeps a subset of the larger sample
    val smaller = Sampling.quotaSample(df, col("id"), col("src"),
      Map("s0" -> 0.25, "s1" -> 0.25, "s2" -> 0.5), targetRows = 400L)
      .select("id").collect().map(_.getLong(0)).toSet
    val larger = out.select("id").collect().map(_.getLong(0)).toSet
    assert(smaller.subsetOf(larger))
  }

  test("temperatureSample: alpha<1 boosts small strata; alpha=1 is proportional") {
    // big=2400, small=600 (4:1); alpha=0.5 → weights ∝ sqrt(n) = 2:1,
    // so rates come out EXACTLY big 900·(2/3)/2400 = 0.25 and
    // small 900·(1/3)/600 = 0.5
    val df = (1L to 3000L).toDF("id")
      .withColumn("src", when(col("id") <= 2400, "big").otherwise("small"))
    val out = Sampling.temperatureSample(df, col("id"), col("src"),
      alpha = 0.5, target = 900L)
    val rates = out.groupBy("src").agg(max("keep_rate")).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(rates("big") - 0.25) < 1e-6, rates.toString)
    assert(math.abs(rates("small") - 0.5) < 1e-6, rates.toString)
    val counts = out.groupBy("src").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("big") > 520 && counts("big") < 680, counts.toString)
    assert(counts("small") > 240 && counts("small") < 360, counts.toString)
    // alpha=1 degenerates to proportional: identical rate everywhere
    val prop = Sampling.temperatureSample(df, col("id"), col("src"),
      alpha = 1.0, target = 900L)
      .groupBy("src").agg(max("keep_rate")).collect().map(_.getDouble(1))
    assert(math.abs(prop(0) - prop(1)) < 1e-9, prop.mkString(","))
    // nested: halving the target keeps a subset
    val smaller = Sampling.temperatureSample(df, col("id"), col("src"),
      alpha = 0.5, target = 450L)
      .select("id").collect().map(_.getLong(0)).toSet
    val larger = out.select("id").collect().map(_.getLong(0)).toSet
    assert(smaller.subsetOf(larger))
  }

  test("unimaxAllocation: waterfilling hand case, cap binds small strata, budget conserved, all-capped leftover") {
    // hand case (B=100, cap=2, sizes 10/20/100): langs a,b capped at
    // 2 epochs (20, 40), c takes the remaining 40 — exactly B spent
    val rows = Seq.tabulate(10)(i => ("a", 1L)) ++
      Seq.tabulate(20)(i => ("b", 1L)) ++
      Seq.tabulate(100)(i => ("c", 1L))
    val df = rows.toDF("lang", "sz")
    val got = Sampling.unimaxAllocation(df, col("lang"), 100L, 2)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got("a") == ((10L, 20L, 1L, 2000000L)), got.toString)
    assert(got("b") == ((20L, 40L, 1L, 2000000L)), got.toString)
    assert(got("c") == ((100L, 40L, 0L, 400000L)), got.toString)
    assert(got.values.map(_._2).sum == 100L, "budget conserved")
    // all-capped: budget exceeds cap * total -> every stratum takes
    // cap epochs, leftover reported by the sum falling below B
    val all = Sampling.unimaxAllocation(df, col("lang"), 10000L, 2)
      .collect().map(r => (r.getLong(2), r.getLong(3)))
    assert(all.forall(_._2 == 1L) && all.map(_._1).sum == 260L)
    // monotone: a larger stratum never receives LESS than a smaller
    val rnd = new scala.util.Random(7)
    val sizes = (0 until 12).map(i => (s"l$i", 1L + rnd.nextInt(500).toLong))
    val wdf = sizes.flatMap { case (l, n) => Seq.fill(n.toInt)((l, 1L)) }
      .toDF("lang", "sz")
    val out = Sampling.unimaxAllocation(wdf, col("lang"), 1500L, 3)
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    out.toSeq.sliding(2).foreach {
      case Seq((n1, a1), (n2, a2)) =>
        assert(n1 <= n2 && a1 <= a2,
          s"monotone: ($n1,$a1) vs ($n2,$a2)")
      case _ => ()
    }
    // weighted size column (chars not rows)
    val sz = Seq(("x", 30L), ("y", 300L)).toDF("lang", "chars")
    val ws = Sampling.unimaxAllocation(sz, col("lang"), 120L, 2,
      col("chars")).collect().map(r => r.getString(0) -> r.getLong(2))
      .toMap
    // x capped at 60, y takes the remaining 60
    assert(ws == Map("x" -> 60L, "y" -> 60L), ws.toString)
    // size contract (ADVICE r13, exactQuantilesWeighted's): negative
    // and fractional sizes raise with the offending value; NULL sizes
    // carry nothing; a zero-TOTAL stratum is dropped (no budget share)
    def fullMsg(t: Throwable): String = {
      var c: Throwable = t; var m = Option(t.getMessage).getOrElse("")
      while (c.getCause != null) {
        c = c.getCause; m += " | " + Option(c.getMessage).getOrElse("")
      }
      m
    }
    val neg = intercept[Exception] {
      Sampling.unimaxAllocation(Seq(("x", -3L)).toDF("lang", "chars"),
        col("lang"), 10L, 2, col("chars")).collect()
    }
    assert(fullMsg(neg).contains("non-negative integers"), fullMsg(neg))
    val frac = intercept[Exception] {
      Sampling.unimaxAllocation(Seq(("x", 1.5)).toDF("lang", "chars"),
        col("lang"), 10L, 2, col("chars")).collect()
    }
    assert(fullMsg(frac).contains("non-negative integers"), fullMsg(frac))
    val zs = Sampling.unimaxAllocation(
      Seq(("x", Some(0L)), ("y", Some(5L)), ("z", None))
        .toDF("lang", "chars"),
      col("lang"), 10L, 2, col("chars"))
      .collect().map(_.getString(0)).toSet
    assert(zs == Set("y"), zs.toString)
  }

  test("unimaxAllocation ≡ independent sequential waterfilling across random cases") {
    // brute force derives the allocation the ALGORITHM's way (walk
    // ascending, spend the remainder) rather than the operator's
    // closed-form prefix condition — a real cross-check, not a replay
    def brute(sizes: Seq[(String, Long)], b: Long,
        cap: Int): Map[String, Long] = {
      val asc = sizes.sortBy(t => (t._2, t._1))
      var rem = BigInt(b)
      var left = asc.length
      val out = scala.collection.mutable.Map.empty[String, Long]
      var uncappedShare: Option[Long] = None
      for ((lang, n) <- asc) {
        uncappedShare match {
          case Some(tau) => out(lang) = tau
          case None =>
            if (BigInt(cap) * n * left <= rem) {
              out(lang) = cap * n; rem -= cap * n; left -= 1
            } else {
              val tau = (rem / left).toLong
              uncappedShare = Some(tau); out(lang) = tau
            }
        }
      }
      out.toMap
    }
    val rnd = new scala.util.Random(97)
    for (trial <- 0 until 12) {
      val L = 1 + rnd.nextInt(9)
      val sizes = (0 until L).map(i =>
        (s"l$i", 1L + rnd.nextInt(2000).toLong))
      val b = rnd.nextInt(12000).toLong
      val cap = 1 + rnd.nextInt(4)
      val df = sizes.toDF("lang", "sz")
      val got = Sampling.unimaxAllocation(df, col("lang"), b, cap,
        col("sz")).collect()
        .map(r => r.getString(0) -> r.getLong(2)).toMap
      assert(got == brute(sizes, b, cap),
        s"trial $trial (b=$b cap=$cap sizes=$sizes): " +
          s"$got vs ${brute(sizes, b, cap)}")
    }
  }

  test("epochMix repeats whole epochs exactly, gates the fractional one, nests") {
    val df = (1L to 300L).toDF("id")
      .withColumn("src", when(col("id") <= 100, "a")
        .when(col("id") <= 200, "b").otherwise("c"))
    val out = Sampling.epochMix(df, col("id"), col("src"),
      Map("a" -> 2.0, "b" -> 0.5, "c" -> 3.5))
    val counts = out.groupBy("src").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("a") == 200L, "integral rate is exact, not stochastic")
    assert(counts("b") > 30 && counts("b") < 70, counts.toString)
    assert(counts("c") > 320 && counts("c") < 380, counts.toString)
    // every copy of a row is present: copy indices are dense 0..n-1
    val copies = out.where(col("src") === "a").groupBy("id")
      .agg(collect_set(col("copy")).as("cs")).collect()
    assert(copies.forall(_.getSeq[Long](1).toSet == Set(0L, 1L)))
    // unlisted strata drop
    assert(Sampling.epochMix(df, col("id"), col("src"),
      Map("a" -> 1.0)).where(col("src") =!= "a").isEmpty)
    // nested: lowering c's fractional part keeps a subset of (id, copy)
    val lower = Sampling.epochMix(df, col("id"), col("src"),
      Map("c" -> 3.25)).select("id", "copy").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val higher = out.where(col("src") === "c").select("id", "copy")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lower.subsetOf(higher))
  }

  test("hash sampling/splits are streaming-safe (pure per-row, no state)") {
    // the sampling family is deterministic per-row expressions, so it
    // must compose with readStream in append mode with ZERO streaming
    // state — the property that lets a crawl pipeline mix/split on
    // ingest (quotaSample, which aggregates counts, is batch-only by
    // design)
    val stream = spark.readStream.format("rate")
      .option("rowsPerSecond", "1").load()
      .select(col("value").as("id"),
        concat(lit("s"), col("value") % 3).as("src"))
    val out = Sampling.splitAssign(
      Sampling.stratifiedSample(stream, col("id"), col("src"),
        Map("s0" -> 0.5)),
      col("id"), Seq("train" -> 0.9, "test" -> 0.1))
    assert(out.isStreaming)
    assert(out.queryExecution.analyzed.collect {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
    }.isEmpty, "sampling must stay stateless on streams")
  }

  test("quotaSampleBy targets the SIZE measure, not row counts") {
    // s0: 100 rows of size 100; s1: 1000 rows of size 10 — equal total
    // mass (10k each); a 50/50 mix at target 10k should keep ~5k of
    // EACH stratum's mass, i.e. ~50 s0 rows but ~500 s1 rows
    val df = (1L to 1100L).toDF("id")
      .withColumn("src", when(col("id") <= 100, "s0").otherwise("s1"))
      .withColumn("sz", when(col("id") <= 100, 100L).otherwise(10L))
    val out = Sampling.quotaSampleBy(df, col("id"), col("src"),
      Map("s0" -> 0.5, "s1" -> 0.5), target = 10000L, sizeCol = col("sz"))
    val mass = out.groupBy("src").agg(sum("sz").as("m"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(mass("s0") > 3500 && mass("s0") < 6500, mass.toString)
    assert(mass("s1") > 3500 && mass("s1") < 6500, mass.toString)
    // row counts differ ~10x even though mass targets are equal
    val rows = out.groupBy("src").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows("s1") > 5 * rows("s0"), rows.toString)
  }

  test("negativeSample: k per anchor, positives excluded, reruns identical") {
    val corpus = (1L to 400L).map(i => (i, (i % 4).toInt))
      .toDF("neg_id", "label")
    val anchors = Seq((1L, 1), (2L, 2)).toDF("vec_id", "label")
    // positives = same label (incl. the self pair by construction)
    val positives = anchors.join(corpus, "label")
      .select(col("vec_id"), col("neg_id"))
    def run() = graft.operators.Sampling.negativeSample(
      anchors, "vec_id", corpus.select("neg_id"), "neg_id",
      positives, k = 7, buckets = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sorted.toList
    val a = run()
    assert(a == run(), "negative draws must be reproducible")
    val byAnchor = a.groupBy(_._1)
    assert(byAnchor.keySet == Set(1L, 2L) &&
      byAnchor.values.forall(_.size == 7), a.toString)
    // no positive leaked: anchor 1's negatives never have label 1
    val pos = positives.collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a.forall { case (an, n, _) => !pos.contains((an, n)) })
    // draws are 1..k dense per anchor; per-anchor negatives distinct
    byAnchor.values.foreach { g =>
      assert(g.map(_._3).sorted == (1L to 7L).toList)
      assert(g.map(_._2).distinct.size == 7)
    }
  }
}
