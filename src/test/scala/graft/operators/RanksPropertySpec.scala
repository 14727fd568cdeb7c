package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests for [[Ranks.cumOver]]'s monotone-proxy claims — the
  * bit-equality RanksSpec pins on friendly fixtures, re-proven here on
  * ADVERSARIAL domains: IEEE edge doubles (±Inf, NaN, ±0.0,
  * subnormals, full-range magnitudes where the grid ratio rounds),
  * long extremes (where the double cast loses precision — weak
  * monotonicity is all the machinery needs), and unicode strings with
  * shared >8-byte prefixes (where the first-8-byte proxy ties and the
  * in-bucket sort must resolve). Deterministic sampling (fixed seeds,
  * the UpdatesPropertySpec pattern) so failures replay. */
class RanksPropertySpec extends SparkSpec {
  import spark.implicits._

  private def sample[A](gen: Gen[A], seed: Long): A =
    gen.pureApply(Gen.Parameters.default, Seed(seed))

  private def plainCum(df: DataFrame, parts: Seq[String]): DataFrame = {
    val w = (if (parts.isEmpty) Window.orderBy(col("v"))
      else Window.partitionBy(parts.map(col): _*).orderBy(col("v")))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("want", sum(col("cnt")).over(w))
  }

  private def check(hist: DataFrame, parts: Seq[String]): Unit = {
    val got = Ranks.cumOver(hist, "v", parts, Seq("cnt" -> "cum"))
      .select((parts :+ "v").map(col) :+ col("cum"): _*)
      .collect().map(_.toString).sorted
    val want = plainCum(hist, parts)
      .select((parts :+ "v").map(col) :+ col("want"): _*)
      .collect().map(_.toString).sorted
    assert(got.length == want.length && got.sameElements(want),
      s"diff: ${got.diff(want).take(3).mkString("; ")} / " +
        s"${want.diff(got).take(3).mkString("; ")}")
  }

  private val edgeDoubles = Seq(Double.NegativeInfinity,
    Double.PositiveInfinity, Double.NaN, 0.0, -0.0,
    Double.MinPositiveValue, -Double.MinPositiveValue,
    Double.MaxValue, Double.MinValue, 1e-300, -1e300, math.Pi)

  test("doubles: cum ≡ global window across IEEE edge cases and wild magnitudes") {
    val gen = Gen.listOfN(150, Gen.oneOf(
      Gen.chooseNum(-1e12, 1e12),
      Gen.chooseNum(-1.0, 1.0),
      Gen.oneOf(edgeDoubles)))
    for (seed <- 0L until 8L) {
      val vs = (sample(gen, seed) ++ edgeDoubles)
        .map(v => (v, 1L + (v.hashCode().abs % 5)))
      check(vs.toDF("v", "cnt")
        .groupBy("v").agg(sum("cnt").as("cnt")), Nil)
    }
  }

  test("longs: extreme magnitudes survive the lossy double proxy (weak monotonicity suffices)") {
    val gen = Gen.listOfN(150, Gen.oneOf(
      Gen.chooseNum(Long.MinValue, Long.MaxValue),
      // adjacent longs past 2^53 — identical double proxies, the
      // in-bucket exact sort must split them
      Gen.chooseNum(0L, 40L).map(d => (1L << 60) + d),
      Gen.chooseNum(-40L, 0L).map(d => Long.MinValue + 40 + d)))
    for (seed <- 0L until 8L) {
      val vs = (sample(gen, seed) ++
        Seq(Long.MinValue, Long.MaxValue, 0L, -1L, 1L))
        .map(v => (v, 1L))
      check(vs.toDF("v", "cnt")
        .groupBy("v").agg(sum("cnt").as("cnt")), Nil)
    }
  }

  test("strings: unicode + shared long prefixes ≡ global window (proxy ties resolved in-bucket)") {
    val genChar = Gen.oneOf(
      Gen.alphaNumChar, Gen.const('é'), Gen.const('中'),
      Gen.const('ÿ'))
    val genStr = Gen.oneOf(
      Gen.listOfN(3, genChar).map(_.mkString),
      Gen.listOfN(12, genChar).map(_.mkString),
      // shared 10-char prefix: identical first-8-byte proxies
      Gen.listOfN(4, genChar).map("prefix_ten" + _.mkString),
      // 4-byte UTF-8 (surrogate pair) + empty string
      Gen.listOfN(2, genChar).map("𝕏" + _.mkString),
      Gen.const(""))
    val gen = Gen.listOfN(120, genStr)
    for (seed <- 0L until 8L) {
      val vs = sample(gen, seed).map(v => (v, 1L))
      check(vs.toDF("v", "cnt")
        .groupBy("v").agg(sum("cnt").as("cnt")), Nil)
    }
  }

  test("stratified doubles: per-group cums restart correctly under the global grid") {
    val gen = Gen.listOfN(200, Gen.zip(
      Gen.oneOf("a", "b", "c"),
      Gen.oneOf(Gen.chooseNum(-1e6, 1e6), Gen.oneOf(edgeDoubles))))
    for (seed <- 0L until 5L) {
      val vs = sample(gen, seed).map { case (g, v) => (g, v, 1L) }
      check(vs.toDF("g", "v", "cnt")
        .groupBy("g", "v").agg(sum("cnt").as("cnt")), Seq("g"))
    }
  }

  /** Max rows any one grid cell receives for a double-valued
    * histogram — the spread the anchors must defend. */
  private def maxCell(vals: Seq[Double]): Long = {
    val hist = vals.map(v => (v, 1L)).toDF("v", "cnt")
      .groupBy("v").agg(sum("cnt").as("cnt"))
    Ranks.bucketize(hist, "v",
      least(greatest(nanvl(col("v").cast("double"),
        lit(Double.MaxValue)), lit(Double.MinValue)),
        lit(Double.MaxValue)))
      .groupBy("__b").agg(count(lit(1)).as("n"))
      .agg(max("n")).head().getLong(0)
  }

  test("grid is scale-invariant: one extreme outlier / NaN / Inf cannot collapse the buckets (ADVICE r12)") {
    // 4096 uniform-ish distinct values + the adversary. Under the old
    // linear [min, max] grid each adversary collapsed ALL finite
    // values into bucket 0 (maxCell ≈ 4096); rank anchors bound any
    // coarse cell at ~1/Anchors of the distinct values + in-cell
    // clumping, so demand maxCell ≤ 2 × distinct/Anchors.
    val base = (1 to 4096).map(_.toDouble * 1.5 + 0.25)
    val bound = 2L * 4096 / Ranks.Anchors
    for (adversary <- Seq(1e300, -1e300, Double.NaN,
        Double.PositiveInfinity, Double.NegativeInfinity,
        Double.MaxValue)) {
      val m = maxCell(base :+ adversary)
      assert(m <= bound, s"adversary $adversary: maxCell $m > $bound")
    }
    // and the cums stay exact under the same adversaries
    for (adversary <- Seq(1e300, Double.NaN, Double.NegativeInfinity)) {
      val vs = (base :+ adversary).map(v => (v, 1L))
      check(vs.toDF("v", "cnt")
        .groupBy("v").agg(sum("cnt").as("cnt")), Nil)
    }
  }

  test("log-spread domains spread too (anchors adapt where any fixed linear grid clumps)") {
    // distinct values spanning 120 orders of magnitude, uniform in
    // LOG space: a linear grid would put ~everything in bucket 0
    val vals = (0 until 2048).map(i => math.pow(10.0, i / 17.0 - 60.0))
    val m = maxCell(vals)
    assert(m <= 2L * 2048 / Ranks.Anchors, s"log-uniform maxCell $m")
  }

  /** Max rows any one grid cell receives for a string/binary-valued
    * histogram, on the exact proxy cumOver uses (bucketize relocates
    * the 8-byte window past the column LCP internally). */
  private def maxCellOf(hist: DataFrame): Long =
    Ranks.bucketize(hist, "v", Ranks.proxyOf(hist, "v").get)
      .where(col("v").isNotNull)
      .groupBy("__b").agg(count(lit(1)).as("n"))
      .agg(max("n")).head().getLong(0)

  test("shared-prefix strings spread: zero-padded ids / URLs / digest binaries cannot collapse into one bucket (VERDICT r13)") {
    // the natural inputs the r13 verdict called out: every value
    // shares ≥8 leading bytes, so the UNstripped first-8-byte proxy
    // is constant — anchors all tie and the whole distinct set lands
    // in one bucket's single-task sort. The LCP strip must restore
    // the outlier-case spread bound (maxCell ≤ 2·distinct/Anchors).
    val ids = (0 until 4096).map(i => f"doc_$i%012d")
    val urls = (0 until 4096).map(i => s"https://example.com/page/$i")
    val bound = 2L * 4096 / Ranks.Anchors
    for ((name, vs) <- Seq("zero-padded ids" -> ids, "urls" -> urls)) {
      val hist = vs.map(v => (v, 1L)).toDF("v", "cnt")
        .groupBy("v").agg(sum("cnt").as("cnt"))
      val m = maxCellOf(hist)
      assert(m <= bound, s"$name: maxCell $m > $bound")
    }
    // binary twin: 16-byte fingerprints sharing an 8-byte magic header
    val bins = (0 until 4096).map(i =>
      ("GRAFTv01" + f"$i%08d").getBytes("UTF-8"))
    val binHist = bins.map(v => (v, 1L)).toDF("v", "cnt")
      .groupBy("v").agg(sum("cnt").as("cnt"))
    assert(maxCellOf(binHist) <= bound, "binary shared header collapsed")
    // and the cums stay exact under the strip — including the edge
    // where one value IS the LCP (strips to the empty window → least
    // proxy) and a NULL rides along
    val edge = ids ++ Seq("doc_", "doc_000000000000", null)
    check(edge.map(v => (v, 1L)).toDF("v", "cnt")
      .groupBy("v").agg(sum("cnt").as("cnt")), Nil)
  }

  test("timestamps: epoch proxy rides the anchored grid, far-future outliers included") {
    // ordinary 2020s event times + a year-9999 sentinel (a classic
    // dirty-data value) + nulls: cums ≡ window, and the sentinel must
    // not collapse the grid (quantile anchors ignore it)
    val base = (0 until 2000).map(i =>
      new java.sql.Timestamp(1600000000000L + i * 37000L))
    val vals = base ++ Seq(java.sql.Timestamp.valueOf("9999-12-31 23:59:59"), null)
    val hist = vals.map(v => (v, 1L)).toDF("v", "cnt")
      .groupBy("v").agg(sum("cnt").as("cnt"))
    check(hist, Nil)
    val m = Ranks.bucketize(hist, "v",
      least(greatest(nanvl(col("v").cast("double"),
        lit(Double.MaxValue)), lit(Double.MinValue)),
        lit(Double.MaxValue)))
      .where(col("v").isNotNull)
      .groupBy("__b").agg(count(lit(1)).as("n"))
      .agg(max("n")).head().getLong(0)
    assert(m <= 2L * 2001 / Ranks.Anchors, s"timestamp maxCell $m")
  }

  test("NULL partition values rank as their own group, same as the plain-window fallback (ADVICE r12)") {
    // numeric proxy path: the offsets join must be null-safe or these
    // rows silently vanish
    val rows = Seq(("a", 1.0, 1L), ("a", 2.0, 1L), (null, 1.0, 2L),
      (null, 5.0, 3L), ("b", 5.0, 1L), (null, 9.0, 1L))
    val hist = rows.toDF("g", "v", "cnt")
    val got = Ranks.cumOver(hist, "v", Seq("g"), Seq("cnt" -> "cum"))
      .orderBy("g", "v")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(3)))
    assert(got.count(_._1 == null) == 3, s"null-group rows kept: ${got.mkString(",")}")
    assert(got.filter(_._1 == null).map(_._3).toSeq == Seq(2L, 5L, 6L),
      s"null-group cums: ${got.mkString(",")}")
    // and the string-proxy path behaves identically
    val rowsS = Seq(("a", "x", 1L), (null, "x", 2L), (null, "y", 3L))
    val gotS = Ranks.cumOver(rowsS.toDF("g", "v", "cnt"), "v", Seq("g"),
      Seq("cnt" -> "cum"))
      .where(col("g").isNull).orderBy("v")
      .collect().map(_.getLong(3))
    assert(gotS.toSeq == Seq(2L, 5L), s"string null-group: ${gotS.mkString(",")}")
  }
}
