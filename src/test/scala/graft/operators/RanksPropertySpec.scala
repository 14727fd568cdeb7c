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
}
