package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pins [[Ranks.cumOver]] — the shared distributed rank machinery —
  * bit-identical to a plain global window on every input shape it
  * serves, and pins the PLAN property it exists for: the only
  * partition-less window it emits is the ≤Buckets-row offset rollup,
  * never one over the input. */
class RanksSpec extends SparkSpec {
  import spark.implicits._

  private def plainCum(df: DataFrame, v: String, parts: Seq[String],
      sums: Seq[(String, String)], ties: Seq[String]): DataFrame = {
    val ord = (v +: ties).map(col)
    val w = (if (parts.isEmpty) Window.orderBy(ord: _*)
      else Window.partitionBy(parts.map(col): _*).orderBy(ord: _*))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sums.foldLeft(df) { case (d, (s, t)) =>
      d.withColumn(t, sum(col(s)).over(w)) }
  }

  private def same(got: DataFrame, want: DataFrame, keys: Seq[String])
      : Unit = {
    val g = got.orderBy(keys.map(col): _*).collect().map(_.toString)
    val w = want.orderBy(keys.map(col): _*).collect().map(_.toString)
    assert(g.length == w.length && g.sameElements(w),
      s"mismatch:\n got ${g.take(5).mkString("; ")}\nwant ${w.take(5).mkString("; ")}")
  }

  test("numeric: grid cum ≡ global window, incl. ties, negatives, nulls") {
    // 997 distinct-ish doubles with engineered ties and a null row;
    // histogram rows (v, cnt, aux) like every caller builds
    val hist = (0 until 997).map { i =>
      (if (i % 13 == 0) 42.5 else i * 0.37 - 100.0,
        (i % 7 + 1).toLong, (i % 3).toLong)
    }.toDF("v0", "cnt", "aux")
      .groupBy("v0").agg(sum("cnt").as("cnt"), sum("aux").as("aux"))
      .select(col("v0").as("v"), col("cnt"), col("aux"))
      .unionByName(Seq((Option.empty[Double], 5L, 1L))
        .toDF("v", "cnt", "aux"))
    val got = Ranks.cumOver(hist, "v", Nil,
      Seq("cnt" -> "cum", "aux" -> "cuma"))
    val want = plainCum(hist, "v", Nil,
      Seq("cnt" -> "cum", "aux" -> "cuma"), Nil)
    same(got, want, Seq("cum"))
  }

  test("numeric: single distinct value and constant column don't divide by zero") {
    val one = Seq((7.0, 3L), (7.0, 2L)).toDF("v", "cnt")
      .groupBy("v").agg(sum("cnt").as("cnt"))
    val got = Ranks.cumOver(one, "v", Nil, Seq("cnt" -> "cum")).collect()
    assert(got.length == 1 && got.head.getAs[Long]("cum") == 5L)
  }

  test("string: first-8-byte proxy keeps exact lexicographic order (shared prefixes, multibyte, empty)") {
    val words = Seq("", "a", "aa", "abcdefgh", "abcdefgha", "abcdefghb",
      "abcdefghé", "zebra", "z", "éclair", "中文",
      "prefix_shared_very_long_1", "prefix_shared_very_long_2") ++
      (0 until 400).map(i => f"w$i%03d")
    val hist = words.distinct.map(w => (w, 1L)).toDF("v", "cnt")
    val got = Ranks.cumOver(hist, "v", Nil, Seq("cnt" -> "cum"))
    val want = plainCum(hist, "v", Nil, Seq("cnt" -> "cum"), Nil)
    same(got, want, Seq("cum"))
    // ranks are exactly 1..n in Spark's string sort order
    val byRank = got.orderBy("cum").select("v").collect().map(_.getString(0))
    val sorted = hist.orderBy("v").select("v").collect().map(_.getString(0))
    assert(byRank.sameElements(sorted))
  }

  test("timestamps and dates: epoch-second proxy ≡ global window (incl. pre-1970 and micros ties)") {
    val ts = (0 until 300).map { i =>
      (java.sql.Timestamp.valueOf("1969-12-25 00:00:00").getTime +
        (i % 97) * 86400123L + (i % 7), 1L)
    }.map { case (ms, c) => (new java.sql.Timestamp(ms), c) }
    val tHist = ts.toDF("v", "cnt")
      .groupBy("v").agg(sum("cnt").as("cnt"))
    same(Ranks.cumOver(tHist, "v", Nil, Seq("cnt" -> "cum")),
      plainCum(tHist, "v", Nil, Seq("cnt" -> "cum"), Nil), Seq("cum"))
    val ds = (0 until 200).map(i =>
      (java.sql.Date.valueOf(java.time.LocalDate.of(1965, 1, 1)
        .plusDays((i * 37) % 40000)), 1L))
    val dHist = ds.toDF("v", "cnt").groupBy("v").agg(sum("cnt").as("cnt"))
    same(Ranks.cumOver(dHist, "v", Nil, Seq("cnt" -> "cum")),
      plainCum(dHist, "v", Nil, Seq("cnt" -> "cum"), Nil), Seq("cum"))
  }

  test("binary: byte-wise prefix proxy ≡ global window (digest-like values, shared prefixes, length ties)") {
    val rnd = new scala.util.Random(61)
    val vals = (0 until 300).map { i =>
      val len = i % 3 match {
        case 0 => 16; case 1 => 4; case _ => 10
      }
      val b = new Array[Byte](len); rnd.nextBytes(b)
      // force shared 8+-byte prefixes on a slice
      if (i % 11 == 0) java.util.Arrays.fill(b, 0, math.min(9, len), 0x41.toByte)
      b
    } :+ Array.empty[Byte] :+ Array[Byte](0, 0) :+ Array[Byte](-1, -1)
    val hist = vals.map(v => (v, 1L)).toDF("v", "cnt")
      .groupBy("v").agg(sum("cnt").as("cnt"))
    // compare via hex: Row.toString prints byte arrays by identity
    same(
      Ranks.cumOver(hist, "v", Nil, Seq("cnt" -> "cum"))
        .select(hex(col("v")).as("v"), col("cnt"), col("cum")),
      plainCum(hist, "v", Nil, Seq("cnt" -> "cum"), Nil)
        .select(hex(col("v")).as("v"), col("cnt"), col("cum")),
      Seq("cum"))
  }

  test("stratified: per-group cums restart, tie columns break totally") {
    val hist = (for {
      g <- Seq("en", "zh", "de"); i <- 0 until 300
    } yield (g, (i % 57) * 1.5, s"t${i % 11}", (i % 5 + 1).toLong))
      .toDF("g", "v", "tie", "cnt")
      .groupBy("g", "v", "tie").agg(sum("cnt").as("cnt"))
    val got = Ranks.cumOver(hist, "v", Seq("g"), Seq("cnt" -> "cum"),
      tieCols = Seq("tie"))
    val want = plainCum(hist, "v", Seq("g"), Seq("cnt" -> "cum"),
      Seq("tie"))
    same(got, want, Seq("g", "v", "tie"))
  }

  test("plan: local cum windows are partitioned; the sole partition-less window is the ≤Buckets offset rollup") {
    val hist = (0 until 5000).map(i => (i * 1.0, 1L)).toDF("v", "cnt")
    val df = Ranks.cumOver(hist, "v", Nil, Seq("cnt" -> "cum"))
    def nodes(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
      case a: org.apache.spark.sql.execution.adaptive
          .AdaptiveSparkPlanExec => p +: nodes(a.inputPlan)
      case _ => p +: p.children.flatMap(nodes)
    }
    val winExecs = nodes(df.queryExecution.executedPlan).collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    // the final joined plan carries the bucketed local window
    // (partitioned) and the offset rollup (partition-less but fed by a
    // groupBy over ≤Buckets distinct bucket ids)
    val unpart = winExecs.filter(_.partitionSpec.isEmpty)
    val part = winExecs.filter(_.partitionSpec.nonEmpty)
    assert(part.nonEmpty, "expected a partitioned local cum window")
    assert(unpart.forall { w =>
      w.child.toString.contains("__b")
    }, s"partition-less window not over the bucket rollup:\n$unpart")
  }
}
