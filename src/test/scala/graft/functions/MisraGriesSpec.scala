package graft.functions

import scala.util.Random

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.CatalystBridge
import graft.SparkSpec
import graft.operators.Sketch

/** The Misra–Gries aggregate's contract: exact when the universe fits
  * in k entries, and the published bound (sketch <= true, undercount
  * <= n/(k+1), guaranteed presence above the threshold) under EVERY
  * partitioning — counter values may differ across merge orders, the
  * bound may not. */
class MisraGriesSpec extends SparkSpec {
  import spark.implicits._

  private def mgMap(df: org.apache.spark.sql.DataFrame, k: Int)
      : Map[String, Long] =
    df.agg(CatalystBridge.freqItems(col("v"), k).as("mg"))
      .head().getMap[String, Long](0).toMap

  test("exact counts when distinct universe fits in k") {
    val data = Seq("a", "a", "a", "b", "b", "c").toDF("v")
    assert(mgMap(data, 8) === Map("a" -> 3L, "b" -> 2L, "c" -> 1L))
  }

  test("nulls are skipped, empty input yields empty map") {
    val data = Seq(Some("a"), None, Some("a"), None).toDF("v")
    assert(mgMap(data, 4) === Map("a" -> 2L))
    assert(mgMap(Seq.empty[String].toDF("v"), 4) === Map.empty)
  }

  test("bound holds for every item under every partitioning") {
    val rnd = new Random(42)
    // zipf-ish: heavy head + long uniform tail, far more distincts
    // than k so decrements and merge reductions both fire
    val rows = Seq.tabulate(20000) { _ =>
      val r = rnd.nextInt(100)
      if (r < 30) s"hot${rnd.nextInt(5)}"
      else if (r < 55) s"warm${rnd.nextInt(40)}"
      else s"cold${rnd.nextInt(4000)}"
    }
    val k = 64
    val n = rows.size.toLong
    val exact: Map[String, Long] =
      rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
    for (parts <- Seq(1, 4, 13)) {
      val df = rows.toDF("v").repartition(parts)
      val mg = mgMap(df, k)
      assert(mg.size <= k)
      mg.foreach { case (item, c) =>
        val t = exact(item)
        assert(c <= t, s"overcount of $item at parts=$parts")
        assert((t - c) * (k + 1) <= n, s"undercount bound broken for $item")
      }
      // guaranteed presence + bound for everything above n/(k+1)
      exact.filter { case (_, t) => t * (k + 1) > n }.foreach {
        case (item, t) =>
          assert(mg.contains(item), s"$item (count $t) missing at parts=$parts")
      }
    }
  }

  test("heavyHitters emits the guaranteed set with true flags") {
    val rows = Seq.fill(300)("the") ++ Seq.fill(200)("of") ++
      Seq.tabulate(500)(i => s"t$i")
    val df = rows.toDF("tok").repartition(7)
    val out = Sketch.heavyHitters(df, "tok", k = 16).collect()
    // n=1000, k=16: threshold n/(k+1) ~ 58.8 — exactly {the, of}
    assert(out.map(_.getString(0)).toSeq === Seq("the", "of"))
    assert(out.forall(r => r.getBoolean(2) && r.getBoolean(3)))
    assert(out.map(r => r.getString(0) -> r.getLong(1)).toMap ===
      Map("the" -> 300L, "of" -> 200L))
  }

  test("freq_items is callable from plain SQL") {
    CatalystBridge.registerFunctions(spark)
    Seq("x", "x", "y").toDF("v").createOrReplaceTempView("mg_sql_in")
    val m = spark.sql("SELECT freq_items(v, 4) AS mg FROM mg_sql_in")
      .head().getMap[String, Long](0).toMap
    assert(m === Map("x" -> 2L, "y" -> 1L))
  }
}
