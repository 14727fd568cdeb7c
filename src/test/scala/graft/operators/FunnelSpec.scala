package graft.operators

import graft.SparkSpec

/** `Sessionize.funnel` / `funnelSummary` — ordered-step conversion. */
class FunnelSpec extends SparkSpec {

  import spark.implicits._

  private val events = Seq(
    // user 1: completes the whole funnel in order
    (1L, "view", 10L), (1L, "click", 20L), (1L, "purchase", 30L),
    // user 2: click/purchase BEFORE the first view never count
    (2L, "click", 5L), (2L, "view", 10L), (2L, "purchase", 8L),
    // user 3: stalls after view
    (3L, "view", 10L),
    // user 4: never views -> not in the funnel at all
    (4L, "purchase", 5L),
    // user 5: same-timestamp step completion counts (>=)
    (5L, "view", 10L), (5L, "click", 10L), (5L, "purchase", 40L))
    .toDF("user_id", "event_type", "ts_us")

  test("per-user step times honor ordering") {
    val f = Sessionize.funnel(events, Seq("view", "click", "purchase"))
      .orderBy("user_id").collect()
    assert(f.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L, 5L))
    val u1 = f(0)
    assert(u1.getLong(1) == 10L && u1.getLong(2) == 20L &&
      u1.getLong(3) == 30L)
    val u2 = f(1)
    assert(u2.getLong(1) == 10L && u2.isNullAt(2) && u2.isNullAt(3))
    val u5 = f(3)
    assert(u5.getLong(2) == 10L && u5.getLong(3) == 40L)
  }

  test("summary counts and conversion rates") {
    val s = Sessionize.funnelSummary(events, Seq("view", "click", "purchase"))
      .orderBy("step_idx").collect()
    assert(s.map(r => (r.getString(1), r.getLong(2))).toSeq ==
      Seq(("view", 4L), ("click", 2L), ("purchase", 2L)))
    assert(s(0).isNullAt(3))
    assert(s(1).getDouble(3) == 0.5 && s(2).getDouble(3) == 1.0)
  }

  test("rateAnomalies: spike and dark hour flag, steady hours don't") {
    import spark.implicits._
    // 9 steady hours at ~10/h (9..11), one 100x spike, one near-dark
    val perHour = Seq(10, 11, 9, 10, 11, 9, 10, 11, 10, 1000, 1)
    val rows = perHour.zipWithIndex.flatMap { case (n, h) =>
      (0 until n).map(i => (h * 3600000000L + i * 1000L, 1L))
    }.toDF("ts_us", "x")
    val got = Sessionize.rateAnomalies(rows, "ts_us",
        bucketUs = 3600000000L, zMilThreshold = 3500L)
      .orderBy("bucket").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    // n=11 buckets, counts sorted: 1,9,9,10,10,10,10,11,11,11,1000
    // median = rank-6 value = 10; deviations sorted: 0,0,0,0,1,1,1,1,1,9,990
    // MAD = rank-6 value = 1
    assert(got.forall(r => r._3 == 10L && r._4 == 1L))
    val spike = got(9); val dark = got(10)
    assert(spike._5 == 990000L && spike._6 == 1L) // (1000-10)*1000/1
    assert(dark._5 == -9000L && dark._6 == 1L)    // sign respected
    // steady hours: |z| <= 1000, unflagged
    got.take(9).foreach { r =>
      assert(math.abs(r._5) <= 1000L && r._6 == 0L)
    }
  }

  test("rateAutocorrelation: period-4 series peaks at lag 4, nulls on flat") {
    import spark.implicits._
    // counts cycle 10,2,10,2,... over 40 hours -> acf(4)=1, acf(1)<0.
    // Hour 7 has ZERO events (absent rows) - densification keeps the
    // cycle aligned only if the gap counts as a real 0... use a clean
    // periodic series with no gap for the exact +1/-1 pins.
    val perHour = (0 until 40).map(h => if (h % 2 == 0) 10 else 2)
    val rows = perHour.zipWithIndex.flatMap { case (n, h) =>
      (0 until n).map(i => (h * 3600000000L + i * 1000L, 1L))
    }.toDF("ts_us", "x")
    val got = Sessionize.rateAutocorrelation(rows, "ts_us",
        3600000000L, Seq(1, 2)).orderBy("lag").collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(got(2L) == 1.0, got)   // period 2: perfect at lag 2
    assert(got(1L) == -1.0, got)  // anti-phase at lag 1
    // constant series: zero variance -> null
    val flat = (0 until 10).flatMap(h =>
      (0 until 5).map(i => (h * 3600000000L + i, 1L))).toDF("ts_us", "x")
    assert(Sessionize.rateAutocorrelation(flat, "ts_us", 3600000000L,
      Seq(1)).head.isNullAt(2))
    // gap densification: an absent bucket is a 0, not a skip
    val gappy = Seq(0, 1, 3).flatMap(h =>
      (0 until 4).map(i => (h * 3600000000L + i, 1L))).toDF("ts_us", "x")
    val g1 = Sessionize.rateAutocorrelation(gappy, "ts_us",
      3600000000L, Seq(1)).head
    assert(g1.getLong(1) == 3L) // buckets 0..3 dense -> 3 lag-1 pairs
  }
}
