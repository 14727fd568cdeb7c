package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import graft.operators.Sketch
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming quantile monitoring: the per-window log-linear histogram
  * must agree with the batch sketch bucket-for-bucket, and quantiles
  * served from the streamed rows must equal batch quantiles. */
class HdrStreamSpec extends SparkSpec {

  test("valueHistogramPerWindow: stream buckets == batch sketch per window") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val ms = MemoryStream[(Timestamp, Long)]
    val out = ScdStream.valueHistogramPerWindow(
      ms.toDF().toDF("ts", "x"), "x", "ts", "10 minutes", "5 minutes")
    val q = out.writeStream.format("memory").queryName("hist")
      .outputMode("complete").start()
    try {
      val w1 = (1 to 40).map(i =>
        (Timestamp.valueOf("2024-01-01 00:03:00"), (i * 97L) % 5000L))
      val w2 = (1 to 25).map(i =>
        (Timestamp.valueOf("2024-01-01 00:14:00"), (i * 131L) % 800L))
      ms.addData(w1 ++ w2)
      q.processAllAvailable()
      val got = spark.table("hist")
        .select(col("window_start").cast("string").as("w"),
          col("key"), col("cnt"))
        .collect()
        .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
      def batch(rows: Seq[(Timestamp, Long)], w: String) =
        Sketch.hdrSketch(rows.map(_._2).toDF("x"), "x", 5)
          .collect().map(r => (w, r.getLong(0)) -> r.getLong(1)).toMap
      val want = batch(w1, "2024-01-01 00:00:00") ++
        batch(w2, "2024-01-01 00:10:00")
      assert(got == want)
    } finally q.stop()
  }

  test("streaming drift monitor: per-window histograms vs a reference sketch") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    // reference distribution: lengths ~ (i*61) % 20000
    val ref = Sketch.hdrSketch(
      (1 to 500).map(i => (i * 61L) % 20000L).toDF("x"), "x", 5)
    val ms = MemoryStream[(Timestamp, Long)]
    val out = ScdStream.valueHistogramPerWindow(
      ms.toDF().toDF("ts", "x"), "x", "ts", "10 minutes", "5 minutes")
    val q = out.writeStream.format("memory").queryName("drift_hist")
      .outputMode("complete").start()
    try {
      // window 1 draws from the reference distribution; window 2 is
      // shifted 30x — the drift monitor must separate them
      ms.addData((1 to 300).map(i =>
        (Timestamp.valueOf("2024-01-01 00:02:00"), (i * 61L) % 20000L)))
      ms.addData((1 to 300).map(i =>
        (Timestamp.valueOf("2024-01-01 00:12:00"),
          ((i * 61L) % 20000L) * 30L)))
      q.processAllAvailable()
      def windowSketch(start: String) = spark.table("drift_hist")
        .where(col("window_start").cast("string").startsWith(start))
        .select("key", "cnt")
      val same = Sketch.hdrDrift(ref,
        windowSketch("2024-01-01 00:00")).head
      val shifted = Sketch.hdrDrift(ref,
        windowSketch("2024-01-01 00:10")).head
      val (psiSame, psiShift) = (same.getAs[Long]("psi_e12"),
        shifted.getAs[Long]("psi_e12"))
      val (ksSame, ksShift) = (same.getAs[Long]("ks_mil"),
        shifted.getAs[Long]("ks_mil"))
      assert(psiShift > 4 * math.max(psiSame, 1L),
        s"psi same=$psiSame shifted=$psiShift")
      assert(ksShift > 3 * math.max(ksSame, 1L) && ksShift >= 900,
        s"ks same=$ksSame shifted=$ksShift")
    } finally q.stop()
  }

  test("stratified streaming drift: per-(window, lang) histograms vs per-lang reference — only the shifted lang fires") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    def mk(lang: String, f: Long => Long) =
      (1 to 300).map(i => (lang, f((i * 61L) % 20000L)))
    // per-lang reference sketches from the standing corpus
    val ref = Sketch.hdrSketchBy(
      (mk("en", identity) ++ mk("zh", identity)).toDF("lang", "x"),
      col("lang"), "x", 5)
      .withColumnRenamed("lang", "stratum")
    val ms = MemoryStream[(Timestamp, String, Long)]
    val out = ScdStream.valueHistogramPerWindowBy(
      ms.toDF().toDF("ts", "lang", "x"), col("lang"), "x", "ts",
      "10 minutes", "5 minutes")
    val q = out.writeStream.format("memory").queryName("hist_by")
      .outputMode("complete").start()
    try {
      // the batch window: en draws from the reference distribution,
      // zh arrives 30x longer — only zh must light up
      val ts = Timestamp.valueOf("2024-01-01 00:02:00")
      ms.addData((mk("en", identity) ++ mk("zh", _ * 30L))
        .map { case (l, x) => (ts, l, x) })
      q.processAllAvailable()
      // stream buckets == batch hdrSketchBy, stratum for stratum
      val streamed = spark.table("hist_by")
        .select(col("stratum"), col("key"), col("cnt"))
      val gotBuckets = streamed.collect()
        .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
      val wantBuckets = Sketch.hdrSketchBy(
          (mk("en", identity) ++ mk("zh", _ * 30L)).toDF("lang", "x"),
          col("lang"), "x", 5)
        .collect()
        .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(gotBuckets == wantBuckets)
      // score the window against the reference per stratum
      val drift = Sketch.hdrDriftBy(ref, streamed).collect()
        .map(r => r.getString(0) -> r).toMap
      val (ksEn, ksZh) = (drift("en").getAs[Long]("ks_mil"),
        drift("zh").getAs[Long]("ks_mil"))
      assert(ksZh >= 900 && ksZh > 3 * math.max(ksEn, 1L),
        s"ks en=$ksEn zh=$ksZh")
      assert(drift("zh").getAs[Long]("psi_e12") >
        4 * math.max(drift("en").getAs[Long]("psi_e12"), 1L))
    } finally q.stop()
  }

  test("streamed rows are additive: quantiles served from the union == batch") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val ms = MemoryStream[(Timestamp, Long)]
    val out = ScdStream.valueHistogramPerWindow(
      ms.toDF().toDF("ts", "x"), "x", "ts", "10 minutes", "0 seconds")
    val q = out.writeStream.format("memory").queryName("hist2")
      .outputMode("complete").start()
    try {
      val xs = (1 to 300).map(i => (i * 61L) % 20000L)
      // same window, fed in two batches — counts must merge by addition
      ms.addData(xs.take(180).map(x =>
        (Timestamp.valueOf("2024-01-01 00:02:00"), x)))
      q.processAllAvailable()
      ms.addData(xs.drop(180).map(x =>
        (Timestamp.valueOf("2024-01-01 00:07:00"), x)))
      q.processAllAvailable()
      // roll all emitted windows up (here: one) and serve quantiles
      val rolled = Sketch.hdrMerge(
        spark.table("hist2").select(col("key"), col("cnt")))
      val servedQ = Sketch.hdrQuantiles(rolled, 5, Seq(500, 990))
        .select("q_mil", "key").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val batchQ = Sketch.hdrQuantiles(
          Sketch.hdrSketch(xs.toDF("x"), "x", 5), 5, Seq(500, 990))
        .select("q_mil", "key").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(servedQ == batchQ)
    } finally q.stop()
  }
}
