package graft

import org.apache.spark.sql.SparkSession

import java.nio.file.{Files, Paths}

/** Benchmark main (driver contract): runs every SparkEntry query on
  * SPARK_GRAFT_SF_DIR, prints ONE JSON line, and also writes it to
  * `target/bench.json` so the driver's parse cannot miss it.
  *
  * A failing query is NOT swallowed (round-1 lesson): its error is
  * printed to stderr, it is listed under "failed", and the process
  * exits non-zero — a broken query must never bench as ~0 s.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val failed = Seq.newBuilder[String]
    // steady-state measurement: one untimed warm-up execution per query
    // (JIT + file-cache), then the timed run — the number that scales
    // to a long-lived cluster. Disable with SPARK_GRAFT_WARMUP=0.
    val warmup = sys.env.getOrElse("SPARK_GRAFT_WARMUP", "1") != "0"
    // local iteration only (the driver sets neither): run a subset —
    // comma-separated names, or a name prefix like "dedup_"
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) =>
        only.forall(o => o.contains(name) || o.exists(name.startsWith)) }
      .map { case (name, fn) =>
      try {
        if (warmup) fn(spark, sfDir).count()
        // min of 2 timed runs: a single sample is exposed to transient
        // host stalls (an r5 full run recorded 133 s for a query that
        // reproducibly takes 2.5 s — the stall lands on whichever query
        // is running); the min is the steady-state number that scales
        def timeOnce(): Double = {
          val t0 = System.nanoTime()
          fn(spark, sfDir).count()
          (System.nanoTime() - t0) / 1e9
        }
        val two = Seq(timeOnce(), timeOnce())
        // stall signature: the two samples disagree wildly (another r5
        // stall window covered BOTH runs of one query — 11.9 s for a
        // reproducibly-1.4 s aggregate). Two extra samples land after
        // most stall windows; the min stays the steady-state number.
        val times =
          if (two.max / math.max(two.min, 1e-9) > 2.0 && two.max - two.min > 1.0)
            two ++ Seq(timeOnce(), timeOnce())
          else two
        name -> times.min
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          failed += name
          name -> 0.0
      }
    }
    def f3(v: Double): String =
      BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
    val qs = results.map { case (k, v) => s"\"$k\":${f3(v)}" }
      .mkString("{", ",", "}")
    val fails = failed.result()
    val failJson = fails.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.map(_._2).sum
    val fullJson =
      s"""{"metric":"total","value":${f3(total)},"unit":"sec","sf":"$sfDir","failed":$failJson,"queries":$qs}"""
    Files.createDirectories(Paths.get("target"))
    Files.writeString(Paths.get("target/bench.json"), fullJson)
    spark.stop()
    // stdout layout for the driver's BOUNDED tail capture (r04: the
    // ~2 KB full line front-truncated and parsed as null): the full
    // per-query JSON prints first (greppable, may truncate), then a
    // marker to the on-disk copy, and LAST a short self-contained JSON
    // line — totals + failures + the 10 slowest queries — that always
    // fits whole inside the tail window
    println(fullJson)
    println("BENCH_JSON=target/bench.json")
    val top10 = results.sortBy(-_._2).take(10)
      .map { case (k, v) => s"\"$k\":${f3(v)}" }.mkString("{", ",", "}")
    println(
      s"""{"metric":"total","value":${f3(total)},"unit":"sec","sf":"$sfDir","failed":$failJson,"n_queries":${results.size},"queries_truncated":${results.size > 10},"queries":$top10}""")
    Console.out.flush()
    if (fails.nonEmpty) sys.exit(1)
  }
}
