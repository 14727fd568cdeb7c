package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Proof that clustered layout actually prunes: a selective range
  * filter over a range-clustered table must open a strict subset of
  * the files (parquet min/max skipping), versus all files for the
  * randomly-laid-out copy. */
class LayoutSpec extends SparkSpec {

  import spark.implicits._

  /** rows the parquet scan EMITS after row-group min/max skipping +
    * pushed-filter evaluation (file-level pruning from footers is a
    * table-format feature; vanilla Spark skips at row-group level
    * inside the reader — that's what clustering unlocks) */
  private def scanOutputRows(df: org.apache.spark.sql.DataFrame): Long = {
    df.collect() // execute so metrics populate
    df.queryExecution.executedPlan.collectLeaves().collect {
      case s: FileSourceScanExec => s.metrics("numOutputRows").value
    }.sum
  }

  test("range filter on clustered layout skips row groups the unclustered layout reads") {
    val n = 50000
    // pseudo-random key order so the unclustered layout interleaves ids
    val df = (1 to n).map(i => ((i * 48271) % n, i)).toDF("id", "payload")
    val unclustered = Files.createTempDirectory("lay_rand").toString
    df.repartition(8).write.mode("overwrite").parquet(unclustered)
    val clustered = Files.createTempDirectory("lay_clust").toString
    Layout.clusteredWrite(df, Seq(col("id")), clustered, numFiles = 8)

    val pred = col("id").between(100, 200)
    val randRows = scanOutputRows(spark.read.parquet(unclustered).where(pred))
    val clustRows = scanOutputRows(spark.read.parquet(clustered).where(pred))
    // clustered: only the one row group whose min/max covers [100,200]
    // survives the footer check; interleaved: every row group overlaps
    assert(clustRows < randRows / 4,
      s"no row-group skipping: clustered=$clustRows unclustered=$randRows")
    // identical results either way
    assert(spark.read.parquet(clustered).where(pred).count() ==
      spark.read.parquet(unclustered).where(pred).count())
  }

  test("z-order layout prunes on the NON-prefix dimension; linear sort cannot") {
    // 64x64 grid: lexicographic (x, y) clustering gives y no locality
    val grid = (for { x <- 0 until 64; y <- 0 until 64 }
      yield (x, y, x * 64 + y)).toDF("x", "y", "payload")
    val linear = Files.createTempDirectory("lay_lin").toString
    Layout.clusteredWrite(grid, Seq(col("x"), col("y")), linear,
      numFiles = 16)
    val zed = Files.createTempDirectory("lay_z").toString
    Layout.zOrderedWrite(grid, Seq(col("x"), col("y")), bits = 6, zed,
      numFiles = 16)

    // filter on y ALONE — the dimension the linear sort subordinates
    val pred = col("y") < 4
    val linRows = scanOutputRows(spark.read.parquet(linear).where(pred))
    val zRows = scanOutputRows(spark.read.parquet(zed).where(pred))
    // every x-clustered row group spans all y: nothing skips; z-tiles
    // confine y < 4 to the bottom row of tiles
    assert(zRows < linRows / 2,
      s"z-order did not prune: z=$zRows linear=$linRows")
    assert(spark.read.parquet(zed).where(pred).count() ==
      spark.read.parquet(linear).where(pred).count())
    // the layout key is not persisted
    assert(spark.read.parquet(zed).columns.toSet == Set("x", "y", "payload"))
  }

  test("hilbertKey: bijection, curve adjacency, canonical-C replay, locality beats Morton") {
    // plain-Scala canonical xy2d (the Wikipedia C loop, verbatim)
    def xy2d(bits: Int, x0: Long, y0: Long): Long = {
      var (x, y, d) = (x0, y0, 0L)
      val n = 1L << bits
      var s = n / 2
      while (s > 0) {
        val rx = if ((x & s) > 0) 1L else 0L
        val ry = if ((y & s) > 0) 1L else 0L
        d += s * s * ((3 * rx) ^ ry)
        if (ry == 0) {
          if (rx == 1) { x = n - 1 - x; y = n - 1 - y }
          val t = x; x = y; y = t
        }
        s /= 2
      }
      d
    }
    // bits = 3: full 8x8 grid — bijection onto 0..63 AND the Hilbert
    // property: consecutive curve positions are grid-adjacent
    val grid = (for { x <- 0 until 8; y <- 0 until 8 }
      yield (x.toLong, y.toLong)).toDF("x", "y")
    val got = grid.select(col("x"), col("y"),
        Layout.hilbertKey(col("x"), col("y"), bits = 3).as("h"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(got.values.toSeq.sorted == (0L until 64L).toSeq)
    val byD = got.map(_.swap)
    for (d <- 0L until 63L) {
      val (x1, y1) = byD(d); val (x2, y2) = byD(d + 1)
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"jump at d=$d: ($x1,$y1)->($x2,$y2)")
    }
    // bits = 16: match the canonical C loop on random coordinates
    val rnd = new scala.util.Random(9)
    val pts = (1 to 200).map(_ =>
      (rnd.nextInt(65536).toLong, rnd.nextInt(65536).toLong))
    val got16 = pts.toDF("x", "y")
      .select(col("x"), col("y"),
        Layout.hilbertKey(col("x"), col("y"), bits = 16).as("h"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    for ((x, y) <- pts)
      assert(got16((x, y)) == xy2d(16, x, y), s"($x,$y)")
    // locality: total curve length (sum of |key delta| between grid
    // neighbors) — Hilbert's bounded rotations beat the Morton Z-jumps
    def cost(keyOf: (Long, Long) => Long): Long =
      (for { x <- 0L until 8L; y <- 0L until 7L }
        yield math.abs(keyOf(x, y + 1) - keyOf(x, y))).sum
    val mort = grid.select(col("x"), col("y"),
        Layout.zOrderKey(Seq(col("x"), col("y")), bits = 3).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(cost((a, b) => got((a, b))) < cost((a, b) => mort((a, b))),
      "hilbert locality not better than morton")
  }

  test("hilbertOrderedWrite prunes a query box at least as well as z-order") {
    val grid = (for { x <- 0 until 64; y <- 0 until 64 }
      yield (x, y, x * 64 + y)).toDF("x", "y", "payload")
    val zed = Files.createTempDirectory("lay_z2").toString
    Layout.zOrderedWrite(grid, Seq(col("x"), col("y")), bits = 6, zed,
      numFiles = 16)
    val hil = Files.createTempDirectory("lay_h").toString
    Layout.hilbertOrderedWrite(grid, col("x"), col("y"), bits = 6, hil,
      numFiles = 16)
    val pred = col("y") < 4
    val zRows = scanOutputRows(spark.read.parquet(zed).where(pred))
    val hRows = scanOutputRows(spark.read.parquet(hil).where(pred))
    assert(hRows <= zRows, s"hilbert=$hRows morton=$zRows")
    assert(spark.read.parquet(hil).where(pred).count() ==
      spark.read.parquet(zed).where(pred).count())
    assert(spark.read.parquet(hil).columns.toSet ==
      Set("x", "y", "payload"))
  }

  test("bucketed tables join with zero exchanges (co-located join)") {
    val facts = (1 to 20000).map(i => (i % 1000, i)).toDF("k", "v")
    val dims = (0 until 1000).map(i => (i, s"d$i")).toDF("k", "name")
    Layout.bucketedWrite(facts, "k", 8, "lay_facts")
    Layout.bucketedWrite(dims, "k", 8, "lay_dims")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("lay_facts")
        .join(spark.table("lay_dims"), Seq("k"))
      assert(joined.count() == 20000)
      val plan = joined.queryExecution.executedPlan.toString
      // both sides pre-bucketed on k with equal bucket counts: the
      // sort-merge join consumes bucket layout directly — NO shuffle
      assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
      prevThreshold)
  }

  test("shuffledShardWrite: reproducible global shuffle, balanced disjoint shards") {
    val n = 20000
    val nShards = 8
    val df = (1 to n).map(i => (i.toLong, s"payload$i")).toDF("id", "pay")
    val dir = Files.createTempDirectory("shards").toString + "/out"
    Layout.shuffledShardWrite(df, col("id"), dir, nShards)
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
    assert(files.length == nShards, s"${files.length} shard files")
    // per-shard: rows arrive in (u, id) order; shard u-ranges disjoint
    def u(id: Long): Double = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val d = md.digest(s"sf|ep0|$id".getBytes("UTF-8"))
      val v = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      v.toDouble / 4294967296.0
    }
    var all = List.empty[Long]
    var prevMax = -1.0
    var sizes = List.empty[Int]
    files.foreach { f =>
      val ids = spark.read.parquet(f.getPath)
        .select("id").collect().map(_.getLong(0)).toList
      val us = ids.map(u)
      assert(us == us.sorted, s"shard ${f.getName} not in shuffle order")
      assert(us.head >= prevMax, "shard u-ranges overlap")
      prevMax = us.last
      sizes ::= ids.size
      all = all ++ ids
    }
    // nothing lost or duplicated; shards statistically balanced
    assert(all.sorted == (1 to n).map(_.toLong).toList)
    assert(sizes.min > n / nShards / 2, s"unbalanced shards: $sizes")
    // epoch key changes the order, same machinery (single shard file
    // ⇒ one input partition ⇒ collect preserves on-disk row order)
    val dir2 = Files.createTempDirectory("shards2").toString + "/out"
    Layout.shuffledShardWrite(df, col("id"), dir2, 1, seed = "ep1")
    val e1 = spark.read.parquet(dir2).select("id")
      .collect().map(_.getLong(0)).toList
    assert(e1.sorted == all.sorted && e1 != all,
      "different epoch seed must permute the order")
  }

  test("zone-map manifest: skipScan opens a strict file subset, results exact") {
    val n = 40000
    val df = (1 to n).map(i => ((i * 48271) % n, i)).toDF("id", "payload")
    val dir = Files.createTempDirectory("zm_data").toString + "/t"
    Layout.clusteredWrite(df, Seq(col("id")), dir, numFiles = 8)
    val man = Files.createTempDirectory("zm_man").toString + "/m"
    Layout.zoneMapWrite(spark, dir, Seq("id"), man)
    val manifest = spark.read.parquet(man)
    val total = manifest.count()
    assert(total == 8, s"one manifest row per file, got $total")
    assert(manifest.agg(sum($"rows")).head.getLong(0) == n)

    val (lo, hi) = (100, 600)
    val keep = col("id_min") <= hi && col("id_max") >= lo
    val kept = Layout.prunedFiles(manifest, keep)
    assert(kept.size < total,
      s"no file-level pruning: kept ${kept.size} of $total")
    val residual = col("id").between(lo, hi)
    val pruned = Layout.skipScan(spark, dir, manifest, keep, residual)
      .select("id", "payload").collect().map(r => (r.getInt(0), r.getInt(1)))
    val full = spark.read.parquet(dir).where(residual)
      .select("id", "payload").collect().map(r => (r.getInt(0), r.getInt(1)))
    assert(pruned.sorted.toList == full.sorted.toList)

    // zero qualifying files → empty result, schema preserved
    val none = Layout.skipScan(spark, dir, manifest,
      col("id_min") > n * 2, col("id") === n * 2)
    assert(none.count() == 0 &&
      none.columns.toSet == Set("id", "payload"))
  }

  test("zone-map append: new files' stats only; appended == rebuilt") {
    val dir = Files.createTempDirectory("zma_data").toString + "/t"
    val a = (1 to 1000).map(i => (i, i)).toDF("id", "payload")
    Layout.clusteredWrite(a, Seq(col("id")), dir, numFiles = 4)
    val man = Files.createTempDirectory("zma_man").toString + "/m"
    Layout.zoneMapWrite(spark, dir, Seq("id"), man)
    // a new batch of files arrives in the same table directory
    val b = (2001 to 2500).map(i => (i, i)).toDF("id", "payload")
    b.repartition(2).write.mode("append").parquet(dir)
    Layout.zoneMapAppend(spark, dir, Seq("id"), man)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("file", "id_min", "id_max", "rows").collect()
        .map(r => (r.getString(0), r.getInt(1), r.getInt(2), r.getLong(3)))
        .sortBy(_._1).toList
    val appended = rows(spark.read.parquet(man))
    val rebuilt = rows(Layout.zoneMapBuild(spark, dir, Seq("id")))
    assert(appended == rebuilt, "appended manifest diverged from rebuild")
    assert(appended.size == 6, s"4 + 2 files, got ${appended.size}")
  }

  test("optimize: small files compact into few z-ordered files, rows intact") {
    val grid = (for { x <- 0 until 64; y <- 0 until 64 }
      yield (x, y, x * 64 + y)).toDF("x", "y", "payload")
    val dir = Files.createTempDirectory("opt").toString + "/t"
    grid.repartition(64).write.mode("overwrite").parquet(dir)
    // a sidecar-like hidden file must survive the swap untouched
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, ".updates"), "-- log\n")
    val before = spark.read.parquet(dir)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2)))
    val (was, now) = Layout.optimize(spark, dir,
      Seq(col("x"), col("y")), bits = 6, numFiles = Some(4))
    assert(was == 64 && now == 4)
    val dataFiles = new java.io.File(dir).listFiles()
      .filter(f => f.isFile && !f.getName.startsWith(".") &&
        !f.getName.startsWith("_"))
    assert(dataFiles.length == 4, s"left ${dataFiles.length} data files")
    assert(new java.io.File(dir, ".updates").exists())
    assert(!new java.io.File(dir, ".optimize-tmp").exists() &&
      !new java.io.File(dir, ".optimize-backup").exists())
    val after = spark.read.parquet(dir)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2)))
    assert(after.sorted.toList == before.sorted.toList)
    // compaction clustered while it compacted: a y-filter now skips.
    // Granularity bound: 4 files ≈ the 4 Morton quadrants, and y < 4
    // intersects the two y-low quadrants (2048 rows), plus slop from
    // repartitionByRange's SAMPLED boundaries — so assert strictly
    // better than 3 of 4 quadrants, not an exact tile count
    val yRows = scanOutputRows(spark.read.parquet(dir)
      .where(col("y") < 4))
    assert(yRows < 64 * 64 * 3 / 4, s"no clustering after optimize: $yRows")
  }

  test("optimize refuses to run over a non-empty crash backup") {
    val dir = Files.createTempDirectory("opt_crash").toString + "/t"
    (1 to 100).map(i => (i, i)).toDF("id", "payload")
      .repartition(4).write.mode("overwrite").parquet(dir)
    // simulate a mid-swap crash: one original lives only in the backup
    val backup = new java.io.File(dir, ".optimize-backup")
    assert(backup.mkdirs())
    val moved = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    assert(moved.renameTo(new java.io.File(backup, moved.getName)))
    val before = new java.io.File(dir).listFiles().map(_.getName).toSet
    val e = intercept[IllegalArgumentException] {
      Layout.optimize(spark, dir, Seq(col("id")), numFiles = Some(2))
    }
    assert(e.getMessage.contains("interrupted run"), e.getMessage)
    // NOTHING was touched: data files and the backup are intact
    assert(new java.io.File(dir).listFiles().map(_.getName).toSet ==
      before)
    assert(new java.io.File(backup, moved.getName).exists())
  }

  test("cross-type probe: NULL/erroring casts never skip — probe keeps the file") {
    // STRING stats probed with a NUMERIC literal: comparing "zzz" to 5
    // raises under ANSI (NULL pre-ANSI) — neither proves disjointness,
    // so the probe must KEEP both files (the old coalesce(keep, false)
    // form skipped them; the raw comparison would crash the probe)
    val dir = Files.createTempDirectory("zm_xtype").toString + "/t"
    Seq(("5", 1), ("abc", 2)).toDF("k", "payload")
      .coalesce(1).write.mode("overwrite").parquet(dir)
    Seq(("zzz", 3)).toDF("k", "payload")
      .coalesce(1).write.mode("append").parquet(dir)
    val man = Files.createTempDirectory("zm_xtype_m").toString + "/m"
    Layout.zoneMapWrite(spark, dir, Seq("k"), man)
    val manifest = spark.read.parquet(man)
    val kept = Layout.prunedFiles(manifest,
      Layout.autoKeep(manifest, col("k") === 5))
    assert(kept.size == 2,
      s"cross-type probe must keep every unprovable file: $kept")
    // same-type probe on the same manifest still prunes normally
    val keptStr = Layout.prunedFiles(manifest,
      Layout.autoKeep(manifest, col("k") === "5"))
    assert(keptStr.size == 1, s"same-type pruning broke: $keptStr")
  }

  test("bloom manifest: point lookup opens few files on an UNCLUSTERED key") {
    val n = 40000
    // random layout: min/max zone maps are useless for this key —
    // every file spans nearly the full id range; blooms still skip
    val df = (1 to n).map(i => ((i.toLong * 48271) % n, i))
      .toDF("id", "payload")
    val dir = Files.createTempDirectory("bm_data").toString + "/t"
    df.repartition(16).write.mode("overwrite").parquet(dir)
    val man = Files.createTempDirectory("bm_man").toString + "/m"
    Layout.bloomManifestWrite(spark, dir, "id", n / 16 * 2, man)
    val manifest = spark.read.parquet(man)
    assert(manifest.count() == 16)

    val probe = lit(4242L) // matches the bigint key type (xxhash64!)
    val kept = Layout.prunedFiles(manifest,
      org.apache.spark.sql.graft.CatalystBridge.bloomContains(col("bloom"),
        xxhash64(probe)))
    assert(kept.size < 8, s"bloom did not prune: kept ${kept.size}/16")
    val got = Layout.bloomSkipScan(spark, dir, manifest, "id", probe)
      .select("id", "payload").collect()
      .map(r => (r.getLong(0), r.getInt(1))).sorted.toList
    val want = spark.read.parquet(dir).where(col("id") === 4242L)
      .select("id", "payload").collect()
      .map(r => (r.getLong(0), r.getInt(1))).sorted.toList
    assert(got == want && got.nonEmpty)
  }

  test("prunedFilesForKeys: a key SET prunes files; bloom append == rebuild") {
    val n = 20000
    val df = (1 to n).map(i => ((i.toLong * 48271) % n, i))
      .toDF("id", "payload")
    val dir = Files.createTempDirectory("dyn_data").toString + "/t"
    df.repartition(16).write.mode("overwrite").parquet(dir)
    val man = Files.createTempDirectory("dyn_man").toString + "/m"
    // manifest built on HALF the files, the rest appended
    Layout.bloomManifestWrite(spark, dir, "id", 4096, man)
    val more = (100001 to 100500).map(i => (i.toLong, i))
      .toDF("id", "payload")
    more.repartition(2).write.mode("append").parquet(dir)
    Layout.bloomManifestAppend(spark, dir, "id", 4096, man)
    val manifest = spark.read.parquet(man)
    assert(manifest.count() == 18)
    // appended == rebuilt (bit-for-bit per file)
    val rebuilt = Layout.bloomManifestBuild(spark, dir, "id", 4096)
    def asMap(m: org.apache.spark.sql.DataFrame) =
      m.collect().map(r => r.getString(0) ->
        r.getAs[Array[Byte]](1).toSeq).toMap
    assert(asMap(manifest) == asMap(rebuilt))

    val keys = Seq(77L, 4242L, 100100L).toDF("id")
    val kept = Layout.prunedFilesForKeys(manifest, keys, "id")
    assert(kept.nonEmpty && kept.size < 18,
      s"dynamic pruning kept ${kept.size}/18")
    val got = spark.read.option("basePath", dir).parquet(kept: _*)
      .join(keys, Seq("id")).select("id", "payload").collect()
      .map(r => (r.getLong(0), r.getInt(1))).sorted.toList
    val want = spark.read.parquet(dir)
      .join(keys, Seq("id")).select("id", "payload").collect()
      .map(r => (r.getLong(0), r.getInt(1))).sorted.toList
    assert(got == want && got.nonEmpty)
  }

  test("skipScan keeps hive-partition columns alive (basePath)") {
    val df = (1 to 2000).map(i => (i, i % 4, i * 2))
      .toDF("id", "pt", "payload")
    val dir = Files.createTempDirectory("zm_part").toString + "/t"
    df.write.mode("overwrite").partitionBy("pt").parquet(dir)
    val man = Files.createTempDirectory("zm_part_m").toString + "/m"
    Layout.zoneMapWrite(spark, dir, Seq("id"), man)
    val manifest = spark.read.parquet(man)
    val out = Layout.skipScan(spark, dir, manifest,
      col("id_min") <= 100 && col("id_max") >= 50,
      col("id").between(50, 100))
    // the partition column survives the explicit-file-list read
    assert(out.columns.toSet == Set("id", "pt", "payload"))
    val got = out.select("id", "pt").collect()
      .map(r => (r.getInt(0), r.getInt(1))).sorted.toList
    val want = spark.read.parquet(dir).where(col("id").between(50, 100))
      .select("id", "pt").collect()
      .map(r => (r.getInt(0), r.getInt(1))).sorted.toList
    assert(got == want && got.nonEmpty)
  }

  test("zone-map append on a hive-partitioned dir: files in NEW k=v subdirs are indexed") {
    // regression (ADVICE r08): freshFiles listed only the top level,
    // so appends into partition subdirs were silently unindexed and
    // skipScan silently dropped their rows
    val dir = Files.createTempDirectory("zma_part").toString + "/t"
    (1 to 1000).map(i => (i, i % 2, i)).toDF("id", "pt", "payload")
      .repartition(2).write.mode("overwrite").partitionBy("pt")
      .parquet(dir)
    val man = Files.createTempDirectory("zma_part_m").toString + "/m"
    Layout.zoneMapWrite(spark, dir, Seq("id"), man)
    val baseFiles = spark.read.parquet(man).count()
    // new batch lands in BOTH an existing partition and a brand-new one
    (2001 to 2400).map(i => (i, if (i % 2 == 0) 2 else 1, i))
      .toDF("id", "pt", "payload")
      .coalesce(1).write.mode("append").partitionBy("pt").parquet(dir)
    Layout.zoneMapAppend(spark, dir, Seq("id"), man)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("file", "id_min", "id_max", "rows").collect()
        .map(r => (r.getString(0), r.getInt(1), r.getInt(2), r.getLong(3)))
        .sortBy(_._1).toList
    val appended = rows(spark.read.parquet(man))
    val rebuilt = rows(Layout.zoneMapBuild(spark, dir, Seq("id")))
    assert(appended == rebuilt, "partitioned append diverged from rebuild")
    assert(appended.size > baseFiles, "no new files were indexed")
    // and skipScan over the refreshed manifest finds the NEW rows
    val manifest = spark.read.parquet(man)
    val got = Layout.skipScan(spark, dir, manifest,
      Layout.rangeKeep("id", lit(2001), lit(2400)),
      col("id").between(2001, 2400)).count()
    assert(got == 400L, s"skipScan lost appended-partition rows: $got")
  }

  test("optimize refreshes named zone-map + bloom manifests; verify reads all-ok") {
    val dir = Files.createTempDirectory("opt_man").toString + "/t"
    (1 to 4000).map(i => (i, i % 97, i)).toDF("id", "k", "payload")
      .repartition(16).write.mode("overwrite").parquet(dir)
    val zm = Files.createTempDirectory("opt_man_zm").toString + "/zm"
    val bm = Files.createTempDirectory("opt_man_bm").toString + "/bm"
    Layout.zoneMapWrite(spark, dir, Seq("id"), zm)
    Layout.bloomManifestWrite(spark, dir, "k", 1024, bm)
    val (was, now) = Layout.optimize(spark, dir, Seq(col("id")),
      numFiles = Some(2), zoneMapManifest = Some(zm),
      bloomManifest = Some((bm, "k", 1024L)))
    assert(was == 16 && now == 2)
    // the refreshed zone map matches the post-optimize layout exactly
    val statuses = Layout.zoneMapVerify(spark, dir, Seq("id"), zm)
      .groupBy("status").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(statuses == Map("ok" -> 2L), statuses.toString)
    // both refreshed manifests still serve exact scans
    val zmGot = Layout.skipScan(spark, dir, spark.read.parquet(zm),
      Layout.rangeKeep("id", lit(10), lit(20)),
      col("id").between(10, 20)).count()
    assert(zmGot == 11L, s"zone-map skipScan after optimize: $zmGot")
    val hits = Layout.prunedFilesForKeys(spark.read.parquet(bm),
      Seq(42).toDF("k"), "k")
    val bmGot = spark.read.parquet(hits: _*)
      .where(col("k") === 42).count()
    val want = spark.read.parquet(dir).where(col("k") === 42).count()
    assert(bmGot == want && want > 0,
      s"bloom manifest after optimize: $bmGot vs $want")
  }

  test("optimize on a hive-partitioned root: per-leaf compaction, manifest healed") {
    val dir = Files.createTempDirectory("opt_part").toString + "/t"
    (1 to 3000).map(i => (i, i % 3, i)).toDF("id", "pt", "payload")
      .repartition(8).write.mode("overwrite").partitionBy("pt")
      .parquet(dir)
    val zm = Files.createTempDirectory("opt_part_zm").toString + "/zm"
    Layout.zoneMapWrite(spark, dir, Seq("id"), zm)
    val before = spark.read.parquet(dir).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2))).sorted.toList
    val (was, now) = Layout.optimize(spark, dir, Seq(col("id")),
      numFiles = Some(1), zoneMapManifest = Some(zm))
    assert(was == 24 && now == 3, s"($was, $now)") // 8 files × 3 parts → 1 × 3
    // rows and the partition column survive
    val after = spark.read.parquet(dir).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2))).sorted.toList
    assert(after == before)
    // partition boundaries preserved: each k=v dir holds exactly 1 file
    for (p <- 0 until 3) {
      val leaf = new java.io.File(dir, s"pt=$p").listFiles()
        .filter(f => f.isFile && !f.getName.startsWith(".") &&
          !f.getName.startsWith("_"))
      assert(leaf.length == 1, s"pt=$p has ${leaf.length} files")
    }
    // the named manifest was refreshed across all leaves: all-ok fsck
    val statuses = Layout.zoneMapVerify(spark, dir, Seq("id"), zm)
      .groupBy("status").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(statuses == Map("ok" -> 3L), statuses.toString)
  }

  test("partitioned optimize: empty leaf dirs skipped, mixed dirs compact their own files") {
    val dir = Files.createTempDirectory("opt_mixed").toString + "/t"
    (1 to 1000).map(i => (i, i % 2, i)).toDF("id", "pt", "payload")
      .repartition(4).write.mode("overwrite").partitionBy("pt")
      .parquet(dir)
    // an empty partition dir (crashed writer) must not abort the run
    assert(new java.io.File(dir, "pt=9").mkdirs())
    val before = spark.read.parquet(dir).count()
    val (was, now) = Layout.optimize(spark, dir, Seq(col("id")),
      numFiles = Some(1))
    assert(was == 8 && now == 2, s"($was, $now)")
    assert(spark.read.parquet(dir).count() == before)
  }

  test("optimize on a MIXED root compacts its own files AND every partition leaf") {
    // top-level data files + k=v subdirs in one root: before ADVICE r9
    // only the top-level files were compacted and all partition data
    // was silently ignored — both must now be rewritten
    val dir = Files.createTempDirectory("opt_mixedroot").toString + "/t"
    (1 to 1000).map(i => (i, i)).toDF("id", "payload")
      .repartition(4).write.mode("overwrite").parquet(dir)
    (2001 to 3000).map(i => (i, i)).toDF("id", "payload")
      .repartition(4).write.mode("overwrite").parquet(dir + "/pt=1")
    def dataFiles(d: String) = new java.io.File(d).listFiles()
      .filter(f => f.isFile && !f.getName.startsWith(".") &&
        !f.getName.startsWith("_"))
    val (was, now) = Layout.optimize(spark, dir, Seq(col("id")),
      numFiles = Some(1))
    assert(was == 8 && now == 2, s"($was, $now)")
    assert(dataFiles(dir).length == 1 &&
      dataFiles(dir + "/pt=1").length == 1,
      "each unit must compact to one file")
    // every row survives, in its original location
    val topIds = spark.read.parquet(
        dataFiles(dir).map(_.toString).toSeq: _*)
      .select("id").collect().map(_.getInt(0)).sorted.toList
    val leafIds = spark.read.parquet(dir + "/pt=1")
      .select("id").collect().map(_.getInt(0)).sorted.toList
    assert(topIds == (1 to 1000).toList, "root rows lost")
    assert(leafIds == (2001 to 3000).toList, "partition rows lost")
  }

  test("zoneMapVerify: ok / unindexed / missing / stale all detected") {
    val dir = Files.createTempDirectory("zmv").toString + "/t"
    (1 to 1000).map(i => (i, i)).toDF("id", "payload")
      .repartition(4).write.mode("overwrite").parquet(dir)
    val man = Files.createTempDirectory("zmv_m").toString + "/m"
    Layout.zoneMapWrite(spark, dir, Seq("id"), man)
    def statuses() = Layout.zoneMapVerify(spark, dir, Seq("id"), man)
      .groupBy("status").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(statuses() == Map("ok" -> 4L))
    // new files land without a manifest append -> unindexed
    (2001 to 2100).map(i => (i, i)).toDF("id", "payload")
      .coalesce(1).write.mode("append").parquet(dir)
    assert(statuses() == Map("ok" -> 4L, "unindexed" -> 1L))
    Layout.zoneMapAppend(spark, dir, Seq("id"), man)
    assert(statuses() == Map("ok" -> 5L))
    // doctor one manifest row -> stale; drop a data file -> missing
    val doctored = spark.read.parquet(man).collect()
    val first = doctored.head.getString(0)
    spark.read.parquet(man)
      .withColumn("id_min", when(col("file") === first, lit(-999))
        .otherwise(col("id_min")))
      .coalesce(1).write.mode("overwrite").parquet(man + "2")
    val dropped = new java.io.File(dir).listFiles()
      .filter(f => f.getName.endsWith(".parquet") &&
        !first.endsWith(f.getName))
      .head
    assert(dropped.delete())
    val s2 = Layout.zoneMapVerify(spark, dir, Seq("id"), man + "2")
      .groupBy("status").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(s2 == Map("ok" -> 3L, "stale" -> 1L, "missing" -> 1L), s2.toString)
  }

  test("null-aware zone map: all-NULL file skipped by rangeKeep, found by nullKeep") {
    // the all-NULL file is written explicitly (repartitionByRange
    // SAMPLES its boundaries, so "nulls sort first" does not guarantee
    // a nulls-only file across runs)
    val dir = Files.createTempDirectory("zm_null").toString + "/t"
    Layout.clusteredWrite(
      (501 to 4000).map(i => (Some(i), i)).toDF("k", "payload"),
      Seq(col("k")), dir, numFiles = 7)
    (1 to 500).map(i => (Option.empty[Int], i)).toDF("k", "payload")
      .coalesce(1).write.mode("append").parquet(dir)
    val man = Files.createTempDirectory("zm_null_m").toString + "/m"
    Layout.zoneMapWrite(spark, dir, Seq("k"), man)
    val manifest = spark.read.parquet(man)
    assert(manifest.agg(sum($"k_nulls")).head.getLong(0) == 500)
    // naive NULL-keep policy keeps the all-NULL file; rangeKeep skips it
    val naive = Layout.prunedFiles(manifest,
      col("k_min") <= 600 && col("k_max") >= 501)
    val strict = Layout.prunedFiles(manifest,
      Layout.rangeKeep("k", lit(501), lit(600)))
    assert(strict.size < naive.size,
      s"all-NULL file not skipped: strict=${strict.size} naive=${naive.size}")
    val got = Layout.skipScan(spark, dir, manifest,
      Layout.rangeKeep("k", lit(501), lit(600)),
      col("k").between(501, 600)).count()
    assert(got == 100)
    // the IS NULL probe goes straight to the files holding nulls
    val nullFiles = Layout.prunedFiles(manifest, Layout.nullKeep("k"))
    assert(nullFiles.size < 8)
    assert(Layout.skipScan(spark, dir, manifest, Layout.nullKeep("k"),
      col("k").isNull).count() == 500)
  }

  test("skipScanAuto: keep derived from the residual itself, every shape") {
    val dir = Files.createTempDirectory("zm_auto").toString + "/t"
    Layout.clusteredWrite(
      (101 to 4000).map(i => (Some(i), i % 7, i)).toDF("k", "m", "payload"),
      Seq(col("k")), dir, numFiles = 7)
    (1 to 100).map(i => (Option.empty[Int], i % 7, i))
      .toDF("k", "m", "payload")
      .coalesce(1).write.mode("append").parquet(dir)
    val man = Files.createTempDirectory("zm_auto_m").toString + "/m"
    Layout.zoneMapWrite(spark, dir, Seq("k"), man)
    val manifest = spark.read.parquet(man).cache()
    val full = spark.read.parquet(dir)
    def check(residual: org.apache.spark.sql.Column,
        expectPrune: Boolean = true): Unit = {
      val kept = Layout.prunedFiles(manifest,
        Layout.autoKeep(manifest, residual))
      if (expectPrune) assert(kept.size < 8, s"$residual kept all 8")
      val got = Layout.skipScanAuto(spark, dir, manifest, residual)
        .select("payload").collect().map(_.getInt(0)).sorted.toList
      val want = full.where(residual)
        .select("payload").collect().map(_.getInt(0)).sorted.toList
      assert(got == want && want.nonEmpty, s"$residual diverged")
    }
    check(col("k") === 333)
    check(lit(333) === col("k"))
    check(col("k") < 200)
    check(col("k") >= 3900)
    check(lit(300) > col("k")) // flipped: k < 300
    check(col("k").between(500, 600))
    check(col("k").isin(250, 3999))
    check(col("k").isNull)
    check(col("k") === 333 || col("k") === 3999)
    // unknown term (m has no stats) is conservative: correct, no prune
    check(col("m") === 3, expectPrune = false)
    // mixed: the k-term prunes even with an unknown conjunct beside it
    check(col("k") < 200 && col("m") === 3)
    // IS NOT NULL skips the all-NULL file
    val kept = Layout.prunedFiles(manifest,
      Layout.autoKeep(manifest, col("k").isNotNull))
    assert(kept.size == 7, s"all-NULL file not dropped: ${kept.size}")
    manifest.unpersist()
  }

  test("property: random predicate trees, skipScanAuto == full scan") {
    val rnd = new scala.util.Random(90210)
    // k is indexed (with NULLs so the null branches execute);
    // m is NOT in the manifest — its terms must be conservative
    val rows = (1 to 3000).map { i =>
      (if (i % 17 == 0) None else Some(rnd.nextInt(500)),
        rnd.nextInt(10), i)
    }
    val df = rows.toDF("k", "m", "payload")
    val dir = Files.createTempDirectory("zm_fuzz").toString + "/t"
    Layout.clusteredWrite(df, Seq(col("k")), dir, numFiles = 6)
    val man = Files.createTempDirectory("zm_fuzz_m").toString + "/m"
    Layout.zoneMapWrite(spark, dir, Seq("k"), man)
    val manifest = spark.read.parquet(man).cache()
    val full = spark.read.parquet(dir)
    def leaf(): org.apache.spark.sql.Column = rnd.nextInt(8) match {
      case 0 => col("k") === rnd.nextInt(600)
      case 1 => col("k") < rnd.nextInt(600)
      case 2 => col("k") >= rnd.nextInt(600)
      case 3 => lit(rnd.nextInt(600)) > col("k")
      case 4 => col("k").isin(rnd.nextInt(600), rnd.nextInt(600))
      case 5 => col("k").isNull
      case 6 => col("k").isNotNull
      case 7 => col("m") === rnd.nextInt(10) // unindexed: no pruning
    }
    def tree(depth: Int): org.apache.spark.sql.Column =
      if (depth == 0 || rnd.nextInt(3) == 0) leaf()
      else if (rnd.nextBoolean()) tree(depth - 1) && tree(depth - 1)
      else tree(depth - 1) || tree(depth - 1)
    (1 to 40).foreach { _ =>
      val p = tree(2)
      val got = Layout.skipScanAuto(spark, dir, manifest, p)
        .select("payload").collect().map(_.getInt(0)).sorted.toList
      val want = full.where(p)
        .select("payload").collect().map(_.getInt(0)).sorted.toList
      assert(got == want, s"predicate $p diverged")
    }
    manifest.unpersist()
  }

  test("property: random data + random range probes, pruned == full scan") {
    val rnd = new scala.util.Random(4242)
    val n = 5000
    val df = (1 to n).map(_ => (rnd.nextInt(1000), rnd.nextInt()))
      .toDF("k", "payload")
    val dir = Files.createTempDirectory("zm_prop").toString + "/t"
    Layout.clusteredWrite(df, Seq(col("k")), dir, numFiles = 8)
    val man = Files.createTempDirectory("zm_prop_m").toString + "/m"
    Layout.zoneMapWrite(spark, dir, Seq("k"), man)
    val manifest = spark.read.parquet(man).cache()
    (1 to 12).foreach { _ =>
      val a = rnd.nextInt(1200) - 100 // ranges may miss entirely
      val b = a + rnd.nextInt(300)
      val keep = col("k_min") <= b && col("k_max") >= a
      val res = col("k").between(a, b)
      val pruned = Layout.skipScan(spark, dir, manifest, keep, res)
        .select("k", "payload").collect()
        .map(r => (r.getInt(0), r.getInt(1))).sorted.toList
      val full = spark.read.parquet(dir).where(res)
        .select("k", "payload").collect()
        .map(r => (r.getInt(0), r.getInt(1))).sorted.toList
      assert(pruned == full, s"range [$a,$b] diverged")
    }
    manifest.unpersist()
  }

  test("bloom_contains: NULL bloom yields NULL; garbage bytes raise") {
    val df = Seq((Option.empty[Array[Byte]], 1L)).toDF("bloom", "h")
    val out = df.select(org.apache.spark.sql.graft.CatalystBridge.bloomContains(
      col("bloom"), col("h")).as("c")).head
    assert(out.isNullAt(0))
    intercept[Exception] {
      Seq((Array[Byte](1, 2, 3), 1L)).toDF("bloom", "h")
        .select(org.apache.spark.sql.graft.CatalystBridge.bloomContains(
          col("bloom"), col("h"))).collect()
    }
  }

  test("shardAssignment: queryable order equals the written global order") {
    val n = 5000
    val nShards = 4
    val df = (1 to n).map(i => (i.toLong, s"p$i")).toDF("id", "pay")
    val dir = Files.createTempDirectory("shard_asgn").toString + "/out"
    Layout.shuffledShardWrite(df, col("id"), dir, nShards)
    // written global order: shard files in partition order, each file
    // already in (u, id) order with disjoint ascending u-ranges
    val written = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
      .flatMap(f => spark.read.parquet(f.getPath)
        .select("id").collect().map(_.getLong(0))).toList
    // queryable order: equal-width u-bucket shards, rank within shard —
    // both forms are the SAME global (u, id) sort, only the shard
    // boundary positions differ (equal-mass sampled vs equal-width)
    val assigned = Layout.shardAssignment(df, col("id"), nShards)
    val logical = assigned.orderBy("shard", "shard_rank")
      .select("id").collect().map(_.getLong(0)).toList
    assert(logical == written,
      "shardAssignment order diverged from the written shard order")
    // hash-uniform u ⇒ equal-width buckets are balanced too
    val sizes = assigned.groupBy("shard").count()
      .collect().map(_.getLong(1))
    assert(sizes.length == nShards && sizes.min > n / nShards / 2,
      s"unbalanced shards: ${sizes.toList}")
    // seed with the delimiter is rejected (namespace aliasing guard)
    intercept[IllegalArgumentException] {
      Layout.shardAssignment(df, col("id"), 2, seed = "a|b")
    }
  }
}
