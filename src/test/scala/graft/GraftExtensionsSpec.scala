package graft

import org.apache.spark.sql.functions._

/** SQL-surface registration of graft's native functions. */
class GraftExtensionsSpec extends SparkSpec {

  import spark.implicits._

  test("imperative registration exposes dot_product to SQL and expr()") {
    GraftExtensions.register(spark)
    Seq((Array(1.0f, 2.0f), Array(3.0f, 4.0f))).toDF("a", "b")
      .createOrReplaceTempView("vecs_ext")
    val viaSql = spark.sql("SELECT dot_product(a, b) AS d FROM vecs_ext")
      .collect().head.getDouble(0)
    assert(viaSql == 11.0)
    val viaExpr = spark.table("vecs_ext")
      .select(expr("dot_product(a, b)")).collect().head.getDouble(0)
    assert(viaExpr == 11.0)
  }

  test("md5_fraction and winnow_min are SQL-callable and match the APIs") {
    GraftExtensions.register(spark)
    Seq("the quick brown fox jumps over it").toDF("t")
      .createOrReplaceTempView("texts_ext")
    val row = spark.sql(
      "SELECT md5_fraction(t) AS f, winnow_min(t, 16, 1) AS w FROM texts_ext")
      .collect().head
    val api = spark.table("texts_ext").select(
      graft.operators.Sketch.md5Fraction(col("t")).as("f"),
      graft.operators.TextAnalysis.winnowFingerprint(col("t")).as("w"))
      .collect().head
    assert(row.getDouble(0) == api.getDouble(0))
    assert(row.getString(1) == api.getString(1))
    // non-literal k is rejected with a clear message
    val e = intercept[Exception](
      spark.sql("SELECT winnow_min(t, length(t), 1) FROM texts_ext").collect())
    assert(e.getMessage.contains("integer literal") ||
      e.getCause != null && e.getCause.getMessage.contains("integer literal"))
  }

  test("builder-time withExtensions wires function AND optimizer rule") {
    // getOrCreate() returns the existing default session (extensions
    // ignored) unless it's cleared first; the new session shares the
    // SparkContext, so never stop() it — restore the originals instead
    val orig = spark
    org.apache.spark.sql.SparkSession.clearActiveSession()
    org.apache.spark.sql.SparkSession.clearDefaultSession()
    try {
      val s2 = org.apache.spark.sql.SparkSession.builder()
        .master("local[2]")
        .config("spark.graft.rangeJoin.cellWidth", "100")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      import s2.implicits._
      val pts = Seq((5L, 1.0)).toDF("p", "x")
      val ivs = Seq((0L, 30L)).toDF("s", "e")
      val plan = pts.join(ivs, pts("p") >= ivs("s") && pts("p") <= ivs("e"))
        .queryExecution.executedPlan.toString
      assert(plan.contains("__pcell"), plan)
      assert(s2.sql("SELECT dot_product(array(1.0D), array(2.0D))")
        .collect().head.getDouble(0) == 2.0)
    } finally {
      org.apache.spark.sql.SparkSession.setActiveSession(orig)
      org.apache.spark.sql.SparkSession.setDefaultSession(orig)
    }
  }

  test("wrong arity is rejected at analysis") {
    GraftExtensions.register(spark)
    Seq((Array(1.0f), 1)).toDF("a", "x").createOrReplaceTempView("vecs_ext2")
    intercept[Exception] {
      spark.sql("SELECT dot_product(a) FROM vecs_ext2").collect()
    }
  }

  test("simhash64/hamming64 in plain SQL match the DataFrame forms") {
    import spark.implicits._
    GraftExtensions.register(spark)
    Seq((1L, "the quick brown fox jumps"),
      (2L, "the quick brown fox leaps"),
      (3L, "completely different text entirely here"))
      .toDF("doc_id", "text").createOrReplaceTempView("docs_sql")
    val sql = spark.sql(
      """SELECT doc_id, simhash64(text) AS sh FROM docs_sql""")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val df = operators.Dedup.simHash(
      spark.table("docs_sql"), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sql == df)
    val d = spark.sql(
      """SELECT hamming64(simhash64(a.text), simhash64(b.text)) AS d
        |FROM docs_sql a JOIN docs_sql b ON a.doc_id = 1 AND b.doc_id = 2
        |""".stripMargin).head().getInt(0) // bit_count yields INT
    assert(d == java.lang.Long.bitCount(sql(1L) ^ sql(2L)))
    assert(d <= 16, s"near-identical docs should be close: $d")
  }

  test("bloom_contains in plain SQL probes a built manifest") {
    GraftExtensions.register(spark)
    val dir = java.nio.file.Files.createTempDirectory("bc_sql")
      .toString + "/t"
    (1L to 2000L).map(i => (i, i)).toDF("id", "payload")
      .repartition(4).write.mode("overwrite").parquet(dir)
    graft.operators.Layout.bloomManifestWrite(spark, dir, "id", 1024,
      dir + "_man")
    spark.read.parquet(dir + "_man").createOrReplaceTempView("bc_man")
    // the SQL file-skipping composition: filter the manifest, read
    // the survivors
    val kept = spark.sql(
      "SELECT file FROM bc_man WHERE bloom_contains(bloom, xxhash64(42L))")
      .collect().map(_.getString(0))
    assert(kept.nonEmpty && kept.length < 4)
    val got = spark.read.parquet(kept: _*)
      .where($"id" === 42L).count()
    assert(got == 1)
    // type errors are analysis-time
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT bloom_contains('notbinary', 1L)").collect()
    }
  }

  test("hdr_key in plain SQL matches the Column API; literal subBits enforced") {
    GraftExtensions.register(spark)
    import spark.implicits._
    val xs = (Seq(0L, 1L, 31L, 32L, 33L, 1023L, 4096L) ++
      (1 to 50).map(i => (i * 997L) % 100000L)).distinct
    xs.toDF("x").createOrReplaceTempView("hk_vals")
    val viaSql = spark.sql("SELECT x, hdr_key(x, 5) AS k FROM hk_vals")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaApi = xs.toDF("x")
      .select($"x", graft.operators.Sketch.hdrKey($"x", 5).as("k"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaSql == viaApi)
    val e = intercept[Exception] {
      spark.sql("SELECT hdr_key(x, x) FROM hk_vals").collect()
    }
    assert(e.getMessage.contains("literal"), e.getMessage)
  }

  test("wordpiece in plain SQL: array-literal vocab, non-foldable rejected") {
    GraftExtensions.register(spark)
    val got = spark.sql(
      "SELECT wordpiece('catthe zz', array('cat', 'the')) AS s")
      .head().getString(0)
    assert(got == "cat|the z|z", got)
    // the trie must come from plan-time folding — a per-row vocab has
    // no single trie and is rejected at analysis
    val e = intercept[Exception] {
      spark.sql("SELECT wordpiece(s, array(s)) AS x FROM (SELECT 'a' AS s)")
        .collect()
    }
    assert(e.getMessage.contains("foldable"), e.getMessage)
  }

  test("unigram_segment in plain SQL: scored vocab, optimality, guards") {
    GraftExtensions.register(spark)
    // 'ab'+'cd' (cost 6) beats greedy 'abc'+'d' (cost 19)
    val got = spark.sql(
      "SELECT unigram_segment('abcd', array('abc', 'ab', 'cd', 'd')," +
        " array(10L, 3L, 3L, 9L)) AS s").head().getString(0)
    assert(got == "ab|cd", got)
    // the natural int spelling widens instead of rejecting
    val ints = spark.sql(
      "SELECT unigram_segment('abcd', array('ab', 'cd'), array(3, 3))" +
        " AS s").head().getString(0)
    assert(ints == "ab|cd", ints)
    // custom OOV cost: any foldable integer, not just a bare literal
    val oov = spark.sql(
      "SELECT unigram_segment('ax', array('a'), array(1L)," +
        " CAST(5000000 AS BIGINT)) AS s").head().getString(0)
    assert(oov == "a|x", oov)
    // length-mismatched tables rejected at analysis
    val e = intercept[Exception] {
      spark.sql("SELECT unigram_segment('a', array('a', 'b')," +
        " array(1L)) AS s").collect()
    }
    assert(e.getMessage.contains("pieces"), e.getMessage)
    // non-foldable vocab rejected (plan-time table, like wordpiece)
    val e2 = intercept[Exception] {
      spark.sql("SELECT unigram_segment(s, array(s), array(1L)) AS x" +
        " FROM (SELECT 'a' AS s)").collect()
    }
    assert(e2.getMessage.contains("foldable"), e2.getMessage)
  }

  test("luhn_valid in plain SQL: checksum, non-digit, empty, NULL, arity") {
    GraftExtensions.register(spark)
    val got = spark.sql(
      """SELECT luhn_valid('4111111111111111') AS ok,
        |  luhn_valid('4111111111111112') AS bad,
        |  luhn_valid('4111-1111') AS sep,
        |  luhn_valid('') AS empty,
        |  luhn_valid(CAST(NULL AS STRING)) AS nul""".stripMargin).head()
    assert(got.getBoolean(0), "valid test PAN must pass")
    assert(!got.getBoolean(1), "check-digit+1 must fail")
    assert(!got.getBoolean(2), "separators are not digits -> false")
    assert(!got.getBoolean(3), "empty -> false, not vacuously true")
    assert(got.isNullAt(4), "NULL in -> NULL out")
    // matches the Column API (which rides the same expression)
    import spark.implicits._
    val viaApi = Seq("4111111111111111", "4111111111111112").toDF("s")
      .select(graft.operators.TextAnalysis.luhnValid(col("s")))
      .collect().map(_.getBoolean(0)).toSeq
    assert(viaApi == Seq(true, false))
    val e = intercept[Exception] {
      spark.sql("SELECT luhn_valid('1', '2')").collect()
    }
    assert(e.getMessage.contains("luhn_valid"), e.getMessage)
  }

  test("iban_valid in plain SQL: mod-97, corruption, lowercase, NULL") {
    GraftExtensions.register(spark)
    val got = spark.sql(
      """SELECT iban_valid('GB82WEST12345698765432') AS ok,
        |  iban_valid('FR1420041010050500013M02606') AS fr,
        |  iban_valid('GB82WEST12345698765433') AS bad,
        |  iban_valid('gb82west12345698765432') AS lower,
        |  iban_valid('GB82') AS short,
        |  iban_valid(CAST(NULL AS STRING)) AS nul""".stripMargin).head()
    assert(got.getBoolean(0) && got.getBoolean(1))
    assert(!got.getBoolean(2), "check-digit corruption must fail")
    assert(!got.getBoolean(3), "lowercase is out of the strict alphabet")
    assert(!got.getBoolean(4), "below the 5-char rearrangement floor")
    assert(got.isNullAt(5), "NULL in -> NULL out")
  }

  test("unicode_normalize in plain SQL: forms work, non-literal form rejected") {
    GraftExtensions.register(spark)
    // decomposed e + U+0301 composes under NFC
    val nfc = spark.sql("SELECT unicode_normalize('café', 'NFC') AS s")
      .head().getString(0)
    assert(nfc == "café", nfc.map(_.toInt.toHexString).mkString(","))
    // NFKC folds compatibility forms: full-width A, fi ligature
    val nfkc = spark.sql(
      "SELECT unicode_normalize('Ａ ﬁn', 'NFKC') AS s")
      .head().getString(0)
    assert(nfkc == "A fin", nfkc.map(_.toInt.toHexString).mkString(","))
    // NFC leaves compatibility forms alone
    val nfcK = spark.sql(
      "SELECT unicode_normalize('Ａ', 'NFC') AS s").head().getString(0)
    assert(nfcK == "Ａ")
    // NULL propagates; idempotence
    assert(spark.sql("SELECT unicode_normalize(CAST(NULL AS STRING), 'NFC')")
      .head().isNullAt(0))
    val twice = spark.sql(
      "SELECT unicode_normalize(unicode_normalize('café', 'NFC'), 'NFC') AS s")
      .head().getString(0)
    assert(twice == "café")
    // the form is a plan-time constant — a column is rejected
    val e2 = intercept[Exception] {
      spark.sql(
        "SELECT unicode_normalize(s, s) FROM (SELECT 'NFC' AS s)").collect()
    }
    assert(e2.getMessage.contains("literal"), e2.getMessage)
  }
}
