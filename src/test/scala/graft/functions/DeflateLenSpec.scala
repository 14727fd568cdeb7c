package graft.functions

import graft.SparkSpec
import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.CatalystBridge

/** DeflateLen / compressionStats — the compression-ratio junk gate.
  * No SQL oracle (DuckDB has no deflate); these specs pin the
  * behavior instead: determinism, the two-tailed separation the gate
  * exists for, type/NULL handling, and the SQL surface. */
class DeflateLenSpec extends SparkSpec {

  import spark.implicits._

  private val repetitive = "spam ham " * 200 // boilerplate loop
  private val prose = "the quick brown fox jumps over a lazy dog and " +
    "then wanders off towards a quiet river bank where nothing much " +
    "happens for the rest of a long warm afternoon in early summer " +
    "until a kingfisher darts across the shallows scattering minnows " +
    "beneath the willow roots while distant thunder promises rain " +
    "that never quite arrives before dusk settles on the water meadow"
  // deterministic incompressible payload: base64 of md5-chained bytes
  // (random at 6 bits/char — deflate can reclaim little beyond the
  // base64 framing, so the ratio stays near its 0.75 entropy floor)
  private val randomish = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val bb = java.nio.ByteBuffer.allocate(1600)
    var seed = "s0".getBytes("UTF-8")
    while (bb.remaining() >= 16) { seed = md.digest(seed); bb.put(seed) }
    java.util.Base64.getEncoder.encodeToString(bb.array())
  }

  test("deterministic across evaluations and plans") {
    val df = Seq(repetitive, prose, randomish, "", "naïve café")
      .toDF("s").select(col("s"),
        CatalystBridge.deflateLen(col("s")).as("n"))
    val a = df.collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    val b = df.repartition(7).collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(a == b, s"$a vs $b")
    assert(a.values.forall(_ >= 0))
  }

  test("two-tailed separation: boilerplate << prose << random payloads") {
    val got = Seq((1L, repetitive), (2L, prose), (3L, randomish))
      .toDF("doc_id", "text")
    val ratios = TextAnalysis.compressionStats(got)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(ratios(1L) < 0.1, s"boilerplate must crush: $ratios")
    assert(ratios(2L) > ratios(1L) && ratios(2L) < ratios(3L), ratios.toString)
    assert(ratios(3L) > 0.7, s"base64 chain must resist: $ratios")
  }

  test("binary input, NULL passthrough, empty string, zero-byte ratio") {
    val bin = Seq((1L, Array.fill[Byte](4096)(7)),
      (2L, null.asInstanceOf[Array[Byte]])).toDF("id", "payload")
    val rows = bin.select(col("id"),
      CatalystBridge.deflateLen(col("payload")).as("n"))
      .orderBy("id").collect()
    assert(rows(0).getInt(1) > 0 && rows(0).getInt(1) < 64,
      s"constant bytes must crush: ${rows(0)}")
    assert(rows(1).isNullAt(1))
    val empty = TextAnalysis.compressionStats(
      Seq((1L, "")).toDF("doc_id", "text")).head()
    assert(empty.getLong(1) == 0L)
    assert(empty.isNullAt(3)) // ratio undefined at zero raw bytes
  }

  test("levels trade size for work; both land in [1, 9]") {
    val df = Seq(repetitive).toDF("s")
    val n1 = df.select(CatalystBridge.deflateLen(col("s"), 1)).head().getInt(0)
    val n9 = df.select(CatalystBridge.deflateLen(col("s"), 9)).head().getInt(0)
    assert(n9 <= n1, s"level 9 ($n9) must not exceed level 1 ($n1)")
    intercept[IllegalArgumentException] {
      df.select(CatalystBridge.deflateLen(col("s"), 0)).collect()
    }
  }

  test("deflate_len is callable from plain SQL, default and explicit level") {
    CatalystBridge.registerFunctions(spark)
    Seq((1L, repetitive)).toDF("doc_id", "text")
      .createOrReplaceTempView("dfl_docs")
    val r = spark.sql(
      """SELECT deflate_len(text) AS d6, deflate_len(text, 9) AS d9,
        |  octet_length(text) AS raw FROM dfl_docs""".stripMargin).head()
    assert(r.getInt(0) > 0 && r.getInt(1) > 0)
    assert(r.getInt(1) <= r.getInt(0) && r.getInt(0) < r.getInt(2) / 10)
  }

  test("non-binary, non-string input is rejected at analysis") {
    intercept[org.apache.spark.sql.AnalysisException] {
      Seq(1).toDF("i")
        .select(CatalystBridge.deflateLen(col("i"))).collect()
    }
  }
}
