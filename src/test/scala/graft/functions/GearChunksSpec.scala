package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.CatalystBridge

/** Content-defined chunking specs: determinism, the shift-resistance
  * property that justifies CDC over fixed windows, and length bounds. */
class GearChunksSpec extends SparkSpec {

  import spark.implicits._

  private def chunksOf(payload: Array[Byte], maskBits: Int = 8,
      minLen: Int = 32, maxLen: Int = 4096): Seq[String] =
    Seq(Tuple1(payload)).toDF("b")
      .select(CatalystBridge.gearChunks(col("b"), maskBits, minLen, maxLen))
      .collect().head.getSeq[String](0)

  private def blob(n: Int, seed: Int): Array[Byte] = {
    val r = new scala.util.Random(seed)
    Array.fill(n)(r.nextInt(256).toByte)
  }

  test("deterministic, chunk-count within min/max-length bounds") {
    val b = blob(50000, 42)
    val a1 = chunksOf(b)
    assert(a1 == chunksOf(b), "same payload must chunk identically")
    // every chunk in [32, 4096] bytes => count bounds follow
    assert(a1.length >= 50000 / 4096 && a1.length <= 50000 / 32 + 1)
    // expected chunk ~2^8: count should be in the right decade
    assert(a1.length > 50, s"suspiciously few chunks: ${a1.length}")
    assert(chunksOf(Array.emptyByteArray).isEmpty)
  }

  test("shift resistance: a prefix insertion preserves most chunk hashes") {
    val base = blob(50000, 7)
    val shifted = blob(17, 8) ++ base
    val a = chunksOf(base).toSet
    val b = chunksOf(shifted).toSet
    val shared = a.intersect(b).size.toDouble / a.size
    assert(shared > 0.8,
      f"CDC must resynchronize after an insertion; shared=$shared%.2f")
    // the contrast that motivates CDC: FIXED windows lose everything
    def fixed(p: Array[Byte]) = p.grouped(256).map(c =>
      java.util.Arrays.hashCode(c)).toSet
    val fshared = fixed(base).intersect(fixed(shifted)).size.toDouble /
      fixed(base).size
    assert(fshared < 0.05, s"fixed-window control unexpectedly high: $fshared")
  }

  test("chunkDedupStats: duplicated payloads share every chunk") {
    val b1 = blob(20000, 1)
    val b2 = blob(20000, 2)
    val df = Seq(Tuple1(b1), Tuple1(b1), Tuple1(b2)).toDF("payload")
    val r = graft.operators.Multimodal
      .chunkDedupStats(df, "payload", maskBits = 8, minLen = 32,
        maxLen = 4096)
      .collect().head
    assert(r.getAs[Long]("n_payloads") == 3L)
    val total = r.getAs[Long]("n_chunks")
    val distinct = r.getAs[Long]("n_distinct_chunks")
    // b1 appears twice: its chunks count double but stay one distinct
    // set, so the ratio lands near 2/3 of total
    assert(distinct < total)
    assert(math.abs(r.getAs[Double]("dedup_ratio") - 2.0 / 3) < 0.05)
  }
}
