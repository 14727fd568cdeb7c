package graft.functions

import graft.SparkSpec
import graft.operators.Sketch
import org.apache.spark.sql.functions._

/** The native Md5Fraction must be bit-identical to the declarative
  * per-hex-digit horner form (the shape every DuckDB oracle replays) —
  * it is the engine's only randomness source, so a single differing
  * bit would silently shift samples, bands, and embeddings. */
class Md5FractionSpec extends SparkSpec {

  import spark.implicits._

  test("native ≡ declarative horner on varied inputs, bit for bit") {
    val inputs = Seq("", "a", "hello world", "ws|42", "kpp|123",
      "b|token", "naïve café", "0", "-1", "2024-06-01",
      "x" * 1000) ++ (0 until 200).map(i => s"row|$i")
    val rows = inputs.toDF("s").select(
      Sketch.md5Fraction(col("s")).as("native"),
      Sketch.md5FractionHof(col("s")).as("hof")).collect()
    rows.foreach { r =>
      assert(java.lang.Double.doubleToRawLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToRawLongBits(r.getDouble(1)),
        s"${r.getDouble(0)} != ${r.getDouble(1)}")
    }
  }

  test("fraction is in [0,1) and deterministic across evaluations") {
    val df = (0 until 1000).toDF("i")
      .select(Sketch.md5Fraction(col("i")).as("f"))
    val (mn, mx) = df.agg(min("f"), max("f")).as[(Double, Double)].head()
    assert(mn >= 0.0 && mx < 1.0)
    assert(df.distinct().count() == 1000) // no collisions on this range
  }

  test("non-string input is rejected at analysis") {
    intercept[org.apache.spark.sql.AnalysisException] {
      Seq(1).toDF("i").select(org.apache.spark.sql.graft.CatalystBridge
        .md5Fraction(col("i"))).collect()
    }
  }
}
