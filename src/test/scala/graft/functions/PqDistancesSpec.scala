package graft.functions

import graft.SparkSpec
import graft.functions.VectorFunctions
import org.apache.spark.sql.graft.CatalystBridge
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The native PQ/SQ serving expressions must be BIT-identical to the
  * interpreted `aggregate`-HOF folds they replaced (the folds are
  * reconstructed here verbatim as the reference): same IEEE operation
  * order, same `(long) floor` micro-quantization, same argmin
  * tie-breaks and NULL/sentinel paths. Random vectors come from
  * deterministic md5-fraction columns, so the fixture replays. */
class PqDistancesSpec extends SparkSpec {

  import graft.operators.Sketch.md5Fraction

  private def vec(seed: String, n: Int, idc: Column): Column =
    array((0 until n).map(i =>
      md5Fraction(concat(lit(seed), idc.cast("string"), lit("|"),
        lit(i.toString))) * 2.0 - 1.0): _*)

  private lazy val base: DataFrame = {
    val df = spark.range(60).toDF("id")
    df.select(col("id"),
      vec("pq|", 8, col("id")).as("v"),
      // codes in [0, 4) per 4 subspaces; dt 4×4 longs
      array((0 until 4).map(s =>
        floor(md5Fraction(concat(lit(s + "c|"), col("id").cast("string")))
          * 4).cast("int")): _*).as("codes4"),
      array((0 until 4).map(s => array((0 until 4).map(c =>
        floor(md5Fraction(concat(lit(s + "t" + c), col("id").cast("string")))
          * 100000).cast("long")): _*)): _*).as("dt"))
  }

  test("AdcDistance ≡ the element_at fold") {
    val m = 4
    val hof = aggregate(sequence(lit(0), lit(m - 1)), lit(0L), (a, s) =>
      a + element_at(element_at(col("dt"), (s + 1).cast("int")),
        element_at(col("codes4"), (s + 1).cast("int")) + 1))
    val bad = base.select(
        CatalystBridge.adcDistance(col("dt"), col("codes4"), m).as("nat"),
        hof.as("ref"))
      .where(not(col("nat") <=> col("ref"))).count()
    assert(bad == 0)
    // NULL inputs → NULL (the fold's propagation)
    val r = base.limit(1).select(
      CatalystBridge.adcDistance(lit(null).cast("array<array<bigint>>"),
        col("codes4"), m).as("a"),
      CatalystBridge.adcDistance(col("dt"),
        lit(null).cast("array<int>"), m).as("b")).collect()(0)
    assert(r.isNullAt(0) && r.isNullAt(1))
  }

  test("SqDistance ≡ the midpoint-reconstruction fold") {
    val dim = 8
    val rows = base.select(col("id"), col("v"),
      // a plausible grid: lo/hi per dim, plus one FLAT dim (hi == lo)
      array((0 until dim).map(d => struct(lit(d).as("d"),
        (when(lit(d) === 3, lit(0.25)).otherwise(lit(-1.0 - d * 0.1)))
          .as("lo"),
        (when(lit(d) === 3, lit(0.25)).otherwise(lit(1.0 + d * 0.05)))
          .as("hi"))): _*).as("__g"),
      array((0 until dim).map(d =>
        floor(md5Fraction(concat(lit("sq" + d), col("id").cast("string")))
          * 256).cast("int")): _*).as("codes"),
      col("v").as("qv"))
    val hof = aggregate(sequence(lit(0), lit(dim - 1)), lit(0L), (a, d) => {
      val g = element_at(col("__g"), (d + 1).cast("int"))
      val lo = g.getField("lo")
      val hi = g.getField("hi")
      val c = element_at(col("codes"), (d + 1).cast("int"))
      val q = element_at(col("qv"), (d + 1).cast("int"))
      val recon = lo + (c.cast("double") + lit(0.5)) * (hi - lo) / lit(256)
      a + floor(lit(1000000.0) * (q - recon) * (q - recon)).cast("long")
    })
    val bad = rows.select(
        CatalystBridge.sqDistance(col("__g"), col("codes"), col("qv"), dim)
          .as("nat"), hof.as("ref"))
      .where(not(col("nat") <=> col("ref"))).count()
    assert(bad == 0)
  }

  test("PqNearestCodes / PqNearestCode ≡ the argmin fold (ties → lowest code)") {
    val (m, k, dsub) = (4, 4, 2)
    // dense (sub, code)-sorted codebook with DUPLICATE codewords to
    // force distance ties (strict < must keep the lowest code)
    val cb = array((0 until m * k).map { i =>
      val (s, c) = (i / k, i % k)
      struct(lit(s).as("sub"), lit(c).as("code"),
        vec("cw|" + s + "|" + (c / 2), dsub, lit(0)).as("cvec"))
    }: _*)
    val rows = base.select(col("id"), col("v"), cb.as("__cb"))
    def l2SqMicro(a: Column, b: Column): Column =
      floor(lit(1000000.0) *
        (VectorFunctions.dot(a, a) - lit(2.0) * VectorFunctions.dot(a, b) +
          VectorFunctions.dot(b, b))).cast("long")
    val init = struct(lit(-1).cast("int").as("c"),
      lit(Long.MaxValue).as("d"))
    val hofCodes = transform(sequence(lit(0), lit(m - 1)), s => {
      val sv = slice(col("v"), s * dsub + 1, lit(dsub))
      aggregate(sequence(lit(0), lit(k - 1)), init, (a, c) => {
        val cw = element_at(col("__cb"), (s * k + c + 1).cast("int"))
          .getField("cvec")
        val dm = l2SqMicro(sv, cw)
        when(dm < a.getField("d"),
          struct(c.cast("int").as("c"), dm.as("d"))).otherwise(a)
      }, a => a.getField("c"))
    })
    val bad = rows.select(
        CatalystBridge.pqNearestCodes(col("__cb"), col("v"), m, k, dsub)
          .as("nat"), hofCodes.as("ref"))
      .where(not(col("nat") <=> col("ref"))).count()
    assert(bad == 0)
    // per-(sub, sv) form agrees with the all-subspace form
    val single = rows
      .select(col("id"), col("__cb"), explode(sequence(lit(0), lit(m - 1)))
        .as("sub"), col("v"))
      .select(col("id"), col("sub"),
        CatalystBridge.pqNearestCode(col("__cb"),
          slice(col("v"), col("sub") * dsub + 1, lit(dsub)), col("sub"), k)
          .as("nat"),
        element_at(
          CatalystBridge.pqNearestCodes(col("__cb"), col("v"), m, k, dsub),
          col("sub") + 1).as("ref"))
      .where(not(col("nat") <=> col("ref"))).count()
    assert(single == 0)
    // sentinel paths: NULL vector / NULL sub → -1, never NULL
    val s = rows.limit(1).select(
      CatalystBridge.pqNearestCodes(col("__cb"),
        lit(null).cast("array<double>"), m, k, dsub).as("a"),
      CatalystBridge.pqNearestCode(col("__cb"),
        lit(null).cast("array<double>"), lit(0), k).as("b"),
      CatalystBridge.pqNearestCode(col("__cb"),
        slice(col("v"), 1, dsub), lit(null).cast("int"), k).as("c"))
      .collect()(0)
    assert(s.getSeq[Int](0) == Seq.fill(m)(-1))
    assert(s.getInt(1) == -1 && s.getInt(2) == -1)
    // width-mismatched vector (shorter than m·dsub) → trailing -1s,
    // like slice() producing short subvectors that match no codeword
    val short = rows.limit(1).select(
      CatalystBridge.pqNearestCodes(col("__cb"),
        slice(col("v"), 1, dsub * 2 + 1), m, k, dsub).as("a"))
      .collect()(0).getSeq[Int](0)
    assert(short.length == m && short(2) == -1 && short(3) == -1 &&
      short(0) >= 0 && short(1) >= 0)
  }
}
