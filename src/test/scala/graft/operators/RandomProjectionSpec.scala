package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Behavioral specs for the deterministic Johnson–Lindenstrauss sign
  * projection: determinism (the whole point of hashing the matrix),
  * shape, and the JL distance-preservation guarantee measured over
  * real embeddings — the mean squared-distance ratio across pairs must
  * concentrate around 1, which is what makes the reduced space usable
  * for ANN candidate generation. */
class RandomProjectionSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def emb = spark.read.parquet(s"$dir/embeddings.parquet")

  test("output shape: one reduced vector of outDim per input row") {
    val out = Similarity.randomProjection(emb, outDim = 16)
    assert(out.columns.toSeq == Seq("vec_id", "reduced"))
    val n = emb.count()
    assert(out.count() == n)
    val dims = out.select(size(col("reduced")).as("d"))
      .distinct().collect().map(_.getInt(0)).toSeq
    assert(dims == Seq(16))
  }

  test("deterministic: two independent invocations are bit-identical") {
    val a = Similarity.randomProjection(emb, outDim = 8).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val b = Similarity.randomProjection(emb, outDim = 8).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(a == b)
  }

  test("seed changes the matrix") {
    val a = Similarity.randomProjection(emb, outDim = 8).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val c = Similarity.randomProjection(emb, outDim = 8, seed = "other")
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(a != c)
  }

  test("JL distance preservation: pair distance ratios concentrate at 1") {
    // E‖y_a − y_b‖² = ‖x_a − x_b‖² for the sign construction; at
    // outDim = 16 a single pair's ratio has std ≈ √(2/16) ≈ 0.35, so
    // assert the MEAN over many pairs (tight) and loose per-pair rails
    val proj = Similarity.randomProjection(emb, outDim = 16)
    val x = emb.select(col("vec_id"),
      col("embedding").cast("array<double>").as("v"))
    val joined = x.as("a").join(x.as("b"),
        col("a.vec_id") + lit(1) === col("b.vec_id"))
      .join(proj.as("pa"), col("a.vec_id") === col("pa.vec_id"))
      .join(proj.as("pb"), col("b.vec_id") === col("pb.vec_id"))
    def d2(u: org.apache.spark.sql.Column, v: org.apache.spark.sql.Column) = {
      val diff = zip_with(u, v, (p, q) => p - q)
      graft.functions.VectorFunctions.dot(diff, diff)
    }
    val ratios = joined.select(
        (d2(col("pa.reduced"), col("pb.reduced")) /
          d2(col("a.v"), col("b.v"))).as("r"))
      .where(col("r").isNotNull)
      .agg(avg(col("r")).as("mean"), min(col("r")).as("lo"),
        max(col("r")).as("hi"))
      .collect()(0)
    assert(math.abs(ratios.getDouble(0) - 1.0) < 0.15,
      s"mean ratio ${ratios.getDouble(0)} not near 1")
    assert(ratios.getDouble(1) > 0.05 && ratios.getDouble(2) < 4.0,
      s"pair ratio rails violated: [${ratios.getDouble(1)}, ${ratios.getDouble(2)}]")
  }

  test("plan shape: no shuffle in the projection scan") {
    val plan = Similarity.randomProjection(emb, outDim = 16)
      .queryExecution.executedPlan.toString
    // one broadcast of the folded sign matrix; the embedding stream
    // itself must not hit an Exchange (per-row fold, no shuffle)
    assert(!plan.contains("CartesianProduct"))
    val bnlj = "BroadcastNestedLoopJoin".r.findAllIn(plan).length
    assert(bnlj == 1, s"expected exactly the sign-matrix fold, got $bnlj")
  }
}
