package graft.functions

import scala.util.Random

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.operators.Sketch

/** The Count-Min aggregate's contract: the grid is a PURE FUNCTION of
  * the value multiset (bit-identical across partitionings and merge
  * orders — stronger than Misra–Gries, whose counters are only
  * bound-deterministic), estimates never undercount, and grids of
  * disjoint batches add. A plain-Scala replay of the same md5-cell
  * sums pins every counter. */
class CountMinSpec extends SparkSpec {
  import spark.implicits._

  private val depth = 4
  private val width = 32

  private def grid(df: org.apache.spark.sql.DataFrame): Seq[Long] =
    df.agg(Sketch.countMin(col("v"), depth, width).as("sk"))
      .head().getSeq[Long](0)

  /** The identical grid in plain Scala: per-cell sums over the same
    * md5 'cm|j|' fractions. */
  private def refGrid(values: Seq[String]): Seq[Long] = {
    val g = new Array[Long](depth * width)
    values.foreach { v =>
      for (j <- 0 until depth) {
        val frac = graft.functions.expressions.Md5Fraction.compute(
          org.apache.spark.unsafe.types.UTF8String.fromString(s"cm|$j|$v"))
        g(j * width + (frac * width).toInt) += 1L
      }
    }
    g.toSeq
  }

  test("grid equals the scalar replay, bit-identical across partitionings") {
    val rnd = new Random(7)
    val values = Seq.tabulate(5000)(_ => s"k${rnd.nextInt(300)}")
    val want = refGrid(values)
    assert(grid(values.toDF("v")) === want)
    assert(grid(values.toDF("v").repartition(17)) === want)
    assert(grid(values.reverse.toDF("v").repartition(3)) === want)
  }

  test("estimates never undercount; exact when no collision") {
    val rnd = new Random(11)
    val values = Seq.tabulate(8000)(_ => s"k${rnd.nextInt(500)}")
    val truth = values.groupBy(identity).map { case (k, v) =>
      (k, v.size.toLong)
    }.toSeq.toDF("v", "true_cnt")
    val sk = values.toDF("v")
      .agg(Sketch.countMin(col("v"), depth, width).as("sk"))
    val rows = truth.crossJoin(broadcast(sk))
      .select(col("v"), col("true_cnt"),
        Sketch.countMinEstimate(col("sk"), col("v"), depth, width)
          .as("est"))
      .collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      assert(r.getLong(2) >= r.getLong(1),
        s"undercount for ${r.getString(0)}: ${r.getLong(2)} < ${r.getLong(1)}")
    }
    // with 500 keys over 4 rows of 32 cells collisions are certain,
    // but at least the heaviest key's estimate stays within the
    // eps*N deterministic worst case (every other key in its cells)
    val n = values.size
    rows.foreach(r => assert(r.getLong(2) <= n.toLong))
  }

  test("nulls are skipped; disjoint-batch grids add (linearity)") {
    val a = Seq("x", "x", "y").toDF("v")
    val b = Seq("y", "z").toDF("v")
    val withNulls = Seq(Some("x"), None, Some("x"), Some("y"), None)
      .toDF("v")
    assert(grid(withNulls) === refGrid(Seq("x", "x", "y")))
    val sum = grid(a).zip(grid(b)).map { case (p, q) => p + q }
    assert(grid(a.unionAll(b)) === sum)
  }

  test("count_min is callable from plain SQL via GraftExtensions") {
    graft.GraftExtensions.register(spark)
    Seq("a", "a", "b").toDF("v").createOrReplaceTempView("cms_in")
    val got = spark.sql(
      s"SELECT count_min(v, $depth, $width) FROM cms_in")
      .head().getSeq[Long](0)
    assert(got === refGrid(Seq("a", "a", "b")))
    assert(got.sum == 3L * depth)
  }
}
