package graft.operators

import graft.SparkSpec
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Randomized equivalence: `asOfSlim` must produce exactly the rows of
  * `asOf` on arbitrary keyed event sets — including time ties, keys
  * with no right rows, keys with no left rows, and duplicate
  * timestamps on both sides. Deterministic seeded sampling (no
  * scalatest-plus bridge in the offline cache). */
class AsOfPropertySpec extends SparkSpec {

  import spark.implicits._

  private def forAll[A](gen: Gen[A], n: Int)(f: A => Unit): Unit =
    (1 to n).foreach { i =>
      val a = gen.pureApply(Gen.Parameters.default, Seed(i.toLong))
      withClue(s"[seed=$i] ")(f(a))
    }

  // small domains force collisions: few keys, coarse times
  private val genEvents: Gen[(List[(Long, Long)], List[(Long, Long)])] =
    for {
      nL <- Gen.chooseNum(0, 12)
      nR <- Gen.chooseNum(0, 12)
      l <- Gen.listOfN(nL,
        Gen.zip(Gen.chooseNum(1L, 3L), Gen.chooseNum(0L, 5L)))
      r <- Gen.listOfN(nR,
        Gen.zip(Gen.chooseNum(1L, 3L), Gen.chooseNum(0L, 5L)))
    } yield (l, r)

  test("asOfSlim ≡ asOf on random keyed event sets") {
    forAll(genEvents, n = 25) { case (l, r) =>
      val left = l.zipWithIndex
        .map { case ((k, t), i) => (k, t, i.toLong, s"pay$i") }
        .toDF("k", "t", "eid", "wide")
      val right = r.zipWithIndex
        .map { case ((k, t), i) => (k, t, 1000L + i, s"v$i") }
        .toDF("k", "t", "eid", "v")
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.select("eid", "k", "t", "wide", "asof_v")
          .collect().map(_.toSeq).toSet
      val base = rows(AsOfJoin.asOf(left, right, "k", "t", "t",
        Seq(("v", "asof_v")), "eid"))
      val slim = rows(AsOfJoin.asOfSlim(left, right, "k", "t", "t",
        Seq(("v", "asof_v")), "eid", uid = "eid"))
      assert(slim == base)
    }
  }
}
