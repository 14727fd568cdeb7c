package graft.functions

import graft.functions.expressions.WordpieceTrie
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Randomized equivalence: the codepoint-trie greedy scanner must
  * match a naive quadratic max-munch reference on arbitrary
  * vocab/text pairs — including overlapping pieces, pieces that are
  * prefixes of each other, space runs, and multibyte codepoints.
  * Deterministic seeded sampling (no scalatest-plus bridge in the
  * offline cache). No SparkSession needed: the scanner is plain JVM
  * code under the expression. */
class WordpiecePropertySpec extends AnyFunSuite {

  private def forAll[A](gen: Gen[A], n: Int)(f: A => Unit): Unit =
    (1 to n).foreach { i =>
      val a = gen.pureApply(Gen.Parameters.default, Seed(i.toLong))
      withClue(s"[seed=$i] ")(f(a))
    }
  private def withClue(s: String)(f: => Unit): Unit =
    try f catch {
      case e: Throwable => throw new AssertionError(s + e.getMessage, e)
    }

  // tiny alphabet (incl. a multibyte char) forces overlapping pieces
  private val alpha: Gen[Char] = Gen.oneOf('a', 'b', 'c', '猫')

  private val genCase: Gen[(List[String], String)] = for {
    nv <- Gen.chooseNum(0, 8)
    vocab <- Gen.listOfN(nv,
      Gen.chooseNum(1, 4).flatMap(l => Gen.listOfN(l, alpha).map(_.mkString)))
    nw <- Gen.chooseNum(0, 6)
    words <- Gen.listOfN(nw,
      Gen.chooseNum(0, 7).flatMap(l => Gen.listOfN(l, alpha).map(_.mkString)))
  } yield (vocab.distinct, words.mkString(" "))

  /** Naive max-munch: at each codepoint position try every vocab piece
    * by string prefix, keep the longest; fallback one codepoint. */
  private def reference(vocab: Seq[String], text: String): String = {
    val words = text.split(" ", -1)
    words.map { w =>
      val parts = Seq.newBuilder[String]
      var i = 0
      while (i < w.length) {
        val rest = w.substring(i)
        val best = vocab.filter(rest.startsWith).sortBy(-_.length).headOption
        val piece = best.getOrElse(
          rest.substring(0, Character.charCount(rest.codePointAt(0))))
        parts += piece
        i += piece.length
      }
      parts.result().mkString("|")
    }.mkString(" ")
  }

  test("trie greedy scan ≡ naive max-munch on random vocab/text") {
    forAll(genCase, n = 200) { case (vocab, text) =>
      val trie = new WordpieceTrie(vocab)
      val got = trie.segment(UTF8String.fromString(text)).toString
      val want = reference(vocab, text)
      assert(got == want, s"vocab=$vocab text='$text': '$got' != '$want'")
    }
  }
}
