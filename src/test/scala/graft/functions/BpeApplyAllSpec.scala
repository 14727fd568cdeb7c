package graft.functions

import graft.SparkSpec
import graft.functions.expressions.BpeMergeTable
import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** The native whole-merge-list BPE scanner must be bit-identical to
  * the sequential per-rule fold it replaces ([[TextAnalysis
  * .bpeApplyHof]]'s semantics): for each rule in training order, one
  * greedy non-overlapping left-to-right pass. The reference here is an
  * independent direct transliteration of that fold (using the REAL
  * `String.split("(?!^)(?=.)")` for the initial symbols), so the two
  * implementations share no code. Randomized tables are built the way
  * real BPE tables grow — later rules merge symbols earlier rules
  * created — which exercises the scanner's rank-skip loop, and a
  * dedicated case pins SEQUENTIAL semantics against the rank-priority
  * shortcut (they genuinely differ when a later rule's product equals
  * an earlier rule's left side). */
class BpeApplyAllSpec extends SparkSpec {

  private def forAll[A](gen: Gen[A], n: Int)(f: A => Unit): Unit =
    (1 to n).foreach { i =>
      val a = gen.pureApply(Gen.Parameters.default, Seed(i.toLong))
      try f(a) catch {
        case e: Throwable => throw new AssertionError(s"[seed=$i] " + e.getMessage, e)
      }
    }

  /** Direct transliteration of the bpeApplyOne fold chain. */
  private def reference(word: String, merges: Seq[(String, String)]): Seq[String] = {
    var syms: Vector[String] =
      if (word.isEmpty) Vector("")
      else word.split("(?!^)(?=.)", -1).toVector
    merges.foreach { case (l, r) =>
      val out = scala.collection.mutable.ArrayBuffer[String]()
      syms.foreach { x =>
        if (out.nonEmpty && out.last == l && x == r)
          out(out.length - 1) = l + r
        else out += x
      }
      syms = out.toVector
    }
    syms
  }

  private def native(word: String, merges: Seq[(String, String)]): Seq[String] =
    new BpeMergeTable(merges)
      .segment(UTF8String.fromString(word))
      .toObjectArray(org.apache.spark.sql.types.StringType)
      .map(_.toString).toSeq

  /** A BPE-shaped table: each rule's sides draw from the pool of
    * already-created symbols (chaining, like a trained table), with
    * occasional repeats of an earlier rule. */
  private val genCase: Gen[(Seq[(String, String)], String)] = for {
    nm <- Gen.chooseNum(0, 12)
    seeds <- Gen.listOfN(nm * 2 + 2, Gen.oneOf("a", "b", "c"))
    picks <- Gen.listOfN(nm, Gen.chooseNum(0, 1000))
    dup <- Gen.listOfN(nm, Gen.chooseNum(0, 9))
    wl <- Gen.chooseNum(0, 12)
    word <- Gen.listOfN(wl, Gen.oneOf('a', 'b', 'c')).map(_.mkString)
  } yield {
    val pool = scala.collection.mutable.ArrayBuffer[String]("a", "b", "c")
    val merges = scala.collection.mutable.ArrayBuffer[(String, String)]()
    (0 until nm).foreach { i =>
      if (dup(i) == 0 && merges.nonEmpty) merges += merges(picks(i) % merges.length)
      else {
        val l = pool(picks(i) % pool.length)
        val r = pool((picks(i) / 7 + i) % pool.length)
        merges += ((l, r))
        pool += l + r
      }
    }
    (merges.toSeq, word)
  }

  test("native scan ≡ sequential per-rule fold on random BPE tables") {
    forAll(genCase, n = 400) { case (merges, word) =>
      val got = native(word, merges)
      val want = reference(word, merges)
      assert(got == want, s"merges=$merges word='$word': $got != $want")
    }
  }

  test("sequential semantics pinned: later product = earlier left does NOT re-fire") {
    // rank-priority BPE would merge (a,b)→ab then (ab,c)→abc; the
    // sequential fold runs (ab,c)'s pass FIRST (no-op) and must never
    // revisit it
    val merges = Seq(("ab", "c"), ("a", "b"))
    assert(native("abc", merges) == Seq("ab", "c"))
    assert(reference("abc", merges) == Seq("ab", "c"))
    // and a pair learned twice replays twice, in order
    val twice = Seq(("a", "b"), ("ab", "c"), ("a", "b"))
    assert(native("ababc", twice) == reference("ababc", twice))
  }

  test("split edge cases: empty, line terminators, surrogate pairs") {
    val merges = Seq(("a", "b"))
    // the reference fold works on raw Strings; Spark values live as
    // UTF8String, where a LONE surrogate half (split cuts inside the
    // pair, like Java's zero-width split) encodes to '?' -- round-trip
    // the reference pieces so both sides see Spark's value semantics
    def utf8(ss: Seq[String]): Seq[String] =
      ss.map(s => UTF8String.fromString(s).toString)
    for (w <- Seq("", "a\nb", "\na", "a\rb", "a\u2028b", "a\u0085b",
        "😀a", "a😀b", "ab\nab", " a b ")) {
      assert(native(w, merges) == utf8(reference(w, merges)),
        s"word=${w.toList}")
      assert(native(w, Nil) == utf8(reference(w, Nil)),
        s"no-merge word=${w.toList}")
    }
  }

  test("Column form: native bpeApply ≡ HOF chain on a DataFrame, NULL → NULL") {
    import spark.implicits._
    val words = Seq("lowering", "lowest", "newer", "wider", "low",
      "a", "", "banana", "abcabcabc", "lo😀wer", "lo\nwer").toDF("w")
      .union(Seq.empty[String].toDF("w"))
      .union(spark.sql("SELECT CAST(NULL AS STRING) AS w"))
    val merges = Seq(("l", "o"), ("lo", "w"), ("e", "r"))
    val got = words.select(
        TextAnalysis.bpeApply(col("w"), merges).as("p")).collect()
    val want = words.select(
        TextAnalysis.bpeApplyHof(col("w"), merges).as("p")).collect()
    assert(got.toSeq == want.toSeq)
  }

  test("SQL surface: bpe_apply(word, lhs[], rhs[])") {
    val r = spark.sql(
      "SELECT bpe_apply('lower', array('l','lo'), array('o','w')) AS p")
      .collect()(0).getSeq[String](0)
    assert(r == Seq("low", "e", "r"))
  }

  test("≥100 trained merges at near-flat cost vs 3 merges") {
    // chained 150-rule table over a small alphabet (every rule's sides
    // are reachable symbols, so lookups really fire)
    val pool = scala.collection.mutable.ArrayBuffer("a", "b", "c", "d")
    val big = (0 until 150).map { i =>
      val l = pool(i % pool.length)
      val r = pool((i * 13 + 5) % pool.length)
      pool += l + r
      (l, r)
    }
    val small = big.take(3)
    val words = (0 until 2000).map(i =>
      UTF8String.fromString(
        (0 until 10).map(j => "abcd" ((i * 7 + j) % 4)).mkString))
    def timeIt(merges: Seq[(String, String)]): Long = {
      val t = new BpeMergeTable(merges)
      words.foreach(t.segment) // warm
      (0 until 5).map { _ =>
        val t0 = System.nanoTime()
        (0 until 20).foreach(_ => words.foreach(t.segment))
        System.nanoTime() - t0
      }.min
    }
    val (t3, t150) = (timeIt(small), timeIt(big))
    // the per-merge HOF chain is ~50× here; the scan is pass-bounded
    // by the word length, not the table size — allow generous jitter
    assert(t150 < 10 * t3,
      s"150 merges cost ${t150}ns vs 3 merges ${t3}ns — not near-flat")
    // and the big table must still be EXACT vs the sequential fold
    words.take(50).foreach { w =>
      assert(native(w.toString, big) == reference(w.toString, big))
    }
  }
}
