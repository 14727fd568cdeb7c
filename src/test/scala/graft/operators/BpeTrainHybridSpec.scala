package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[TextAnalysis.bpeTrainHybrid]] — the production trainer (one
  * distributed word-count pass + driver merge loop) must be
  * bit-identical to the oracle-replayed [[TextAnalysis.bpeTrain]]:
  * same greedy merges, same (count desc, l, r) tie-break, same early
  * stop, same output schema. The incremental pair-count bookkeeping
  * (inverted index + lazy-deletion priority queue) additionally gets a
  * from-scratch-recount differential at depth, where a single stale
  * count or missed re-enqueue would change a merge. */
class BpeTrainHybridSpec extends SparkSpec {

  private def trainPairs(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("step").collect().map(r => (r.getInt(0), r.getString(1),
      r.getString(2), r.getString(3), r.getLong(4))).toSeq

  test("hybrid == distributed bpeTrain row-for-row on a weighted random corpus (k=40)") {
    import spark.implicits._
    val rnd = new scala.util.Random(4217)
    // Zipf-ish weighted words over a 5-letter alphabet, plus
    // punctuation-cleaning and len<2 drops riding in the raw text
    val words = (1 to 300).map { i =>
      val len = 2 + rnd.nextInt(7)
      val w = (1 to len).map(_ => ('a' + rnd.nextInt(5)).toChar).mkString
      val rep = 1 + 60 / i
      (Seq.fill(rep)(w) ++ Seq("x", "!?")).mkString(" ")
    }
    val docs = words.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val slow = trainPairs(TextAnalysis.bpeTrain(docs, merges = 40))
    val fast = trainPairs(TextAnalysis.bpeTrainHybrid(docs, merges = 40))
    assert(fast == slow, s"first diff: ${
      fast.zip(slow).indexWhere(p => p._1 != p._2)}")
    assert(fast.length == 40)
  }

  test("hybrid == bpeTrain on the hand-computed fixtures (ties, greedy overlap, early stop)") {
    import spark.implicits._
    for (texts <- Seq(
        Seq((1L, "aa ab aa"), (2L, "ab aa b")), // early stop at 2
        Seq((1L, "aaaa aaa")), // greedy non-overlap + lex tie
        Seq((1L, "abab abab baba")), // alternating chains
        Seq((1L, "zz zz yy yy")))) { // pure count ties
      val docs = texts.toDF("doc_id", "text")
      val slow = trainPairs(TextAnalysis.bpeTrain(docs, merges = 6))
      val fast = trainPairs(TextAnalysis.bpeTrainHybrid(docs, merges = 6))
      assert(fast == slow, s"fixture $texts")
    }
  }

  test("incremental bookkeeping == from-scratch recount at depth (k=300)") {
    import spark.implicits._
    val rnd = new scala.util.Random(99)
    // tie-heavy, merge-chain-heavy: few letters, long repetitive words
    val docs = (1 to 400).map { i =>
      val w = (1 to (3 + rnd.nextInt(9)))
        .map(_ => "ab".charAt(rnd.nextInt(2))).mkString
      (i.toLong, Seq.fill(1 + rnd.nextInt(4))(w).mkString(" "))
    }.toDF("doc_id", "text")
    val fast = trainPairs(TextAnalysis.bpeTrainHybrid(docs, merges = 300))
    // naive reference: recount every pair over every word each step
    var words = docs.select(explode(split(lower(col("text")), " ")).as("w0"))
      .select(regexp_replace(col("w0"), "[^a-z0-9]", "").as("w"))
      .where(length(col("w")) >= 2)
      .groupBy("w").count().collect()
      .map(r => (r.getString(0).map(_.toString).toList, r.getLong(1)))
      .toList
    val naive = scala.collection.mutable.ArrayBuffer[
      (Int, String, String, String, Long)]()
    var step = 1
    var stop = false
    while (step <= 300 && !stop) {
      val counts = scala.collection.mutable.HashMap[(String, String), Long]()
      for ((s, f) <- words; j <- 0 until s.length - 1)
        counts((s(j), s(j + 1))) = counts.getOrElse((s(j), s(j + 1)), 0L) + f
      if (counts.isEmpty) stop = true
      else {
        val ((l, r), c) = counts.toSeq.minBy { case ((l, r), c) =>
          (-c, l, r) }((Ordering.Tuple3[Long, String, String]))
        naive += ((step, l, r, l + r, c))
        words = words.map { case (s, f) =>
          val out = scala.collection.mutable.ListBuffer[String]()
          var j = 0
          while (j < s.length) {
            if (j + 1 < s.length && s(j) == l && s(j + 1) == r) {
              out += l + r; j += 2
            } else { out += s(j); j += 1 }
          }
          (out.toList, f)
        }
        step += 1
      }
    }
    assert(fast == naive.toSeq,
      s"first diff at ${fast.zip(naive).indexWhere(p => p._1 != p._2)}")
    assert(fast.length > 100, s"fixture too shallow: ${fast.length}")
  }

  test("maxWords cap raises loud; minFreq prunes the long tail") {
    import spark.implicits._
    val docs = Seq((1L, "aa bb cc dd ee aa aa bb"))
      .toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      TextAnalysis.bpeTrainHybrid(docs, merges = 2, maxWords = 3)
    }
    assert(e.getMessage.contains("minFreq"))
    // minFreq = 2 keeps only aa (x3) and bb (x2)
    val m = trainPairs(TextAnalysis.bpeTrainHybrid(docs, merges = 9,
      minFreq = 2L))
    assert(m.map(_._4) == Seq("aa", "bb"), m.toString)
  }

  test("empty corpus and all-short words yield an empty merge table") {
    import spark.implicits._
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(TextAnalysis.bpeTrainHybrid(empty, merges = 3).count() == 0)
    val short = Seq((1L, "a b c ! .")).toDF("doc_id", "text")
    assert(TextAnalysis.bpeTrainHybrid(short, merges = 3).count() == 0)
  }
}
