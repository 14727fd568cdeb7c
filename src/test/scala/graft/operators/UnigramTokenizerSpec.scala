package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.CatalystBridge

/** [[UnigramTokenizer]]: the integer Viterbi contract (optimality,
  * tie-break, OOV fallback) and the hard-EM trainer pinned against a
  * plain-Scala replay of the identical arithmetic. */
class UnigramTokenizerSpec extends SparkSpec {

  import spark.implicits._

  private def segOne(word: String, vocab: Seq[(String, Long)]): String =
    Seq(word).toDF("w")
      .select(CatalystBridge.unigramSegment(col("w"), vocab,
        UnigramTokenizer.OovCostMicro).as("s"))
      .head.getString(0)

  test("viterbi picks the minimum-cost segmentation, not greedy") {
    // greedy longest-match would take 'abc' (cost 10) + 'd' (9) = 19;
    // optimal is 'ab' (3) + 'cd' (3) = 6
    val v = Seq("abc" -> 10L, "ab" -> 3L, "cd" -> 3L, "d" -> 9L,
      "a" -> 8L, "b" -> 8L, "c" -> 8L)
    assert(segOne("abcd", v) == "ab|cd")
  }

  test("tie-break: longest piece at each backtrack step from the end") {
    // two optimal paths of cost 8: a|bc and ab|c — backtracking from
    // the end must take the LONGER last piece 'bc'
    val v = Seq("a" -> 4L, "bc" -> 4L, "ab" -> 4L, "c" -> 4L,
      "b" -> 9L)
    assert(segOne("abc", v) == "a|bc")
  }

  test("OOV single codepoints fall back at the penalty cost") {
    val v = Seq("ab" -> 5L)
    assert(segOne("abx", v) == "ab|x")
    assert(segOne("x", v) == "x")
    // a known single beats two OOVs around it only via cost math:
    // 'axb': a,b unknown (25e6 each) — still segments, never throws
    assert(segOne("axb", v) == "a|x|b")
  }

  /** Plain-Scala replay of unigramTrain's arithmetic (same cleaning,
    * same seeding, same integer DP, same M-step). */
  private def refTrain(docs: Seq[String], vocabSize: Int,
      iters: Int, maxWordLen: Int): Map[String, Long] = {
    val words = docs.flatMap(_.toLowerCase.split(" ", -1))
      .map(_.replaceAll("[^a-z0-9]", ""))
      .filter(w => w.nonEmpty && w.length <= maxWordLen)
      .groupBy(identity).map { case (w, g) => w -> g.size.toLong }
    val subs = words.toSeq.flatMap { case (w, n) =>
      for {
        i <- 1 to w.length
        l <- 1 to math.min(UnigramTokenizer.MaxPieceLen, w.length - i + 1)
      } yield (w.substring(i - 1, i - 1 + l), n)
    }.groupBy(_._1).map { case (p, g) => p -> g.map(_._2).sum }
    val multi = subs.filter(_._1.length > 1).toSeq
      .sortBy { case (p, f) => (-f, p) }.take(vocabSize)
    val seed = multi ++ subs.filter(_._1.length == 1).toSeq
    def toScores(cs: Seq[(String, Long)]): Map[String, Long] = {
      val t = cs.map(_._2).sum.toDouble
      cs.map { case (p, f) =>
        p -> math.floor(-math.log(f / t) * 1e6).toLong
      }.toMap
    }
    var scores = toScores(seed)
    for (_ <- 1 to iters) {
      def segment(w: String): Seq[String] = {
        val n = w.length
        val INF = Long.MaxValue / 4
        val dp = Array.fill(n + 1)(INF); dp(0) = 0
        def cost(piece: String): Long =
          scores.getOrElse(piece,
            if (piece.length == 1) UnigramTokenizer.OovCostMicro else -1L)
        for (i <- 1 to n; l <- 1 to math.min(4, i)) {
          val c = cost(w.substring(i - l, i))
          if (c >= 0 && dp(i - l) < INF && dp(i - l) + c < dp(i))
            dp(i) = dp(i - l) + c
        }
        var pos = n
        val out = List.newBuilder[String]
        var acc = List.empty[String]
        while (pos > 0) {
          var chosen = -1
          for (l <- 1 to math.min(4, pos)) {
            val c = cost(w.substring(pos - l, pos))
            if (c >= 0 && dp(pos - l) < INF && dp(pos - l) + c == dp(pos))
              chosen = l
          }
          acc = w.substring(pos - chosen, pos) :: acc
          pos -= chosen
        }
        out ++= acc
        out.result()
      }
      val usage = words.toSeq.flatMap { case (w, n) =>
        segment(w).map(_ -> n)
      }.groupBy(_._1).map { case (p, g) => p -> g.map(_._2).sum }
      val counts = scores.keys.toSeq.sorted.map { p =>
        p -> (usage.getOrElse(p, 0L) + (if (p.length == 1) 1L else 0L))
      }.filter(_._2 > 0)
      scores = toScores(counts)
    }
    scores
  }

  test("unigramTrain equals the plain-Scala replay (1 and 2 EM rounds)") {
    val docs = Seq(
      "the cat sat on the mat", "the cats sat", "a mat on a cat",
      "concat that mat", "sat sat sat on that cat")
    val df = docs.toDF("text")
    for (iters <- Seq(1, 2)) {
      val got = UnigramTokenizer
        .unigramTrain(df, vocabSize = 12, iters = iters, maxWordLen = 12)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val want = refTrain(docs, 12, iters, 12)
      assert(got == want, s"iters=$iters\n got=$got\nwant=$want")
    }
    // multi-char pieces the model actually uses survive; 'at' family
    // should be prominent in this corpus
    val trained = UnigramTokenizer
      .unigramTrain(df, vocabSize = 12, iters = 1, maxWordLen = 12)
      .collect().map(_.getString(0)).toSet
    assert(trained.exists(p => p.length > 1 && p.contains("at")),
      trained.toString)
  }

  /** Independent replay of the pruneTo path: same E-step as
    * [[refTrain]], then Kudo's rank — loss = f·(alt − cost) with alt
    * the brute-force minimum segmentation cost of the piece's own
    * string under the current table WITHOUT the piece itself. */
  private def refTrainPruned(docs: Seq[String], vocabSize: Int,
      iters: Int, maxWordLen: Int, k: Int): Map[String, Long] = {
    val words = docs.flatMap(_.toLowerCase.split(" ", -1))
      .map(_.replaceAll("[^a-z0-9]", ""))
      .filter(w => w.nonEmpty && w.length <= maxWordLen)
      .groupBy(identity).map { case (w, g) => w -> g.size.toLong }
    val subs = words.toSeq.flatMap { case (w, n) =>
      for {
        i <- 1 to w.length
        l <- 1 to math.min(UnigramTokenizer.MaxPieceLen, w.length - i + 1)
      } yield (w.substring(i - 1, i - 1 + l), n)
    }.groupBy(_._1).map { case (p, g) => p -> g.map(_._2).sum }
    val multi = subs.filter(_._1.length > 1).toSeq
      .sortBy { case (p, f) => (-f, p) }.take(vocabSize)
    val seed = multi ++ subs.filter(_._1.length == 1).toSeq
    def toScores(cs: Seq[(String, Long)]): Map[String, Long] = {
      val t = cs.map(_._2).sum.toDouble
      cs.map { case (p, f) =>
        p -> math.floor(-math.log(f / t) * 1e6).toLong
      }.toMap
    }
    var scores = toScores(seed)
    for (_ <- 1 to iters) {
      def pieceCost(piece: String, excl: Option[String]): Long =
        if (excl.contains(piece)) -1L
        else scores.get(piece).getOrElse(
          if (piece.length == 1) UnigramTokenizer.OovCostMicro else -1L)
      def minCost(w: String, excl: Option[String]): Long = {
        val INF = Long.MaxValue / 4
        val dp = Array.fill(w.length + 1)(INF); dp(0) = 0
        for (i <- 1 to w.length; l <- 1 to math.min(4, i)) {
          val c = pieceCost(w.substring(i - l, i), excl)
          if (c >= 0 && dp(i - l) < INF) dp(i) = math.min(dp(i), dp(i - l) + c)
        }
        dp(w.length)
      }
      def segment(w: String): Seq[String] = {
        val dpn = minCost(w, None)
        var pos = w.length
        var acc = List.empty[String]
        while (pos > 0) {
          var chosen = -1
          for (l <- 1 to math.min(4, pos)) {
            val c = pieceCost(w.substring(pos - l, pos), None)
            if (c >= 0 &&
                minCost(w.substring(0, pos - l), None) + c ==
                  minCost(w.substring(0, pos), None))
              chosen = l
          }
          acc = w.substring(pos - chosen, pos) :: acc
          pos -= chosen
        }
        assert(acc.map(p => pieceCost(p, None)).sum == dpn)
        acc
      }
      val usage = words.toSeq.flatMap { case (w, n) =>
        segment(w).map(_ -> n)
      }.groupBy(_._1).map { case (p, g) => p -> g.map(_._2).sum }
      val counts = scores.keys.toSeq.sorted.map { p =>
        p -> (usage.getOrElse(p, 0L) + (if (p.length == 1) 1L else 0L))
      }.filter(_._2 > 0)
      val losses = counts.filter(_._1.length > 1).map { case (p, f) =>
        (p, f, f * (minCost(p, Some(p)) - scores(p)))
      }
      val kept = losses.sortBy { case (p, _, l) => (-l, p) }.take(k)
        .map { case (p, f, _) => p -> f } ++
        counts.filter(_._1.length == 1)
      scores = toScores(kept)
    }
    scores
  }

  test("pruneTo: trainer equals the independent pruning replay; singles survive") {
    val docs = Seq(
      "the cat sat on the mat", "the cats sat", "a mat on a cat",
      "concat that mat", "sat sat sat on that cat")
    val df = docs.toDF("text")
    for (iters <- Seq(1, 2); k <- Seq(2, 4)) {
      val got = UnigramTokenizer
        .unigramTrain(df, vocabSize = 12, iters = iters, maxWordLen = 12,
          pruneTo = Some(k))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val want = refTrainPruned(docs, 12, iters, 12, k)
      assert(got == want, s"iters=$iters k=$k\n got=$got\nwant=$want")
      // invariants: at most k multi pieces; every single char that
      // appears in the corpus survives every round
      assert(got.keys.count(_.length > 1) <= k)
      val corpusChars = docs.flatMap(_.toLowerCase.filter(c =>
        c.isLetterOrDigit)).map(_.toString).toSet
      assert(corpusChars.subsetOf(got.keySet))
    }
    // pruning is strictly stronger than the F=0 rule here: with a
    // small k the multi-piece set shrinks below the unpruned one
    val unpruned = UnigramTokenizer
      .unigramTrain(df, vocabSize = 12, iters = 1, maxWordLen = 12)
      .collect().map(_.getString(0)).count(_.length > 1)
    val pruned = UnigramTokenizer
      .unigramTrain(df, vocabSize = 12, iters = 1, maxWordLen = 12,
        pruneTo = Some(2))
      .collect().map(_.getString(0)).count(_.length > 1)
    assert(pruned == 2 && unpruned > pruned, s"$unpruned vs $pruned")
  }

  test("property: viterbi cost is the brute-force minimum; tie rule holds (200 random cases)") {
    val rnd = new scala.util.Random(42)
    def cost(vocab: Map[String, Long], piece: String): Option[Long] =
      vocab.get(piece).orElse(
        if (piece.length == 1) Some(UnigramTokenizer.OovCostMicro)
        else None)
    // all segmentations with pieces up to 4 chars
    def allSegs(w: String): Seq[Seq[String]] =
      if (w.isEmpty) Seq(Seq.empty)
      else (1 to math.min(4, w.length)).flatMap(l =>
        allSegs(w.drop(l)).map(w.take(l) +: _))
    val alpha = "abc"
    for (_ <- 1 to 20) {
      val vocab = (1 to 6).map { _ =>
        val p = Seq.fill(1 + rnd.nextInt(3))(
          alpha(rnd.nextInt(alpha.length))).mkString
        p -> (1L + rnd.nextInt(20))
      }.toMap.toSeq
      val vm = vocab.toMap
      val words = (1 to 10).map(_ => Seq.fill(2 + rnd.nextInt(7))(
        alpha(rnd.nextInt(alpha.length))).mkString)
      val got = words.toDF("w")
        .select(col("w"), CatalystBridge.unigramSegment(col("w"),
          vocab, UnigramTokenizer.OovCostMicro).as("s"))
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
      for (word <- words) {
        val gotPieces = got(word).split("\\|").toSeq
        val gotCost = gotPieces.map(p => cost(vm, p).get).sum
        val valid = allSegs(word).flatMap { segs =>
          val cs = segs.map(p => cost(vm, p))
          if (cs.forall(_.isDefined)) Some(segs -> cs.flatten.sum)
          else None
        }
        val best = valid.map(_._2).min
        assert(gotPieces.mkString("") == word, s"$word -> ${got(word)}")
        assert(gotCost == best,
          s"$word vocab=$vocab: got ${got(word)} ($gotCost) vs $best")
        // the tie rule, replayed brute-force: among ALL optimal-cost
        // segmentations, backtracking longest-piece-first from the end
        // selects the lexicographic maximum of the REVERSED piece-
        // length sequence — the exact ordering the oracle's max(l)
        // steps induce
        import scala.math.Ordering.Implicits.seqOrdering
        val expected = valid.filter(_._2 == best).map(_._1)
          .maxBy(segs => segs.map(_.length).reverse.toSeq)
        assert(gotPieces == expected,
          s"$word vocab=$vocab: tie-break got ${got(word)} vs " +
            s"${expected.mkString("|")}")
      }
    }
  }

  test("encode: counts, reassembly order, artifact round-trip") {
    val docs = Seq((1L, "the cat sat"), (2L, "concat a mat"))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files
      .createTempDirectory("uni_idx").toString + "/idx"
    UnigramTokenizer.unigramIndexWrite(docs, vocabSize = 10, iters = 1,
      path = dir)
    val enc = UnigramTokenizer.unigramEncodeWith(docs, dir)
      .orderBy("doc_id").collect()
    assert(enc.length == 2)
    assert(enc(0).getLong(1) == 3L && enc(1).getLong(1) == 3L) // words
    assert(enc(0).getLong(2) >= 3L) // at least one piece per word
    // identical input segments identically through the artifact
    val scores = UnigramTokenizer.unigramIndexRead(spark, dir)
    val direct = UnigramTokenizer.unigramEncode(docs, scores)
      .orderBy("doc_id").collect()
    assert(enc.map(_.toString).toList == direct.map(_.toString).toList)
  }
}
