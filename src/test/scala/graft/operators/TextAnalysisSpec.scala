package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Behavioral specs for the per-document text-quality operators on
  * crafted fixtures with hand-computed expectations. */
class TextAnalysisSpec extends SparkSpec {

  test("unigramLogLoss: rare-token documents score higher than common-token ones") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the the the the the the the the"), // all common tokens
      (2L, "the the the the zyx qwv jkl pfd")) // half hapaxes
      .toDF("doc_id", "text")
    val got = TextAnalysis.unigramLogLoss(docs)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(got(2L) > got(1L),
      s"rare-token doc must score higher: $got")
    // exact value for doc 1: every token is 'the' with count 12 of 16
    val want = BigDecimal(
      math.floor(-math.log(12.0 / 16.0) * 1e6) * 8 / (1e6 * 8))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(1L) == want, s"${got(1L)} != $want")
  }

  test("tokenEntropy: per-row fold equals the relational twin, edges included") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a a a a a a"), // zero entropy: one token type
      (2L, "a b c d e f"), // uniform: entropy = qln(6) exactly
      (3L, "a a a b b c"), // mixed distribution
      (4L, ""), // split('') = [""]: one empty token, entropy 0
      (5L, "Zulu zulu ZULU x"), // case folds before counting
      (6L, null.asInstanceOf[String])) // NULL text: dropped
      .toDF("doc_id", "text")
    val fold = TextAnalysis.tokenEntropy(docs).orderBy("doc_id").collect()
    val rel = TextAnalysis.tokenEntropyRelational(docs)
      .orderBy("doc_id").collect()
    assert(fold.toSeq == rel.toSeq,
      s"fold=${fold.toSeq} rel=${rel.toSeq}")
    val byId = fold.map(r => r.getLong(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(!byId.contains(6L), byId.toString)
    assert(byId(1L) == ((6L, 1L, 0L)), byId.toString) // repeated: H=0
    // uniform over n distinct: Σ c·qln(c) = 0, so H = qln(n) exactly
    val qln6 = math.floor(1e6 * math.log(6.0)).toLong
    assert(byId(2L) == ((6L, 6L, qln6)), byId.toString)
    // mixed: hand-computed (6·qln(6) − 3·qln(3) − 2·qln(2)) div 6
    val want3 = (6 * qln6 - 3 * math.floor(1e6 * math.log(3.0)).toLong -
      2 * math.floor(1e6 * math.log(2.0)).toLong) / 6
    assert(byId(3L) == ((6L, 3L, want3)), byId.toString)
    assert(byId(4L) == ((1L, 1L, 0L)), byId.toString)
    // lowercasing collapses the three zulus: 2 distinct, not 4
    assert(byId(5L)._2 == 2L, byId.toString)
    // order sanity: uniform > mixed > constant
    assert(byId(2L)._3 > byId(3L)._3 && byId(3L)._3 > byId(1L)._3)
  }

  test("tokenKlDivergence: zero on self, positive under drift") {
    import spark.implicits._
    val a = Seq((1L, "alpha alpha beta gamma"),
      (2L, "alpha beta beta gamma")).toDF("doc_id", "text")
    val b = Seq((3L, "delta delta epsilon zeta"),
      (4L, "delta epsilon epsilon zeta")).toDF("doc_id", "text")
    val self = TextAnalysis.tokenKlDivergence(a, a).head()
    assert(self.getDouble(1) == 0.0, self.toString) // p == q per term
    val drift = TextAnalysis.tokenKlDivergence(a, b).head()
    // disjoint vocab; add-1 smoothing bounds the tiny-corpus value
    assert(drift.getDouble(1) > 0.5, drift.toString)
    assert(drift.getLong(0) == 6L) // union vocabulary
    // mild overlap sits between the extremes
    val mixed = TextAnalysis.tokenKlDivergence(a,
      Seq((5L, "alpha beta gamma delta")).toDF("doc_id", "text")).head()
    assert(mixed.getDouble(1) > 0.0 && mixed.getDouble(1) < drift.getDouble(1))
  }

  test("bigramLogLoss: word salad scores high where unigrams cannot tell") {
    import spark.implicits._
    // both docs have IDENTICAL token multisets — unigram log-loss ties
    // by construction; only the bigram score separates fluent order
    // from salad
    val docs = Seq(
      (1L, "the cat sat on the mat the cat sat on the mat"),
      (2L, "mat the on sat cat the mat the on sat cat the"))
      .toDF("doc_id", "text")
    val uni = TextAnalysis.unigramLogLoss(docs)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(uni(1L) == uni(2L), s"unigram must tie: $uni")
    // LM trained on FLUENT text only (the reference-corpus shape):
    // the salad's unseen transitions charge the OOV penalty
    val lm = TextAnalysis.bigramLm(docs.where($"doc_id" === 1L))
    val bi = TextAnalysis.bigramLogLossWith(docs, lm,
        oovQMicros = 20000000L)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(bi(1L) < bi(2L), s"salad must score higher: $bi")
    // short doc exclusion + OOV penalty on an unseen-bigram doc
    val scored = TextAnalysis.bigramLogLossWith(
      Seq((8L, "solo"), (9L, "zz yy xx")).toDF("doc_id", "text"),
      TextAnalysis.bigramLm(docs), oovQMicros = 20000000L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(scored.toSeq == Seq((9L, 2L, 20.0)), scored.mkString(","))
  }

  test("unigramLogLossWith: self-LM equals unigramLogLoss; OOV charges the flat penalty") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta alpha gamma"),
      (2L, "beta beta gamma alpha")).toDF("doc_id", "text")
    val self = TextAnalysis.unigramLogLossWith(docs,
        TextAnalysis.unigramLm(docs), oovQMicros = 999L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val base = TextAnalysis.unigramLogLoss(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(self == base) // no OOV possible against the self LM
    // score an unseen document: its OOV tokens each cost exactly the
    // flat penalty (20.0 after the 1e-6 dequantize)
    val unseen = Seq((9L, "zz yy")).toDF("doc_id", "text")
    val got = TextAnalysis.unigramLogLossWith(unseen,
        TextAnalysis.unigramLm(docs), oovQMicros = 20000000L)
      .head()
    assert(got.getLong(1) == 2L && got.getDouble(2) == 20.0, got.toString)
  }

  test("repetitionStats: fractions match hand-computed values") {
    import spark.implicits._
    val docs = Seq(
      // 6 tokens: "a" x3, "b" x2, "c" x1; bigrams: "a a","a b","b a","a b"...
      (1L, "a a b a b c"),
      // fully repeated doc: one token repeated
      (2L, "x x x x"),
      // no repetition at all
      (3L, "p q r s"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.repetitionStats(docs)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    // doc 1: n=6; top token "a" 3/6=0.5; dup tokens (a:3 + b:2)/6=0.8333;
    // bigrams of [a a b a b c] = [a a, a b, b a, a b, b c] -> top "a b" 2/5=0.4
    assert(got(1L) == ((6L, 0.5, 0.8333, 0.4)))
    // doc 2: n=4; all same token; bigrams all "x x" -> 1.0 everywhere
    assert(got(2L) == ((4L, 1.0, 1.0, 1.0)))
    // doc 3: no dup token, every bigram unique: top fractions are 1/n
    assert(got(3L) == ((4L, 0.25, 0.0, 0.3333)))
  }

  test("repetitionStats: single-token doc has zero bigram fraction") {
    import spark.implicits._
    val got = TextAnalysis.repetitionStats(Seq((1L, "solo")).toDF("doc_id", "text"))
      .collect().head
    assert(got.getLong(1) == 1L && got.getDouble(4) == 0.0)
  }

  test("piiScrub: emails and long digit runs redacted, counts exact") {
    import spark.implicits._
    val docs = Seq(
      (1L, "contact jane.doe+test@example.co.uk or bob@corp.io today"),
      (2L, "account 1234567890 pin 123 card 000111222333"),
      (3L, "mixed: a1b2@mail.example.com then 9876543 end"),
      (4L, "clean text with no sensitive payloads at all"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.piiScrub(docs)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(got(1L) == ((2L, 0L, "contact [EMAIL] or [EMAIL] today")))
    // "123" is below the 6-digit floor and survives
    assert(got(2L) == ((0L, 2L, "account [NUM] pin 123 card [NUM]")))
    // the email is consumed BEFORE the digit-run pass can split it
    assert(got(3L) == ((1L, 1L, "mixed: [EMAIL] then [NUM] end")))
    assert(got(4L) == ((0L, 0L, "clean text with no sensitive payloads at all")))
  }

  test("piiAudit: Luhn checksum and octet range separate valid PII from shaped noise") {
    import spark.implicits._
    // independent reference Luhn (plain Scala), used to BUILD the
    // fixture: a 16-digit base gets its correct check digit, then a
    // corrupted twin gets check+1 — the operator must split them
    def luhnCheckDigit(base: String): Int = {
      val sum = ("0" + base.reverse).zipWithIndex.map { case (c, i) =>
        val d = c - '0'
        if (i % 2 == 1) { val t = d * 2; if (t > 9) t - 9 else t }
        else d
      }.sum // includes the placeholder 0 at position 1
      (10 - sum % 10) % 10
    }
    val base = "537241908563214" // 15 digits -> 16-digit PAN
    val valid = base + luhnCheckDigit(base)
    val invalid = base + ((luhnCheckDigit(base) + 1) % 10)
    val docs = Seq(
      (1L, s"pay $valid not $invalid ok"), // checksum splits the twins
      (2L, "visa 4111111111111111 and a 123456789012 tracker"), // 12 digits: below floor
      (3L, "hosts 10.0.0.1 and 999.1.1.1 and 192.168.300.7"), // octet validation
      (4L, "v6-ish 1.2.3.4.5.6 collapses to one candidate"),
      (5L, "clean text, no candidates anywhere"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.piiAudit(docs).collect().map(r =>
      r.getLong(0) -> (r.getAs[Long]("n_card_candidates"),
        r.getAs[Long]("n_cards_luhn"),
        r.getAs[Long]("n_ipv4_candidates"),
        r.getAs[Long]("n_ipv4_valid"))).toMap
    assert(got(1L) == ((2L, 1L, 0L, 0L)),
      s"Luhn must keep exactly the constructed-valid twin: ${got(1L)}")
    assert(got(2L) == ((1L, 1L, 0L, 0L)),
      s"4111111111111111 is Luhn-valid; 12 digits is no candidate: ${got(2L)}")
    assert(got(3L) == ((0L, 0L, 3L, 1L)),
      s"only 10.0.0.1 has all octets <= 255: ${got(3L)}")
    // leftmost-greedy: "1.2.3.4" matches, ".5.6" cannot restart
    assert(got(4L) == ((0L, 0L, 1L, 1L)), s"${got(4L)}")
    assert(got(5L) == ((0L, 0L, 0L, 0L)))
  }

  test("piiAudit: every 13..19 candidate length validates, 20+ yields its greedy 19-prefix") {
    import spark.implicits._
    def luhnCheckDigit(base: String): Int = {
      val sum = ("0" + base.reverse).zipWithIndex.map { case (c, i) =>
        val d = c - '0'
        if (i % 2 == 1) { val t = d * 2; if (t > 9) t - 9 else t }
        else d
      }.sum
      (10 - sum % 10) % 10
    }
    // one valid PAN per legal length (13..19): parity handling must
    // hold for both odd and even lengths
    val pans = (13 to 19).map { len =>
      val b = "98765432109876543".take(len - 1)
      b + luhnCheckDigit(b)
    }
    val docs = pans.zipWithIndex.map { case (p, i) =>
      (i.toLong, s"pan $p end")
    } :+ (99L, s"run ${pans.last}000 overflows") // 22 digits
    val got = TextAnalysis.piiAudit(docs.toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3)))
      .toMap
    (0 until 7).foreach { i =>
      assert(got(i.toLong) == ((1L, 1L)),
        s"len ${13 + i} PAN must validate: ${got(i.toLong)}")
    }
    // the 22-digit run: one greedy 19-digit candidate, Luhn fate is
    // whatever the prefix's arithmetic says — here the 19-digit PAN
    // plus trailing zeros shifts parity, so it must NOT pass as the
    // embedded valid 19-PAN (the checksum sees different positions)
    assert(got(99L)._1 == 1L, s"greedy prefix count: ${got(99L)}")
  }

  test("piiAudit IBAN: mod-97 splits real IBANs from shaped noise across lengths") {
    import spark.implicits._
    // three public ISO 13616 example IBANs (GB/DE/FR — 22/22/27
    // chars, mixed-alpha BBAN in the FR one) + a check-digit
    // corruption + lowercase (not a candidate) + shaped noise
    val docs = Seq(
      (1L, "send to GB82WEST12345698765432 today"),
      (2L, "konto DE89370400440532013000 bitte"),
      (3L, "compte FR1420041010050500013M02606 merci"),
      (4L, "typo GB82WEST12345698765433 fails"),
      (5L, "lowercase gb82west12345698765432 is no candidate"),
      (6L, "serial XY99ABCDEFGHIJ0123 looks bankish"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.piiAudit(docs).collect().map(r =>
      r.getLong(0) -> (r.getAs[Long]("n_iban_candidates"),
        r.getAs[Long]("n_ibans_valid"))).toMap
    assert(got(1L) == ((1L, 1L)), got(1L).toString)
    assert(got(2L) == ((1L, 1L)), got(2L).toString)
    assert(got(3L) == ((1L, 1L)), got(3L).toString)
    assert(got(4L) == ((1L, 0L)), s"check-digit corruption: ${got(4L)}")
    assert(got(5L) == ((0L, 0L)), got(5L).toString)
    assert(got(6L)._1 == 1L && got(6L)._2 == 0L,
      s"shaped noise must fail mod-97: ${got(6L)}")
  }

  test("piiAudit phones: E.164 shape counts; plausibility is the validated tier (r16)") {
    import spark.implicits._
    val docs = Seq(
      (1L, "call +14155550123 or +442071838750 now"), // two E.164, both plausible
      (2L, "call (415) 555-0123 today"),              // national: out of scope
      (3L, "code +0123456789 has a leading zero"),    // invalid E.164
      (4L, "short +1234567 only 7 digits"),           // below the floor
      (5L, "noise +999123456789 unassigned code"))    // shape, no assignment
      .toDF("doc_id", "text")
    val got = TextAnalysis.piiAudit(docs).collect().map(r =>
      r.getLong(0) -> (r.getAs[Long]("n_phones_e164"),
        r.getAs[Long]("n_phones_valid"))).toMap
    assert(got == Map(1L -> ((2L, 2L)), 2L -> ((0L, 0L)),
      3L -> ((0L, 0L)), 4L -> ((0L, 0L)), 5L -> ((1L, 0L))),
      got.toString)
    // PLAUSIBLE phones trip the validated gate; shape-only noise
    // (unassigned code) does not — and redaction still recovers
    // (the digits fall under the [NUM] pass, so a redacted doc
    // never re-flags)
    val flagged = docs.select(
      TextAnalysis.hasValidatedPii($"text")).collect()
      .map(_.getBoolean(0)).toSeq
    assert(flagged == Seq(true, false, false, false, false),
      flagged.toString)
    val reflagged = docs.select(TextAnalysis.hasValidatedPii(
      TextAnalysis.redactPiiAll($"text"))).collect()
      .map(_.getBoolean(0)).toSeq
    assert(reflagged == Seq(false, false, false, false, false),
      reflagged.toString)
  }

  test("piiAudit scope: ASCII digit classes only — localized digits never form candidates") {
    import spark.implicits._
    // Arabic-Indic and Devanagari digits are \\p{Nd} but NOT [0-9]:
    // both Java regex and RE2 treat [0-9] as ASCII-only, so the scope
    // is identical cross-engine — pinned here so a future "smarter"
    // pattern doesn't silently diverge from the DuckDB oracle
    val docs = Seq(
      (1L, "card ٤١١١١١١١١١١١١١١١ end"),
      (2L, "ip १٠.٠.٠.१ end"),
      (3L, "card 4111111111111111 end"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.piiAudit(docs).collect().map(r =>
      r.getLong(0) -> (r.getLong(2), r.getLong(4))).toMap
    assert(got(1L) == ((0L, 0L)), s"localized digits: ${got(1L)}")
    assert(got(2L) == ((0L, 0L)), s"localized IP: ${got(2L)}")
    assert(got(3L)._1 == 1L)
  }

  test("hasValidatedPii / redactPiiAll: gate flags validated PII only; redaction closes the loop") {
    import spark.implicits._
    val docs = Seq(
      (1L, "pay 4111111111111111 now"),            // Luhn-valid card
      (2L, "tracker 4111111111111112 is noise"),   // Luhn fails
      (3L, "host 10.0.0.1 up"),                    // valid IPv4
      (4L, "spec 999.1.1.1 rev"),                  // octet overflow
      (5L, "mail bob@corp.io ok"),                 // email
      (6L, "nothing here"),
      (7L, "chain 10.0.0.1.2.3.4.5 both halves"),  // two IPs via global scan
      (8L, "wire GB82WEST12345698765432 now"),     // mod-97-valid IBAN
      (9L, "fake GB82WEST12345698765433 meh"))     // checksum fails
      .toDF("doc_id", "text")
    val flags = docs.select($"doc_id",
      TextAnalysis.hasValidatedPii($"text").as("f"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(flags == Map(1L -> true, 2L -> false, 3L -> true,
      4L -> false, 5L -> true, 6L -> false, 7L -> true,
      8L -> true, 9L -> false), flags.toString)
    // redactPiiAll output never re-flags: the recovery-loop invariant
    val after = docs.select($"doc_id",
      TextAnalysis.redactPiiAll($"text").as("r"))
      .withColumn("f", TextAnalysis.hasValidatedPii(col("r")))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getBoolean(2)))
      .toMap
    assert(after.values.forall(!_._2), after.toString)
    assert(after(1L)._1 == "pay [NUM] now")
    assert(after(3L)._1 == "host [IP] up")
    // shape-level: the invalid IP also redacts (over-scrub, no leak)
    assert(after(4L)._1 == "spec [IP] rev")
    assert(after(5L)._1 == "mail [EMAIL] ok")
    // global replace consumes BOTH dotted runs, not just the first
    assert(after(7L)._1 == "chain [IP].[IP] both halves", after(7L)._1)
    // IBAN goes WHOLESALE (not cored to GB82WEST[NUM] by the digit
    // pass); the checksum-failing shape also redacts — over-scrub
    assert(after(8L)._1 == "wire [IBAN] now", after(8L)._1)
    assert(after(9L)._1 == "fake [IBAN] meh", after(9L)._1)
  }

  test("heuristicFilter: rule verdicts and fixed-order reasons") {
    import spark.implicits._
    val clean = (1 to 30).map(i => s"word$i").mkString(" ")
    val docs = Seq(
      (1L, clean), // 30 varied tokens: keeps
      (2L, "tiny doc"), // too_short
      (3L, ("spam " * 30).trim), // short-circuit: every rep rule + dup
      (4L, (1 to 30).map(_ => "ab").mkString(" "))) // word_len + repetition
      .toDF("doc_id", "text")
    val got = TextAnalysis.heuristicFilter(docs)
      .select("doc_id", "keep", "reasons").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    assert(got(1L) == ((1L, "")))
    assert(got(2L)._1 == 0L && got(2L)._2.contains("too_short"))
    // reasons join in fixed rule order: token rule before bigram rule
    assert(got(3L) ==
      ((0L, "repetitive_token,repetitive_bigram,dup_heavy")))
    assert(got(4L)._1 == 0L && got(4L)._2.startsWith("word_len"))
  }

  test("chunkText: overlapping windows tile the doc; short docs yield one chunk") {
    import spark.implicits._
    val docs = Seq(
      (1L, (1 to 10).map(i => s"t$i").mkString(" ")), // 10 tokens
      (2L, "a b c")) // shorter than one window
      .toDF("doc_id", "text")
    val got = TextAnalysis.chunkText(docs, maxTokens = 4, overlap = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getLong(2), r.getString(3)))
    val d1 = got.filter(_._1 == 1L).sortBy(_._2)
    // stride 2: ceil((10-2)/2) = 4 chunks, each starting 2 later
    assert(d1.map(_._4).toSeq == Seq(
      "t1 t2 t3 t4", "t3 t4 t5 t6", "t5 t6 t7 t8", "t7 t8 t9 t10"))
    assert(got.filter(_._1 == 2L).toSeq == Seq((2L, 0L, 3L, "a b c")))
  }

  test("histogram: degenerate all-equal column collapses to bucket 0") {
    import spark.implicits._
    val got = Profile.histogram(Seq(5.0, 5.0, 5.0).toDF("v"), col("v"), 8)
      .collect().map(r => (r.getLong(0), r.getLong(3)))
    assert(got.toSeq == Seq((0L, 3L))) // width 0 must not divide-by-zero
  }

  test("histogram: hand-computed equal-width buckets, max lands in last") {
    import spark.implicits._
    val df = Seq(0.0, 1.0, 2.5, 5.0, 9.9, 10.0).toDF("v")
    val got = Profile.histogram(df, col("v"), 4)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    // width 2.5: [0,2.5)->{0,1}, [2.5,5)->{2.5}, [5,7.5)->{5},
    // [7.5,10]->{9.9, 10 (clamped)}
    assert(got == Map(0L -> 2L, 1L -> 1L, 2L -> 1L, 3L -> 2L))
  }

  test("skewStats ranks heavy keys with deterministic tie-break") {
    import spark.implicits._
    // key 7 -> 6 rows, key 3 -> 2, keys 1,2 -> 1 each (tie on cnt)
    val df = (Seq.fill(6)(7) ++ Seq(3, 3, 1, 2)).toDF("k")
    val got = Profile.skewStats(df, col("k"), k = 3)
      .orderBy("rank").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getDouble(3)))
    assert(got.toSeq == Seq(
      (1L, "7", 6L, 0.6),
      (2L, "3", 2L, 0.2),
      (3L, "1", 1L, 0.1))) // "1" < "2" breaks the tie
  }

  test("paretoCoverage: exact mil shares, minimal needed prefix, boundary") {
    import spark.implicits._
    // masses 600/300/80/20 of 1000: cum 600, 900, 980, 1000. At 900‰
    // cover, "b" is needed (prev cum 600 < 900) but "c" is NOT (prev
    // cum 900 — the boundary case: ALREADY covered, strict <)
    val df = Seq(("a", 600L), ("b", 300L), ("c", 80L), ("d", 20L))
      .flatMap { case (s, n) => Seq((s, n)) }.toDF("src", "m")
    val got = Profile.paretoCoverage(df, col("src"), col("m"), 900L)
      .orderBy(col("w").desc, col("stratum")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(got.toSeq == Seq(
      ("a", 600L, 600L, 600L, 1L),
      ("b", 300L, 300L, 900L, 1L),
      ("c", 80L, 80L, 980L, 0L),
      ("d", 20L, 20L, 1000L, 0L)))
  }

  test("textRank: the co-occurrence hub ranks first; minLen drops noise") {
    import spark.implicits._
    // "spark" neighbors 6 distinct words; everything else is a chain
    // leaf. Single-char tokens ("a") must not enter the graph.
    val docs = Seq(
      "spark shuffle a spark join a spark agg",
      "spark window a spark sort",
      "spark cache",
      "lonely pair").toDF("text")
    val got = TextAnalysis.textRankKeywords(docs, iters = 3, k = 5)
      .orderBy("kw_rank").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(got.head == ((1L, "spark")), got.mkString(","))
    assert(!got.map(_._2).contains("a"))
  }

  test("jsDivergence: 0 on identical corpora, symmetric, under ln 2") {
    import spark.implicits._
    val a = Seq("x y z", "x x y").toDF("text")
    val b = Seq("p q", "p p p q r").toDF("text")
    assert(TextAnalysis.jsDivergence(a, a).head.getDouble(1) == 0.0)
    val ab = TextAnalysis.jsDivergence(a, b).head.getDouble(1)
    val ba = TextAnalysis.jsDivergence(b, a).head.getDouble(1)
    assert(ab == ba, s"asymmetric: $ab vs $ba")
    assert(ab > 0.0 && ab <= math.log(2.0) + 1e-9)
  }

  test("giniConcentration: 0 on equal masses, (k-1)/k on total concentration") {
    import spark.implicits._
    val equal = (for { s <- Seq("a", "b", "c", "d"); _ <- 1 to 5 }
      yield (s, 10L)).toDF("s", "m")
    assert(Profile.giniConcentration(equal, col("s"), col("m"))
      .head.getDouble(1) == 0.0)
    // one stratum has all the mass, three have (near) none -> this
    // formula needs w > 0 rows; use 1 vs huge for the limit check
    val conc = Seq(("a", 1L), ("b", 1L), ("c", 1L), ("d", 1000000L))
      .toDF("s", "m")
    val g = Profile.giniConcentration(conc, col("s"), col("m"))
      .head.getDouble(1)
    assert(g > 0.74 && g < 0.75, s"expected ~3/4, got $g")
    // a negative stratum mass means upstream corruption -> null, not
    // a silently-wrong G
    val bad = Seq(("a", 10L), ("b", -3L)).toDF("s", "m")
    assert(Profile.giniConcentration(bad, col("s"), col("m"))
      .head.isNullAt(1))
  }

  test("chiSquareIndependence: 0 on exact independence, V=1 on a bijection") {
    import spark.implicits._
    // perfectly independent 2x2: every cell = R*C/n exactly
    val indep = (for { a <- Seq("x", "y"); b <- Seq("p", "q");
      _ <- 1 to 10 } yield (a, b)).toDF("a", "b")
    val gi = Profile.chiSquareIndependence(indep, col("a"), col("b")).head
    assert(gi.getLong(0) == 40L && gi.getLong(3) == 1L)
    assert(gi.getDouble(4) == 0.0 && gi.getDouble(5) == 0.0)
    // perfect dependence (a determines b): chi2 = n*(k-1), V = 1
    val dep = (for { a <- Seq("x", "y", "z"); _ <- 1 to 7 }
      yield (a, a.toUpperCase)).toDF("a", "b")
    val gd = Profile.chiSquareIndependence(dep, col("a"), col("b")).head
    assert(gd.getLong(3) == 4L)
    assert(math.abs(gd.getDouble(4) - 21.0 * 2) < 1e-6) // n*(min-1)... n*(k-1)=42
    assert(math.abs(gd.getDouble(5) - 1.0) < 1e-6)
    // single-category column -> dof 0, V null
    val flat = Seq(("x", "p"), ("x", "q")).toDF("a", "b")
    val gf = Profile.chiSquareIndependence(flat, col("a"), col("b")).head
    assert(gf.getLong(3) == 0L && gf.isNullAt(5))
  }

  test("chiSquareIndependence: >10k cells raise before materializing (ADVICE r11)") {
    import spark.implicits._
    // 101x101 = 10201 distinct cells: the guard must fire off the
    // limit(10001) probe — the driver never holds the full cell table
    val big = spark.range(10201).select(
      (col("id") % 101).cast("string").as("a"),
      (col("id") / 101).cast("string").as("b"))
    val e = intercept[IllegalArgumentException] {
      Profile.chiSquareIndependence(big, col("a"), col("b"))
    }
    assert(e.getMessage.contains("10k driver-finish bound"), e.getMessage)
  }

  test("summarizeDiff: quiet columns read zero, corruption lights up, one-sided columns flag") {
    import spark.implicits._
    val a = Seq((1L, "x", 10L), (2L, "y", 20L), (3L, "x", 30L))
      .toDF("id", "cat", "v")
    // id grows, v gains a null + a range shift, cat unchanged, and
    // a brand-new column appears only in b
    val b = Seq((1L, "x", Some(10L), "p"), (2L, "y", Some(20L), "q"),
      (3L, "x", Some(99L), "p"), (4L, "x", None, "q"))
      .toDF("id", "cat", "v", "extra")
    val got = Profile.summarizeDiff(a, b, Seq("id", "cat", "v", "extra"))
      .collect().map(r => r.getString(0) -> r).toMap
    val cat = got("cat")
    assert(cat.getLong(1) == 3L && cat.getLong(2) == 4L)
    assert(cat.getLong(7) == 0L && cat.getLong(8) == 0L) // quiet
    val v = got("v")
    assert(v.getLong(6) == 250L && v.getLong(7) == 250L) // null rate jump
    assert(v.getLong(8) == 1L) // max moved 30 -> 99
    val extra = got("extra")
    assert(extra.isNullAt(1) && extra.getLong(2) == 4L &&
      extra.getLong(8) == 1L) // appeared-only-in-b flags
    // absent from both -> reject
    val e = intercept[IllegalArgumentException] {
      Profile.summarizeDiff(a, b, Seq("id", "ghost"))
    }
    assert(e.getMessage.contains("ghost"))
    // EVERY requested column missing from one side still reports
    // (ADVICE r12: the dropped-all-columns release IS the alert — it
    // used to throw 'summarize needs at least one column')
    val noneInB = Profile.summarizeDiff(a, b.select("extra"),
      Seq("id", "v")).collect().map(r => r.getString(0) -> r).toMap
    assert(noneInB.keySet == Set("id", "v"))
    assert(noneInB("id").getLong(1) == 3L && noneInB("id").isNullAt(2))
    assert(noneInB("id").getLong(8) == 1L) // minmax_moved flags
  }

  test("redactPii is idempotent") {
    import spark.implicits._
    val df = Seq("x 1234567 y a@b.com z").toDF("text")
    val once = df.select(TextAnalysis.redactPii(col("text")).as("r"))
    val twice = once.select(TextAnalysis.redactPii(col("r")))
    assert(once.collect().head.getString(0) == twice.collect().head.getString(0))
  }

  test("sentences: terminator runs, trim, empties dropped, 0-based idx") {
    import spark.implicits._
    val docs = Seq(
      (1L, "One two. Three!  Four? And no end"),
      (2L, "..."), // terminators only: no sentences
      (3L, "Just one line")).toDF("doc_id", "text")
    val got = TextAnalysis.sentences(docs)
      .orderBy("doc_id", "sent_idx").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(got.toSeq == Seq(
      (1L, 0L, 2L, "One two."),
      (1L, 1L, 1L, "Three!"),
      (1L, 2L, 1L, "Four?"),
      (1L, 3L, 3L, "And no end"),
      (3L, 0L, 3L, "Just one line")))
  }

  test("sentences: dotted tokens (emails, IPv4, decimals) stay whole") {
    import spark.implicits._
    val docs = Seq(
      (1L, "Mail a.user@ex.com today. Host 10.1.2.3 is up. Done"),
      (2L, "Version 1.2.3 shipped! v1.2.4 next?"),
      (3L, "trailing dot inside x.y.z")).toDF("doc_id", "text")
    val got = TextAnalysis.sentences(docs)
      .orderBy("doc_id", "sent_idx").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(3)))
    assert(got.toSeq == Seq(
      (1L, 0L, "Mail a.user@ex.com today."),
      (1L, 1L, "Host 10.1.2.3 is up."),
      (1L, 2L, "Done"),
      (2L, 0L, "Version 1.2.3 shipped!"),
      (2L, 1L, "v1.2.4 next?"),
      (3L, 0L, "trailing dot inside x.y.z")))
  }

  test("cardWindowsValid: detects a PAN fused into a longer digit run") {
    import spark.implicits._
    val docs = Seq(
      // the q_pii_audit embedded fixture: greedy 19-prefix is
      // Luhn-invalid, exactly one window passes Luhn AND IIN
      (1L, "trace 99204111111111111111880 end"),
      // a standalone valid PAN is also one window (its own alignment)
      (2L, "card 4111111111111111"),
      // Luhn-valid but IIN-implausible run (starts with 7): 0 windows
      (3L, "id 7111111111111114"),
      // Luhn-failing PAN shape: 0
      (4L, "n 4111111111111112"),
      // short run (< 13 digits): no window domain at all
      (5L, "tel 411111111111"),
      (6L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val got = docs.select($"doc_id",
      TextAnalysis.cardWindowsValid($"text").as("w"))
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 0L, 4L -> 0L,
      5L -> 0L, 6L -> -1L), got.toString)
    // the greedy candidate audit MISSES the fused PAN; the window
    // column catches it — the exact gap VERDICT r14 #2 named
    val audit = TextAnalysis.piiAudit(docs.where($"doc_id" === 1))
      .collect().head
    assert(audit.getAs[Long]("n_cards_luhn") == 0L)
    assert(audit.getAs[Long]("n_cards_embedded") == 1L)
    // and the gate now trips on it (stream gate rides the same
    // predicate), while redaction still closes the recovery loop
    val flagged = docs.where($"doc_id" === 1)
      .select(TextAnalysis.hasValidatedPii($"text")).collect().head
    assert(flagged.getBoolean(0))
    val recovered = docs.where($"doc_id" === 1)
      .select(TextAnalysis.hasValidatedPii(
        TextAnalysis.redactPiiAll($"text"))).collect().head
    assert(!recovered.getBoolean(0))
  }

  test("dsirWeights: target-like docs outweigh off-target; selection deterministic") {
    import spark.implicits._
    val raw = Seq(
      (1L, "alpha beta alpha beta"), // pure target vocabulary
      (2L, "zulu yankee zulu yankee"), // pure off-target vocabulary
      (3L, "alpha beta zulu yankee"), // half and half
      (4L, "alpha beta alpha beta"), // duplicate of 1's content
      (5L, "zulu yankee zulu yankee"),
      (6L, null.asInstanceOf[String])) // NULL text: dropped, never ranked
      .toDF("doc_id", "text")
    val target = Seq((10L, "alpha beta alpha beta beta alpha"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.dsirWeights(raw, target, buckets = 4096, k = 6)
    val logw = got.collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // the NULL-text doc is dropped (oracle semantics: explode emits
    // nothing), not ranked with null scores padding the k-cut
    assert(!logw.contains(6L), logw.toString)
    // same content ⇒ same weight; target vocab > mixed > off-target
    assert(logw(1L) == logw(4L), logw.toString)
    assert(logw(2L) == logw(5L), logw.toString)
    assert(logw(1L) > logw(3L) && logw(3L) > logw(2L), logw.toString)
    // pure function: identical output across executions, order included
    val again = TextAnalysis.dsirWeights(raw, target, buckets = 4096, k = 6)
    assert(got.collect().toSeq == again.collect().toSeq)
    // the k cut keeps the highest gumbel-perturbed scores, best first
    val scores = got.collect().map(_.getDouble(3)).toSeq
    assert(scores == scores.sorted.reverse, scores.toString)
  }

  test("wordpieceSegment: greedy max-munch, char fallback, space runs, unicode") {
    import spark.implicits._
    val docs = Seq(
      (1L, "thecatx cat the"), // whole-word match beats prefix pieces
      (2L, "catthe zz"), // concatenation splits; unknown falls to chars
      (3L, "a  b"), // space run round-trips; 1-char words
      (4L, ""), // empty text
      (5L, "猫猫x 猫"), // non-ASCII codepoints
      (6L, null)) // NULL text: NULL n_words AND NULL segmented
      .toDF("doc_id", "text")
    val vocab = Seq("cat", "the", "thecatx", "猫猫")
    val rows = TextAnalysis.wordpieceSegment(docs, vocab).collect()
    val got = rows.filter(!_.isNullAt(1))
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(got(1L) == ((3L, "thecatx cat the")), got(1L).toString)
    assert(got(2L) == ((2L, "cat|the z|z")), got(2L).toString)
    assert(got(3L) == ((3L, "a  b")), got(3L).toString)
    assert(got(4L) == ((1L, "")), got(4L).toString)
    assert(got(5L) == ((2L, "猫猫|x 猫")), got(5L).toString)
    // NULL text propagates NULL through both columns — the oracle's
    // CASE WHEN ws IS NULL mirrors exactly this (spark/oracle pinned)
    val nullRow = rows.find(_.getLong(0) == 6L).get
    assert(nullRow.isNullAt(1) && nullRow.isNullAt(2), nullRow.toString)
  }

  test("topWordVocab: (count desc, word asc) cut, single chars excluded") {
    import spark.implicits._
    val docs = Seq((1L, "bb aa bb cc aa x")).toDF("doc_id", "text")
    assert(TextAnalysis.topWordVocab(docs, 2) == Seq("aa", "bb"))
    assert(TextAnalysis.topWordVocab(docs, 3) == Seq("aa", "bb", "cc"))
  }

  test("dsirScorer: native per-row score is bit-identical to the relational twin") {
    import spark.implicits._
    val raw = Seq(
      (1L, "alpha beta alpha beta"),
      (2L, "zulu yankee zulu yankee"),
      (3L, "alpha  beta"), // double space: empty token scores too
      (4L, ""), // empty text = one empty token
      (5L, "猫 alpha 猫猫")) // multibyte tokens
      .toDF("doc_id", "text")
    val target = Seq((10L, "alpha beta alpha")).toDF("doc_id", "text")
    val sc = TextAnalysis.dsirScorer(raw, target, buckets = 512)
    val native = raw.select(col("doc_id"),
      org.apache.spark.sql.graft.CatalystBridge.dsirScore(
        lower(col("text")), sc).as("swq"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // relational twin: explode -> bucket -> weight join -> sum (the
    // oracle's formulation, over the partial seen-buckets table)
    val w = TextAnalysis.dsirBucketWeights(raw, target, buckets = 512)
    val twin = raw.select(col("doc_id"),
        explode(split(lower(col("text")), " ")).as("t"))
      .select(col("doc_id"),
        floor(Sketch.md5Fraction(concat(lit("ds|"), col("t"))) * 512)
          .cast("long").as("b"))
      .join(w, Seq("b"))
      .groupBy("doc_id").agg(sum("wq").as("swq"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(native == twin, s"native=$native twin=$twin")
    // unseen-token default: a token absent from the raw corpus lands
    // on the cr=0 slot — still a finite, deterministic weight
    val unseen = Seq((9L, "qqqqxyz")).toDF("doc_id", "text")
    val s9 = unseen.select(org.apache.spark.sql.graft.CatalystBridge
      .dsirScore(lower(col("text")), sc)).collect().head.getLong(0)
    assert(s9 != 0L) // some definite weight, computable without the corpus
  }

  test("dsirBucketWeights: bounded by buckets; signs follow the vocab split") {
    import spark.implicits._
    val raw = Seq((1L, "alpha beta zulu yankee")).toDF("doc_id", "text")
    val target = Seq((2L, "alpha beta")).toDF("doc_id", "text")
    val w = TextAnalysis.dsirBucketWeights(raw, target, buckets = 4096)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(w.size == 4) // 4 distinct tokens, no bucket collision here
    // target-vocab buckets score positive, off-target negative
    assert(w.values.count(_ > 0) == 2 && w.values.count(_ < 0) == 2,
      w.toString)
  }

  test("bpeTrain: hand-computed merges, weighted counts, early stop") {
    import spark.implicits._
    // words: aa x3, ab x2, b x1 (dropped: len < 2)
    val docs = Seq((1L, "aa ab aa"), (2L, "ab aa b"))
      .toDF("doc_id", "text")
    val m = TextAnalysis.bpeTrain(docs, merges = 5)
      .orderBy("step").collect()
    // iter1: (a,a)=3 beats (a,b)=2; iter2: only (a,b)=2 remains
    // (aa fully merged); iter3: no pairs left -> early stop at 2 rows
    assert(m.length == 2)
    assert((m(0).getString(1), m(0).getString(2), m(0).getLong(4)) ==
      ("a", "a", 3L))
    assert((m(1).getString(1), m(1).getString(2), m(1).getString(3),
      m(1).getLong(4)) == ("a", "b", "ab", 2L))
  }

  test("bpeTrain: greedy non-overlapping application + lexicographic ties") {
    import spark.implicits._
    val docs = Seq((1L, "aaaa aaa")).toDF("doc_id", "text")
    val m = TextAnalysis.bpeTrain(docs, merges = 2)
      .orderBy("step").collect()
    // iter1: (a,a) appears 3x in aaaa + 2x in aaa = 5; greedy single
    // pass rewrites aaaa -> [aa,aa] (NOT [aa,a,a]) and aaa -> [aa,a]
    assert((m(0).getString(1), m(0).getString(2), m(0).getLong(4)) ==
      ("a", "a", 5L))
    // iter2: pairs (aa,aa)=1 vs (aa,a)=1 — tie breaks to (aa,a)
    assert((m(1).getString(1), m(1).getString(2), m(1).getString(3)) ==
      ("aa", "a", "aaa"))
  }

  test("bpeEncode: docs reassemble in word order; short words dropped") {
    import spark.implicits._
    val docs = Seq((1L, "aab x aa!b aa"), (2L, "x y")).toDF("doc_id", "text")
    // merges learned elsewhere: (a,a) then (aa,b)
    val out = TextAnalysis.bpeEncode(docs,
      Seq(("a", "a"), ("aa", "b"))).orderBy("doc_id").collect()
    // doc 1: "aab"->[aab], "x" dropped (len<2), "aa!b"->"aab"->[aab],
    //        "aa"->[aa]; order preserved
    assert(out.length == 1) // doc 2 has no word >= 2 chars -> absent
    assert((out(0).getLong(0), out(0).getLong(1), out(0).getLong(2),
      out(0).getString(3)) == ((1L, 3L, 3L, "aab aab aa")))
    // piece delimiter visible when a word does NOT fully merge
    val part = TextAnalysis.bpeEncode(
      Seq((1L, "aac")).toDF("doc_id", "text"), Seq(("a", "a")))
      .head.getString(3)
    assert(part == "aa|c")
  }

  test("bpeIndexWrite/Read round-trip: persisted merges == trained merges") {
    import spark.implicits._
    val docs = Seq((1L, "aa ab aa"), (2L, "ab aa b")).toDF("doc_id", "text")
    val p = java.nio.file.Files.createTempDirectory("bpeidx")
      .toString + "/m"
    TextAnalysis.bpeIndexWrite(docs, merges = 5, p)
    val persisted = TextAnalysis.bpeIndexRead(spark, p)
    val trained = TextAnalysis.bpeTrain(docs, merges = 5)
      .orderBy("step").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    assert(persisted == trained && persisted.nonEmpty)
    // artifact-served encode == inline encode
    val a = TextAnalysis.bpeEncodeWith(docs, p).orderBy("doc_id")
      .collect().toSeq
    val b = TextAnalysis.bpeEncode(docs, trained).orderBy("doc_id")
      .collect().toSeq
    assert(a == b)
  }

  test("bpeApply segments a new word with the learned rules in order") {
    import spark.implicits._
    val seg = Seq(("banana")).toDF("w")
      .select(TextAnalysis.bpeApply(col("w"),
        Seq(("a", "n"), ("an", "an"))).as("s"))
      .head.getSeq[String](0)
    // a|n|a|n|a -> b,an,an,a -> b,anan,a
    assert(seg == Seq("b", "anan", "a"))
  }

  test("gopherRules: each published rule trips on its own violation") {
    import spark.implicits._
    val good = (("the quick brown alpha beta gamma delta " * 8) +
      "that have with and be to of end").trim // 64 words, stopword-rich
    val docs = Seq(
      (1L, good),                                   // passes all
      (2L, "too short that the"),                   // n_words < 50
      (3L, ("### " * 60) + good),                   // symbol ratio
      (4L, (1 to 60).map(_ => "12345").mkString(" ") +
        " the that"),                               // alpha ratio (+len)
      (5L, (1 to 12).map(_ => "- bullet line the that")
        .mkString("\n"))                            // bullets (60 words)
    ).toDF("doc_id", "text")
    val r = TextAnalysis.gopherRules(docs).orderBy("doc_id").collect()
    assert(r(0).getBoolean(8), r(0).toString)
    assert(!r(1).getBoolean(8) && r(1).getLong(1) < 50, r(1).toString)
    assert(!r(2).getBoolean(8) &&
      r(2).getDouble(3) > 0.1, r(2).toString)       // symbol_ratio
    assert(!r(3).getBoolean(8) &&
      r(3).getDouble(6) < 0.8, r(3).toString)       // alpha_word_ratio
    assert(!r(4).getBoolean(8) &&
      r(4).getDouble(4) > 0.9, r(4).toString)       // bullet_line_ratio
    // stop-hit counting is exact distinct-of-8
    assert(r(0).getLong(7) == 8L, r(0).toString)
  }

  test("kneserNeyLogLoss: plain-Scala replay, backoff beats flat-OOV, sums to 1") {
    import spark.implicits._
    val train = Seq(
      (0L, "the cat sat on the mat"),
      (2L, "the dog sat on a log"),
      (4L, "a cat and a dog"))
    val score = train ++ Seq(
      (1L, "the cat sat"),          // all bigrams seen
      (3L, "the mat sat"),          // 'mat sat' unseen: backoff fires
      (5L, "zzz qqq"))              // unseen history: flat OOV
    val docs = score.toDF("doc_id", "text")
    val got = TextAnalysis.kneserNeyLogLoss(docs,
        docs.where(col("doc_id") % 2 === 0), oovQMicros = 25000000L)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    // independent replay
    def bigrams(t: String): Seq[(String, String)] = {
      val w = t.toLowerCase.split(" ", -1).toSeq
      if (w.size < 2) Nil else w.zip(w.tail)
    }
    val trainEv = train.flatMap { case (_, t) => bigrams(t) }
    val c12 = trainEv.groupBy(identity).map { case (k, g) =>
      k -> g.size.toLong }
    val c1 = trainEv.groupBy(_._1).map { case (k, g) =>
      k -> g.size.toLong }
    val n1v = c12.keys.toSeq.groupBy(_._1).map { case (k, g) =>
      k -> g.size.toLong }
    val n1w = c12.keys.toSeq.groupBy(_._2).map { case (k, g) =>
      k -> g.size.toLong }
    val b = c12.size.toLong
    def q(v: String, w: String): Long =
      if (!c1.contains(v)) 25000000L
      else {
        val num = math.max(4 * c12.getOrElse((v, w), 0L) - 3, 0L) * b +
          3 * n1v(v) * n1w.getOrElse(w, 0L)
        if (num == 0) 25000000L
        else math.floor(-math.log(num.toDouble /
          (4 * c1(v) * b).toDouble) * 1e6).toLong
      }
    for ((id, t) <- score) {
      val ev = bigrams(t)
      val want = BigDecimal(ev.map { case (v, w) => q(v, w) }.sum
        .toDouble / (1e6 * ev.size))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(got(id) == ((ev.size.toLong, want)),
        s"doc $id: ${got(id)} vs ($want)")
    }
    // doc 3's backoff charge must be cheaper than a flat OOV penalty
    // but costlier than doc 1's all-seen bigrams
    assert(got(1L)._2 < got(3L)._2 && got(3L)._2 < 25.0, got.toString)
    assert(got(5L)._2 == 25.0, got.toString) // pure OOV
    // KN normalization, exactly: for every seen history v,
    // sum over the continuation vocab of num(v,w) == den(v)
    for (v <- c1.keys) {
      val den = 4 * c1(v) * b
      val tot = n1w.keys.toSeq.map { w =>
        math.max(4 * c12.getOrElse((v, w), 0L) - 3, 0L) * b +
          3 * n1v(v) * n1w(w)
      }.sum
      assert(tot == den, s"history '$v': $tot != $den")
    }
  }
}
