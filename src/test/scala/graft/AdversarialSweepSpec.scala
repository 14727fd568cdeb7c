package graft

import org.apache.spark.sql.functions._
import graft.tools.AdvCorpus
import graft.operators.{Dedup, TextAnalysis}

/** The round-15 adversarial cross-engine sweeps, as CI (VERDICT r15 #4
  * — they previously lived only as SCALE.md receipts, and they caught a
  * real bug pre-ship: `concat_ws` swallowing a null token array made a
  * NULL document fingerprint-collide with an EMPTY one).
  *
  * Two layers per corpus:
  *  - semantic row-level assertions on the raw operators (explainable
  *    failures for the adversarial cases each corpus exists for);
  *  - a pinned [[AdvCorpus.resultHash]] per board query, minted from a
  *    run whose outputs were replayed in DuckDB from the dumped
  *    oracle_sql.json (`python3 tools/oracle_check.py <corpus> <dump>
  *    <names>` — 6/6 and 15/15 OK, round 16). A pin mismatch means the
  *    operator's cross-engine-verified behavior CHANGED: re-run the
  *    DuckDB replay before re-minting the pin.
  */
class AdversarialSweepSpec extends SparkSpec {

  private def corpusDir(which: String): String = {
    val dir = java.nio.file.Files
      .createTempDirectory(s"graft-adv-$which").toString
    AdvCorpus.write(spark, dir, which)
    dir
  }

  private lazy val piiDir = corpusDir("pii")
  private lazy val dedupDir = corpusDir("dedup")

  private def docs(dir: String) =
    spark.read.parquet(s"$dir/documents.parquet")

  // ---- PII corpus: semantic assertions ----------------------------

  test("fused PAN at offset 34 of a 76-digit run: embedded window finds it, greedy cut does not") {
    val row = TextAnalysis.piiAudit(docs(piiDir))
      .where(col("doc_id") === 2).head()
    assert(row.getAs[Long]("n_cards_luhn") === 0L)
    assert(row.getAs[Long]("n_cards_embedded") >= 1L)
  }

  test("10k-digit run: the detectors stay exact on a pathological candidate volume") {
    val row = TextAnalysis.piiAudit(docs(piiDir))
      .where(col("doc_id") === 1).head()
    // a repeating 10k-digit decimal necessarily contains Luhn-valid
    // shapes at every granularity: 526 greedy candidates of which 104
    // pass Luhn, and 998 (offset, length) windows pass Luhn ∧ IIN.
    // The exact counts are the cross-engine contract — DuckDB replays
    // the same greedy extraction and window walk bit-for-bit (also
    // covered by the q_pii_audit pin; replayed via oracle_check.py
    // when these values were minted)
    assert(row.getAs[Long]("n_card_candidates") === 526L)
    assert(row.getAs[Long]("n_cards_luhn") === 104L)
    assert(row.getAs[Long]("n_cards_embedded") === 998L)
  }

  test("Luhn boundary pair: invalid 16-digit fails, valid 13-digit Visa passes") {
    val audit = TextAnalysis.piiAudit(docs(piiDir))
    assert(audit.where(col("doc_id") === 13)
      .head().getAs[Long]("n_cards_luhn") === 0L)
    assert(audit.where(col("doc_id") === 17)
      .head().getAs[Long]("n_cards_luhn") === 1L)
  }

  test("Arabic-Indic digits never match the ASCII digit classes") {
    val row = TextAnalysis.piiAudit(docs(piiDir))
      .where(col("doc_id") === 7).head()
    assert(row.getAs[Long]("n_card_candidates") === 0L)
    assert(row.getAs[Long]("n_cards_embedded") === 0L)
  }

  test("sentence segmentation keeps dotted tokens whole across every whitespace class") {
    val all = TextAnalysis.sentences(docs(piiDir)).collect()
      .map(r => r.getLong(0) -> r.getAs[String]("sentence"))
    val sents = all.collect { case (0L, s) => s }
    assert(sents.exists(_.contains("a.user@ex.com")),
      s"email split apart: ${sents.mkString(" | ")}")
    assert(sents.exists(_.contains("10.1.2.3")))
    assert(sents.exists(_.contains("1.2.3 stay whole")))
    // doc 6 mixes the segmenter's split class ([ \t\n\r\f] after a
    // terminator → a cut) with non-splitting whitespace (VT, NBSP,
    // LS, PS, ideographic space stay INSIDE a sentence): exactly the
    // four non-space class members cut (tab/nl/cr/ff), so 5 parts —
    // the doc's NBSP/LS/PS terminators deliberately do not split
    val ws = all.count(_._1 == 6L)
    assert(ws === 5, s"whitespace-class doc split into $ws parts")
    // doc 8 is terminator-only — junk fragments are dropped entirely
    assert(!all.exists(_._1 == 8L), "terminator-only doc leaked a sentence")
  }

  test("phone plausibility ladder: assignment table + published lengths decide, not shape") {
    val row = TextAnalysis.piiAudit(docs(piiDir))
      .where(col("doc_id") === 18).head()
    // six E.164 shapes; exactly three plausible: +7 with a 10-digit
    // NSN, Gibraltar (+350) at the short-NSN floor, and the NANP
    // rule-plausible +12005550123 — the 1-led NANP area code, the
    // unassigned +999 code and the over-length +86 NSN all fail
    assert(row.getAs[Long]("n_phones_e164") === 6L)
    assert(row.getAs[Long]("n_phones_valid") === 3L)
    // the gate agrees with the audit: plausible phones are validated
    // PII, shape-only noise alone is not
    assert(docs(piiDir).where(col("doc_id") === 18)
      .where(TextAnalysis.hasValidatedPii(col("text"))).count() === 1L)
  }

  test("null and empty texts flow through the audit without flagging") {
    val flagged = docs(piiDir)
      .where(col("doc_id").isin(10, 11))
      .where(TextAnalysis.hasValidatedPii(col("text")))
    assert(flagged.head(1).isEmpty)
  }

  // ---- PII corpus: cross-engine pins ------------------------------

  private val piiPins = Map(
    "q_pii_audit" -> "8dae8a500337b579c19b68a23440b05e",
    "q_pii_audit_agg" -> "f11c608df13c68957aad42bec9dd0244",
    "q_pii_sentences" -> "a4295c3d1715ec1c78a7ad9ee3f26b22",
    "q_pii_gate" -> "0125a50c0ca9d67e6d63071d5c61951d",
    "text_sentences" -> "7be6736c10744c02d1ade770cf35bb48",
    "text_pii" -> "bab110d506d85c2867c106f4087abd7b",
    // r16 full-board sweep finds, pinned post-fix (the explicit
    // whitespace class: Java's \s includes \x0B, RE2's does not)
    "q_token_counts" -> "315cd626d9e4702bc24db75a5b05712d",
    "q_tokenizer_fertility" -> "33ff14205685b20cf8eab7d8d897268f",
    "text_html_extract" -> "fb3b02a201413d1d4b3f9431c208823e",
    "q_pack_bpe" -> "38ec3935286656fe62b8ff81a5f52ac4")

  for ((name, pin) <- piiPins.toSeq.sortBy(_._1))
    test(s"pii sweep pin: $name") {
      val got = AdvCorpus.resultHash(
        SparkEntry.queries(name)(spark, piiDir))
      assert(got === pin,
        s"$name diverged from its DuckDB-verified pin — re-run " +
          "tools/oracle_check.py on the pii corpus before re-minting")
    }

  // ---- events corpus: semantic assertions (r16 — this corpus found
  // FOUR real cross-engine divergences on first contact: null-ts
  // events sessionized/versioned by engine null-ordering, a JSON sum
  // with no overflow contract, and a no-match extract the oracle
  // could not cast) ---------------------------------------------------

  private lazy val evDir = corpusDir("events")

  private def evs = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$evDir/events.parquet")
      .withColumn("ts_us", unix_micros(col("ts")))
  }

  test("null-timestamp events are dropped from time-ordered operators, not null-ordered") {
    import graft.operators.{Sessionize, ScdMerge}
    // user 8 has one null-ts click and one timed event: exactly ONE
    // session of ONE event (pre-fix, Spark's nulls-first window made
    // the undated event its own leading session)
    val u8 = Sessionize.sessions(evs, tsCol = "ts_us")
      .where(col("user_id") === 8).collect()
    assert(u8.length === 1 && u8.head.getAs[Long]("n_events") === 1L, u8.mkString)
    // an undated change is never versioned and cannot fake is_current
    val v8 = ScdMerge.scd2FromChangeLog(
        evs.select("user_id", "event_id", "ts_us"),
        "user_id", "ts_us", "event_id")
      .where(col("user_id") === 8).collect()
    assert(v8.length === 1 && v8.head.getAs[Boolean]("is_current"), v8.mkString)
  }

  test("gap exactly at the session threshold stays inside the session") {
    import graft.operators.Sessionize
    // user 4: events at 00:00, 00:30 (gap == 1800 s — NOT >), then
    // +30 m 1 µs (gap > threshold → new session)
    val u4 = Sessionize.sessions(evs, tsCol = "ts_us")
      .where(col("user_id") === 4).orderBy("session_seq").collect()
    assert(u4.map(_.getAs[Long]("n_events")).toSeq === Seq(2L, 1L), u4.mkString)
  }

  test("duplicate timestamps: one zero-duration session, event_id tie-break in versions") {
    import graft.operators.{Sessionize, ScdMerge}
    val u2 = Sessionize.sessions(evs, tsCol = "ts_us")
      .where(col("user_id") === 2).collect()
    assert(u2.length === 1 && u2.head.getAs[Double]("duration_s") === 0.0)
    // three same-instant changes version in event_id order: each
    // valid_to equals the next event's valid_from (zero-width, ordered)
    val v2 = ScdMerge.scd2FromChangeLog(
        evs.select("user_id", "event_id", "ts_us"),
        "user_id", "ts_us", "event_id")
      .where(col("user_id") === 2).orderBy("event_id").collect()
    assert(v2.map(_.getAs[Long]("event_id")).toSeq === Seq(3L, 4L, 5L))
    assert(v2.count(_.getAs[Boolean]("is_current")) === 1)
  }

  test("schema-on-read props: malformed, missing, string and nested k are NULL; 2^62 parses") {
    import org.apache.spark.sql.types.StructType
    val k = evs.where(col("user_id") === 7)
      .select(col("event_id"), from_json(col("props"),
        StructType.fromDDL("k LONG")).getField("k").as("k"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(k(18L).isEmpty, "malformed json must yield NULL k")
    assert(k(19L).isEmpty, "null props must yield NULL k")
    assert(k(20L).isEmpty, "missing k must yield NULL")
    assert(k(21L).isEmpty, "string k must yield NULL")
    assert(k(22L) === Some(4611686018427387904L))
    assert(k(23L).isEmpty, "nested object k must yield NULL")
  }

  test("an undated quote never attaches; an undated probe has no as-of position") {
    import graft.operators.AsOfJoin
    // user 11: click@10:00, an UNDATED click, purchase@11:00, an
    // UNDATED purchase. Backward: the timed click attaches. Forward:
    // the only following candidate is the undated click — NULL must
    // attach (pre-contract, a NULLS-LAST engine would have attached
    // it as "the latest"). The undated probe emits no row at all.
    val ev = evs.where(col("user_id") === 11)
    val purchases = ev.where(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts_us")
    val clicks = ev.where(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts_us"),
        col("event_id").as("click_eid"))
    def run(dir: String) = AsOfJoin.asOf(purchases, clicks, "user_id",
        "ts_us", "ts_us", Seq(("click_eid", "click_id")), "event_id",
        direction = dir)
      .collect().map(r => r.getLong(0) -> Option(r.get(3))).toMap
    val back = run("backward")
    assert(back.keySet === Set(30L), "undated probe must emit no row")
    assert(back(30L) === Some(28L), "backward attaches the timed click")
    val fwd = run("forward")
    assert(fwd(30L).isEmpty, "the undated click must NOT attach forward")
  }

  // ---- events corpus: cross-engine pins (replayed via
  // tools/oracle_check.py on /tmp/advev this round: 14/14 OK) --------

  private val evPins = Map(
    "asof_join_events" -> "7ca0926324a23d940d2684d7ffcd0cb4",
    "asof_join_fwd" -> "72b8a26d9ce5365163f10644d79aee3e",
    "asof_join_nearest" -> "7ca0926324a23d940d2684d7ffcd0cb4",
    "asof_join_slim" -> "7ca0926324a23d940d2684d7ffcd0cb4",
    "sessionize" -> "6a501860e4534d345a3fc3f9959a7618",
    "q_funnel" -> "330a978835a2d1db92070b1604cd4487",
    "q_event_gaps" -> "1235e8fa7544d81a8d96c2e38dea3371",
    "q_event_buckets" -> "cfea8b8dd29b32b4b9410a01b9edd092",
    "q_rate_anomaly" -> "710a39673bd84d97afdfdfcabfb051fd",
    "q_rate_acf" -> "b0a2033c698251b3f5c8a36a5becffe7",
    "q_resample_gaps" -> "e7688f68a242a4d775020f4b0572e83e",
    "scd2_reconstruct" -> "7ec09cbcd001a156034c5a2a4dd695be",
    "scd2_snapshot" -> "ab3112eec75463b38341ad50286acf16",
    "q_json_props" -> "c619114c2cf48ba365ffafda04f2efcf",
    // r16 follow-up finds, pinned post-fix (seed ∩ nodes teleport
    // renormalization; non-finite values have no bin)
    "q_graph_ppr" -> "1118fb9b744fb51eb50045cf3ce106cf",
    "q_histogram" -> "40caee3a9a34b3f0a186f94c4d84084e")

  for ((name, pin) <- evPins.toSeq.sortBy(_._1))
    test(s"events sweep pin: $name") {
      val got = AdvCorpus.resultHash(
        SparkEntry.queries(name)(spark, evDir))
      assert(got === pin,
        s"$name diverged from its DuckDB-verified pin — re-run " +
          "tools/oracle_check.py on the events corpus before re-minting")
    }

  // ---- cust corpus: semantic assertions (r16 — the fifth sweep
  // member, the REFERENCE's own replay semantics; found five
  // divergences on first contact: ntile null ordering, round's signed
  // zero, a NOT-IN null-key drop, and the keyed-diff cross-pairing) --

  private lazy val custDir = corpusDir("cust")

  private def cust = spark.read.parquet(s"$custDir/customer.parquet")

  test("SCD replay contracts on degenerate rows: NULL predicate keeps (O10), NULL arithmetic stays NULL, boundary exact") {
    import graft.scd.ScdReader
    val log = "UPDATE customer SET c_acctbal = c_acctbal + 100 " +
      "WHERE c_mktsegment = 'BUILDING';\n" +
      "DELETE FROM customer WHERE c_acctbal < 0;\n"
    val out = ScdReader.applyLogText(spark, cust, log, None)
      .collect().map(r => Option(r.get(0)) ->
        (Option(r.get(3)), Option(r.get(4)))).toMap
    // O10: the NULL-balance row survives DELETE (NULL predicate keeps)
    assert(out.contains(Some(2L)), "NULL-balance row must survive DELETE")
    assert(out(Some(2L))._1.isEmpty, "NULL + 100 must stay NULL")
    // the UPDATE lifts -100 exactly to the threshold: < 0 keeps it
    assert(out.contains(Some(9L)))
    assert(out(Some(9L))._1 === Some(0.0))
    // genuinely negative rows are gone; quotes in values never parse
    assert(!out.contains(Some(8L)))
    assert(!out.contains(Some(1L)))
    // the NULL-key row flows through untouched (FURNITURE, no match)
    assert(out.contains(None))
  }

  test("snapshotDiff never fabricates U from ambiguous identities") {
    import graft.operators.ScdMerge
    // key 5 is duplicated and UNCHANGED between the snapshots; the
    // NULL-key row is unchanged too — the diff must emit NOTHING for
    // either (the naive full-outer cross-paired the duplicates into
    // two U rows whose post-images were each other's siblings)
    val after = cust.withColumn("c_acctbal",
      when(col("c_custkey") === 0, col("c_acctbal") + 100)
        .otherwise(col("c_acctbal")))
    val d = ScdMerge.snapshotDiff(cust, after, "c_custkey").collect()
    assert(d.length === 1, d.mkString("; "))
    assert(d.head.getString(0) === "U" && d.head.getLong(1) === 0L)
    // a duplicate key whose MULTISET really changes degrades to
    // full-row D/I, never U
    val after2 = cust.withColumn("c_name",
      when(col("c_custkey") === 5 && col("c_name") === "dup one",
        lit("dup one v2")).otherwise(col("c_name")))
    val d2 = ScdMerge.snapshotDiff(cust, after2, "c_custkey")
      .collect().map(r => (r.getString(0), r.getAs[String]("c_name")))
    assert(d2.toSet === Set(("D", "dup one"), ("I", "dup one v2")),
      d2.mkString("; "))
  }

  test("a keyed merge can never touch a NULL-key base row") {
    import graft.operators.ScdMerge
    val updates = cust.where(col("c_custkey") === 0)
      .withColumn("c_acctbal", col("c_acctbal") + 500)
    val merged = ScdMerge.upsert(cust, updates, "c_custkey")
    assert(merged.where(col("c_custkey").isNull).count() === 1L,
      "the NULL-key base row must survive the merge")
    assert(merged.count() === cust.count())
  }

  // ---- cust corpus: cross-engine pins (replayed via
  // tools/oracle_check.py on /tmp/advcust this round: 27/27 OK; note
  // the seven as-of-NOW surfaces hash-identical, and the four
  // as-of-PAST surfaces likewise) ------------------------------------

  private val custPins = Map(
    "q_above_avg" -> "c226535dbd467495a07fd6d218f6d38a",
    "q_ntile" -> "c98b12f46d365cd5a04b35b7d83a0573",
    "q_profile" -> "8d35429ce98ccca4c6890e4bea0814fb",
    "q_registrable_domain" -> "37318636d5e3318d765abb410c8c378c",
    "q_rollup" -> "2fa400df8cf8344f51b6f2d589836f37",
    "q_string_agg" -> "78401e7dbe17dd480f72ae2a4e79fe5a",
    "q_url_canonical" -> "e8e47f0a08fea8cd7b0bb6c18a34affe",
    "scd_asof_future" -> "8c8fd786dde84b7488386ac65119ebf2",
    "scd_asof_now" -> "8c8fd786dde84b7488386ac65119ebf2",
    "scd_asof_past" -> "44a2977d4e268ff66937447f850a3bb6",
    "scd_catalog_travel" -> "44a2977d4e268ff66937447f850a3bb6",
    "scd_cdc_stmt" -> "c57d220833c25917744971b9aeed1599",
    "scd_compact" -> "8c8fd786dde84b7488386ac65119ebf2",
    "scd_diff" -> "a465f600d24fc2d3f42ed50968ba5b96",
    "scd_disabled" -> "3aba2133b024e22ca5dc63063eceab1c",
    "scd_history" -> "96c323ec44f4cd0a5939d7f30dd7e72c",
    "scd_log_feed" -> "2e34f2a3cbfe34a04e5e9f7fedad16af",
    "scd_log_stats" -> "daa74283173740425abb8e863c9c7970",
    "scd_merge_upsert" -> "dd257377ac5473eda833cd68e18824f9",
    "scd_partitioned" -> "8c8fd786dde84b7488386ac65119ebf2",
    "scd_sequential" -> "515e7b1c232b98a0079b5801bb9447e4",
    "scd_sidecar" -> "8c8fd786dde84b7488386ac65119ebf2",
    "scd_sql_add_update" -> "8c8fd786dde84b7488386ac65119ebf2",
    "scd_sql_conf" -> "44a2977d4e268ff66937447f850a3bb6",
    "scd_sql_source" -> "8c8fd786dde84b7488386ac65119ebf2",
    "scd_sql_view" -> "44a2977d4e268ff66937447f850a3bb6",
    "text_normalize" -> "4be838231fa09d73d3ef6e114798730e")

  for ((name, pin) <- custPins.toSeq.sortBy(_._1))
    test(s"cust sweep pin: $name") {
      val got = AdvCorpus.resultHash(
        SparkEntry.queries(name)(spark, custDir))
      assert(got === pin,
        s"$name diverged from its DuckDB-verified pin — re-run " +
          "tools/oracle_check.py on the cust corpus before re-minting")
    }

  // ---- dedup corpus: semantic assertions --------------------------

  test("NULL text fingerprints NULL; EMPTY text fingerprints non-null (absent != empty)") {
    val byId = docs(dedupDir)
      .select(col("doc_id"),
        TextAnalysis.fingerprint(col("text")).as("fp"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(byId(7L).isEmpty, "null text must fingerprint NULL")
    assert(byId(8L).nonEmpty, "empty text must fingerprint non-null")
    assert(byId(0L) === byId(1L), "exact dups must collide")
    assert(byId(0L) !== byId(12L), "near-dups must not collide")
  }

  test("containment finds the doc inside its 50x container, directed") {
    val pairs = Dedup.containmentJoin(
        docs(dedupDir).select(col("doc_id"), col("text")),
        w = 3, threshold = 0.8)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((2L, 3L)),
      s"containment missed the 50x pair: $pairs")
  }

  test("sub-width, null and empty texts produce no shingle pairs and no errors") {
    val pairs = Dedup.containmentJoin(
        docs(dedupDir).select(col("doc_id"), col("text")),
        w = 3, threshold = 0.1)
      .select("id_a", "id_b").collect()
      .flatMap(r => Seq(r.getLong(0), r.getLong(1))).toSet
    assert(!pairs.exists(Set(7L, 8L, 9L)),
      s"degenerate docs surfaced in pairs: $pairs")
  }

  // ---- dedup corpus: cross-engine pins -----------------------------

  // ---- tokenizer corpus: semantic assertions (r16) ------------------

  private lazy val tokDir = corpusDir("tok")

  test("tokenizer training never sees oracle-delimiter or non-[a-z0-9] bytes") {
    // doc 8 is pipe soup and doc 2/3 clean to nothing/latin residue —
    // the trained merge symbols must be pure [a-z0-9] (a literal '|'
    // reaching a symbol would forge the DuckDB replay's '|sym|'
    // encoding; the cleaning strip is what makes the oracle sound)
    val merges = TextAnalysis.bpeTrain(docs(tokDir), merges = 3)
      .collect()
    assert(merges.nonEmpty)
    merges.foreach { r =>
      val m = r.getAs[String]("merged")
      assert(m.matches("[a-z0-9]+"), s"non-clean merge symbol: '$m'")
    }
  }

  test("10k-char single word flows through bpe inference bounded and intact") {
    val merges = TextAnalysis.bpeTrain(docs(tokDir), merges = 3)
      .orderBy("step").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val row = TextAnalysis.bpeEncode(docs(tokDir), merges)
      .where(col("doc_id") === 1).head()
    // "start" + the 10k-a word + "end": the repeated-letter word must
    // survive the native one-pass scan as ONE word whose pieces
    // reassemble to the original 10000 chars
    assert(row.getAs[Long]("n_words") === 3L)
    val seg = row.getAs[String]("segmented")
    assert(seg.replace(" ", "").length >= 10000 + 8)
  }

  // ---- tokenizer corpus: cross-engine pins (replayed via
  // tools/oracle_check.py on /tmp/advtok this round: 14/14 OK) -------

  private val tokPins = Map(
    "text_bpe_train" -> "c45ecd577854b84b8315f7de89c07191",
    "text_bpe_encode" -> "612e8ac2e60fc989794be3adb4acee61",
    "text_bpe_indexed" -> "612e8ac2e60fc989794be3adb4acee61",
    "text_wordpiece" -> "725c3c7f172be1b948bafa4b56728e2e",
    "text_unigram_train" -> "d2985b39f5bffacfa14befed239f1247",
    "text_unigram_train2" -> "d2985b39f5bffacfa14befed239f1247",
    "text_unigram_train3" -> "aebd253d4504bfb4c89f12af6f30fdf9",
    "text_unigram_encode" -> "2058b0afc56ff6c2f921c2099df4fc5f",
    "q_token_counts" -> "597493b4096d75871552694a8e1e6854",
    "q_tokenizer_fertility" -> "0971937b1d3cd1ad5bb4e9986b3e0fa8",
    "text_vocab_oov" -> "f5eef8b85dfa6d94f5c824d6626a6bbf",
    "text_perplexity" -> "ff19cff5438a920ba53e9147526c102e",
    "text_perplexity_bigram" -> "930344a1a641cc42e7fac7b61c7267ef",
    "text_perplexity_kn" -> "80157315ed8bceaf752a85ceaa7f85b6",
    // r16 full-board sweep finds, pinned post-fix (NULL-doc langid
    // argmax, null-doc chunks, null n_stop_hits, zero-mass strata,
    // null-label training exclusion, embed doc grid, the binned gates
    // downstream of the classifier prior)
    "text_langid" -> "e125fd50a63b9031e188088758fc5f80",
    "q_chunk_text" -> "2f818eafb1ca05e3919e68472bd253e8",
    "q_chunk_sliding" -> "bbdaef037cbfdd40658822e934d16402",
    "text_gopher_rules" -> "51eaebf9ce4690afad2dafd1e11d01b7",
    "q_source_gini" -> "53697fda88d1f543cc9af31b3f42f71a",
    "q_source_pareto" -> "1deddf7b632bb40fde4225854c137308",
    "text_classify" -> "834d3b938058e78c856aeb3a34ac936b",
    "text_embed" -> "a4bd6b518caef35cce4ede4a8039bdaa",
    "q_gate_ece" -> "0153f0a6bc266f3a0f05bc13703c1fcf",
    "q_gate_reliability" -> "0aac41f868db82911dc96624ea75c4ca")

  for ((name, pin) <- tokPins.toSeq.sortBy(_._1))
    test(s"tok sweep pin: $name") {
      val got = AdvCorpus.resultHash(
        SparkEntry.queries(name)(spark, tokDir))
      assert(got === pin,
        s"$name diverged from its DuckDB-verified pin — re-run " +
          "tools/oracle_check.py on the tok corpus before re-minting")
    }

  private val dedupPins = Map(
    "dedup_exact" -> "f7b862e3b817f0a0ef429e80d15a360e",
    "dedup_scrub" -> "17674228461c4656add9350dd3862e5b",
    "dedup_survivor" -> "66a4c5e2d68ec6fd9f9c92db99a27867",
    "dedup_winnow" -> "e4b10322ef7f78fe54cac709bcb2c466",
    "dedup_simhash" -> "4d0f98eb3f02a3ef4ba49d0be594d236",
    "dedup_spans" -> "b82f500bdb8705a50ffc8e440c249bb0",
    "dedup_minhash_lsh" -> "a63bd93e0572211f64f51bd9492c3c67",
    "dedup_jaccard_join" -> "a63bd93e0572211f64f51bd9492c3c67",
    "dedup_jaccard_indexed" -> "a63bd93e0572211f64f51bd9492c3c67",
    "dedup_jaccard_pairs_1k" -> "a63bd93e0572211f64f51bd9492c3c67",
    "dedup_containment" -> "e67615a1398128b9ea34db1f39a64839",
    "dedup_containment_indexed" -> "e67615a1398128b9ea34db1f39a64839",
    "dedup_cc" -> "772baf5b3ef68ac6a5a6c99530bb4a0e",
    "text_fingerprint" -> "0a22bea58c0f7161ffcbee6845d005fb",
    "text_line_dedup" -> "43ea4492fba94d9bba76c66382ef62a3")

  for ((name, pin) <- dedupPins.toSeq.sortBy(_._1))
    test(s"dedup sweep pin: $name") {
      val got = AdvCorpus.resultHash(
        SparkEntry.queries(name)(spark, dedupDir))
      assert(got === pin,
        s"$name diverged from its DuckDB-verified pin — re-run " +
          "tools/oracle_check.py on the dedup corpus before re-minting")
    }

  // ---- stream corpus (r17): watermark-edge / late-row / restart
  // semantics replayed against batch twins. First contact found TWO
  // real hazards: a NULL event time CRASHED sessionizeStream and
  // latestPerKeyStateful (NPE inside the state function — both now
  // filter, matching the r16 null-has-no-position batch contract),
  // and an event timestamped EXACTLY at the watermark is already
  // late (the boundary is drop-inclusive) — now documented. --------

  private lazy val streamDir = corpusDir("stream")

  /** corpus rows as (event_id, Option[sec], user_id) per feed. */
  private def feeds: Map[Int, Seq[(Long, Option[Long], Long)]] =
    spark.read.parquet(s"$streamDir/stream_events.parquet").collect()
      .map(r => (r.getInt(3), (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)), r.getLong(2))))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq.sortBy(_._1)).toMap

  private def tOf(sec: Long) = new java.sql.Timestamp(sec * 1000L)

  /** The batch twin over a chosen row subset, as comparable tuples. */
  private def batchSessions(
      rows: Seq[(Long, Option[Long], Long)]): Set[(Long, Long, Long, Long)] = {
    import spark.implicits._
    val df = rows.map { case (id, sec, u) =>
      (id, sec.map(tOf).orNull, u) }.toDF("event_id", "ts", "user_id")
    graft.operators.Sessionize.sessions(df, gapSeconds = 60)
      .where(col("user_id") =!= 9L)
      .select("user_id", "start_us", "end_us", "n_events").collect()
      .map(r => (r.getLong(0), r.getLong(1) / 1000000L,
        r.getLong(2) / 1000000L, r.getLong(3))).toSet
  }

  /** Run sessionizeStream over the corpus feeds (plus two clock
    * batches that flush every open session), optionally stopping and
    * restarting from the checkpoint between feeds 2 and 3. */
  private def streamSessions(name: String,
      restart: Boolean): Set[(Long, Long, Long, Long)] = {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val ckpt = java.nio.file.Files
      .createTempDirectory(s"sweepck-$name").toString
    // parquet sink, not memory: the memory sink cannot recover from a
    // checkpoint, and the restart leg is the point of this harness
    val outDir = java.nio.file.Files
      .createTempDirectory(s"sweepout-$name").toString
    val ms = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Option[java.sql.Timestamp])]
    def start() = graft.streaming.ScdStream.sessionizeStream(
        ms.toDF().toDF("user_id", "ts"), "user_id", "ts",
        gapSeconds = 60, watermarkDelay = "10 seconds")
      .writeStream.format("parquet").option("path", outDir)
      .option("checkpointLocation", ckpt).outputMode("append").start()
    def add(fd: Int): Unit =
      ms.addData(feeds(fd).map { case (_, sec, u) => (u, sec.map(tOf)) })
    var q = start()
    try {
      add(1); q.processAllAvailable()
      add(2); q.processAllAvailable()
      if (restart) { q.stop(); q = start() }
      add(3); q.processAllAvailable()
      // clock batches: advance the watermark past every flush deadline
      ms.addData(Seq((9L, Some(tOf(5000))))); q.processAllAvailable()
      ms.addData(Seq((9L, Some(tOf(6000))))); q.processAllAvailable()
    } finally q.stop()
    spark.read.parquet(outDir).where(col("user_id") =!= 9L).collect()
      .map(r => (r.getLong(0), r.getLong(1) / 1000000L,
        r.getLong(2) / 1000000L, r.getLong(3))).toSet
  }

  test("stream sweep: watermark edges vs the batch twin — late AND at-watermark rows drop, nulls don't crash") {
    val got = streamSessions("sweep_sess", restart = false)
    // the pinned drop set: 3 (late beyond), 4 (EXACTLY at the
    // watermark — the boundary is drop-inclusive), 7 (late), 10 (null)
    val dropped = Set(3L, 4L, 7L, 10L)
    val kept = feeds.values.flatten.toSeq.filterNot(r => dropped(r._1))
    assert(got == batchSessions(kept),
      s"stream != batch-twin-minus-drops: $got")
    // and the drops MATTER: the full batch replay differs exactly by
    // the late extensions (u1 absorbs 1040; u2 starts at 1990 and
    // gains a 2985 singleton) — the documented divergence
    val full = batchSessions(feeds.values.flatten.toSeq)
    assert(full != got)
    assert(full == Set((1L, 1000L, 1040L, 3L), (2L, 1990L, 1995L, 2L),
      (2L, 2985L, 2985L, 1L), (3L, 3100L, 3100L, 2L)), full.toString)
  }

  test("stream sweep: restart from checkpoint mid-corpus equals the uninterrupted run") {
    val uninterrupted = streamSessions("sweep_sess_a", restart = false)
    val restarted = streamSessions("sweep_sess_b", restart = true)
    assert(restarted == uninterrupted,
      s"restart diverged: $restarted vs $uninterrupted")
  }

  test("stream sweep: latestPerKeyStateful drops null-ts rows instead of crashing; agrees with the batch twin") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val ms = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, java.lang.Long, String)]
    val out = graft.streaming.ScdStream.latestPerKeyStateful(
      ms.toDF().toDF("k", "ts", "v"), "k", "ts")
    val q = out.writeStream.format("memory").queryName("sweep_latest")
      .outputMode("update").start()
    try {
      ms.addData((1L, 10L, "a"), (1L, null, "null-ts"), (2L, 5L, "b"))
      q.processAllAvailable()
      ms.addData((1L, 10L, "tie"), (2L, null, "null-again"))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("sweep_latest").groupBy("k")
      .agg(max_by(col("v"), col("ts")).as("v")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // batch twin (max_by skips NULL ordering keys); the ts=10 tie is
    // last-write-wins in the stateful form (maxBy keeps the FIRST max
    // — state arrived before the tie, so "a" survives)
    assert(got(2L) == "b" && Set("a", "tie")(got(1L)), got.toString)
  }

  // ---- layout corpus (r17): zone-map staleness / unindexed /
  // missing-file / NULL- and non-finite-stats hazards, and the
  // verify -> refresh/append heal lifecycle ------------------------

  import graft.operators.Layout

  /** A fresh mutable copy of the corpus table (the sweep perturbs
    * files in place). */
  private def layoutCopy(): String = {
    val src = corpusDir("layout")
    s"$src/layout_table"
  }

  private def man(path: String) = spark.read.parquet(path)

  private def fullScan(dir: String, residual: org.apache.spark.sql.Column) =
    spark.read.parquet(dir).where(residual).collect()
      .map(_.getString(2)).toSet

  private def statuses(dir: String, mp: String): Map[String, String] =
    Layout.zoneMapVerify(spark, dir, Seq("k"), mp).collect()
      .map(r => (r.getString(0).split('/').last, r.getString(1))).toMap

  test("layout sweep: NULL-stats and non-finite-stats files are never wrongly skipped") {
    val dir = layoutCopy()
    val mp = s"$dir/../zm"
    Layout.zoneMapWrite(spark, dir, Seq("k", "x"), mp)
    // k-range query: the all-NULL-k file is skipped SOUNDLY — not by
    // a NULL comparison (which proves nothing) but by the explicit
    // nulls = rows term (no non-null value exists to match a range);
    // the result still equals the full scan because NULL k cannot
    // pass the residual either
    val keepK = Layout.rangeKeep("k", lit(0L), lit(9L))
    val files = Layout.prunedFiles(man(mp), keepK)
    assert(files.exists(_.endsWith("f0.parquet")), files.toString)
    assert(!files.exists(_.endsWith("f2.parquet")), files.toString)
    assert(!files.exists(_.endsWith("f1.parquet")), files.toString)
    val resK = col("k").between(0L, 9L)
    assert(Layout.skipScan(spark, dir, man(mp), keepK, resK)
      .collect().map(_.getString(2)).toSet == fullScan(dir, resK))
    // an IS NULL probe keeps EXACTLY the null-bearing file
    val nf = Layout.prunedFiles(man(mp), Layout.nullKeep("k"))
    assert(nf.length == 1 && nf.head.endsWith("f2.parquet"), nf.toString)
    // x-range query over the NaN/-0.0 file: result == full scan
    val res = col("x") >= 0.0 && col("x") <= 20.0
    val got = Layout.skipScan(spark, dir, man(mp),
      Layout.rangeKeep("x", lit(0.0), lit(20.0)), res)
      .collect().map(_.getString(2)).toSet
    assert(got == fullScan(dir, res), got.toString)
  }

  test("layout sweep: in-place rewrite -> stale row detected, skipScan hazard is real, refresh heals") {
    val dir = layoutCopy()
    val mp = s"$dir/../zm2"
    Layout.zoneMapWrite(spark, dir, Seq("k"), mp)
    // rewrite f1 IN PLACE with keys far outside its recorded range
    import spark.implicits._
    val tmp = s"$dir/../_rw"
    (500L to 509L).map(k => (k, k * 1.0, s"w$k")).toDF("k", "x", "s")
      .coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .find(_.getName.endsWith(".parquet")).get
    java.nio.file.Files.move(part.toPath,
      java.nio.file.Paths.get(dir, "f1.parquet"),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    // verify pinpoints EXACTLY the rewritten file
    val st = statuses(dir, mp)
    assert(st("f1.parquet") == "stale" &&
      st.filterKeys(_ != "f1.parquet").values.forall(_ == "ok"), st.toString)
    // the documented hazard: a stale manifest WRONGLY SKIPS the
    // rewritten file (this is WHY verify exists)
    val res = col("k") === 505L
    val stale = Layout.skipScan(spark, dir, man(mp),
      Layout.rangeKeep("k", lit(505L), lit(505L)), res)
    assert(stale.count() == 0 && fullScan(dir, res) == Set("w505"))
    // refresh does NOT heal stale rows — it diffs PATHS, and the
    // rewritten file's path is unchanged (the pinned contract: verify
    // detects, REBUILD heals; refresh is for add/remove only)
    Layout.zoneMapRefresh(spark, dir, mp)
    assert(statuses(dir, mp)("f1.parquet") == "stale")
    Layout.zoneMapWrite(spark, dir, Seq("k"), mp)
    val healed = Layout.skipScan(spark, dir, man(mp),
      Layout.rangeKeep("k", lit(505L), lit(505L)), res)
      .collect().map(_.getString(2)).toSet
    assert(healed == Set("w505"), healed.toString)
  }

  test("layout sweep: unindexed and missing files — detected, invisible-or-loud, then healed") {
    val dir = layoutCopy()
    val mp = s"$dir/../zm3"
    Layout.zoneMapWrite(spark, dir, Seq("k"), mp)
    // an ingest lands WITHOUT zoneMapAppend: invisible to skip scans
    import spark.implicits._
    val tmp = s"$dir/../_new"
    (300L to 309L).map(k => (k, k * 1.0, s"v$k")).toDF("k", "x", "s")
      .coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .find(_.getName.endsWith(".parquet")).get
    java.nio.file.Files.move(part.toPath,
      java.nio.file.Paths.get(dir, "f4.parquet"))
    assert(statuses(dir, mp)("f4.parquet") == "unindexed")
    val res = col("k").between(300L, 309L)
    assert(Layout.skipScan(spark, dir, man(mp),
      Layout.rangeKeep("k", lit(300L), lit(309L)), res).count() == 0)
    Layout.zoneMapAppend(spark, dir, Seq("k"), mp)
    assert(Layout.skipScan(spark, dir, man(mp),
      Layout.rangeKeep("k", lit(300L), lit(309L)), res).count() == 10)
    // a file deleted without refresh: verify says missing; the skip
    // scan that selects it fails LOUD (never silently empty)
    assert(new java.io.File(dir, "f0.parquet").delete())
    assert(statuses(dir, mp)("f0.parquet") == "missing")
    intercept[Exception] {
      Layout.skipScan(spark, dir, man(mp),
        Layout.rangeKeep("k", lit(0L), lit(9L)),
        col("k").between(0L, 9L)).count()
    }
    Layout.zoneMapRefresh(spark, dir, mp)
    assert(!statuses(dir, mp).contains("f0.parquet"))
  }

  test("layout sweep: optimize is re-runnable — a second (racing-loser) run neither duplicates nor drops rows") {
    val dir = layoutCopy()
    val rows0 = spark.read.parquet(dir).collect()
      .map(r => (if (r.isNullAt(0)) -1L else r.getLong(0), r.getString(2)))
      .sorted.toSeq
    Layout.optimize(spark, dir, Seq(col("k")), targetBytes = 1L << 20)
    val rows1 = spark.read.parquet(dir).collect()
      .map(r => (if (r.isNullAt(0)) -1L else r.getLong(0), r.getString(2)))
      .sorted.toSeq
    assert(rows1 == rows0, "first optimize changed the data")
    Layout.optimize(spark, dir, Seq(col("k")), targetBytes = 1L << 20)
    val rows2 = spark.read.parquet(dir).collect()
      .map(r => (if (r.isNullAt(0)) -1L else r.getLong(0), r.getString(2)))
      .sorted.toSeq
    assert(rows2 == rows0, "second optimize changed the data")
  }
}
