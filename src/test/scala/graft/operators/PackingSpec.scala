package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PackingSpec extends SparkSpec {

  private def docs = {
    import spark.implicits._
    // shard A: 4+4+4 tokens; budget 10 -> doc 3 starts at offset 8
    // (straddles into chunk 0..1 boundary: chunk of its FIRST token = 0)
    Seq(
      (1L, "a", "t t t t"),
      (2L, "a", "t t t t"),
      (3L, "a", "t t t t"),
      (4L, "a", "t t t t"), // starts at 12 -> chunk 1
      (5L, "b", "t t t t t t t t t t t"), // 11 tokens, starts at 0 -> chunk 0
      (6L, "b", "t t")) // starts at 11 -> chunk 1
      .toDF("doc_id", "shard", "text")
  }

  test("packByOffset: offsets cumulative per shard, chunk = first-token window") {
    val got = Packing.packByOffset(docs, col("shard"), col("doc_id"),
        maxTokens = 10)
      .select("doc_id", "n_tokens", "start_offset", "chunk_id")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got(1L) == ((4L, 0L, 0L)))
    assert(got(2L) == ((4L, 4L, 0L)))
    assert(got(3L) == ((4L, 8L, 0L))) // straddles; assigned to chunk 0
    assert(got(4L) == ((4L, 12L, 1L)))
    assert(got(5L) == ((11L, 0L, 0L)))
    assert(got(6L) == ((2L, 11L, 1L)))
  }

  test("chunkStats: fill and overflow per chunk") {
    val packed = Packing.packByOffset(docs, col("shard"), col("doc_id"),
      maxTokens = 10)
    val got = Packing.chunkStats(packed, col("shard"), maxTokens = 10)
      .select("shard", "chunk_id", "n_docs", "n_tokens", "overflow")
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // shard a chunk 0: docs 1-3, 12 tokens, 2 overflow past offset 10
    assert(got(("a", 0L)) == ((3L, 12L, 2L)))
    assert(got(("a", 1L)) == ((1L, 4L, 0L)))
    // shard b chunk 0: one 11-token doc, 1 token overflow
    assert(got(("b", 0L)) == ((1L, 11L, 1L)))
    assert(got(("b", 1L)) == ((1L, 2L, 0L)))
  }

  test("packSegments: straddle split has exact ranges; windows fill to budget") {
    import spark.implicits._
    val got = Packing.packSegments(docs, col("shard"), col("doc_id"),
        maxTokens = 10)
      .select("doc_id", "chunk_id", "seg_idx", "tok_start", "tok_end",
        "n_seg_tokens")
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    // doc 3 (shard a, offset 8, 4 tokens): 2 in window 0, 2 in window 1
    assert(got((3L, 0L)) == ((0L, 0L, 2L, 2L)))
    assert(got((3L, 1L)) == ((1L, 2L, 4L, 2L)))
    // doc 5 (shard b, offset 0, 11 tokens): 10 + 1
    assert(got((5L, 0L)) == ((0L, 0L, 10L, 10L)))
    assert(got((5L, 1L)) == ((1L, 10L, 11L, 1L)))
    // non-straddling docs emit exactly one whole-doc segment
    assert(got((1L, 0L)) == ((0L, 0L, 4L, 4L)))
    assert(got((4L, 1L)) == ((0L, 0L, 4L, 4L)))
    assert(got((6L, 1L)) == ((0L, 0L, 2L, 2L)))

    // invariants on the full table: every doc's segments concatenate
    // back to the doc; every non-final window per shard fills to 10
    val seg = Packing.packSegments(docs, col("shard"), col("doc_id"),
      maxTokens = 10)
    val perDoc = seg.groupBy("doc_id")
      .agg(sum("n_seg_tokens").as("s"), min("tok_start").as("lo"),
        max("tok_end").as("hi"))
      .join(Packing.packByOffset(docs, col("shard"), col("doc_id"),
        maxTokens = 10).select("doc_id", "n_tokens"), "doc_id")
      .where(col("s") =!= col("n_tokens") || col("lo") =!= 0 ||
        col("hi") =!= col("n_tokens"))
    assert(perDoc.count() == 0, "doc reassembly broken")
    val fills = seg.groupBy("shard", "chunk_id")
      .agg(sum("n_seg_tokens").as("fill"))
    val lastPer = fills.groupBy("shard")
      .agg(max("chunk_id").as("last"))
    val nonLast = fills.join(lastPer, "shard")
      .where(col("chunk_id") < col("last") && col("fill") =!= 10)
    assert(nonLast.count() == 0, "non-final window not exactly full")
  }

  test("packSegments: zero-token docs emit no segment") {
    import spark.implicits._
    // split('') yields [""] = 1 token in tokenCount; a truly 0-token
    // doc needs null-ish text — pin the documented n>0 guard via a
    // doc whose tokenCount is 0 only if tokens() says so
    val d = Seq((1L, "a", "x y"), (2L, "a", "")).toDF("doc_id", "shard", "text")
    val n = d.select(TextAnalysis.tokenCount(col("text")).as("n"))
      .collect().map(_.getInt(0)).toSeq
    // fixture sanity: "" tokenizes to one empty token, so BOTH docs
    // emit; the zero-row path is unreachable from tokenCount and the
    // guard protects only hand-fed n_tokens=0 rows
    assert(n == Seq(2, 1), n.toString)
    val segs = Packing.packSegments(d, col("shard"), col("doc_id"),
      maxTokens = 10)
    assert(segs.count() == 2)
  }

  test("packByOffsetWith: caller-supplied counters — precomputed column and bpeish both pack") {
    import spark.implicits._
    val d = Seq(
      (1L, "a", "word word", 7L),   // precomputed says 7, whitespace says 2
      (2L, "a", "x, y!", 3L),       // bpeish says 4 (x , y !), whitespace 2
      (3L, "a", "z", 10L))
      .toDF("doc_id", "shard", "text", "n_pre")
    // precomputed column drives offsets verbatim
    val pre = Packing.packByOffsetWith(d, col("shard"), col("doc_id"),
        col("n_pre"), maxTokens = 10)
      .select("doc_id", "n_tokens", "start_offset", "chunk_id")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(pre(1L) == ((7L, 0L, 0L)))
    assert(pre(2L) == ((3L, 7L, 0L)))
    assert(pre(3L) == ((10L, 10L, 1L)))
    // bpeish counter: punctuation splits off as its own pieces
    val bp = Packing.packByOffsetWith(d, col("shard"), col("doc_id"),
        TextAnalysis.bpeishTokenCount(col("text")), maxTokens = 10)
      .select("doc_id", "n_tokens").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(bp == Map(1L -> 2L, 2L -> 4L, 3L -> 1L), bp.toString)
    // the default whitespace form IS the With form under tokenCount
    val a = Packing.packByOffset(docs, col("shard"), col("doc_id"),
      maxTokens = 10).select("doc_id", "chunk_id").collect().toSeq
    val b = Packing.packByOffsetWith(docs, col("shard"), col("doc_id"),
      TextAnalysis.tokenCount(col("text")), maxTokens = 10)
      .select("doc_id", "chunk_id").collect().toSeq
    assert(a == b)
  }

  test("chunkText: window texts are exact token slices that reassemble the shard") {
    import spark.implicits._
    val d = Seq(
      (1L, "a", "w1 w2 w3 w4"),
      (2L, "a", "x1 x2 x3 x4"),
      (3L, "a", "y1 y2 y3 y4"),        // straddles at offset 8
      (4L, "b", "z1 z2 z3 z4 z5 z6 z7 z8 z9 z10 z11")) // 11: 10 + 1
      .toDF("doc_id", "shard", "text")
    val got = Packing.chunkText(d, col("shard"), col("doc_id"),
        maxTokens = 10)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getString(4))).toMap
    // shard a window 0: docs 1, 2 whole + doc 3's first 2 tokens
    assert(got(("a", 0L)) == ((3L, 10L, "w1 w2 w3 w4 x1 x2 x3 x4 y1 y2")),
      got(("a", 0L)).toString)
    assert(got(("a", 1L)) == ((1L, 2L, "y3 y4")), got(("a", 1L)).toString)
    assert(got(("b", 0L)) ==
      ((1L, 10L, "z1 z2 z3 z4 z5 z6 z7 z8 z9 z10")))
    assert(got(("b", 1L)) == ((1L, 1L, "z11")))
    // reassembly: windows in order concatenate to the shard's stream
    val aText = got(("a", 0L))._3 + " " + got(("a", 1L))._3
    assert(aText == "w1 w2 w3 w4 x1 x2 x3 x4 y1 y2 y3 y4")
  }

  test("packAppend: appending a monotone batch equals repacking the union") {
    import spark.implicits._
    val old = Seq((1L, "a", "t t t"), (2L, "a", "t t t t"),
      (3L, "b", "t t")).toDF("doc_id", "shard", "text")
    val batch = Seq((10L, "a", "t t t t t"), (11L, "b", "t"),
      (12L, "c", "t t t")) // shard c unseen -> starts at 0
      .toDF("doc_id", "shard", "text")
    val totals = Packing.packTotals(
      Packing.packByOffset(old, col("shard"), col("doc_id"),
        maxTokens = 5), col("shard"))
    val inc = Packing.packAppend(batch, col("shard"), col("doc_id"),
        totals, maxTokens = 5)
      .select("doc_id", "n_tokens", "start_offset", "chunk_id")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val full = Packing.packByOffset(old.union(batch), col("shard"),
        col("doc_id"), maxTokens = 5)
      .where(col("doc_id") >= 10L)
      .select("doc_id", "n_tokens", "start_offset", "chunk_id")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(inc == full, s"inc=$inc full=$full")
    // spot values: shard a had 7 tokens -> batch doc starts at 7,
    // chunk 1 of budget 5; unseen shard c starts at 0
    assert(inc.contains(10L -> ((5L, 7L, 1L))), inc.toString)
    assert(inc.contains(12L -> ((3L, 0L, 0L))), inc.toString)
  }

  test("slidingWindows: coverage, overlap, tail, and short docs") {
    import spark.implicits._
    val d = Seq(
      (1L, (1 to 10).map(i => s"w$i").mkString(" ")), // 10 tokens
      (2L, "a b c"),                                   // shorter than size
      (3L, (1 to 8).map(i => s"v$i").mkString(" ")))   // exactly size
      .toDF("doc_id", "text")
    val got = Packing.slidingWindows(d, windowTokens = 8, stride = 3)
      .select("doc_id", "win_idx", "tok_start", "tok_end", "window")
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getString(4))).toMap
    // doc 1 (n=10): windows [0,8) and [3,10) — overlap 5, tail covered
    assert(got((1L, 0L)) ==
      ((0L, 8L, "w1 w2 w3 w4 w5 w6 w7 w8")), got((1L, 0L)).toString)
    assert(got((1L, 1L)) ==
      ((3L, 10L, "w4 w5 w6 w7 w8 w9 w10")), got((1L, 1L)).toString)
    // short doc: one partial window
    assert(got((2L, 0L)) == ((0L, 3L, "a b c")))
    // exactly size: one full window, no redundant second
    assert(got((3L, 0L))._2 == 8L)
    assert(!got.contains((3L, 1L)), got.keys.toString)
    // every token of doc 1 appears in some window
    val covered = got.collect { case ((1L, _), (s, e, _)) =>
      (s until e) }.flatten.toSet
    assert(covered == (0L until 10L).toSet)
    val e = intercept[IllegalArgumentException] {
      Packing.slidingWindows(d, windowTokens = 4, stride = 5)
    }
    assert(e.getMessage.contains("stride"), e.getMessage)
  }

  test("fimTransform: PSM reorder is lossless and deterministic; rate gates application") {
    import spark.implicits._
    val d = (1L to 40L).map(i =>
      (i, (1 to 12).map(j => s"t${i}_$j").mkString(" ")))
      .toDF("doc_id", "text")
    // rate 1.0: every doc transforms; tokens are conserved
    val all = Packing.fimTransform(d, rate = 1.0)
      .select("doc_id", "fim_applied", "text_fim").collect()
    assert(all.forall(_.getBoolean(1)))
    all.foreach { r =>
      val toks = r.getString(2).split(" ").toSeq
      val sentinels = Seq("<fim_pre>", "<fim_suf>", "<fim_mid>")
      assert(sentinels.forall(toks.contains), toks.toString)
      // sentinel ORDER is PSM: pre before suf before mid
      assert(toks.indexOf("<fim_pre>") < toks.indexOf("<fim_suf>") &&
        toks.indexOf("<fim_suf>") < toks.indexOf("<fim_mid>"))
      // losslessness: removing sentinels leaves the original multiset
      val orig = d.where($"doc_id" === r.getLong(0))
        .head().getString(1).split(" ").toSet
      assert(toks.filterNot(sentinels.contains).toSet == orig)
      // reconstruction: pre ++ mid ++ suf IS the original sequence
      val pre = toks.slice(toks.indexOf("<fim_pre>") + 1, toks.indexOf("<fim_suf>"))
      val suf = toks.slice(toks.indexOf("<fim_suf>") + 1, toks.indexOf("<fim_mid>"))
      val mid = toks.drop(toks.indexOf("<fim_mid>") + 1)
      assert((pre ++ mid ++ suf).mkString(" ") ==
        d.where($"doc_id" === r.getLong(0)).head().getString(1))
    }
    // rate 0: nothing transforms, passthrough is the token-space text
    val none = Packing.fimTransform(d, rate = 0.0)
      .select("fim_applied", "text_fim").collect()
    assert(none.forall(r => !r.getBoolean(0) &&
      !r.getString(1).contains("<fim_")))
    // deterministic: two runs agree exactly
    val x = Packing.fimTransform(d, rate = 0.5).select("text_fim")
      .collect().map(_.getString(0)).toSeq
    val y = Packing.fimTransform(d.repartition(7), rate = 0.5)
      .select("text_fim").collect().map(_.getString(0)).toSeq.sorted
    assert(x.sorted == y, "determinism under repartitioning")
  }

  test("packing is deterministic under repartitioning") {
    val a = Packing.packByOffset(docs.repartition(7), col("shard"),
      col("doc_id"), maxTokens = 10).select("doc_id", "chunk_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = Packing.packByOffset(docs.coalesce(1), col("shard"),
      col("doc_id"), maxTokens = 10).select("doc_id", "chunk_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a == b)
  }
}
