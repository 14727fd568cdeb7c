package graft.operators

import graft.SparkSpec
import graft.functions.expressions.ByteLevel
import org.apache.spark.sql.functions._

/** Real-tokenizer interop (VERDICT r16 #3): the GPT-2 `merges.txt`
  * parser, the byte→unicode alphabet bijection, and byte-level corpus
  * encoding — including the unicode paths the board fixture's cleaned
  * domain cannot exercise. */
class ByteBpeSpec extends SparkSpec {

  test("bytes_to_unicode bijection: 256 distinct printable chars, identity on the three latin runs") {
    val m = ByteLevel.ByteToChar
    assert(m.distinct.length == 256)
    for (c <- ('!' to '~') ++ ('¡' to '¬') ++ ('®' to 'ÿ'))
      assert(m(c.toInt) == c, s"printable $c must map to itself")
    // the canonical landmark: space -> 'Ġ' (U+0120)
    assert(m(0x20) == 'Ġ')
    // remapped bytes start at U+0100 in byte order (0x00 is first)
    assert(m(0x00) == 'Ā' && m(0x0a) == 'Ċ')
    // round-trip through the inverse
    for (b <- 0 until 256) assert(ByteLevel.CharToByte(m(b)) == b)
  }

  test("byteLevelChars decomposes multi-byte UTF-8 into mapped bytes") {
    import spark.implicits._
    val got = Seq("a b", "é", "日", "").toDF("t")
      .select(TextAnalysis.byteLevelChars(col("t"))).as[String].collect()
    assert(got(0) == "aĠb")
    // é = 0xC3 0xA9; 0xC3 printable latin ('Ã'), 0xA9 printable ('©')
    assert(got(1) == "Ã©")
    // 日 = 0xE6 0x97 0xA5: 0xE6='æ', 0x97 remapped, 0xA5='¥'
    assert(got(2).length == 3 && got(2)(0) == 'æ' && got(2)(2) == '¥')
    assert(ByteLevel.CharToByte(got(2)(1)) == 0x97)
    assert(got(3) == "")
    // NULL propagates
    assert(Seq[Option[String]](None).toDF("t")
      .select(TextAnalysis.byteLevelChars(col("t"))).head.isNullAt(0))
  }

  test("gpt2MergesRead: header/blank lines skipped, order kept, malformed raises") {
    val dir = java.nio.file.Files.createTempDirectory("gpt2m")
    val f = dir.resolve("merges.txt")
    java.nio.file.Files.write(f,
      "#version: 0.2\nĠ t\nh e\n\nĠt he\n".getBytes("UTF-8"))
    val m = TextAnalysis.gpt2MergesRead(spark, f.toString)
    assert(m == Seq("Ġ" -> "t", "h" -> "e", "Ġt" -> "he"))
    val bad = dir.resolve("bad.txt")
    java.nio.file.Files.write(bad, "Ġ t x\n".getBytes("UTF-8"))
    val e = intercept[IllegalArgumentException] {
      TextAnalysis.gpt2MergesRead(spark, bad.toString)
    }
    assert(e.getMessage.contains("malformed"), e.getMessage)
  }

  test("byteBpeEncode: Ġ word-boundary convention + merge walk (hand-computed)") {
    import spark.implicits._
    val docs = Seq((1L, "the theater"), (2L, " leading"), (3L, "a  b"))
      .toDF("doc_id", "text")
    val merges = Seq("Ġ" -> "t", "h" -> "e", "t" -> "he", "Ġt" -> "he")
    val out = TextAnalysis.byteBpeEncode(docs, merges)
      .orderBy("doc_id").collect()
    // doc 1: "the" (no prefix) -> t,h,e -> t,he -> the;
    //        "Ġtheater" -> Ġt,h,e,a,t,e,r -> Ġt,he,a,t,e,r -> Ġthe,a,t,e,r
    assert(out(0).getString(3) == "the Ġthe|a|t|e|r", out(0).getString(3))
    assert(out(0).getLong(1) == 2L && out(0).getLong(2) == 6L)
    // doc 2: leading space -> first split token empty (dropped), so
    // the word DOES carry Ġ
    assert(out(1).getString(3).startsWith("Ġ"), out(1).getString(3))
    // doc 3: double space collapses (documented vs full GPT-2)
    assert(out(2).getLong(1) == 2L, out(2).toString)
  }

  test("byteBpeEncode handles unicode text (bytes are bytes, case preserved)") {
    import spark.implicits._
    val docs = Seq((1L, "Café 日本")).toDF("doc_id", "text")
    // no merges: pieces = mapped bytes, one per UTF-8 byte
    val out = TextAnalysis.byteBpeEncode(docs, Seq("Ġ" -> "C"))
      .orderBy("doc_id").head
    // "Café" = 5 bytes, " 日本" = 1+6 bytes = 7; total 12 pieces
    assert(out.getLong(1) == 2L && out.getLong(2) == 12L, out.toString)
    // case preserved: 'C' appears (no folding)
    assert(out.getString(3).contains("C"))
  }

  test("round-trip: a merges.txt written from bpeTrainHybrid output serves identically") {
    import spark.implicits._
    val docs = Seq((1L, "aa ab aa"), (2L, "ab aa b")).toDF("doc_id", "text")
    val trained = TextAnalysis.bpeTrainHybrid(docs, merges = 5)
      .orderBy("step").collect().map(r => (r.getString(1), r.getString(2))).toSeq
    val dir = java.nio.file.Files.createTempDirectory("gpt2rt")
    val f = dir.resolve("merges.txt")
    java.nio.file.Files.write(f, ("#version: 0.2\n" +
      trained.map { case (l, r) => s"$l $r" }.mkString("\n") + "\n")
      .getBytes("UTF-8"))
    val loaded = TextAnalysis.gpt2MergesRead(spark, f.toString)
    assert(loaded == trained)
    val a = TextAnalysis.bpeEncode(docs, trained).orderBy("doc_id").collect()
    val b = TextAnalysis.bpeEncode(docs, loaded).orderBy("doc_id").collect()
    assert(a.sameElements(b))
  }
}
