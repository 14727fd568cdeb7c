package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native unigram-LM (SentencePiece-style) Viterbi segmentation of ONE
  * word against a fixed scored piece vocabulary: among all ways to
  * split the word into vocabulary pieces (single codepoints always
  * available at `oovCostMicro` as the coverage fallback), emit the
  * segmentation with the MINIMUM total cost, where cost(piece) is the
  * trained integer micro-nat table (−ln p quantized to 1e-6; see
  * [[graft.operators.UnigramTokenizer]]).
  *
  * Exactness contract (the DuckDB oracle replays it): the DP is
  * integer-only — costs are longs, sums are longs, no float exists
  * anywhere in the forward pass or the backtrack — so the chosen
  * segmentation is engine-independent. Ties are broken by preferring
  * the LONGEST piece at each backtrack step from the end of the word
  * (the same `max(l)` rule the oracle's unrolled backtrack applies).
  * Positions are CODEPOINTS, matching SQL `substr`/`len` semantics.
  *
  * Output: pieces joined with '|'. Input is one word (no spaces);
  * document-level use explodes words first, exactly like bpeEncode.
  *
  * Why native: Viterbi is sequential per word — declaratively it is
  * a per-position unrolled join chain (the oracle's shape, O(len)
  * CTEs, row-multiplying). Here it is one array DP per row; the
  * scorer ships to codegen via `addReferenceObj` (the
  * [[WordpieceSegment]] pattern), keeping the scan fused. */
case class UnigramSegment(child: Expression,
    vocab: Seq[(String, Long)], oovCostMicro: Long)
    extends UnaryExpression {

  require(vocab.forall(_._1.nonEmpty),
    "unigram: vocab pieces must be non-empty")
  require(oovCostMicro > 0, s"unigram: bad oov cost $oovCostMicro")

  override def dataType: DataType = StringType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"unigram needs a string column, got ${child.dataType.catalogString}")

  @transient private lazy val viterbi: UnigramViterbi =
    new UnigramViterbi(vocab, oovCostMicro)

  override protected def nullSafeEval(input: Any): Any =
    viterbi.segment(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("unigramViterbi", viterbi,
      classOf[UnigramViterbi].getName)
    defineCodeGen(ctx, ev, c => s"$ref.segment($c)")
  }

  override protected def withNewChildInternal(
      newChild: Expression): UnigramSegment = copy(child = newChild)

  override def prettyName: String = "unigram_segment"
}

/** The integer Viterbi scorer. Serializable for plan shipping; the
  * piece map is rebuilt lazily per executor. */
final class UnigramViterbi(vocab: Seq[(String, Long)], oovCost: Long)
    extends Serializable {

  @transient private lazy val costs: java.util.HashMap[String, java.lang.Long] = {
    val m = new java.util.HashMap[String, java.lang.Long](vocab.size * 2)
    vocab.foreach { case (p, c) => m.put(p, c) }
    m
  }

  @transient private lazy val maxPieceLen: Int =
    if (vocab.isEmpty) 1
    else math.max(1,
      vocab.iterator.map(p => p._1.codePointCount(0, p._1.length)).max)

  /** min total cost segmentation; '|'-joined pieces. Empty input →
    * empty output. */
  def segment(word: UTF8String): UTF8String = {
    val s = word.toString
    if (s.isEmpty) return UTF8String.EMPTY_UTF8
    val cps = s.codePoints().toArray
    val n = cps.length
    val P = maxPieceLen
    val INF = Long.MaxValue / 4
    val dp = new Array[Long](n + 1)
    var i = 1
    while (i <= n) { dp(i) = INF; i += 1 }
    i = 1
    while (i <= n) {
      var l = 1
      val lMax = if (P < i) P else i
      while (l <= lMax) {
        val prev = dp(i - l)
        if (prev < INF) {
          val piece = new String(cps, i - l, l)
          val c = costs.get(piece)
          val cost =
            if (c != null) c.longValue()
            else if (l == 1) oovCost
            else -1L
          if (cost >= 0 && prev + cost < dp(i)) dp(i) = prev + cost
        }
        l += 1
      }
      i += 1
    }
    // backtrack: at each end position take the LONGEST piece whose
    // predecessor state reproduces dp(pos) — the oracle's max(l) rule
    val pieces = new java.util.ArrayDeque[String]()
    var pos = n
    while (pos > 0) {
      var chosen = -1
      var l = 1
      val lMax = if (P < pos) P else pos
      while (l <= lMax) {
        val prev = dp(pos - l)
        if (prev < INF) {
          val piece = new String(cps, pos - l, l)
          val c = costs.get(piece)
          val cost =
            if (c != null) c.longValue()
            else if (l == 1) oovCost
            else -1L
          if (cost >= 0 && prev + cost == dp(pos)) chosen = l
        }
        l += 1
      }
      // dp(n) finite by construction (single-codepoint fallback), so a
      // consistent predecessor always exists
      val piece = new String(cps, pos - chosen, chosen)
      pieces.addFirst(piece)
      pos -= chosen
    }
    val sb = new java.lang.StringBuilder(s.length + (s.length >> 2))
    val it = pieces.iterator()
    var first = true
    while (it.hasNext) {
      if (!first) sb.append('|')
      sb.append(it.next())
      first = false
    }
    UTF8String.fromString(sb.toString)
  }
}
