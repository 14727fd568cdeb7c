package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native wordpiece segmentation: greedy longest-match (max-munch)
  * tokenization of every whitespace word against a FIXED piece
  * vocabulary, with the single-codepoint fallback for unmatched
  * positions — the inference step of a wordpiece/BPE tokenizer, the
  * per-row op a training pipeline runs on every document to get exact
  * token counts and boundaries under the model's real vocabulary.
  *
  * Output formatting: pieces joined with '|' inside a word, words
  * joined with ' ' — the input's space structure (including runs of
  * spaces → empty words) round-trips, so the whole segmentation is one
  * hash-checkable string.
  *
  * Semantics contract (the DuckDB oracle replays it): at each position
  * take the LONGEST vocab piece matching there (ties impossible —
  * equal-length matches at one position are the same string); if none
  * matches, emit one codepoint. All positions and lengths are in
  * codepoints, matching `substr`/`len` character semantics in SQL
  * engines, not UTF-16 units or bytes.
  *
  * Why native: the greedy scan is inherently sequential per word — no
  * `functions._` composition expresses it short of a per-position
  * explode + recursive join (the oracle's shape, quadratic in word
  * length and row-multiplying). Here it is one trie walk per row:
  * vocab lives in a codepoint trie built once per executor
  * (`@transient lazy`), shipped to codegen via `addReferenceObj`, the
  * same pattern as [[DotProduct]]/[[WinnowMin]] — whole-stage codegen
  * keeps the scan pipeline fused.
  */
case class WordpieceSegment(child: Expression, vocab: Seq[String])
    extends UnaryExpression {

  require(vocab.forall(_.nonEmpty), "wordpiece: vocab pieces must be non-empty")

  override def dataType: DataType = StringType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"wordpiece needs a string column, got ${child.dataType.catalogString}")

  @transient private lazy val trie: WordpieceTrie = new WordpieceTrie(vocab)

  override protected def nullSafeEval(input: Any): Any =
    trie.segment(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val trieRef = ctx.addReferenceObj("wordpieceTrie", trie,
      classOf[WordpieceTrie].getName)
    defineCodeGen(ctx, ev, c => s"$trieRef.segment($c)")
  }

  override protected def withNewChildInternal(
      newChild: Expression): WordpieceSegment = copy(child = newChild)

  override def prettyName: String = "wordpiece"
}

/** Codepoint trie + greedy scanner. Serializable so the plan can ship
  * it, but normally rebuilt from the vocab on each executor via the
  * expression's transient lazy val. */
final class WordpieceTrie(vocab: Seq[String]) extends Serializable {

  private final class Node {
    val children = new java.util.HashMap[Integer, Node]()
    var terminal = false
  }

  @transient private lazy val root: Node = {
    val r = new Node
    vocab.foreach { p =>
      var node = r
      var i = 0
      while (i < p.length) {
        val cp = p.codePointAt(i)
        var next = node.children.get(cp)
        if (next == null) { next = new Node; node.children.put(cp, next) }
        node = next
        i += Character.charCount(cp)
      }
      node.terminal = true
    }
    r
  }

  /** Segment the (already-lowercased) text: ' ' separates words, '|'
    * separates pieces within a word. Runs of spaces are preserved
    * verbatim (empty words segment to empty strings). */
  def segment(text: UTF8String): UTF8String = {
    val s = text.toString
    val n = s.length
    val sb = new java.lang.StringBuilder(n + (n >> 2))
    var i = 0
    while (i < n) {
      if (s.charAt(i) == ' ') { sb.append(' '); i += 1 }
      else {
        // word run [i, we)
        var we = i
        while (we < n && s.charAt(we) != ' ') we += 1
        var first = true
        while (i < we) {
          // greedy trie walk from i: remember the LAST terminal depth
          var node = root
          var j = i
          var lastEnd = -1
          var broke = false
          while (j < we && !broke) {
            val cp = s.codePointAt(j)
            node = node.children.get(cp)
            if (node == null) broke = true
            else {
              j += Character.charCount(cp)
              if (node.terminal) lastEnd = j
            }
          }
          val end =
            if (lastEnd > i) lastEnd
            else i + Character.charCount(s.codePointAt(i))
          if (!first) sb.append('|')
          sb.append(s, i, end)
          first = false
          i = end
        }
      }
    }
    UTF8String.fromString(sb.toString)
  }
}
