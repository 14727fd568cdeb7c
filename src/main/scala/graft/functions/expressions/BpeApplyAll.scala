package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native BPE inference: apply an ENTIRE learned merge list (in
  * training order, one greedy left-to-right pass per rule) to one word
  * in a single tight per-row scan — the all-rules replacement for
  * chaining one interpreted `aggregate`-HOF fold per merge rule
  * ([[graft.operators.TextAnalysis.bpeApplyHof]]), which made
  * inference cost (and PLAN SIZE) linear in the merge count and a real
  * 30k-merge vocabulary structurally unreachable.
  *
  * Semantics are EXACTLY the sequential per-rule fold the DuckDB
  * oracle replays — pinned bit-for-bit by BpeApplyAllSpec against the
  * HOF chain:
  *   - initial symbols mirror `split(word, "(?!^)(?=.)")`: one symbol
  *     per CHAR (UTF-16 unit — Java's zero-width split matches inside
  *     surrogate pairs), except no boundary falls before a
  *     line-terminator char (regex `.` does not match \n \r u0085
  *     u2028 u2029, so such a char glues to the previous symbol);
  *     the empty string splits to one empty symbol;
  *   - rule k = one greedy non-overlapping left-to-right pass: when
  *     the previous emitted symbol is `l` and the current is `r`,
  *     they fuse to `l+r`; the fused symbol never re-merges as the
  *     LEFT of the same rule in the same pass (l+r = l needs r empty);
  *   - NULL word → NULL.
  *
  * Why the scan is merge-count-INDEPENDENT (the 30k-vocab story):
  * instead of running every rule's pass, it repeatedly finds, among
  * the ≤ len−1 adjacent symbol pairs actually present, the one whose
  * merge rank is smallest among ranks > the last applied rank, and
  * runs exactly that pass. Every skipped rule's pass is provably a
  * no-op (its pair is absent — minimality), and a pass leaves no
  * (l, r) adjacency of its own rule behind, so applied ranks strictly
  * increase and the loop runs ≤ len−1 passes of O(len) work each:
  * O(len²) per word REGARDLESS of merge-table size. A pair learned at
  * several ranks (possible when later merges re-create an earlier
  * pair in the corpus) keeps all its ranks, so repeated passes of the
  * same pair replay in order.
  *
  * The merge table ships to executors once via `addReferenceObj`
  * (the [[WordpieceSegment]] trie pattern) and the call stays inside
  * whole-stage codegen.
  */
case class BpeApplyAll(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {

  require(merges.forall { case (l, r) => l.nonEmpty && r.nonEmpty },
    "bpe_apply: merge sides must be non-empty")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"bpe_apply needs a string column, got ${child.dataType.catalogString}")

  @transient private lazy val table: BpeMergeTable = new BpeMergeTable(merges)

  override protected def nullSafeEval(input: Any): Any =
    table.segment(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tableRef = ctx.addReferenceObj("bpeMergeTable", table,
      classOf[BpeMergeTable].getName)
    defineCodeGen(ctx, ev, c => s"$tableRef.segment($c)")
  }

  override protected def withNewChildInternal(
      newChild: Expression): BpeApplyAll = copy(child = newChild)

  override def prettyName: String = "bpe_apply"
}

/** Merge-rank table + the per-word scanner. Serializable so the plan
  * can ship it, but normally rebuilt from the merge list on each
  * executor via the expression's transient lazy val. */
final class BpeMergeTable(merges: Seq[(String, String)])
    extends Serializable {

  // rank k (1-based) = merges(k - 1); a pair's ranks stay ascending
  // because insertion follows training order
  @transient private lazy val rules: Array[(String, String)] =
    merges.toArray

  @transient private lazy val ranksByPair
      : java.util.HashMap[String, Array[Int]] = {
    val m = new java.util.HashMap[String, java.util.ArrayList[Integer]]()
    var k = 1
    merges.foreach { case (l, r) =>
      // the split point is recoverable from the left length, so the
      // key is collision-free by construction
      val key = l.length.toString + ":" + l + r
      var lst = m.get(key)
      if (lst == null) { lst = new java.util.ArrayList[Integer](); m.put(key, lst) }
      lst.add(k)
      k += 1
    }
    val out = new java.util.HashMap[String, Array[Int]](m.size() * 2)
    m.forEach((key, lst) => {
      val a = new Array[Int](lst.size())
      var i = 0
      while (i < a.length) { a(i) = lst.get(i); i += 1 }
      out.put(key, a)
    })
    out
  }

  private def isLineTerm(c: Char): Boolean =
    c == '\n' || c == '\r' || c == '\u0085' || c == '\u2028' ||
      c == '\u2029'

  /** Segment one word under the full merge list. */
  def segment(word: UTF8String): ArrayData = {
    val s = word.toString
    val len = s.length
    if (len == 0)
      return new GenericArrayData(
        Array[Any](UTF8String.fromString("")))
    // bnd(i) = start char offset of symbol i; bnd(n) = len
    val bnd = new Array[Int](len + 1)
    var n = 0
    var i = 0
    while (i < len) {
      // mirror split("(?!^)(?=.)"): a line-terminator char never
      // starts a symbol (except at position 0)
      if (i == 0 || !isLineTerm(s.charAt(i))) { bnd(n) = i; n += 1 }
      i += 1
    }
    bnd(n) = len

    @inline def symIs(p: Int, t: String): Boolean = {
      val a = bnd(p)
      (bnd(p + 1) - a) == t.length && s.regionMatches(a, t, 0, t.length)
    }

    var kPrev = 0
    var exhausted = n < 2
    while (!exhausted) {
      // min rank > kPrev among the adjacent pairs actually present
      var best = Int.MaxValue
      var p = 0
      while (p < n - 1) {
        val a = bnd(p)
        val key = (bnd(p + 1) - a).toString + ":" + s.substring(a, bnd(p + 2))
        val ranks = ranksByPair.get(key)
        if (ranks != null) {
          var j = 0
          while (j < ranks.length && ranks(j) <= kPrev) j += 1
          if (j < ranks.length && ranks(j) < best) best = ranks(j)
        }
        p += 1
      }
      if (best == Int.MaxValue) exhausted = true
      else {
        val (l, r) = rules(best - 1)
        // one greedy non-overlapping left-to-right pass, in place
        // (write index never passes the read index)
        var rd = 0
        var wr = 0
        while (rd < n) {
          bnd(wr) = bnd(rd)
          if (rd < n - 1 && symIs(rd, l) && symIs(rd + 1, r)) rd += 2
          else rd += 1
          wr += 1
        }
        bnd(wr) = len
        n = wr
        kPrev = best
        if (n < 2) exhausted = true
      }
    }

    val out = new Array[Any](n)
    var q = 0
    while (q < n) {
      out(q) = UTF8String.fromString(s.substring(bnd(q), bnd(q + 1)))
      q += 1
    }
    new GenericArrayData(out)
  }
}
