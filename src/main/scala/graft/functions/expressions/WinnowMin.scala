package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native winnowing fingerprint: the MINIMUM md5 over the document's
  * k-char sliding windows (step `stride`), as one lowercase hex string —
  * bit-identical to the declarative form
  * `array_min(transform(sequence(0, last), i -> md5(substr(text,
  * i*stride+1, k))))` (hex encoding is byte-order-monotone, so min by
  * digest bytes == min by hex string), which the DuckDB oracle replays.
  *
  * Why native: the higher-order form interprets one Substring + one Md5
  * expression PER WINDOW per row (each allocating a fresh MessageDigest
  * and materializing a 32-char hex string), then builds the full array
  * only to take its min. This one-pass loop reuses a thread-local
  * digest, keeps candidate digests as raw 16-byte arrays, and
  * hex-encodes once per ROW — same cost shape as [[DotProduct]] vs its
  * HOF twin, on the dedup family's hottest per-row op.
  */
case class WinnowMin(child: Expression, k: Int, stride: Int)
    extends UnaryExpression {

  require(k >= 1 && stride >= 1, s"need k >= 1 and stride >= 1: k=$k stride=$stride")

  override def dataType: DataType = StringType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"winnow_min needs a string column, got ${child.dataType.catalogString}")

  override protected def nullSafeEval(input: Any): Any =
    WinnowMin.compute(input.asInstanceOf[UTF8String], k, stride)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.WinnowMin.compute($c, $k, $stride)")

  override protected def withNewChildInternal(newChild: Expression): WinnowMin =
    copy(child = newChild)
}

object WinnowMin {

  /** One pass over the window positions; shared by eval and codegen. */
  def compute(s: UTF8String, k: Int, stride: Int): UTF8String = {
    val n = s.numChars()
    // mirrors greatest(floor((n-k)/stride), 0): any n < k collapses to
    // the single position 0 (md5 of the whole short string)
    val last = math.max((n - k) / stride, 0)
    val md = Md5Util.md5()
    var best: Array[Byte] = null
    var i = 0
    if (n == s.numBytes) {
      // all-ASCII fast path (the overwhelmingly common case): char
      // positions == byte positions, so every window is a range of ONE
      // row-level byte buffer — zero per-window allocations
      val bytes = s.getBytes
      val winLen = math.min(k, n)
      while (i <= last) {
        md.reset()
        md.update(bytes, i * stride, math.min(winLen, n - i * stride))
        val d = md.digest()
        if (best == null || unsignedLess(d, best)) best = d
        i += 1
      }
      return UTF8String.fromString(Md5Util.hex(best))
    }
    while (i <= last) {
      // substringSQL is the Substring expression's own kernel — same
      // char (not byte) indexing, same out-of-range clamping
      val window = s.substringSQL(i * stride + 1, k)
      md.reset()
      val d = md.digest(window.getBytes)
      if (best == null || unsignedLess(d, best)) best = d
      i += 1
    }
    UTF8String.fromString(Md5Util.hex(best))
  }

  private def unsignedLess(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < a.length) {
      val x = a(i) & 0xff
      val y = b(i) & 0xff
      if (x != y) return x < y
      i += 1
    }
    false
  }
}
