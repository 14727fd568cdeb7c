package graft.functions.expressions

import java.util.zip.Deflater

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** DEFLATE-compressed byte length of a string/binary column — the raw
  * material of the compression-ratio quality gate used by large-scale
  * curation pipelines: near-duplicate boilerplate and template spam
  * compress far below natural prose, while already-compressed /
  * random payloads don't compress at all, so
  * `deflate_len(text) / octet_length(text)` separates both tails of
  * the junk distribution with ONE per-row signal and no model
  * artifact.
  *
  * Per-row, shuffle-free, codegen'd. The Deflater (a native-resource
  * object) is thread-local and `reset()` between rows — no per-row
  * native allocation; raw-deflate mode (`nowrap = true`) drops the
  * zlib header/checksum so tiny inputs aren't dominated by framing
  * bytes. Output is deterministic for a fixed (input, level) on a
  * given JVM's zlib; it is NOT replayable in SQL engines (DuckDB has
  * no deflate), so this family is spec-pinned rather than
  * oracle-checked — the same declared boundary as
  * [[GearChunks]] and the image hashes.
  */
case class DeflateLen(child: Expression, level: Int)
    extends UnaryExpression {

  require(level >= 1 && level <= 9, s"deflate level must be in [1, 9], got $level")

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType | BinaryType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"deflate_len needs a string or binary column, got ${other.catalogString}")
    }

  private def isString: Boolean = child.dataType == StringType

  override protected def nullSafeEval(input: Any): Any =
    if (isString)
      DeflateLen.computeUtf8(input.asInstanceOf[UTF8String], level)
    else
      DeflateLen.compute(input.asInstanceOf[Array[Byte]], level)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      if (isString)
        s"graft.functions.expressions.DeflateLen.computeUtf8($c, $level)"
      else
        s"graft.functions.expressions.DeflateLen.compute($c, $level)")

  override protected def withNewChildInternal(newChild: Expression): DeflateLen =
    copy(child = newChild)
}

object DeflateLen {

  // one Deflater per (thread, level): Deflater.reset() preserves the
  // construction-time level and nowrap flag, so reuse is free; levels
  // index a tiny array (1..9)
  private val deflaters = new ThreadLocal[Array[Deflater]] {
    override def initialValue(): Array[Deflater] = new Array[Deflater](10)
  }
  private val outBuf = new ThreadLocal[Array[Byte]] {
    override def initialValue(): Array[Byte] = new Array[Byte](8192)
  }

  /** Compressed length of `b` under raw DEFLATE at `level`; shared by
    * eval and codegen. The output buffer is drained and discarded —
    * only the length survives, so memory stays O(8 KB) per thread
    * regardless of document size. */
  def compute(b: Array[Byte], level: Int): Int = {
    val ds = deflaters.get()
    var d = ds(level)
    if (d == null) { d = new Deflater(level, true); ds(level) = d }
    d.reset()
    d.setInput(b)
    d.finish()
    val buf = outBuf.get()
    var total = 0
    while (!d.finished()) total += d.deflate(buf)
    total
  }

  def computeUtf8(s: UTF8String, level: Int): Int =
    compute(s.getBytes, level)
}
