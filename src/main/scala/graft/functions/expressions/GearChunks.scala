package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined chunking (Gear hash / FastCDC family) over a binary
  * payload: split where the rolling gear hash's low `maskBits` bits are
  * zero (expected chunk ≈ 2^maskBits bytes, `minLen`/`maxLen` bound the
  * tail), emit each chunk's md5 hex. The storage/transfer dedup
  * primitive for binary columns: unlike FIXED-width chunking, an
  * insertion only perturbs the chunk it lands in — boundaries
  * downstream re-synchronize because they depend on content, not
  * offsets (spec-pinned).
  *
  * Native codegen'd expression ([[WinnowMin]]'s shape): one pass over
  * the payload, thread-local digest, no per-chunk allocations beyond
  * the digests themselves. The gear table is derived from md5 (seeded,
  * deterministic) so results replay across engines/JVMs.
  *
  * Output: array of lowercase md5 hex strings, one per chunk; empty
  * payload → empty array. */
case class GearChunks(child: Expression, maskBits: Int, minLen: Int,
    maxLen: Int) extends UnaryExpression {

  require(maskBits >= 1 && maskBits <= 30,
    s"maskBits must be in [1, 30]: $maskBits")
  require(minLen >= 1 && maxLen >= minLen,
    s"need 1 <= minLen <= maxLen: min=$minLen max=$maxLen")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"gear_chunks needs a binary column, got ${child.dataType.catalogString}")

  override protected def nullSafeEval(input: Any): Any =
    GearChunks.compute(input.asInstanceOf[Array[Byte]], maskBits, minLen,
      maxLen)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.GearChunks.compute($c, $maskBits, $minLen, $maxLen)")

  override protected def withNewChildInternal(newChild: Expression): GearChunks =
    copy(child = newChild)
}

object GearChunks {

  /** 256 deterministic 64-bit gear values: first 8 bytes of
    * md5("gear|<i>") — seeded, engine-independent. */
  private val Gear: Array[Long] = Array.tabulate(256) { i =>
    val d = Md5Util.md5().digest(s"gear|$i".getBytes("UTF-8"))
    var v = 0L
    var j = 0
    while (j < 8) { v = (v << 8) | (d(j) & 0xffL); j += 1 }
    v
  }

  def compute(payload: Array[Byte], maskBits: Int, minLen: Int,
      maxLen: Int): GenericArrayData = {
    val mask = (1L << maskBits) - 1
    val md = Md5Util.md5()
    val out = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
    var start = 0
    var h = 0L
    var i = 0
    val n = payload.length
    while (i < n) {
      h = (h << 1) + Gear(payload(i) & 0xff)
      i += 1
      val len = i - start
      if ((len >= minLen && (h & mask) == 0L) || len >= maxLen || i == n) {
        md.reset()
        md.update(payload, start, len)
        out += UTF8String.fromString(Md5Util.hex(md.digest()))
        start = i
        h = 0L
      }
    }
    new GenericArrayData(out.toArray[Any])
  }
}
