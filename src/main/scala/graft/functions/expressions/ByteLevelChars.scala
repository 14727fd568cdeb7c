package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** GPT-2's byte→unicode bijection applied to a string's UTF-8 bytes —
  * the alphabet step of byte-level BPE (Radford et al. 2019,
  * `encoder.py bytes_to_unicode`, public knowledge): every byte maps
  * to a PRINTABLE unicode char so merge rules are plain strings in
  * `merges.txt`. The three printable latin runs map to themselves
  * ('!'..'~', '¡'..'¬', '®'..'ÿ'); the remaining 68 bytes (controls,
  * space, DEL, 0xAD) map to U+0100+n in byte order — space (0x20) is
  * the familiar 'Ġ' (U+0120). Multi-byte UTF-8 input decomposes into
  * its bytes first, exactly as the reference implementation does, so
  * any unicode text becomes a reversible printable-char string over a
  * 256-symbol alphabet. NULL → NULL. */
case class ByteLevelChars(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "byte_level_chars"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"byte_level_chars needs a string, got ${t.catalogString}")
    }

  override def nullSafeEval(s: Any): Any =
    ByteLevel.map(s.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s =>
      s"graft.functions.expressions.ByteLevel.map($s)")

  override protected def withNewChildInternal(
      newChild: Expression): ByteLevelChars = copy(child = newChild)
}

object ByteLevel extends Serializable {

  /** byte value → mapped char, the GPT-2 table. */
  val ByteToChar: Array[Char] = {
    val out = new Array[Char](256)
    val printable = (('!' to '~') ++ ('¡' to '¬') ++
      ('®' to 'ÿ')).map(_.toInt).toSet
    var next = 256
    for (b <- 0 until 256) {
      if (printable(b)) out(b) = b.toChar
      else { out(b) = next.toChar; next += 1 }
    }
    out
  }

  /** mapped char → byte value (the inverse; -1 for chars outside the
    * image, which a well-formed byte-level string never contains). */
  val CharToByte: Map[Char, Int] =
    ByteToChar.zipWithIndex.map { case (c, b) => c -> b }.toMap

  def map(s: UTF8String): UTF8String = {
    val bytes = s.getBytes
    val sb = new java.lang.StringBuilder(bytes.length)
    var i = 0
    while (i < bytes.length) {
      sb.append(ByteToChar(bytes(i) & 0xff))
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }
}
