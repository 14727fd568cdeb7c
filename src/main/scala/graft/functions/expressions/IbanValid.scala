package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native IBAN mod-97 checksum test (ISO 13616) — [[LuhnValid]]'s
  * sibling for bank-account PII: rearrange (body then the first four
  * chars), map letters A..Z to 10..35, and the resulting decimal must
  * leave remainder 1 mod 97. A crawl's IBAN-SHAPED noise (order ids,
  * license keys) fails the checksum 96/97 of the time, which is what
  * makes an IBAN hit alertable.
  *
  * Checksum only, by design: country-specific BBAN length tables are
  * registry data that drifts; the mod-97 test is the universal
  * structural invariant, and the candidate REGEX
  * ([[graft.operators.TextAnalysis.IbanCandidatePattern]]) carries
  * the shape. The fold keeps the remainder in an int at every step
  * ((acc·10 + d) % 97 / (acc·100 + v) % 97) — no big-integer
  * materialization of the up-to-68-digit expansion, O(len) per
  * candidate. Strictness: empty, length outside [5, 34], any byte
  * outside 0-9/A-Z (lowercase included) → FALSE — an answer, not a
  * missing value; NULL in → NULL out.
  *
  * Oracle-replayable: DuckDB runs the same fold as
  * `list_reduce(['0'] || chars-of-rearranged, ...)` with a VARCHAR
  * accumulator (its list_reduce has no seed argument) — see the
  * q_pii_audit oracle.
  */
case class IbanValid(child: Expression) extends UnaryExpression {

  override def dataType: DataType = BooleanType

  override def prettyName: String = "iban_valid"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"iban_valid needs a string column, got " +
          child.dataType.catalogString)

  override protected def nullSafeEval(input: Any): Any =
    IbanValid.compute(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.IbanValid.compute($c)")

  override protected def withNewChildInternal(
      newChild: Expression): IbanValid = copy(child = newChild)
}

object IbanValid {
  /** Streaming mod-97 over the rearranged bytes; FALSE on any byte
    * outside 0-9/A-Z or length outside [5, 34]. */
  def compute(s: UTF8String): Boolean = {
    val b = s.getBytes
    val n = b.length
    if (n < 5 || n > 34) return false
    var acc = 0
    var j = 0
    while (j < n) {
      val c = b((j + 4) % n) // body first, then the leading 4 chars
      if (c >= '0' && c <= '9') acc = (acc * 10 + (c - '0')) % 97
      else if (c >= 'A' && c <= 'Z') acc = (acc * 100 + (c - 'A' + 10)) % 97
      else return false
      j += 1
    }
    acc == 1
  }
}
