package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Luhn (mod-10) checksum test — the validation that separates
  * a chargeable payment-card number from a card-SHAPED digit run
  * (timestamps, tracker ids), so a PII audit can alert on real PANs
  * instead of crying wolf on every long number.
  *
  * Semantics: 1-indexed from the RIGHT, every even position's digit
  * doubles (minus 9 past 9); TRUE iff the total divides by 10.
  * Any non-digit byte — or an empty string — yields FALSE (not NULL:
  * "not a card number" is an answer, not a missing value). NULL in →
  * NULL out. The arithmetic is oracle-replayable in DuckDB with
  * `range`/`list_transform`/`list_sum` over `substr(reverse(c), i, 1)`
  * (see the q_pii_audit oracle), and
  * [[graft.operators.TextAnalysis.piiAudit]] rides this expression.
  *
  * Codegen'd per-row byte loop over the UTF8String's own bytes — no
  * string materialization, no array allocation, branch-free digit
  * doubling; the whole-stage-codegen-friendly replacement for the
  * equivalent `aggregate(transform(sequence(...)))` higher-order tree
  * (which allocates the index array and a lambda frame per element).
  */
case class LuhnValid(child: Expression) extends UnaryExpression {

  override def dataType: DataType = BooleanType

  override def prettyName: String = "luhn_valid"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"luhn_valid needs a string column, got " +
          child.dataType.catalogString)

  override protected def nullSafeEval(input: Any): Any =
    LuhnValid.compute(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.LuhnValid.compute($c)")

  override protected def withNewChildInternal(
      newChild: Expression): LuhnValid = copy(child = newChild)
}

object LuhnValid {
  /** FALSE on empty or any non-digit byte; otherwise the mod-10 test.
    * Walks the raw bytes right-to-left — digits are single bytes in
    * UTF-8, and a multi-byte code point's continuation bytes fall
    * outside '0'..'9' and correctly yield FALSE. */
  def compute(s: UTF8String): Boolean = {
    val b = s.getBytes
    val n = b.length
    if (n == 0) return false
    var sum = 0
    var i = 0
    while (i < n) {
      var d = b(n - 1 - i) - '0'
      if (d < 0 || d > 9) return false
      if ((i & 1) == 1) { d *= 2; if (d > 9) d -= 9 }
      sum += d
      i += 1
    }
    sum % 10 == 0
  }
}
