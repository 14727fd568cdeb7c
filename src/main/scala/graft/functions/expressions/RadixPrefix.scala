package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** The top `bits` bits of the order-preserving unsigned image of a
  * double — the cell key of [[graft.operators.Sketch.interpQuantilesBy]]'s
  * radix-refinement selection. Pure bit arithmetic: no data-dependent
  * anchors, no sketch, fully deterministic.
  *
  * The image is the classic total-order bijection
  * `u = bits ⊕ ((bits >> 63) | MIN_VALUE)` (sign-flip positives,
  * complement negatives), under which unsigned-u order equals Spark
  * SQL's double ordering: −∞ … −0.0≡0.0 … +∞ < NaN (NaN's canonical
  * bit pattern lands above +Inf's; `doubleToLongBits` canonicalizes
  * every NaN; −0.0 is normalized to 0.0 first, matching SQL where the
  * two compare equal). For 1 ≤ bits ≤ 63 the prefix `u >>> (64−bits)`
  * is top-bit-clear, so SIGNED long comparisons on it agree with the
  * unsigned cell order — safe as a sort or join key. Prefixes nest:
  * the level-(L−1) cell of a value is its level-L prefix >>> step. */
case class RadixPrefix(child: Expression, bits: Int)
    extends UnaryExpression {
  require(bits >= 1 && bits <= 63, s"radix_prefix: bits=$bits not in [1,63]")

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "radix_prefix"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case DoubleType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"radix_prefix needs a double, got ${t.catalogString}")
    }

  override def nullSafeEval(d: Any): Any =
    RadixMath.prefix(d.asInstanceOf[Double], bits)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, d =>
      s"graft.functions.expressions.RadixMath.prefix($d, $bits)")

  override protected def withNewChildInternal(
      newChild: Expression): RadixPrefix = copy(child = newChild)
}

object RadixMath extends Serializable {

  /** See [[RadixPrefix]]. */
  def prefix(d: Double, bits: Int): Long = {
    val b = java.lang.Double.doubleToLongBits(if (d == 0.0) 0.0 else d)
    val u = b ^ ((b >> 63) | java.lang.Long.MIN_VALUE)
    u >>> (64 - bits)
  }
}
