package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native codegen'd Σ aᵢ·bᵢ over two numeric array columns.
  *
  * WHY a custom Expression (the one place the built-ins genuinely fall
  * short, per the design preference order): the declarative
  * formulation `aggregate(zip_with(a, b, _*_), 0d, _+_)` routes
  * through `ArrayAggregate`/`ZipWith`, which are `CodegenFallback` —
  * every element of every vector is evaluated interpreted, with a
  * lambda-variable binding per element, inside the hottest loops we
  * have (brute-force cosine, IVF scoring, embedding near-dup). This
  * expression emits a tight primitive loop inside whole-stage codegen
  * instead.
  *
  * Semantics MATCH the higher-order formulation exactly (same
  * left-to-right double accumulation, so results are bit-identical and
  * the DuckDB oracles are unaffected):
  *   - NULL array (either side) → NULL;
  *   - length mismatch → NULL (zip_with pads with NULL ⇒ NULL sum);
  *   - NULL element (either side) → NULL.
  * Element types: float or double arrays, mixed freely.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  private def elemType(e: Expression): DataType = e.dataType match {
    case ArrayType(et, _) => et
    case other => other // rejected by checkInputDataTypes
  }

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType | DoubleType, _),
          ArrayType(FloatType | DoubleType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"dot_product needs two float/double arrays, got " +
            s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
    }
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    val lf = elemType(left) == FloatType
    val rf = elemType(right) == FloatType
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      s += xv * yv
      i += 1
    }
    s
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lGet = if (elemType(left) == FloatType) "getFloat" else "getDouble"
    val rGet = if (elemType(right) == FloatType) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (av, bv) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = $av.numElements();
         |if ($n != $bv.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($av.isNullAt($i) || $bv.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $s += (double) $av.$lGet($i) * (double) $bv.$rGet($i);
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $s; }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}
