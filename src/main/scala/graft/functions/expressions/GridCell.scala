package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType}

/** The rank-anchored grid cell of one proxy value — the routing step
  * of [[graft.operators.Ranks]]' two-level prefix sum, as ONE native
  * codegen'd call instead of a ~6×-inlined tree of 63 chained
  * comparisons.
  *
  * Why native (r17): the declarative form — a fold of `when(k ≥ cut)`
  * terms for the coarse cell, `element_at` anchor lookups and a
  * clamped linear split for the fine cell — is re-INLINED wholesale
  * everywhere the optimizer substitutes the `__b` alias (a filter or
  * join key on the bucket carries ~6 copies), and at that size the
  * generated method abandons JIT: a 600k-row scan filtered on the
  * bucket measured 26 s interpreted / 17 s as a when-fold vs ~0.4 s
  * for the same scan aggregating on it once. A binary search over the
  * anchor array is O(log 64) per COPY, so inlining multiplicity stops
  * mattering.
  *
  * Semantics are bit-for-bit the declarative chain's (pinned by
  * RanksPropertySpec): coarse = |{cuts ≤ k}| (duplicates counted —
  * exactly the Σ when(k ≥ cut) fold); anchors bound the cell with
  * pLo/pHi at the edges; fine = the Spark-ordering clamp
  * `least(fine−1, greatest(0, (k−lo)/(hi−lo)·fine))` where NaN (an
  * Inf/Inf cell ratio) is GREATEST — so greatest keeps it and least
  * then picks fine−1, which Java's Math.min/max would get wrong —
  * and the int cast truncates. NULL k → NULL (the caller maps the
  * NULL value cell to −1 itself). */
case class GridCell(child: Expression, cuts: Array[Double],
    pLo: Double, pHi: Double, fine: Int) extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "grid_cell"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case DoubleType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"grid_cell needs a double proxy, got ${t.catalogString}")
    }

  override def nullSafeEval(k: Any): Any =
    GridMath.cell(k.asInstanceOf[Double], cuts, pLo, pHi, fine)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cutsRef = ctx.addReferenceObj("cuts", cuts, "double[]")
    defineCodeGen(ctx, ev, k =>
      s"graft.functions.expressions.GridMath.cell($k, $cutsRef, " +
        s"${pLo}D, ${pHi}D, $fine)")
  }

  override protected def withNewChildInternal(newChild: Expression): GridCell =
    copy(child = newChild)
}

object GridMath extends Serializable {

  /** See [[GridCell]]. `cuts` must be nondecreasing (quantile cut
    * points are by construction). */
  def cell(k: Double, cuts: Array[Double], pLo: Double, pHi: Double,
      fine: Int): Int = {
    // coarse = |{cuts ≤ k}|: the insertion point AFTER any run of
    // equal cuts (k is never NaN here — Ranks.clamped folds NaN/±Inf
    // to MaxValue/MinValue before routing)
    var lo = 0
    var hi = cuts.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (cuts(mid) <= k) lo = mid + 1 else hi = mid
    }
    val coarse = lo
    val cellLo = if (coarse >= 1) cuts(coarse - 1) else pLo
    val cellHi = if (coarse <= cuts.length - 1) cuts(coarse) else pHi
    val f =
      if (cellHi > cellLo) {
        val t = (k - cellLo) / (cellHi - cellLo) * fine
        // Spark least/greatest ordering: NaN is GREATEST — greatest
        // keeps NaN, least then yields fine−1 (Math.min/max differ)
        val g = if (java.lang.Double.isNaN(t) || t > 0.0) t else 0.0
        if (java.lang.Double.isNaN(g) || g > fine - 1.0) fine - 1.0 else g
      } else 0.0
    coarse * fine + f.toInt
  }
}
