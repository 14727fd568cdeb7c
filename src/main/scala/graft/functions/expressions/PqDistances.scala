package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native codegen'd inner loops for the compressed-domain ANN serving
  * path (PQ/SQ8). The declarative `aggregate`-HOF folds these replace
  * route through `ArrayAggregate` (CodegenFallback) — every element of
  * every (query, vector) pair evaluated interpreted with a
  * lambda-binding per step, which at corpus scale IS the entire
  * serving cost. Each expression reproduces its fold's arithmetic
  * bit-for-bit (same IEEE-double operation order, same
  * `(long) Math.floor` micro-quantization, same left-to-right integer
  * sums), so every existing DuckDB oracle replays unchanged — pinned
  * by PqDistancesSpec against the HOF forms.
  *
  * Domain notes shared by all: the valid domain is the one the
  * builders construct (dense size-checked codebooks/grids, codes in
  * [0, k)); out-of-range lookups DELIBERATELY fail loud
  * (ArrayIndexOutOfBounds) where the replaced folds' `element_at`
  * returned NULL under this repo's non-ANSI sessions — a corrupted
  * codes artifact should kill the job, not silently NULL-propagate
  * into a wrong top-k (ADVICE r16: in-domain results are pinned
  * identical; only the out-of-domain failure MODE differs, by
  * choice). NULL inputs/elements propagate exactly as the folds'
  * three-valued logic did.
  */

/** `Σ_s dt[s][codes[s]]` — the PQ asymmetric-distance (ADC) sum:
  * m exact-long table lookups per (query, vector) pair
  * (see [[graft.operators.Similarity.pqTopKWith]]). NULL dt/codes or
  * any NULL element/cell → NULL, like the `+`-fold. */
case class AdcDistance(left: Expression, right: Expression, m: Int)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "adc_distance"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(ArrayType(LongType, _), _), ArrayType(IntegerType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"adc_distance needs (array<array<bigint>>, array<int>), got " +
            s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
    }

  override def nullSafeEval(dt: Any, codes: Any): Any =
    PqMath.adcSum(dt.asInstanceOf[ArrayData], codes.asInstanceOf[ArrayData], m)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqMath", PqMath, PqMath.getClass.getName)
    nullSafeCodeGen(ctx, ev, (dt, codes) => {
      val boxed = ctx.freshName("adc")
      s"""
         |Object $boxed = $ref.adcSum($dt, $codes, $m);
         |if ($boxed == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ((java.lang.Long) $boxed).longValue(); }
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): AdcDistance =
    copy(left = newLeft, right = newRight)
}

/** The SQ8 asymmetric distance: per dimension the code reconstructs to
  * its cell midpoint `lo + (code + 0.5)·(hi − lo)/256` against the
  * (d-sorted, size-checked) grid, and the result is the exact-long sum
  * of `floor(1e6·(q_d − recon_d)²)` terms
  * (see [[graft.operators.Similarity.sqTopKWith]]). Children:
  * (grid: array<struct<d,lo,hi>>, codes: array<int>, qv:
  * array<double>). NULL input or any NULL element/field → NULL. */
case class SqDistance(first: Expression, second: Expression,
    third: Expression, dim: Int) extends TernaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "sq_distance"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(StructType(fields), _), ArrayType(IntegerType, _),
            ArrayType(DoubleType, _))
          if fields.length == 3 && fields(1).dataType == DoubleType &&
            fields(2).dataType == DoubleType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          "sq_distance needs (array<struct<d,lo:double,hi:double>>, " +
            s"array<int>, array<double>), got ${first.dataType.catalogString}, " +
            s"${second.dataType.catalogString}, ${third.dataType.catalogString}")
    }

  override def nullSafeEval(g: Any, codes: Any, qv: Any): Any =
    PqMath.sqSum(g.asInstanceOf[ArrayData], codes.asInstanceOf[ArrayData],
      qv.asInstanceOf[ArrayData], dim)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqMath", PqMath, PqMath.getClass.getName)
    nullSafeCodeGen(ctx, ev, (g, codes, qv) => {
      val boxed = ctx.freshName("sqd")
      s"""
         |Object $boxed = $ref.sqSum($g, $codes, $qv, $dim);
         |if ($boxed == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ((java.lang.Long) $boxed).longValue(); }
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): SqDistance =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** All-m-subspaces PQ code assignment for one vector against the
  * (sub, code)-sorted dense codebook array: per subspace the argmin
  * over its k codewords on `floor(1e6·‖sv − cw‖²)` exact longs via the
  * dot-identity expansion, ties → lowest code
  * (see [[graft.operators.Similarity.pqEncode]]). Returns -1 sentinels
  * where no distance is defined (NULL vector/elements, width
  * mismatch) — NEVER NULL, so the caller's fail-fast `raise_error`
  * wrapper sees exactly what the fold's sentinel gave it (including
  * for a NULL input vector, which the fold also funnels to the
  * sentinel: slice(NULL) → NULL distances → init survives). */
case class PqNearestCodes(left: Expression, right: Expression,
    m: Int, k: Int, dsub: Int) extends BinaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "pq_nearest_codes"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StructType(fields), _), ArrayType(DoubleType, _))
          if fields.length == 3 && (fields(2).dataType match {
            case ArrayType(DoubleType, _) => true
            case _ => false
          }) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          "pq_nearest_codes needs (array<struct<sub,code,cvec:array<double>>>, " +
            s"array<double>), got ${left.dataType.catalogString} and " +
            s"${right.dataType.catalogString}")
    }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val cb = left.eval(input)
    val v = right.eval(input)
    PqMath.nearestCodes(
      if (cb == null) null else cb.asInstanceOf[ArrayData],
      if (v == null) null else v.asInstanceOf[ArrayData], m, k, dsub)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqMath", PqMath, PqMath.getClass.getName)
    val cb = left.genCode(ctx)
    val v = right.genCode(ctx)
    val code =
      code"""
        ${cb.code}
        ${v.code}
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
          $ref.nearestCodes(
          ${cb.isNull} ? null : ${cb.value},
          ${v.isNull} ? null : ${v.value}, $m, $k, $dsub);
      """
    ev.copy(code = code, isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqNearestCodes =
    copy(left = newLeft, right = newRight)
}

/** Single-subspace PQ code assignment: the per-(sub, subvector)-row
  * form [[graft.operators.Similarity.pqCodebooksTrained]]'s Lloyd
  * assign step runs (children: codebook array, subvector, sub index).
  * Same argmin/sentinel semantics as [[PqNearestCodes]]; a NULL sub
  * index also yields the -1 sentinel (the fold's NULL-index lookup
  * gave NULL distances). */
case class PqNearestCode(first: Expression, second: Expression,
    third: Expression, k: Int) extends TernaryExpression {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = false
  override def prettyName: String = "pq_nearest_code"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(StructType(fields), _), ArrayType(DoubleType, _),
            IntegerType) if fields.length == 3 =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          "pq_nearest_code needs (array<struct<sub,code,cvec>>, " +
            s"array<double>, int), got ${first.dataType.catalogString}, " +
            s"${second.dataType.catalogString}, ${third.dataType.catalogString}")
    }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val cb = first.eval(input)
    val sv = second.eval(input)
    val sub = third.eval(input)
    if (cb == null || sv == null || sub == null) -1
    else PqMath.nearest(cb.asInstanceOf[ArrayData],
      sv.asInstanceOf[ArrayData], 0, sv.asInstanceOf[ArrayData].numElements(),
      sub.asInstanceOf[Int], k)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqMath", PqMath, PqMath.getClass.getName)
    val cb = first.genCode(ctx)
    val sv = second.genCode(ctx)
    val sub = third.genCode(ctx)
    val code =
      code"""
        ${cb.code}
        ${sv.code}
        ${sub.code}
        int ${ev.value} = -1;
        if (!${cb.isNull} && !${sv.isNull} && !${sub.isNull}) {
          ${ev.value} = $ref.nearest(${cb.value}, ${sv.value},
            0, ${sv.value}.numElements(), ${sub.value}, $k);
        }
      """
    ev.copy(code = code, isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): PqNearestCode =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** The shared inner-loop math, callable from generated Java. Every
  * method mirrors its fold's IEEE/long arithmetic exactly (operation
  * order included); `null` returns stand in for the folds' NULL. */
object PqMath extends Serializable {

  /** Σ_s dt[s][codes[s]] over s in [0, m); null on NULL elements,
    * raises on out-of-range (the folds' ANSI element_at). */
  def adcSum(dt: ArrayData, codes: ArrayData, m: Int): java.lang.Long = {
    if (dt.numElements() < m || codes.numElements() < m)
      throw new ArrayIndexOutOfBoundsException(
        s"adc_distance: need $m subspaces, got dt=${dt.numElements()} " +
          s"codes=${codes.numElements()}")
    var s = 0
    var sum = 0L
    while (s < m) {
      if (codes.isNullAt(s) || dt.isNullAt(s)) return null
      val row = dt.getArray(s)
      val c = codes.getInt(s)
      if (c < 0 || c >= row.numElements())
        throw new ArrayIndexOutOfBoundsException(
          s"adc_distance: code $c outside table of ${row.numElements()}")
      if (row.isNullAt(c)) return null
      sum += row.getLong(c)
      s += 1
    }
    java.lang.Long.valueOf(sum)
  }

  /** Σ_d floor(1e6·(q_d − recon_d)²) with recon_d =
    * lo + (code + 0.5)·(hi − lo)/256 — same expression shape (and so
    * the same IEEE rounding) as the sqTopKWith fold. */
  def sqSum(g: ArrayData, codes: ArrayData, qv: ArrayData,
      dim: Int): java.lang.Long = {
    if (g.numElements() < dim || codes.numElements() < dim ||
        qv.numElements() < dim)
      throw new ArrayIndexOutOfBoundsException(
        s"sq_distance: need $dim dims, got grid=${g.numElements()} " +
          s"codes=${codes.numElements()} qv=${qv.numElements()}")
    var d = 0
    var sum = 0L
    while (d < dim) {
      if (g.isNullAt(d) || codes.isNullAt(d) || qv.isNullAt(d)) return null
      val row = g.getStruct(d, 3)
      if (row.isNullAt(1) || row.isNullAt(2)) return null
      val lo = row.getDouble(1)
      val hi = row.getDouble(2)
      val recon = lo + (codes.getInt(d).toDouble + 0.5) * (hi - lo) / 256
      val diff = qv.getDouble(d) - recon
      sum += Math.floor(1000000.0 * diff * diff).toLong
      d += 1
    }
    java.lang.Long.valueOf(sum)
  }

  /** All-subspace argmin codes (-1 sentinels), never null. */
  def nearestCodes(cb: ArrayData, v: ArrayData, m: Int, k: Int,
      dsub: Int): ArrayData = {
    val out = new Array[Int](m)
    var s = 0
    while (s < m) {
      out(s) =
        if (cb == null || v == null) -1
        else {
          // slice(v, s*dsub+1, dsub) semantics: an out-of-range window
          // is empty/short, which then width-mismatches every codeword
          val start = s * dsub
          val len = Math.max(0, Math.min(v.numElements() - start, dsub))
          nearest(cb, v, start, len, s, k)
        }
      s += 1
    }
    new GenericArrayData(out)
  }

  /** Argmin over codewords [sub·k, sub·k+k) for the subvector window
    * v[start, start+len): `floor(1e6·(sv·sv − 2·sv·cw + cw·cw))` exact
    * longs (each dot the DotProduct left-to-right double sum), strict
    * `<` so ties keep the lowest code; -1 when no distance is defined
    * (NULL elements, width mismatch — the fold's NULL-skip). */
  def nearest(cb: ArrayData, v: ArrayData, start: Int, len: Int,
      sub: Int, k: Int): Int = {
    if (cb.numElements() < (sub + 1) * k || sub < 0)
      throw new ArrayIndexOutOfBoundsException(
        s"pq_nearest: codebook has ${cb.numElements()} rows, needs " +
          s"${(sub + 1) * k} for sub=$sub k=$k")
    // self-dot of the subvector (shared across codewords); NaN rides
    // through as NaN (the folds' floor().cast(long) maps it to 0)
    var aa = 0.0
    var aaNull = false
    var i = 0
    while (i < len && !aaNull) {
      if (v.isNullAt(start + i)) aaNull = true
      else { val x = v.getDouble(start + i); aa += x * x }
      i += 1
    }
    var best = -1
    var bestD = Long.MaxValue
    var c = 0
    while (c < k) {
      val idx = sub * k + c
      var dm = 0L
      var defined = !aaNull && !cb.isNullAt(idx)
      if (defined) {
        val row = cb.getStruct(idx, 3)
        if (row.isNullAt(2)) defined = false
        else {
          val cw = row.getArray(2)
          if (cw.numElements() != len) defined = false
          else {
            var ab = 0.0
            var bb = 0.0
            var j = 0
            while (j < len && defined) {
              if (cw.isNullAt(j)) defined = false
              else {
                val y = cw.getDouble(j)
                ab += v.getDouble(start + j) * y
                bb += y * y
              }
              j += 1
            }
            if (defined)
              dm = Math.floor(1000000.0 * ((aa - 2.0 * ab) + bb)).toLong
          }
        }
      }
      if (defined && dm < bestD) { bestD = dm; best = c }
      c += 1
    }
    best
  }
}
