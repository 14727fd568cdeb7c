package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native md5 hash fraction in [0,1): the first 4 digest bytes as a
  * big-endian unsigned 32-bit integer over 2^32 — bit-identical to the
  * declarative per-hex-digit horner form in
  * `graft.operators.Sketch.md5FractionHof` (hex digit i IS nibble i of
  * the digest, and a 32-bit-int / 2^32 divide is exact in double),
  * which is the shape the DuckDB oracle replays.
  *
  * Why native: the declarative form materializes the 32-char hex
  * string, then runs 8 substring+instr scans over it — per CALL, and
  * md5Fraction is the randomness source under minhash banding, simhash,
  * hash embeddings, Bernoulli/stratified/weighted sampling, and KMV.
  * This loop reuses a thread-local digest and never leaves bytes.
  */
case class Md5Fraction(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"md5_fraction needs a string column, got ${child.dataType.catalogString}")

  override protected def nullSafeEval(input: Any): Any =
    Md5Fraction.compute(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.Md5Fraction.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Md5Fraction =
    copy(child = newChild)
}

object Md5Fraction {
  def compute(s: UTF8String): Double = {
    val d = Md5Util.md5().digest(s.getBytes)
    val v = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
    v.toDouble / 4294967296.0
  }
}
