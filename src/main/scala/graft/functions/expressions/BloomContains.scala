package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter

/** `bloom_contains(bloomBytes, xxhash64Value)` — membership test
  * against a PER-ROW bloom-filter binary column.
  *
  * WHY a custom Expression: Spark's own `BloomFilterMightContain`
  * requires its bloom side to be foldable or a scalar subquery (it is
  * built for ONE runtime filter shared by every row), so it cannot
  * probe a MANIFEST table that carries a different bloom per row —
  * the per-FILE bloom index [[graft.operators.Layout.bloomManifest]]
  * builds for file-level scan skipping. This expression deserializes
  * and tests per evaluation instead.
  *
  * Scale contract: input cardinality is the number of FILES in a
  * table (a manifest row per file), never the number of data rows —
  * the per-eval `BloomFilter.readFrom` deserialization is paid O(files)
  * times, which is exactly the cost Spark's own driver-side file
  * listing already accepts. Do NOT use this on a per-data-row stream;
  * row-level bloom pruning is [[graft.operators.BloomPrune]]'s
  * scalar-subquery path.
  *
  * Semantics: NULL bloom or NULL hash → NULL (BinaryExpression
  * default), so callers `coalesce(..., lit(false))` when an absent
  * bloom must mean "cannot skip" vs "skip". Bytes must be the
  * serialized form produced by `BloomFilterAggregate` /
  * `BloomFilter.writeTo` (the two share the sketch wire format).
  * CodegenFallback: deserialization dominates; at manifest cardinality
  * codegen is irrelevant.
  */
case class BloomContains(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true
  override def prettyName: String = "bloom_contains"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    (left.dataType, right.dataType) match {
      case (BinaryType, LongType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bloom_contains needs (binary, bigint), got " +
            s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
    }
  }

  override def nullSafeEval(bloomBytes: Any, hashed: Any): Any = {
    val bytes = bloomBytes.asInstanceOf[Array[Byte]]
    BloomFilter.readFrom(bytes).mightContainLong(hashed.asInstanceOf[Long])
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomContains =
    copy(left = newLeft, right = newRight)
}

/** `bloom_contains_any(bloomBytes, hashes)` — does the bloom possibly
  * contain ANY of the xxhash64 values? The batched form behind
  * dynamic file skipping: one `BloomFilter.readFrom` deserialization
  * per manifest ROW (not per (row, key) pair — the [[BloomContains]]
  * join-condition shape would re-parse the full serialized bloom for
  * every key of every file), then k cheap probes against the parsed
  * filter. NULL bloom or NULL array → NULL; NULL elements are skipped
  * (a NULL key can never equi-join anyway). */
case class BloomContainsAny(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true
  override def prettyName: String = "bloom_contains_any"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    (left.dataType, right.dataType) match {
      case (BinaryType, ArrayType(LongType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bloom_contains_any needs (binary, array<bigint>), got " +
            s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
    }
  }

  override def nullSafeEval(bloomBytes: Any, hashes: Any): Any = {
    val bf = BloomFilter.readFrom(bloomBytes.asInstanceOf[Array[Byte]])
    val arr = hashes
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i) && bf.mightContainLong(arr.getLong(i)))
        return true
      i += 1
    }
    false
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomContainsAny =
    copy(left = newLeft, right = newRight)
}
