package graft.functions.expressions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Unicode normalization (NFC/NFD/NFKC/NFKD) — the text
  * canonicalization step ahead of every hash-keyed operator: the same
  * visible text arrives from a crawl as composed ("é") or decomposed
  * ("e" + U+0301) code points, and as compatibility variants
  * (full-width "Ａ", ligature "ﬁ"), all of which defeat exact
  * fingerprints, minhash shingles, and token statistics unless
  * collapsed first. NFC is the dedup-key default (canonical, lossless);
  * NFKC additionally folds compatibility forms (lossy — width,
  * ligatures, superscripts) and is what aggressive crawl dedup uses.
  *
  * Codegen'd per-row call into the JDK's own `java.text.Normalizer`
  * (the Unicode-conformant implementation already on every executor —
  * no UDF, no library); the form is a plan-time constant so the hot
  * loop carries only the string. Fast path: `Normalizer.isNormalized`
  * skips the rebuild for already-normal text (ASCII corpora pay one
  * scan, no allocation). NULL in → NULL out.
  *
  * The NFC form is oracle-replayable: DuckDB's `nfc_normalize`
  * implements the same Unicode normal form, so hash comparisons agree
  * cross-engine (pinned by the text_normalize query); NFKC/NFKD have
  * no DuckDB twin and are spec-pinned instead. */
case class UnicodeNormalize(child: Expression, form: Normalizer.Form)
    extends UnaryExpression {

  override def dataType: DataType = StringType

  override def prettyName: String = "unicode_normalize"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"unicode_normalize needs a string column, got " +
          child.dataType.catalogString)

  override protected def nullSafeEval(input: Any): Any =
    UnicodeNormalize.compute(input.asInstanceOf[UTF8String], form.ordinal())

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.UnicodeNormalize.compute($c, ${form.ordinal()})")

  override protected def withNewChildInternal(
      newChild: Expression): UnicodeNormalize = copy(child = newChild)
}

object UnicodeNormalize {
  private val Forms = Normalizer.Form.values()

  def compute(s: UTF8String, formOrdinal: Int): UTF8String = {
    val form = Forms(formOrdinal)
    val str = s.toString
    if (Normalizer.isNormalized(str, form)) s
    else UTF8String.fromString(Normalizer.normalize(str, form))
  }
}
