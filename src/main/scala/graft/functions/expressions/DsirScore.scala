package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Driver-local DSIR scorer artifact: the FULL `buckets`-slot table of
  * quantized log importance ratios
  * `floor((ln p_tgt(b) − ln p_raw(b)) · 1e6)` — including the
  * cr = 0 default for buckets the raw sample never hit, which the
  * partial (seen-buckets-only) `dsirBucketWeights` DataFrame cannot
  * express; that is what makes this the artifact that can score
  * ARBITRARY future documents (the streaming gate's requirement), not
  * just the corpus it was trained on. Bounded: `buckets` longs
  * (~32 KB at 4096), shipped into codegen as one plan reference. */
final case class DsirScorer(buckets: Int, weights: Array[Long])
    extends Serializable {

  require(weights.length == buckets,
    s"dsir scorer: ${weights.length} weights for $buckets buckets")
  // above 2^21 the relational floor(v/2^32 · buckets) double product
  // is no longer exact and the two paths could bucket boundary hashes
  // differently — reject rather than silently break bit-equality
  require(buckets >= 2 && buckets <= (1 << 21),
    s"dsir scorer: buckets must be in [2, 2^21], got $buckets")

  private val prefix: Array[Byte] = Array('d', 's', '|')

  /** Σ_tokens wq(bucket(t)) over the (already-lowercased) text's
    * space-split tokens — bit-identical to explode → md5-fraction
    * bucket → weight join → sum: the same "ds|" hash draw, the same
    * empty-token semantics (`split` emits one per space run, and ""
    * yields one empty token), exact long addition. Byte-level: 0x20
    * never occurs inside a UTF-8 multibyte sequence, so the byte
    * split IS the character split. */
  def score(text: UTF8String): Long = {
    val bytes = text.getBytes
    val n = bytes.length
    val md = Md5Util.md5()
    var sum = 0L
    var start = 0
    var done = false
    while (!done) {
      var e = start
      while (e < n && bytes(e) != 0x20) e += 1
      md.reset()
      md.update(prefix)
      md.update(bytes, start, e - start)
      val d = md.digest()
      val v = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      // floor(v/2^32 · buckets) without the doubles: exact for any
      // buckets ≤ 2^21 (v·buckets < 2^53 keeps the rational exact)
      sum += weights(((v * buckets) >>> 32).toInt)
      if (e >= n) done = true else start = e + 1
    }
    sum
  }
}

/** Native per-row DSIR score: the quantized log importance weight
  * Σ_tokens wq(bucket(t)) of a document against a fixed
  * [[DsirScorer]] — the SCALE path for DSIR scoring. The relational
  * formulation (token explode → broadcast weight join → per-doc sum)
  * multiplies rows by token count and shuffles a row per document for
  * the re-group; this is one fused pass per row — no explode, no
  * join, no shuffle, whole-stage codegen intact — and it is the shape
  * a STREAMING gate needs (stateless projection, no aggregation
  * state). The DuckDB oracle replays the relational twin; spec pins
  * their bit-equality.
  */
case class DsirScore(child: Expression, scorer: DsirScorer)
    extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"dsir_score needs a string column, got ${child.dataType.catalogString}")

  override protected def nullSafeEval(input: Any): Any =
    scorer.score(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("dsirScorer", scorer,
      classOf[DsirScorer].getName)
    defineCodeGen(ctx, ev, c => s"$ref.score($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): DsirScore =
    copy(child = newChild)

  override def prettyName: String = "dsir_score"
}
