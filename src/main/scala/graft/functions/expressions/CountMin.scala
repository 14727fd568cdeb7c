package graft.functions.expressions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Count-Min sketch (Cormode & Muthukrishnan 2005) as a native Spark
  * aggregate: a `depth × width` grid of long counters; each input
  * string increments one cell per row of the grid, the cell chosen by
  * the md5 fraction of `"cm|<row>|" + value` (the reserved `cm|`
  * namespace) — so unlike the usual pairwise-independent-family
  * construction, the sketch is a PURE FUNCTION of the multiset of
  * values: counters are plain per-cell sums, independent of arrival
  * and merge order, and a SQL engine can rebuild the identical grid
  * from the same table (the DuckDB oracle replays every counter, not
  * just the estimate bound).
  *
  * The point-estimate for a key is `min` over the key's `depth` cells
  * ([[graft.operators.Sketch.countMinEstimate]] — plain codegen'd
  * column functions over the emitted array). Guarantees: estimate ≥
  * true count always (counters only over-count), and
  * `P[estimate > true + e/width · N] < (1/2)^depth` for N total rows.
  *
  * Why native: the exact alternative (`groupBy(key).count`) shuffles
  * one row per DISTINCT key — billions at corpus scale. This
  * aggregate carries a fixed `depth·width`-long grid per partial
  * (default 4×64 = 2 KiB) regardless of key cardinality, combines
  * map-side by pointwise addition, and ships one grid per partition:
  * the frequency-table probe at a cost independent of vocabulary
  * size, and — because the grid is linear in the input — sketches of
  * disjoint batches ADD, so per-shard sketches roll up to the corpus
  * sketch without touching the data again.
  *
  * Output: array<long> of length depth·width, row-major
  * (`cell(j, key) = j·width + floor(md5frac("cm|j|" + key) · width)`).
  */
case class CountMin(
    child: Expression,
    depth: Int,
    width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with UnaryLike[Expression] {

  require(depth >= 1 && depth <= 16,
    s"count_min: depth must be in [1, 16], got $depth")
  require(width >= 2 && width <= (1 << 20),
    s"count_min: width must be in [2, 2^20], got $width")

  override def dataType: DataType =
    ArrayType(LongType, containsNull = false)

  override def nullable: Boolean = false

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"count_min needs a string column, got ${child.dataType.catalogString}")

  // one "cm|j|" prefix per grid row, built once per task
  @transient private lazy val prefixes: Array[UTF8String] =
    Array.tabulate(depth)(j => UTF8String.fromString(s"cm|$j|"))

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](depth * width)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String]
      var j = 0
      while (j < depth) {
        val frac = Md5Fraction.compute(UTF8String.concat(prefixes(j), s))
        buffer(j * width + (frac * width).toInt) += 1L
        j += 1
      }
    }
    buffer
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buffer.length) {
      buffer(i) += other(i)
      i += 1
    }
    buffer
  }

  override def eval(buffer: Array[Long]): Any =
    new GenericArrayData(buffer.map(_.asInstanceOf[Any]))

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(buffer.length * 8)
    val out = new DataOutputStream(bos)
    var i = 0
    while (i < buffer.length) {
      out.writeLong(buffer(i))
      i += 1
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buffer = new Array[Long](depth * width)
    var i = 0
    while (i < buffer.length) {
      buffer(i) = in.readLong()
      i += 1
    }
    buffer
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CountMin =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): CountMin =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildInternal(newChild: Expression): CountMin =
    copy(child = newChild)

  override def prettyName: String = "count_min"
}
