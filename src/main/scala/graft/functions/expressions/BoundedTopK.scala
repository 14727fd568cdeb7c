package graft.functions.expressions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.types.{ArrayType, DataType, StructType}

/** Bounded per-group top-k: keep the k LARGEST struct values (by the
  * struct's natural lexicographic ordering — put the score first,
  * tie-breaks after) with a k-entry heap as the aggregation state.
  *
  * This is the scale shape for "top N per group". The window-rank
  * formulation (`row_number() OVER (PARTITION BY g ORDER BY s)`) must
  * shuffle and SORT every row of every group — a hot group lands in
  * one task and sorts in full before `rn <= k` drops the rest (the
  * same pathology the bucket-cap de-skew removed from the dedup
  * family). This aggregate is map-side combinable: each partial
  * carries at most k rows per group, the shuffle moves k·partitions
  * rows per group instead of the group, and a skewed group costs its
  * scan, not a single-task sort. Results are exactly the window's
  * rows whenever the struct ordering is total (include a unique
  * tie-break field), which is what the oracle verifies.
  *
  * Output: array<struct> sorted descending (rank order, best first).
  */
case class BoundedTopK(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[InternalRow]]
  with UnaryLike[Expression] {

  require(k >= 1, s"top_k: k must be >= 1, got $k")

  private def structType: StructType =
    child.dataType.asInstanceOf[StructType]

  override def dataType: DataType =
    ArrayType(child.dataType, containsNull = false)

  override def nullable: Boolean = false

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case s: StructType if RowOrderingUtil.isOrderable(s) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"top_k needs an orderable struct column, got ${other.catalogString}")
    }

  @transient private lazy val ord: Ordering[InternalRow] =
    TypeUtils.getInterpretedOrdering(child.dataType)
      .asInstanceOf[Ordering[InternalRow]]

  // PriorityQueue dequeues its ordering's MAX; reversing makes the
  // head the current MINIMUM — the eviction candidate
  private def newHeap(): mutable.PriorityQueue[InternalRow] =
    new mutable.PriorityQueue[InternalRow]()(ord.reverse)

  override def createAggregationBuffer(): mutable.PriorityQueue[InternalRow] =
    newHeap()

  private def offer(
      heap: mutable.PriorityQueue[InternalRow], row: InternalRow): Unit =
    if (heap.size < k) {
      heap.enqueue(row.copy())
    } else if (ord.compare(row, heap.head) > 0) {
      heap.dequeue()
      heap.enqueue(row.copy())
    }

  override def update(
      heap: mutable.PriorityQueue[InternalRow],
      input: InternalRow): mutable.PriorityQueue[InternalRow] = {
    val v = child.eval(input)
    if (v != null) offer(heap, v.asInstanceOf[InternalRow])
    heap
  }

  override def merge(
      heap: mutable.PriorityQueue[InternalRow],
      other: mutable.PriorityQueue[InternalRow])
      : mutable.PriorityQueue[InternalRow] = {
    other.foreach(offer(heap, _))
    heap
  }

  override def eval(heap: mutable.PriorityQueue[InternalRow]): Any =
    new GenericArrayData(
      heap.toArray.sorted(ord.reverse).map(_.asInstanceOf[Any]))

  @transient private lazy val proj: UnsafeProjection =
    UnsafeProjection.create(Array(child.dataType))

  override def serialize(heap: mutable.PriorityQueue[InternalRow])
      : Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(heap.size)
    heap.foreach { row =>
      val bytes = proj(InternalRow(row)).getBytes
      out.writeInt(bytes.length)
      out.write(bytes)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte])
      : mutable.PriorityQueue[InternalRow] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val heap = newHeap()
    val n = in.readInt()
    val nFields = structType.length
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      val ur = new UnsafeRow(1)
      ur.pointTo(b, len)
      heap.enqueue(ur.getStruct(0, nFields).copy())
      i += 1
    }
    heap
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedTopK =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): BoundedTopK =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildInternal(newChild: Expression): BoundedTopK =
    copy(child = newChild)

  override def prettyName: String = "top_k"
}

private[expressions] object RowOrderingUtil {
  def isOrderable(dt: DataType): Boolean =
    org.apache.spark.sql.catalyst.expressions.RowOrdering.isOrderable(dt)
}
