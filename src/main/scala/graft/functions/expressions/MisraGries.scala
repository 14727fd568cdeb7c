package graft.functions.expressions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.ArrayBasedMapData
import org.apache.spark.sql.types.{DataType, LongType, MapType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy-hitters sketch (Misra & Gries 1982) as a native
  * Spark aggregate: at most `k` (item → counter) entries of state per
  * partial, merged with the Agarwal et al. 2012 ("Mergeable
  * Summaries", PODS) reduction — pointwise add, then subtract the
  * (k+1)-th largest counter and drop non-positives — which preserves
  * the global guarantee:
  *
  *   trueCount − n/(k+1)  <=  sketchCount  <=  trueCount
  *
  * for EVERY item (n = total rows aggregated), so any item with
  * trueCount > n/(k+1) is guaranteed present. That bound is what the
  * oracle verifies (the q_freq_topk pattern: exact counts checked
  * directly, sketch checked against its published bound — same scheme
  * as the HLL and quantile-sketch rows).
  *
  * Why native: the exact alternative (`groupBy(token).count` then a
  * top-k) shuffles one row per DISTINCT token — at 100 TB the token
  * universe is billions of rows of shuffle. This aggregate carries a
  * bounded k-entry map per partial regardless of input size, combines
  * map-side, and ships k rows per partition to one reducer: the
  * frequent-terms probe ("which boilerplate strings dominate this
  * crawl batch?") at a cost independent of vocabulary size.
  *
  * Counter values depend on arrival/merge order (only the BOUND is
  * deterministic), so queries must compare against the guarantee, not
  * exact values — MisraGriesSpec pins the bound across repartitionings.
  *
  * Output: map<string, long> of surviving (item → lower-bound count),
  * keys sorted so the map bytes are stable within one run.
  */
case class MisraGries(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[UTF8String, Long]]
  with UnaryLike[Expression] {

  require(k >= 1, s"freq_items: k must be >= 1, got $k")

  override def dataType: DataType =
    MapType(StringType, LongType, valueContainsNull = false)

  override def nullable: Boolean = false

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"freq_items needs a string column, got ${child.dataType.catalogString}")

  override def createAggregationBuffer(): mutable.HashMap[UTF8String, Long] =
    mutable.HashMap.empty

  override def update(
      buffer: mutable.HashMap[UTF8String, Long],
      input: InternalRow): mutable.HashMap[UTF8String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String]
      buffer.get(s) match {
        case Some(c) => buffer.update(s, c + 1)
        case None =>
          if (buffer.size < k) {
            // clone: the UTF8String may point into a reused row buffer
            buffer.update(s.clone(), 1L)
          } else {
            // classic MG step: decrement every counter, evict zeros.
            // Amortized O(1) per row: each sweep retires k counts and
            // at most n/k sweeps can happen over n rows.
            val dead = mutable.ArrayBuffer.empty[UTF8String]
            buffer.mapValuesInPlace { (key, c) =>
              if (c == 1L) dead += key
              c - 1L
            }
            dead.foreach(buffer.remove)
          }
      }
    }
    buffer
  }

  override def merge(
      buffer: mutable.HashMap[UTF8String, Long],
      other: mutable.HashMap[UTF8String, Long])
      : mutable.HashMap[UTF8String, Long] = {
    other.foreach { case (key, c) =>
      buffer.update(key, buffer.getOrElse(key, 0L) + c)
    }
    if (buffer.size > k) {
      // mergeable-summaries reduction: subtract the (k+1)-th largest
      // counter from everything, drop what hits zero — at most k
      // survivors, error grows by exactly the subtracted value
      val counts = buffer.values.toArray
      java.util.Arrays.sort(counts)
      val d = counts(counts.length - (k + 1))
      val dead = mutable.ArrayBuffer.empty[UTF8String]
      buffer.mapValuesInPlace { (key, c) =>
        if (c <= d) dead += key
        c - d
      }
      dead.foreach(buffer.remove)
    }
    buffer
  }

  override def eval(buffer: mutable.HashMap[UTF8String, Long]): Any = {
    val entries = buffer.toArray.sortBy(_._1)
    ArrayBasedMapData(
      entries.map(_._1.asInstanceOf[Any]),
      entries.map(_._2.asInstanceOf[Any]))
  }

  override def serialize(buffer: mutable.HashMap[UTF8String, Long])
      : Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.size)
    buffer.foreach { case (key, c) =>
      val b = key.getBytes
      out.writeInt(b.length)
      out.write(b)
      out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte])
      : mutable.HashMap[UTF8String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buffer = mutable.HashMap.empty[UTF8String, Long]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buffer.update(UTF8String.fromBytes(b), in.readLong())
      i += 1
    }
    buffer
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGries =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): MisraGries =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildInternal(newChild: Expression): MisraGries =
    copy(child = newChild)

  override def prettyName: String = "freq_items"
}
