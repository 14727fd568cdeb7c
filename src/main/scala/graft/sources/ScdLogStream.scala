package graft.sources

import graft.scd.ScdLogFeed
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxRows, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Streaming tail of the `.updates` DML log — `format("scd")` with
  * `option("feed", "log")`.
  *
  * {{{
  * spark.readStream.format("scd").option("feed", "log").load(dir)
  *   // one row per NEW retained statement, schema ScdLogFeed.schema
  * }}}
  *
  * The reference's log is append-only by design (its workflow is
  * "append a line to `.updates`", README.md:127-144) — which makes the
  * statement sequence number a natural streaming OFFSET. Each trigger
  * re-reads the sidecar (kilobytes, driver-side — the same metadata
  * asymmetry the batch feed documents, [[graft.scd.ScdLogFeed]]),
  * compares the retained-statement count against the last offset, and
  * emits exactly the new statements. Restart is exactly-once by
  * construction: offsets live in the checkpoint, and slicing an
  * append-only file by seq is deterministic.
  *
  * What flows through the stream is the LOG — tiny rows of SQL text —
  * not the data. A CDC consumer turns each micro-batch into the
  * distributed change set with [[graft.scd.ScdLogFeed.cdcBetween]]
  * inside `foreachBatch` (statements stream; diffs are ordinary batch
  * jobs — the shape that holds at 100 TB). This mirrors how Delta's
  * streaming source tails its transaction log and turns actions into
  * distributed file reads.
  *
  * Truncation/compaction ([[graft.scd.ScdReader.truncateLog]]) breaks
  * the seq coordinate system — like any log-tailing source, a stream
  * must be restarted with a fresh checkpoint after the log is rewritten
  * (a shrunken log yields an empty batch, never a crash or a re-emit).
  *
  * Streaming options:
  *   - `startingSeq` (default 0): first statement seq a FRESH
  *     checkpoint emits — the log-feed analogue of Kafka's
  *     startingOffsets, for consumers attaching to a log whose prefix
  *     is already folded into a snapshot.
  *   - `maxStatementsPerTrigger` (default unlimited): admission
  *     control — a bulk-authored log drains in bounded micro-batches.
  */
case class ScdLogTable(dir: String) extends Table with SupportsRead {

  override def name(): String = s"scd-log:$dir"

  override def schema(): StructType = ScdLogFeed.schema

  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new ScdLogScan(dir,
      startingSeq = longOpt(options, "startingseq", 0L),
      maxPerTrigger = longOpt(options, "maxstatementspertrigger", Long.MaxValue))

  private def longOpt(options: CaseInsensitiveStringMap, key: String,
      dflt: Long): Long = {
    val v = Option(options.get(key)).fold(dflt)(_.toLong)
    require(v >= 0, s"format(\"scd\") option $key must be >= 0: $v")
    v
  }
}

/** One scan serving both forms: batch (the whole current log) and
  * micro-batch (the slice between offsets). Parsing happens on the
  * driver at PLAN time; executors receive the already-sliced entries
  * inside their [[InputPartition]] — no filesystem access from tasks,
  * so the source works unmodified on any cluster. */
class ScdLogScan(dir: String, startingSeq: Long = 0L,
    maxPerTrigger: Long = Long.MaxValue) extends Scan {

  override def readSchema(): StructType = ScdLogFeed.schema

  override def description(): String = s"ScdLogScan $dir"

  // batch ignores the streaming-only options: the whole current log
  override def toBatch: Batch = new Batch {
    override def planInputPartitions(): Array[InputPartition] =
      Array(ScdLogPartition(current().toArray))
    override def createReaderFactory(): PartitionReaderFactory =
      ScdLogReaderFactory
  }

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new ScdLogMicroBatchStream(dir, startingSeq, maxPerTrigger)

  private def current(): Seq[ScdLogFeed.Entry] =
    ScdLogFeed.entries(SparkSession.active, dir)
}

/** Offset = number of statements already emitted (the next seq). */
case class ScdLogOffset(seq: Long) extends Offset {
  override def json: String = s"""{"seq":$seq}"""
}

class ScdLogMicroBatchStream(dir: String, startingSeq: Long = 0L,
    maxPerTrigger: Long = Long.MaxValue)
    extends MicroBatchStream with SupportsAdmissionControl
    with SupportsTriggerAvailableNow {

  private def spark = SparkSession.active

  // Trigger.AvailableNow end-bound, captured ONCE at query start.
  // Implemented directly (not via Spark's AvailableNowDataStreamWrapper)
  // because the wrapper discards read limits for wrapped sources —
  // maxStatementsPerTrigger must keep bounding batches while the
  // available-now run drains to this frozen end.
  private var availableNowEnd: Option[Long] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowEnd = Some(ScdLogFeed.entries(spark, dir).length.toLong)

  /** `startingSeq` skips statements already consumed elsewhere (the
    * log-feed analogue of Kafka's startingOffsets) — only for a FRESH
    * checkpoint; a recovered stream resumes from its own offsets. */
  override def initialOffset(): Offset = ScdLogOffset(startingSeq)

  override def latestOffset(): Offset =
    ScdLogOffset(ScdLogFeed.entries(spark, dir).length.toLong)

  override def getDefaultReadLimit: ReadLimit =
    if (maxPerTrigger == Long.MaxValue) ReadLimit.allAvailable()
    else ReadLimit.maxRows(maxPerTrigger)

  /** Admission control: cap each micro-batch at `maxStatementsPerTrigger`
    * statements, so a bulk-authored log (a migration appending thousands
    * of DML lines) drains in bounded batches instead of one giant
    * replay-compile. */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val current = ScdLogFeed.entries(spark, dir).length.toLong
    // under AvailableNow, never read past the end frozen at query start
    val avail = availableNowEnd.fold(current)(math.min(current, _))
    val s = start.asInstanceOf[ScdLogOffset].seq
    val capped = limit match {
      case r: ReadMaxRows => math.min(avail, s + r.maxRows())
      case _ => avail
    }
    ScdLogOffset(math.max(s, capped))
  }

  override def reportLatestOffset(): Offset =
    ScdLogOffset(ScdLogFeed.entries(spark, dir).length.toLong)

  override def deserializeOffset(json: String): Offset = {
    // {"seq":N} — written by ScdLogOffset.json; parsed structurally so
    // checkpoint round-trips are exact without a JSON dependency
    val m = """\{\s*"seq"\s*:\s*(\d+)\s*\}""".r
    json.trim match {
      case m(n) => ScdLogOffset(n.toLong)
      case other => throw new IllegalArgumentException(
        s"malformed scd log offset: $other")
    }
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[ScdLogOffset].seq
    val e = end.asInstanceOf[ScdLogOffset].seq
    // slice by seq on the re-read log: append-only ⇒ deterministic.
    // A log shrunk below `e` (out-of-band truncation) yields the rows
    // that still exist — the scaladoc's restart-with-fresh-checkpoint
    // contract, surfaced as missing rows rather than a task crash.
    val slice = ScdLogFeed.entries(spark, dir)
      .filter(en => en.seq >= s && en.seq < e)
    if (slice.isEmpty) Array.empty
    else Array(ScdLogPartition(slice.toArray))
  }

  override def createReaderFactory(): PartitionReaderFactory =
    ScdLogReaderFactory

  override def commit(end: Offset): Unit = ()

  override def stop(): Unit = ()
}

/** The partition carries its rows (statements are KB-scale metadata). */
case class ScdLogPartition(entries: Array[ScdLogFeed.Entry])
  extends InputPartition

object ScdLogReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val rows = partition.asInstanceOf[ScdLogPartition].entries
    new PartitionReader[InternalRow] {
      private var i = -1
      override def next(): Boolean = { i += 1; i < rows.length }
      override def get(): InternalRow = {
        val e = rows(i)
        InternalRow(e.seq, e.effective_ms,
          UTF8String.fromString(e.verb),
          UTF8String.fromString(e.target_table),
          UTF8String.fromString(e.stmt))
      }
      override def close(): Unit = ()
    }
  }
}
