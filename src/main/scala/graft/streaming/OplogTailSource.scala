package graft.streaming

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{CompositeReadLimit, MicroBatchStream, Offset, ReadLimit, ReadMaxRows, SupportsTriggerAvailableNow}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** S1 oplog tailing as a REAL Spark micro-batch source — the closest the
  * sandbox gets to the reference's live tailable cursor
  * (`collector/reader/oplog_reader.go:100-241`): an UNBOUNDED in-JVM
  * cursor buffer served through a custom DataSource-V2
  * [[MicroBatchStream]] whose offset IS the 64-bit packed BSON timestamp
  * — the exact resume-position mapping the [[ChangeSource]] seam
  * documents (`{ts: {$gt: offset}}`, `oplog_reader.go:90-97`). Unlike
  * the parquet-directory feed (whose offsets are file names), resume
  * here goes through the same ts-ordered cursor contract a live MongoDB
  * connector implements; swap [[OplogTail.Buffer]] for a tailable cursor
  * and the class IS that connector.
  *
  *  - '''Tailing''': `latestOffset` re-reads the buffer every trigger,
  *    so entries appended WHILE the query runs become the next
  *    micro-batch (the reference fetcher's poll loop).
  *  - '''Resume''': `initialOffset` = the `startingTs` option; a
  *    restarted query deserializes the checkpointed ts and re-plans
  *    `(start, end]` — replaying an uncommitted batch re-serves the SAME
  *    rows (at-least-once, converged by the idempotent merge downstream).
  *  - '''Ack/bounded memory''': `commit(ts)` purges the buffer through
  *    the committed offset — the cursor holds O(unacked) entries, never
  *    O(history) (the reference worker's purge-on-ack, `worker.go`), and
  *    [[OplogTail.Buffer.size]] exposes the bound for the scale spec.
  *
  * Single-partition batches by design: MongoDB serves ONE tailable
  * cursor per replica set; parallelism comes from one stream per shard
  * (reference: one syncer per source URL), matching how
  * [[graft.streaming.IncrSync]] runs a query per shard. In local mode
  * the buffer registry is naturally executor-visible (one JVM); a
  * cluster deployment replaces the buffer with the network cursor, so
  * the registry is never a multi-JVM surface.
  */
object OplogTail {

  /** One canonical oplog entry (the [[IncrSync.oplogSchema]] layout). */
  final case class Entry(eventId: Long, ts: Long, op: String, ns: String,
      docKey: String, value: Double, props: String = "{}", g: String = "",
      fromMigrate: Boolean = false, lsid: Option[String] = None,
      txnNumber: Option[Long] = None, o: Option[String] = None)

  private def toRow(e: Entry): InternalRow = {
    def s(v: String): AnyRef = if (v == null) null else UTF8String.fromString(v)
    new GenericInternalRow(Array[Any](e.eventId, e.ts, s(e.op), s(e.ns),
      s(e.docKey), e.value, s(e.props), s(e.g), e.fromMigrate,
      e.lsid.map(UTF8String.fromString).orNull,
      e.txnNumber.map(Long.box).orNull,
      e.o.map(UTF8String.fromString).orNull))
  }

  /** The in-JVM tail cursor: ts-ordered log, purged through the acked
    * offset. Appends must be ts-monotone relative to the purge point
    * (a cursor never re-serves below its resume position).
    */
  final class Buffer {
    private val log = new java.util.concurrent.ConcurrentSkipListMap[Long, Vector[InternalRow]]()
    @volatile private var max = Long.MinValue
    @volatile private var acked = Long.MinValue

    def append(entries: Seq[Entry]): Unit = synchronized {
      entries.foreach { e =>
        require(e.ts > acked,
          s"tail append at ts=${e.ts} at or below the acked offset $acked")
        log.merge(e.ts, Vector(toRow(e)), (a, b) => a ++ b)
        if (e.ts > max) max = e.ts
      }
    }

    def maxTs: Long = max

    def rowsIn(fromExclusive: Long, toInclusive: Long): Array[InternalRow] =
      log.subMap(fromExclusive, false, toInclusive, true)
        .values.asScala.flatten.toArray

    /** Admission control (`fetch_batch_size`): the furthest ts whose
      * cumulative row count from `fromExclusive` stays within `maxRows`,
      * capped at `toInclusiveCap`. Cuts only at ts-group boundaries (the
      * offset is a ts — a multi-row ts never splits); a first group
      * larger than the budget is taken whole rather than stalling.
      */
    def advanceBy(fromExclusive: Long, maxRows: Int,
        toInclusiveCap: Long): Long = {
      var n = 0
      var ts = fromExclusive
      val it = log.subMap(fromExclusive, false, toInclusiveCap, true)
        .entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (n > 0 && n + e.getValue.size > maxRows) return ts
        n += e.getValue.size
        ts = e.getKey
      }
      ts
    }

    /** Ack: drop everything at or below the committed offset. */
    def purgeThrough(ts: Long): Unit = synchronized {
      if (ts > acked) acked = ts
      log.headMap(ts, true).clear()
    }

    /** Unacked entries held — the O(unacked) bound the scale spec pins. */
    def size: Int = log.values.asScala.map(_.size).sum
  }

  private val registry = new scala.collection.concurrent.TrieMap[String, Buffer]

  /** Get-or-create the named buffer (MemoryStream-style registry). */
  def buffer(name: String): Buffer = registry.getOrElseUpdate(name, new Buffer)

  def drop(name: String): Unit = { registry.remove(name); () }
}

/** [[ChangeSource]] over the tail buffer `name` — inject into
  * [[IncrSync.startOplogFrom]]/[[IncrSync.startOplogTo]] for a live-tail
  * run with ts-offset resume.
  *
  * @param maxRowsPerTrigger source-side admission bound (the reference
  *   reader's `fetch_batch_size`, default 8192 there; 0 = unlimited
  *   here): each micro-batch admits at most this many rows, so a deep
  *   backlog drains in bounded batches instead of one giant one. This is
  *   the SOURCE half of backpressure; the T7 QoS token bucket
  *   ([[graft.operators.ControlOps]]) composes downstream as the
  *   apply-side half.
  */
final case class OplogTailSource(name: String, startingTs: Long = Long.MinValue,
    maxRowsPerTrigger: Int = 0)
    extends ChangeSource {
  def load(spark: SparkSession): DataFrame =
    spark.readStream.format(classOf[OplogTailProvider].getName)
      .option("buffer", name).option("startingTs", startingTs.toString)
      .option("maxRowsPerTrigger", maxRowsPerTrigger.toString).load()
}

/** ts offset: the packed BSON timestamp of the last served entry. */
private[streaming] final case class TsOffset(ts: Long) extends Offset {
  override def json: String = ts.toString
}

/** DSv2 entry point (resolved by class name — no registry file needed). */
final class OplogTailProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    IncrSync.oplogSchema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new OplogTailTable(properties.getOrDefault("buffer", "default"),
      Option(properties.get("startingTs")).map(_.toLong).getOrElse(Long.MinValue),
      Option(properties.get("maxRowsPerTrigger")).map(_.toInt).getOrElse(0))
}

private[streaming] final class OplogTailTable(name: String, startingTs: Long,
    maxRows: Int)
    extends Table with SupportsRead {
  override def name(): String = s"oplog_tail($name)"
  override def schema(): StructType = IncrSync.oplogSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new Scan {
      override def readSchema(): StructType = IncrSync.oplogSchema
      override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
        new OplogTailStream(name, startingTs, maxRows)
    }
}

private[streaming] final class OplogTailStream(name: String, startingTs: Long,
    maxRows: Int = 0)
    extends MicroBatchStream with SupportsTriggerAvailableNow {
  private def buf = OplogTail.buffer(name)
  // AvailableNow drain bound: pinned at prepare time, so entries tailed
  // in AFTER the drain started don't extend it (the wrapper-free,
  // first-class SupportsTriggerAvailableNow contract)
  @volatile private var drainTo: Option[Long] = None

  override def initialOffset(): Offset = TsOffset(startingTs)
  override def latestOffset(): Offset =
    TsOffset(math.max(buf.maxTs, startingTs))
  override def prepareForTriggerAvailableNow(): Unit =
    drainTo = Some(math.max(buf.maxTs, startingTs))
  /** The engine's admission contract: a maxRows limit advances the end
    * offset only as far as the row budget allows (ts-group granular),
    * so a deep backlog drains in bounded micro-batches — under
    * AvailableNow the drain target stays pinned and the engine keeps
    * scheduling batches until it is reached.
    */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val cap = drainTo.getOrElse(math.max(buf.maxTs, startingTs))
    val s = start.asInstanceOf[TsOffset].ts
    val budget = limit match {
      case m: ReadMaxRows => Some(m.maxRows().toInt)
      case c: CompositeReadLimit =>
        c.getReadLimits.collectFirst { case m: ReadMaxRows => m.maxRows().toInt }
      case _ => None
    }
    val end = budget match {
      case Some(n) => buf.advanceBy(s, n, cap)
      case None => cap
    }
    TsOffset(math.max(end, s))
  }
  override def getDefaultReadLimit: ReadLimit =
    if (maxRows > 0) ReadLimit.maxRows(maxRows.toLong) else ReadLimit.allAvailable()
  override def deserializeOffset(json: String): Offset = TsOffset(json.toLong)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val (s, e) = (start.asInstanceOf[TsOffset].ts, end.asInstanceOf[TsOffset].ts)
    // one partition per batch: one tailable cursor per replica set
    // (shard-level parallelism = one stream per shard, as in the reference)
    Array(OplogTailPartition(buf.rowsIn(s, e)))
  }

  override def createReaderFactory(): PartitionReaderFactory =
    (partition: InputPartition) => {
      val rows = partition.asInstanceOf[OplogTailPartition].rows
      new PartitionReader[InternalRow] {
        private var i = -1
        override def next(): Boolean = { i += 1; i < rows.length }
        override def get(): InternalRow = rows(i)
        override def close(): Unit = ()
      }
    }

  /** The engine committed through `end`: ack the cursor (purge). */
  override def commit(end: Offset): Unit =
    buf.purgeThrough(end.asInstanceOf[TsOffset].ts)
  override def stop(): Unit = ()
}

private[streaming] final case class OplogTailPartition(rows: Array[InternalRow])
    extends InputPartition
