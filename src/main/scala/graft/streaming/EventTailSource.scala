package graft.streaming

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsTriggerAvailableNow}
import org.apache.spark.sql.types.{ArrayType, LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** S2 change-stream tailing with the reference's ACTUAL resume contract
  * (`collector/reader/event_reader.go:109-185`,
  * `common/change_stream.go:28-161`): the offset is the OPAQUE resume
  * token of the last delivered event — `StartAfter(token)` semantics —
  * and `startAtOperationTime` (a packed BSON ts) applies ONLY to the
  * cold start, exactly the branch `NewChangeStreamConn` takes when its
  * `watchStartTime` is an int64 vs a token.
  *
  * This is the sibling of [[OplogTailSource]] with the one contract
  * difference that matters: S1's ts offset is totally ordered and the
  * cursor can seek `{ts: {$gt: offset}}`; a resume token is NOT
  * comparable — the cursor may only "continue after the event bearing
  * this token". The buffer therefore keeps an APPEND-ordered log and a
  * token→position index; consumers never order, compare, or arithmetic
  * on tokens ([[EventTailSpec]] pins this with tokens whose
  * lexicographic order is the reverse of arrival order).
  *
  * Served rows carry the canonical [[graft.model.ChangeEvent]] columns —
  * the event-normalizer's input — so the full S2 pipeline
  * (8-way dispatch → oplog feed → filter chain → idempotent apply) runs
  * downstream unchanged. Ack (`commit`) purges the log through the
  * committed token, holding O(unacked) entries; the committed token's
  * own index entry survives the purge so a checkpointed restart can
  * resolve its resume position.
  */
object EventTail {

  /** One change-stream event: the opaque resume token + the canonical
    * event columns ([[graft.model.ChangeEvent]] layout).
    */
  final case class Event(token: String, eventId: Long, tsUs: Long,
      tsPacked: Long, operationType: String, db: String, coll: String,
      toDb: String, toColl: String, fullDocument: String,
      documentKey: String, updatedFields: String,
      removedFields: Seq[String] = Nil)

  /** The canonical change-event schema (see [[graft.model.ChangeEvent]]). */
  val schema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts_us", LongType),
    StructField("ts_packed", LongType),
    StructField("operation_type", StringType),
    StructField("db", StringType),
    StructField("coll", StringType),
    StructField("to_db", StringType),
    StructField("to_coll", StringType),
    StructField("full_document", StringType),
    StructField("document_key", StringType),
    StructField("updated_fields", StringType),
    StructField("removed_fields", ArrayType(StringType))))

  private def toRow(e: Event): InternalRow = {
    def s(v: String): AnyRef = if (v == null) null else UTF8String.fromString(v)
    new GenericInternalRow(Array[Any](e.eventId, e.tsUs, e.tsPacked,
      s(e.operationType), s(e.db), s(e.coll), s(e.toDb), s(e.toColl),
      s(e.fullDocument), s(e.documentKey), s(e.updatedFields),
      new GenericArrayData(e.removedFields.map(UTF8String.fromString).toArray[Any])))
  }

  /** Append-ordered change-stream cursor buffer: delivery position is
    * ARRIVAL order (the wire order of the change stream), never token
    * order; the token→position index is how `StartAfter(token)` resolves.
    */
  final class Buffer {
    // seq → (token, ts_packed, row); seq is the arrival position
    private val log = new java.util.concurrent.ConcurrentSkipListMap[Long, (String, Long, InternalRow)]()
    private val pos = new scala.collection.concurrent.TrieMap[String, Long]
    @volatile private var nextSeq = 0L
    @volatile private var last: Option[String] = None
    @volatile private var ackedSeq = -1L

    def append(events: Seq[Event]): Unit = synchronized {
      events.foreach { e =>
        require(!pos.contains(e.token), s"duplicate resume token ${e.token}")
        log.put(nextSeq, (e.token, e.tsPacked, toRow(e)))
        pos.put(e.token, nextSeq)
        last = Some(e.token)
        nextSeq += 1
      }
    }

    /** Newest appended token (survives the purge — `latestOffset`). */
    def newestToken: Option[String] = last

    /** Resume position of a token. A token the cursor never issued (or
      * purged past its retention) cannot resume — fail loudly, the
      * reference's `ChangeStreamHistoryLost` analogue.
      */
    def seqOf(token: String): Long = pos.getOrElse(token,
      throw new IllegalStateException(
        s"unknown resume token '$token' — the cursor cannot StartAfter it"))

    def rowsIn(fromExclusive: Long, toInclusive: Long): Array[InternalRow] =
      log.subMap(fromExclusive, false, toInclusive, true)
        .values.asScala.map(_._3).toArray

    /** Cold start (`startAtOperationTime` int64 branch): arrival-ordered
      * rows up to `toInclusive` whose packed ts is above the start
      * position.
      */
    def rowsFromTs(tsExclusive: Long, toInclusive: Long): Array[InternalRow] =
      log.subMap(Long.MinValue, false, toInclusive, true)
        .values.asScala.filter(_._2 > tsExclusive).map(_._3).toArray

    /** Ack: purge through the committed token. The committed token's own
      * index entry is retained (a restart resumes AFTER it).
      */
    def purgeThrough(token: String): Unit = synchronized {
      val seq = seqOf(token)
      if (seq > ackedSeq) ackedSeq = seq
      val purged = log.headMap(seq, true)
      purged.values.asScala.map(_._1).filter(_ != token).foreach(pos.remove)
      purged.clear()
    }

    /** Unacked entries held — the O(unacked) bound. */
    def size: Int = log.size
  }

  private val registry = new scala.collection.concurrent.TrieMap[String, Buffer]

  def buffer(name: String): Buffer = registry.getOrElseUpdate(name, new Buffer)

  def drop(name: String): Unit = { registry.remove(name); () }
}

/** [[ChangeSource]]-style entry: the canonical change-event stream over
  * the token cursor `name`. Pipe through
  * [[graft.transform.EventNormalizer.normalize]] →
  * [[MongoChangeSource.toOplogFeed]] for the oplog-feed seam.
  */
final case class EventTailSource(name: String,
    startAtOperationTime: Long = Long.MinValue) {
  def load(spark: SparkSession): DataFrame =
    spark.readStream.format(classOf[EventTailProvider].getName)
      .option("buffer", name)
      .option("startAtOperationTime", startAtOperationTime.toString).load()
}

/** Offsets: the opaque token, or the cold-start operation time. The two
  * arms mirror `change_stream.go:46-61` — int64 → startAtOperationTime,
  * anything else → StartAfter(token).
  */
private[streaming] sealed trait EventTailOffset extends Offset
private[streaming] final case class ResumeTokenOffset(token: String)
    extends EventTailOffset {
  override def json: String = {
    import org.json4s.JsonDSL._
    import org.json4s.jackson.JsonMethods
    JsonMethods.compact(JsonMethods.render("token" -> token))
  }
}
private[streaming] final case class StartAtOffset(ts: Long)
    extends EventTailOffset {
  override def json: String = s"""{"startAt":$ts}"""
}

private[streaming] object EventTailOffset {
  def parse(j: String): EventTailOffset = {
    import org.json4s.jackson.JsonMethods
    val v = JsonMethods.parse(j)
    (v \ "token") match {
      case org.json4s.JString(t) => ResumeTokenOffset(t)
      case _ => StartAtOffset((v \ "startAt").values.toString.toLong)
    }
  }
}

final class EventTailProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    EventTail.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new EventTailTable(properties.getOrDefault("buffer", "default"),
      Option(properties.get("startAtOperationTime")).map(_.toLong)
        .getOrElse(Long.MinValue))
}

private[streaming] final class EventTailTable(name: String, startAt: Long)
    extends Table with SupportsRead {
  override def name(): String = s"event_tail($name)"
  override def schema(): StructType = EventTail.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new Scan {
      override def readSchema(): StructType = EventTail.schema
      override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
        new EventTailStream(name, startAt)
    }
}

private[streaming] final class EventTailStream(name: String, startAt: Long)
    extends MicroBatchStream with SupportsTriggerAvailableNow {
  private def buf = EventTail.buffer(name)
  @volatile private var drainTo: Option[Option[String]] = None

  override def initialOffset(): Offset = StartAtOffset(startAt)
  override def latestOffset(): Offset =
    buf.newestToken.map(ResumeTokenOffset).getOrElse(StartAtOffset(startAt))
  override def prepareForTriggerAvailableNow(): Unit =
    drainTo = Some(buf.newestToken)
  override def latestOffset(start: Offset, limit: ReadLimit): Offset =
    drainTo.getOrElse(buf.newestToken)
      .map(ResumeTokenOffset).getOrElse(StartAtOffset(startAt))
  override def deserializeOffset(json: String): Offset =
    EventTailOffset.parse(json)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val rows = end match {
      case StartAtOffset(_) => Array.empty[InternalRow]
      case ResumeTokenOffset(e) =>
        val to = buf.seqOf(e)
        start match {
          // cold start: the int64 startAtOperationTime branch
          case StartAtOffset(ts) => buf.rowsFromTs(ts, to)
          // warm resume: StartAfter(token) — position, never order
          case ResumeTokenOffset(t) => buf.rowsIn(buf.seqOf(t), to)
        }
    }
    Array(EventTailPartition(rows))
  }

  override def createReaderFactory(): PartitionReaderFactory =
    (partition: InputPartition) => {
      val rows = partition.asInstanceOf[EventTailPartition].rows
      new PartitionReader[InternalRow] {
        private var i = -1
        override def next(): Boolean = { i += 1; i < rows.length }
        override def get(): InternalRow = rows(i)
        override def close(): Unit = ()
      }
    }

  override def commit(end: Offset): Unit = end match {
    case ResumeTokenOffset(t) => buf.purgeThrough(t)
    case _ => ()
  }
  override def stop(): Unit = ()
}

private[streaming] final case class EventTailPartition(rows: Array[InternalRow])
    extends InputPartition
