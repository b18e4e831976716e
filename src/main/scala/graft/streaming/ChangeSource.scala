package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Pluggable streaming-source seam for the S1/S2 live connectors
  * (reference `collector/reader/oplog_reader.go:100-241`,
  * `collector/reader/event_reader.go:109-185`).
  *
  * [[IncrSync.startFrom]]/[[IncrSync.startOplogFrom]] consume any unbounded
  * DataFrame with the canonical column layout; this trait is the injection
  * point a live MongoDB connector implements without touching the dataflow.
  * The sandbox default is a parquet-directory feed
  * ([[ParquetDirSource]]) — no MongoDB is available here, so the live
  * implementations are deployment code, but everything downstream of
  * `load` (filter chain, txn assembly, barrier apply, checkpoint) is the
  * exact production path.
  *
  * ## Resume-position ↔ offset mapping (`common/change_stream.go:28-161`)
  *
  * Spark's streaming checkpoint persists per-source offsets and replays the
  * last uncommitted batch on restart. A connector maps the reference's
  * resume positions onto that contract like so:
  *
  *  - '''Oplog tailing''' (S1): offset = the 64-bit packed BSON timestamp
  *    `ts` of the last delivered entry. Resume = re-open the tailable
  *    cursor with `{ts: {$gt: offset}}` — exactly the `startingTs`
  *    predicate [[IncrSync.start]] pushes onto the scan
  *    (`oplog_reader.go:90-97`).
  *  - '''Change streams''' (S2): offset = the opaque `_id` resume token of
  *    the last event. Resume = `startAfter(token)`. The token is carried
  *    verbatim inside the offset JSON; the connector must never
  *    reinterpret or re-order it.
  *  - '''Delivery semantics''': at-least-once from the source is
  *    sufficient — the downstream apply is an idempotent
  *    last-effective-write merge (T8/K1), so a replayed batch converges;
  *    the checkpoint row commits only after the sink ack.
  */
trait ChangeSource extends Serializable {

  /** The unbounded (streaming) DataFrame this source tails. */
  def load(spark: SparkSession): DataFrame
}

/** Default sandbox feed: a parquet directory tailed by Spark's file
  * source (each new file is one resumable unit; offsets are file names in
  * the checkpoint's source log).
  */
final case class ParquetDirSource(dir: String, schema: StructType,
    maxFilesPerTrigger: Int = 0) extends ChangeSource {
  def load(spark: SparkSession): DataFrame = {
    val reader = spark.readStream.schema(schema)
    val sized = if (maxFilesPerTrigger > 0)
      reader.option("maxFilesPerTrigger", maxFilesPerTrigger) else reader
    sized.parquet(dir)
  }
}

/** Seam for an already-constructed streaming DataFrame (tests inject a
  * MemoryStream here; a deployment could wrap a Kafka reader carrying the
  * tunnel envelope the same way).
  */
final case class FrameSource(frame: () => DataFrame) extends ChangeSource {
  def load(spark: SparkSession): DataFrame = frame()
}
