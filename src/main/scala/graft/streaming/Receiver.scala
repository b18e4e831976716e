package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

import graft.sinks.Envelope

/** Entry point C: the receiver / tunnel consumer (SURVEY.md §3.3;
  * reference `cmd/receiver/receiver.go:121` → `receiver/replayer.go:54-146`).
  *
  * A second streaming query over the framed tunnel feed: each TMessage
  * frame is checksum-validated and decompressed by [[Envelope.decodeMessage]]
  * (the reference's retransmission gate + CRC check + decompress), its
  * payloads decoded to canonical records, and the batch handed to the
  * replay handler. The reference's ack/retransmission protocol (T9) is
  * subsumed by the streaming `checkpointLocation`: a batch is acked exactly
  * when its offsets commit, and a crash replays the uncommitted batch —
  * the same at-least-once contract, supplied by the engine.
  *
  * The default handler is the `ExampleReplayer` analogue: append the
  * decoded records to a target table (the reference's example hands each
  * decoded document to user logic and acks the last ts).
  */
object Receiver {

  /** Schema of the framed feed (what [[Envelope.messages]] emits and the
    * tunnel writers persist). Column names come from the shared
    * [[Envelope.frameColumns]] contract so writer and reader cannot
    * silently drift (a name mismatch here would read as all-null columns,
    * not an error).
    */
  val framesSchema: StructType = {
    val types = Map[String, DataType](
      "checksum" -> LongType, "tag" -> IntegerType, "shard" -> IntegerType,
      "chunk" -> IntegerType, "compress" -> IntegerType, "frame" -> BinaryType)
    StructType(Envelope.frameColumns.map(n => StructField(n, types(n))))
  }

  /** Decode one micro-batch of frames to canonical records — shard rides
    * along so per-worker ordering is reconstructible downstream.
    */
  def decodeBatch(batch: DataFrame): DataFrame = {
    val spark = batch.sparkSession
    import spark.implicits._
    batch.select(col("shard"), col("frame"))
      .as[(Int, Array[Byte])]
      .flatMap { case (shard, f) =>
        Envelope.decodeMessage(f).payloads.map(p => (shard, new String(p, "UTF-8")))
      }
      .toDF("shard", "payload_json")
      .select(col("shard"),
        get_json_object(col("payload_json"), "$.ts").cast("long").as("ts_packed"),
        get_json_object(col("payload_json"), "$.op").as("op"),
        get_json_object(col("payload_json"), "$.ns").as("ns"),
        get_json_object(col("payload_json"), "$.key").as("doc_key"),
        get_json_object(col("payload_json"), "$.o").as("props"),
        get_json_object(col("payload_json"), "$.meta.g").as("g"))
  }

  /** Start the receiver over a framed-feed directory. `handler` consumes
    * each decoded micro-batch (default: append to `targetDir/decoded`).
    */
  def start(spark: SparkSession, framesDir: String, targetDir: String,
      checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow(),
      handler: (DataFrame, Long) => Unit = null): StreamingQuery =
    startFrom(spark, ParquetDirSource(framesDir, framesSchema),
      targetDir, checkpointDir, trigger, handler)

  /** [[start]] over any [[ChangeSource]] carrying the frame columns — the
    * seam a live tunnel consumer (e.g. a Kafka reader of the TMessage
    * envelope) implements; offsets/acks ride the streaming checkpoint
    * exactly as described in [[ChangeSource]].
    */
  def startFrom(spark: SparkSession, source: ChangeSource, targetDir: String,
      checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow(),
      handler: (DataFrame, Long) => Unit = null): StreamingQuery = {
    val apply: (DataFrame, Long) => Unit =
      if (handler != null) handler
      else (decoded, batchId) =>
        // keyed per batch + overwrite: a replayed micro-batch (crash
        // between write and offset commit) rewrites its own partition
        // instead of appending duplicates
        decoded.write.mode(SaveMode.Overwrite)
          .parquet(s"$targetDir/decoded/batch=$batchId")
    source.load(spark)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        apply(decodeBatch(batch), batchId)
      }
      .start()
  }
}
