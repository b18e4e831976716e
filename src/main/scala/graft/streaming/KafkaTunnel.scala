package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** Deployment-side Kafka tunnel wiring — the TMessage envelope over the
  * standard Spark Kafka connector (reference `tunnel/kafka_writer.go:37-243`
  * write side, `tunnel/kafka_reader.go` read side).
  *
  * No Kafka broker exists in the sandbox, so the `format("kafka")` calls
  * here are deployment code; everything else — the frame-header parse, the
  * partition routing, the ordering contract — is pure column projection
  * and IS unit-tested ([[KafkaFrameSource.parseFrames]] /
  * [[KafkaTunnelSink.toKafkaRows]] round-trip in StreamingSpec). Both ends
  * speak [[graft.sinks.Envelope]]'s TMessage frame verbatim: a reference
  * receiver can consume what this sink publishes and vice versa.
  *
  * Offset mapping (the [[ChangeSource]] contract): Kafka offsets are the
  * resume position — Spark's checkpoint commits (topic, partition, offset)
  * per batch, the exact ack model of the reference's kafka reader; a crash
  * replays the last uncommitted batch and the downstream replay is
  * idempotent.
  */
object KafkaTunnel {

  /** Parse raw Kafka-source rows (`value: binary`, `partition`, `offset`)
    * into the [[Receiver.framesSchema]] column contract. The TMessage
    * header rides the first 20 bytes of `value` big-endian
    * (`tunnel/tunnel.go:61-73`): checksum, tag, shard, compress, n_logs;
    * the frame is passed through intact for [[graft.sinks.Envelope
    * .decodeMessage]]'s checksum gate. `chunk` (the in-shard order key) is
    * the Kafka offset — per-partition monotone, exactly the reader's
    * consumption order.
    */
  def parseFrames(raw: DataFrame): DataFrame = {
    def be32(pos: Int) = conv(hex(substring(col("value"), pos, 4)), 16, 10)
    // header ints are int by the frames-schema contract; a corrupt frame
    // whose 4 bytes carry the high bit would cast int → NULL silently —
    // fail loudly instead, same posture as the chunk guard below (real
    // Envelope values top out at the tag flags, far below 2^31)
    def be32Int(pos: Int, name: String) = {
      val v = be32(pos).cast("long")
      when(v <= lit(Int.MaxValue.toLong), v.cast("int"))
        .otherwise(raise_error(concat(
          lit(s"kafka tunnel: corrupt $name in frame header: "),
          v.cast("string"))).cast("int"))
        .as(name)
    }
    raw.select(
      be32(1).cast("long").as("checksum"),
      be32Int(5, "tag"),
      be32Int(9, "shard"),
      // chunk is int by the frames-schema contract; a partition whose
      // offsets outgrew Int.MaxValue must fail loudly, not wrap negative
      // and silently break the (shard, chunk) ordering key
      when(col("offset") <= lit(Int.MaxValue.toLong), col("offset").cast("int"))
        .otherwise(raise_error(concat(
          lit("kafka tunnel: offset exceeds Int.MaxValue, chunk would wrap: "),
          col("offset").cast("string"))).cast("int"))
        .as("chunk"),
      be32Int(13, "compress"),
      col("value").as("frame"))
  }

  /** S5/K2 read side: a [[ChangeSource]] for [[Receiver.startFrom]] — the
    * live tunnel consumer. Offsets/acks ride the streaming checkpoint.
    */
  final case class KafkaFrameSource(bootstrap: String, topic: String,
      startingOffsets: String = "earliest") extends ChangeSource {
    def load(spark: SparkSession): DataFrame =
      parseFrames(spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("subscribe", topic)
        .option("startingOffsets", startingOffsets)
        .load())
  }

  /** K2 write side: framed feed → Kafka-sink rows. The shard IS the
    * topic partition (the reference computes the partition from the
    * routing hash and publishes directly, `kafka_writer.go:202-224`;
    * Spark's Kafka sink honors an explicit `partition` column), so
    * in-shard frame order is preserved per partition end to end.
    */
  object KafkaTunnelSink {
    def toKafkaRows(framed: DataFrame): DataFrame =
      framed.select(
        col("shard").cast("int").as("partition"),
        col("shard").cast("string").cast("binary").as("key"),
        col("frame").as("value"))

    /** Publish a batch of frames (deployment code — needs a broker). */
    def write(framed: DataFrame, bootstrap: String, topic: String): Unit =
      toKafkaRows(framed).write.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("topic", topic)
        .save()

    /** Publish a framed STREAM (deployment code — needs a broker). */
    def start(framed: DataFrame, bootstrap: String, topic: String,
        checkpointDir: String) =
      toKafkaRows(framed).writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("topic", topic)
        .option("checkpointLocation", checkpointDir)
        .start()
  }
}
