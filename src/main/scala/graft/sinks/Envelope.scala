package graft.sinks

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.plans.JavaStringHash

/** Tunnel envelope codec (SURVEY.md §2.2 K2/K5 + §1.4; reference
  * `tunnel/tunnel.go:41-100` `TMessage`, `tunnel/kafka_writer.go:122-153`
  * encodings, `tunnel/tunnel.go:159-166` partition routing X6).
  *
  * A message is `{checksum, tag, shard, compress, n, [len|payload]*}` with
  * u32 big-endian framing; `checksum` is the XOR of each payload's CRC-32
  * (IEEE — `TMessage.Crc32`, `tunnel/tunnel.go:53-59`). The payload here is
  * the canonical JSON encoding of the oplog record (the reference's "json"
  * tunnel message; raw BSON and canonical-extended-JSON are the same shape
  * with a different payload column).
  *
  * Everything up to the frame bytes is pure Column expressions (codegen'd,
  * shuffle-free); framing aggregates per shard with one exchange. At 100 TB
  * the per-record encode is embarrassingly parallel and the only shuffle is
  * the by-shard grouping the sink needs anyway.
  */
object Envelope {

  val MsgNormal = 0
  val MsgPersistent = 0x00001000
  val MsgStorageBackend = 0x00010000

  /** The framed-feed column set [[messages]] guarantees — the single
    * definition tunnel writers select and readers
    * ([[graft.streaming.Receiver.framesSchema]], [[FileSink.write]])
    * depend on.
    */
  val frameColumns: Seq[String] =
    Seq("checksum", "tag", "shard", "chunk", "compress", "frame")

  /** The op/ns/key/o/meta tail shared by every payload encoding — one
    * definition so the json and extended-json forms cannot drift apart.
    */
  private def payloadTail: Seq[Column] = Seq(
    lit(",\"op\":\""), col("op"),
    lit("\",\"ns\":\""), col("ns"),
    lit("\",\"key\":\""), col("doc_key"),
    lit("\",\"o\":"), col("props"),
    lit(",\"meta\":{\"g\":\""), col("g"), lit("\"}}"))

  /** Canonical JSON payload (P9 LogEntryEncode analogue, key order fixed;
    * includes the P11 `{g: gid}` metadata field).
    */
  val payloadJson: Column = concat(
    (Seq(lit("{\"ts\":"), col("ts_packed").cast("string")) ++ payloadTail): _*)

  /** Canonical extended JSON payload (the reference's third tunnel
    * encoding, `kafka_writer.go:147-153` `MarshalExtJSON(canonical)`):
    * numeric BSON values carry their type tag.
    */
  val payloadExtJson: Column = concat(
    (Seq(lit("{\"ts\":{\"$numberLong\":\""), col("ts_packed").cast("string"),
      lit("\"}")) ++ payloadTail): _*)

  /** A 32-bit int as 4 big-endian bytes (binary Column). */
  def int32be(c: Column): Column = unhex(lpad(hex(c.cast("long").bitwiseAND(lit(0xFFFFFFFFL))), 8, "0"))

  /** Per-record envelope columns (the Kafka-writer projection, X6 routing
    * by Java `String.hashCode` for wire-level partition parity).
    */
  def encode(oplog: DataFrame, nShards: Int, tag: Int = MsgNormal): DataFrame =
    oplog
      .withColumn("payload_json", payloadJson)
      .withColumn("payload", encodeStr(col("payload_json")))
      .withColumn("payload_len", octet_length(col("payload_json")))
      .withColumn("payload_crc32", crc32(col("payload")))
      .withColumn("payload_md5", md5(col("payload")))
      .withColumn("shard", pmod(JavaStringHash(col("ns")), lit(nShards)))
      .withColumn("tag", lit(tag))
      .withColumn("compress", lit(0))

  private def encodeStr(c: Column): Column =
    org.apache.spark.sql.functions.encode(c, "UTF-8")

  /** Assemble TMessage frames per shard: payloads in oplog order, at most
    * `maxLogs` per message (the reference's adaptive batch cap of 1024,
    * `conf/collector.conf:290` — which also bounds frame size and keeps
    * the per-group byte-fold linear instead of one quadratic
    * shard-sized concat), checksum = XOR of per-payload CRC-32s, u32-BE
    * length-prefixed framing (`TMessage.ToBytes`). Two exchanges: the
    * in-shard ordering window and the (shard, chunk) groupBy.
    */
  def messages(encoded: DataFrame, maxLogs: Int = 1024): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("shard")).orderBy(col("ts_packed"), col("event_id"))
    val chunked = encoded.withColumn("chunk",
      ((row_number().over(w) - 1) / maxLogs).cast("int"))
    val ordered = array_sort(collect_list(struct(
      col("ts_packed"), col("event_id"), col("payload"), col("payload_crc32"))))
    chunked
      .groupBy(col("shard"), col("chunk"), col("tag"), col("compress"))
      .agg(
        ordered.as("logs"),
        expr("bit_xor(payload_crc32)").as("checksum"),
        count(lit(1)).as("n_logs"),
        sum(col("payload_len")).as("total_len"))
      .withColumn("frame",
        concat(
          int32be(col("checksum")), int32be(col("tag")), int32be(col("shard")),
          int32be(col("compress")), int32be(col("n_logs")),
          aggregate(col("logs"), lit(Array.emptyByteArray),
            (acc, x) => concat(acc,
              int32be(octet_length(x.getField("payload"))), x.getField("payload")))))
      .withColumn("content_md5",
        md5(aggregate(col("logs"), lit(Array.emptyByteArray),
          (acc, x) => concat(acc, x.getField("payload")))))
      .drop("logs")
  }

  /** P12 compressor (`modules/compress.go:18-100`): frame-body compression
    * for the wire/file tunnels, with the reference's codec-id wire values:
    * 0 = none, 1 = gzip, 2 = snappy (block format), 3 = zlib,
    * 4 = raw deflate — all at BestCompression where the codec has levels
    * (`compress.go: CompressLevel = BestCompression`). Parquet/Kafka
    * sinks use their own codecs; this path exists for the TMessage-framed
    * tunnels.
    */
  val CompressNone = 0
  val CompressGzip = 1
  val CompressSnappy = 2
  val CompressZlib = 3
  val CompressDeflate = 4

  /** Compress each frame's payloads — INDIVIDUALLY, as the reference's
    * Compressor module does (`compress.go:100-116` loops RawLogs), with
    * the checksum recomputed over the compressed payloads afterwards
    * (module order is Compressor then ChecksumCalculator,
    * `write_controller.go:46-49`). The [len|payload] framing itself is
    * never compressed, so a reference reader parses the frame first and
    * decompresses payload by payload. Runs as a per-row JVM map — the
    * same shape as the reference's writer hook. The checksum column is
    * updated alongside the frame bytes.
    */
  def compressFrames(framed: DataFrame, codec: Int = CompressZlib): DataFrame = {
    val cols = framed.columns
    // one UDF yields both the rebuilt frame and its checksum — the header
    // layout is interpreted in exactly one place (frameBytes)
    val zip = udf((f: Array[Byte]) => compressFrameWithCrc(f, codec))
    framed.withColumn("z", zip(col("frame")))
      .withColumn("frame", col("z._1"))
      .withColumn("checksum", col("z._2"))
      .withColumn("compress", lit(codec))
      .select(cols.map(col): _*)
  }

  /** Rebuild TMessage bytes from header fields + payloads (ToBytes,
    * `tunnel/tunnel.go:61-73`).
    */
  def frameBytes(checksum: Long, tag: Int, shard: Int, compress: Int,
      payloads: Seq[Array[Byte]]): Array[Byte] = {
    val size = 20 + payloads.map(_.length + 4).sum
    val bb = ByteBuffer.allocate(size).order(ByteOrder.BIG_ENDIAN)
    bb.putInt((checksum & 0xFFFFFFFFL).toInt)
    bb.putInt(tag); bb.putInt(shard); bb.putInt(compress)
    bb.putInt(payloads.length)
    payloads.foreach { p => bb.putInt(p.length); bb.put(p) }
    bb.array()
  }

  private def compressFrameWithCrc(frame: Array[Byte], codec: Int): (Array[Byte], Long) = {
    val d = decodeMessage(frame) // validates the pre-compress checksum
    val zipped = d.payloads.map(compressBody(_, codec))
    val crc = xorCrc32(zipped)
    (frameBytes(crc, d.tag, d.shard, codec, zipped), crc)
  }

  def compressFrame(frame: Array[Byte], codec: Int = CompressZlib): Array[Byte] =
    compressFrameWithCrc(frame, codec)._1

  private def deflateWith(body: Array[Byte], nowrap: Boolean): Array[Byte] = {
    val d = new java.util.zip.Deflater(java.util.zip.Deflater.BEST_COMPRESSION, nowrap)
    d.setInput(body); d.finish()
    val out = new java.io.ByteArrayOutputStream(body.length / 2 + 64)
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  private def inflateWith(body: Array[Byte], nowrap: Boolean): Array[Byte] = {
    val inf = new java.util.zip.Inflater(nowrap)
    inf.setInput(body)
    val out = new java.io.ByteArrayOutputStream(body.length * 3 + 64)
    val buf = new Array[Byte](8192)
    while (!inf.finished()) {
      val n = inf.inflate(buf)
      require(n > 0 || inf.finished(), "truncated deflate stream")
      out.write(buf, 0, n)
    }
    inf.end()
    out.toByteArray
  }

  def compressBody(body: Array[Byte], codec: Int): Array[Byte] = codec match {
    case CompressNone => body
    case CompressGzip =>
      val bos = new java.io.ByteArrayOutputStream(body.length / 2 + 64)
      val gz = new java.util.zip.GZIPOutputStream(bos) {
        `def`.setLevel(java.util.zip.Deflater.BEST_COMPRESSION)
      }
      gz.write(body); gz.close()
      bos.toByteArray
    case CompressSnappy => org.xerial.snappy.Snappy.compress(body)
    case CompressZlib => deflateWith(body, nowrap = false)
    case CompressDeflate => deflateWith(body, nowrap = true)
    case other => throw new IllegalArgumentException(s"invalid compressor id $other")
  }

  def decompressBody(body: Array[Byte], codec: Int): Array[Byte] = codec match {
    case CompressNone => body
    case CompressGzip =>
      val in = new java.util.zip.GZIPInputStream(new java.io.ByteArrayInputStream(body))
      val out = new java.io.ByteArrayOutputStream(body.length * 3 + 64)
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
      in.close()
      out.toByteArray
    case CompressSnappy => org.xerial.snappy.Snappy.uncompress(body)
    case CompressZlib => inflateWith(body, nowrap = false)
    case CompressDeflate => inflateWith(body, nowrap = true)
    case other => throw new IllegalArgumentException(s"invalid compressor id $other")
  }

  private[sinks] def inflate(body: Array[Byte]): Array[Byte] =
    inflateWith(body, nowrap = false)

  /** XOR of per-payload CRC-32s (`TMessage.Crc32`, `tunnel/tunnel.go:53-59`)
    * — THE checksum rule, shared by encoder, decoder, and the file reader.
    */
  def xorCrc32(payloads: Seq[Array[Byte]]): Long =
    payloads.foldLeft(0L) { (acc, p) =>
      val c = new java.util.zip.CRC32; c.update(p); acc ^ c.getValue
    }

  /** Decoded record of a TMessage frame (`payloads` are decompressed). */
  final case class Decoded(checksum: Long, tag: Int, shard: Int, compress: Int,
      payloads: Seq[Array[Byte]])

  /** `TMessage.FromBytes` (`tunnel/tunnel.go:75-100`): the tunnel-reader
    * side (S5). Parses the (never-compressed) framing, validates the
    * checksum over the payloads AS FRAMED (the reference checksums after
    * compression), then decompresses each payload — the receiver's
    * CRC-check → decompress order (`receiver/replayer.go:54-103`).
    */
  def decodeMessage(frame: Array[Byte]): Decoded = {
    val head = ByteBuffer.wrap(frame, 0, 20).order(ByteOrder.BIG_ENDIAN)
    val checksum = head.getInt.toLong & 0xFFFFFFFFL
    val tag = head.getInt
    val shard = head.getInt
    val compress = head.getInt
    val nFromHead = head.getInt
    val bb = ByteBuffer.wrap(frame, 20, frame.length - 20).order(ByteOrder.BIG_ENDIAN)
    var n = nFromHead
    val out = Seq.newBuilder[Array[Byte]]
    while (n > 0) {
      // The header's log count is untrusted input: a count larger than the
      // payloads actually present must fail with the codec's own framing
      // error, not a BufferUnderflowException from getInt/get.
      require(bb.remaining() >= 4,
        s"truncated message body: header claims $nFromHead logs, " +
          s"body exhausted with $n remaining")
      val len = bb.getInt
      require(len >= 0 && len <= bb.remaining(), s"oplogs in msg offset is invalid: $len")
      val p = new Array[Byte](len)
      bb.get(p)
      out += p
      n -= 1
    }
    require(bb.remaining() == 0, "message decode left bytes are not empty")
    val framedPayloads = out.result()
    val crc = xorCrc32(framedPayloads)
    require(crc == checksum, s"checksum mismatch: $checksum vs $crc")
    Decoded(checksum, tag, shard, compress,
      framedPayloads.map(decompressBody(_, compress)))
  }

  /** Round-trip: frames → decoded payload JSON rows (one per record).
    * Proves the codec inverts (`sink_decode_roundtrip`'s oracle is the
    * plain pre-encode projection).
    */
  def decodeRoundtrip(framed: DataFrame): DataFrame = {
    val spark = framed.sparkSession
    import spark.implicits._
    framed.select(col("frame")).as[Array[Byte]]
      .flatMap(f => decodeMessage(f).payloads.map(new String(_, "UTF-8")))
      .toDF("payload_json")
      .select(
        get_json_object(col("payload_json"), "$.ts").cast("bigint").as("ts_packed"),
        get_json_object(col("payload_json"), "$.op").as("op"),
        get_json_object(col("payload_json"), "$.ns").as("ns"),
        get_json_object(col("payload_json"), "$.key").as("doc_key"),
        get_json_object(col("payload_json"), "$.meta.g").as("g"))
  }

  /** K7 conflict side-output (`executor/duplicate.go:10-20`): inserts that
    * land on an already-live key are recorded to a conflict table instead
    * of failing the batch. One window over (ns, doc_key) — same shuffle
    * class as the apply itself.
    */
  def conflicts(oplog: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("ns"), col("doc_key"))
      .orderBy(col("ts_packed"), col("event_id"))
    oplog.filter(col("op").isin("i", "u", "d"))
      .withColumn("prev_op", lag(col("op"), 1).over(w))
      .filter(col("op") === "i" && col("prev_op").isin("i", "u"))
      .select(col("ns"), col("doc_key"), col("event_id").as("conflict_event_id"),
        col("ts_packed"))
  }
}
