package graft.sinks

import java.nio.{ByteBuffer, ByteOrder}

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FSDataOutputStream, FileSystem, Path}
import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.col

/** K5 file tunnel (`tunnel/file_writer.go:57-168`): an append log with a
  * 32-byte magic header and per-message block framing
  * `{checksum, tag|persistent|storage, shard, compress, 0xEEEEEEEE, len}`
  * followed by the message's length-prefixed payloads.
  *
  * Uses the Hadoop `FileSystem` API throughout so the same code addresses
  * HDFS/S3 paths on a cluster. Two write shapes: [[write]] produces ONE
  * append log through a single driver-fed stream (the single-log case);
  * [[writeSharded]] is the production layout — one file per shard, each
  * written from its own executor task (the reference's one-file-per-worker
  * model, `tunnel/file_writer.go:57-168`).
  */
object FileSink {

  val FileMagic: Long = 0xeeeeeeeeee201314L
  val FileProtocol: Int = 1
  val BlockMarker: Int = 0xeeeeeeee

  final case class Block(checksum: Long, tag: Int, shard: Int, compress: Int,
      payloads: Seq[Array[Byte]])

  private def headerBytes: Array[Byte] = {
    val bb = ByteBuffer.allocate(32).order(ByteOrder.BIG_ENDIAN)
    bb.putLong(FileMagic)
    bb.putInt(FileProtocol)
    bb.putInt(0) // header checksum (reference writes 0)
    bb.array() // remaining 16 bytes reserved = 0
  }

  /** Write framed TMessage rows (the output of [[Envelope.messages]]) to
    * one tunnel file. The `frame` column already carries TMessage framing;
    * this adds the file header and per-block header.
    */
  def write(spark: SparkSession, framed: DataFrame, path: String): Unit = {
    // A single append log forces one writer, but NOT driver-resident
    // batches: the frames stream through `toLocalIterator` in (shard,
    // chunk) order — the cluster range-sorts, the driver holds one
    // partition of frames at a time, never the batch (a `collect` here is
    // a driver OOM at 100 TB-scale batches).
    val it = framed
      .selectExpr(Envelope.frameColumns: _*)
      .orderBy("shard", "chunk")
      .toLocalIterator()
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try {
      out.write(headerBytes)
      it.forEachRemaining(writeBlockRow(out, _))
    } finally out.close()
  }

  /** One framed row as a file block: the block header re-frames the
    * TMessage body (past its 20-byte header) carrying the same fields.
    */
  private def writeBlockRow(out: FSDataOutputStream, r: Row): Unit = {
    val frame = r.getAs[Array[Byte]]("frame")
    val body = frame.drop(20)
    val bb = ByteBuffer.allocate(24).order(ByteOrder.BIG_ENDIAN)
    bb.putInt((r.getAs[Long]("checksum") & 0xFFFFFFFFL).toInt)
    bb.putInt(r.getAs[Int]("tag") | Envelope.MsgPersistent | Envelope.MsgStorageBackend)
    bb.putInt(r.getAs[Int]("shard"))
    bb.putInt(r.getAs[Int]("compress"))
    bb.putInt(BlockMarker)
    bb.putInt(body.length)
    out.write(bb.array())
    out.write(body)
  }

  /** One tunnel file PER SHARD, written executor-side (the reference's
    * one-file-per-worker layout, `tunnel/file_writer.go:57-168`): frames
    * cluster on the shard key, sort within each task by (shard, chunk),
    * and every task streams its shards straight to `<path>.shard-<k>` —
    * no driver funnel, so aggregate tunnel throughput scales with the
    * shard count instead of one `FSDataOutputStream`.
    *
    * A task may co-own several shards (hash co-residence); they arrive
    * sorted, so it writes them sequentially with one open stream at a
    * time. `create(overwrite = true)` keeps task retries idempotent: a
    * retry rewrites its whole shard file from scratch. The in-lambda
    * `TaskContext` require is the no-driver-iterator guarantee — the
    * write path provably executes inside executor tasks.
    *
    * @return shard ids written (ascending), for the caller to locate
    *   `<path>.shard-<k>` files without listing the filesystem.
    */
  /** Hadoop Configuration is not serializable — ship its entries and
    * rebuild per task (works for any scheme the driver conf addresses).
    */
  private def confEntries(spark: SparkSession): Vector[(String, String)] =
    spark.sparkContext.hadoopConfiguration.asScala
      .map(e => e.getKey -> e.getValue).toVector

  private def rebuild(entries: Vector[(String, String)]): Configuration = {
    val conf = new Configuration(false)
    entries.foreach { case (k, v) => conf.set(k, v) }
    conf
  }

  def writeSharded(spark: SparkSession, framed: DataFrame, path: String): Seq[Int] = {
    val entries = confEntries(spark)
    val prefix = path
    val shards = framed
      .selectExpr(Envelope.frameColumns: _*)
      .repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col("chunk"))
      .mapPartitions { it =>
        val ctx = TaskContext.get()
        require(ctx != null,
          "file tunnel: sharded write must run inside an executor task")
        val conf = rebuild(entries)
        // Write-then-commit per shard: stream to a per-attempt temp file,
        // then swap it in whole. Two attempts of one task (speculation, a
        // zombie retry) each own their temp file, so the visible shard
        // file is always ONE complete attempt's output — never two
        // interleaved streams through create(overwrite).
        var cur = Int.MinValue
        var out: FSDataOutputStream = null
        var tmp: Path = null
        val written = Seq.newBuilder[Int]
        def commit(): Unit = if (out != null) {
          out.close(); out = null
          val dst = new Path(s"$prefix.shard-$cur")
          val fs = dst.getFileSystem(conf)
          fs.delete(dst, false)
          require(fs.rename(tmp, dst), s"file tunnel: commit rename failed for $dst")
          written += cur
        }
        def roll(shard: Int): Unit = {
          commit()
          tmp = new Path(s"$prefix.shard-$shard.attempt-${ctx.taskAttemptId()}")
          out = tmp.getFileSystem(conf).create(tmp, true)
          out.write(headerBytes)
        }
        try {
          it.foreach { r =>
            val shard = r.getAs[Int]("shard")
            if (shard != cur) { roll(shard); cur = shard }
            writeBlockRow(out, r)
          }
          commit()
        } finally if (out != null) { // abandoned attempt: drop its temp
          out.close()
          try tmp.getFileSystem(conf).delete(tmp, false) catch { case _: Exception => () }
        }
        written.result().iterator
      }(org.apache.spark.sql.Encoders.scalaInt)
      .collect() // one int per (task, shard) — bounded by the shard count
    shards.toSeq.sorted
  }

  /** Read a [[writeSharded]] layout back DISTRIBUTED: one task per shard
    * file, each streaming its blocks through the lazy checksum-validating
    * iterator and emitting decoded payloads — the read-side symmetric of
    * the per-shard write (no driver funnel; aggregate read throughput
    * scales with the shard count). Each block's header shard id is
    * verified against the file it came from.
    *
    * @return (shard, payload) rows — payload bytes are the decompressed
    *   tunnel payloads in file (= chunk) order within each shard.
    */
  def readSharded(spark: SparkSession, path: String, shards: Seq[Int]): DataFrame = {
    val entries = confEntries(spark)
    val prefix = path
    import spark.implicits._
    spark.createDataset(shards)(org.apache.spark.sql.Encoders.scalaInt)
      .repartition(math.max(shards.size, 1))
      .flatMap { k =>
        val blocks = readWith(rebuild(entries), s"$prefix.shard-$k")
        blocks.flatMap { b =>
          if (b.shard != k) {
            // decode errors self-close inside the iterator; this
            // validation failure must release the handle too
            blocks.close()
            throw new IllegalArgumentException(
              s"shard-$k file carries a shard-${b.shard} block")
          }
          b.payloads.map(p => (k, p))
        }
      }
      .toDF("shard", "payload")
  }

  /** Read a tunnel file back as a LAZY block iterator, validating the
    * magic, protocol, block markers, and each block's XOR-of-CRC32
    * checksum (the S5 file-reader side, `tunnel/file_reader.go`).
    *
    * A tunnel file is an append log and can exceed the driver heap;
    * resident memory is one decoded block (≤ the 1024-log frame cap),
    * never the file — blocks are decoded on demand as the caller pulls.
    * The stream closes on exhaustion or on the first decode error; an
    * abandoned iterator is also closed by `close()` (the caller owns the
    * handle when it stops early).
    */
  def read(spark: SparkSession, path: String): Iterator[Block] with AutoCloseable =
    readWith(spark.sparkContext.hadoopConfiguration, path)

  /** `scripts/filestat` as an engine surface: header fields plus
    * per-shard message counts of a tunnel dump. One sequential pass —
    * the format is variable-length framed and cannot split, and the
    * reference tool is the same sequential scan; resident memory is one
    * block. Output rows (section, k, n, s): `header` carries the magic
    * (hex string) and protocol; `codec` one row PER DISTINCT compress id
    * observed with its block count (compress is a per-block field — a
    * mid-file codec drift is exactly what an inspector must surface, so
    * no single id can summarize it); `shard` rows the payload count per
    * shard; `total` the overall count.
    */
  def stat(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val it = read(spark, path)
    var total = 0L
    val perShard = scala.collection.mutable.SortedMap.empty[Int, Long]
    val perCodec = scala.collection.mutable.SortedMap.empty[Int, Long]
    try it.foreach { b =>
      perShard(b.shard) = perShard.getOrElse(b.shard, 0L) + b.payloads.length
      perCodec(b.compress) = perCodec.getOrElse(b.compress, 0L) + 1L
      total += b.payloads.length
    } finally it.close()
    val rows = Seq(
      ("header", "magic", 0L, f"$FileMagic%x"),
      ("header", "protocol", FileProtocol.toLong, "")) ++
      perCodec.toSeq.map { case (c, n) => ("codec", c.toString, n, "") } ++
      perShard.toSeq.map { case (sh, n) => ("shard", sh.toString, n, "") } ++
      Seq(("total", "", total, ""))
    rows.toDF("section", "k", "n", "s")
  }

  /** [[read]] against an explicit Hadoop configuration — the task-side
    * entry [[readSharded]] uses (a task has no SparkSession).
    */
  def readWith(conf: Configuration, path: String): Iterator[Block] with AutoCloseable = {
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val fileLen = fs.getFileStatus(p).getLen
    val in = new java.io.DataInputStream(new java.io.BufferedInputStream(fs.open(p)))
    var consumed = 32L
    var closed = false
    def closeNow(): Unit = if (!closed) { closed = true; in.close() }
    try {
      require(in.readLong() == FileMagic, "file tunnel: bad magic")
      require(in.readInt() == FileProtocol, "file tunnel: bad protocol")
      in.skipBytes(32 - 12)
    } catch { case e: Throwable => closeNow(); throw e }
    new Iterator[Block] with AutoCloseable {
      override def close(): Unit = closeNow()
      override def hasNext: Boolean = {
        val more = !closed && consumed < fileLen
        if (!more) closeNow()
        more
      }
      override def next(): Block = {
        if (!hasNext) throw new NoSuchElementException("file tunnel: exhausted")
        try {
          val checksum = in.readInt().toLong & 0xFFFFFFFFL
          val tag = in.readInt()
          val shard = in.readInt()
          val compress = in.readInt()
          require(in.readInt() == BlockMarker, "file tunnel: bad block marker")
          val bodyLen = in.readInt()
          val rawBody = new Array[Byte](bodyLen)
          in.readFully(rawBody)
          consumed += 24L + bodyLen
          // framing is never compressed: parse payloads as framed, validate
          // the checksum over them (it covers the post-compression bytes),
          // THEN decompress each — the reference reader's CRC→decompress order
          val bodyBuf = ByteBuffer.wrap(rawBody).order(ByteOrder.BIG_ENDIAN)
          val framedPayloads = Seq.newBuilder[Array[Byte]]
          while (bodyBuf.hasRemaining) {
            // untrusted input: fail with the codec's framing error, not a
            // NegativeArraySize/BufferUnderflow from a corrupt length
            require(bodyBuf.remaining() >= 4, "file tunnel: truncated block body")
            val plen = bodyBuf.getInt
            require(plen >= 0 && plen <= bodyBuf.remaining(),
              s"file tunnel: payload length is invalid: $plen")
            val payload = new Array[Byte](plen)
            bodyBuf.get(payload)
            framedPayloads += payload
          }
          val framed = framedPayloads.result()
          val crc = Envelope.xorCrc32(framed)
          require(crc == checksum, s"file tunnel: block checksum mismatch")
          Block(checksum, tag, shard, compress,
            framed.map(Envelope.decompressBody(_, compress)))
        } catch { case e: Throwable => closeNow(); throw e }
      }
    }
  }
}
