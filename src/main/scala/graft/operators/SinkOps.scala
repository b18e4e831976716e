package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.filters.OplogFilters
import graft.model.Oplog
import graft.sinks.Envelope

/** Sink-surface queries (SURVEY.md §2.2 K2/K5/K7, §2.3 P9/P11/P13, §2.5
  * X6): the tunnel envelope encode, per-shard message assembly, the codec
  * round-trip (S5 reader side), and the conflict side-output — each with an
  * exact DuckDB oracle. CRC-32 fields are additionally golden-tested
  * against `java.util.zip.CRC32` in SinkSpec (DuckDB has no crc32).
  */
object SinkOps {

  private val gids = Seq("")
  private val white = Seq("^app\\.users_[0-9]+$")
  private val black = Seq("^app\\.users_3$")
  private val nShards = 4

  private def filtered(s: SparkSession, dir: String): DataFrame =
    Oplog.fromEvents(s, dir).filter(OplogFilters.chain(gids, white, black))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // K2/P9/P11/X6: per-record envelope projection (json tunnel message).
    "sink_encode" -> ((s, dir) =>
      Envelope.encode(filtered(s, dir), nShards)
        .select(col("event_id"), col("shard").cast("bigint").as("shard"),
          col("payload_json"), col("payload_len").cast("bigint").as("payload_len"),
          col("payload_md5"))),

    // TMessage assembly per (shard, ≤1024-log chunk): order, volume,
    // content digest.
    "sink_messages" -> ((s, dir) =>
      Envelope.messages(Envelope.encode(filtered(s, dir), nShards))
        .select(col("shard").cast("bigint").as("shard"), col("chunk"), col("tag"),
          col("compress"), col("n_logs"), col("total_len"), col("content_md5"))),

    // K2's canonical-extended-JSON encoding (type-tagged numerics).
    "sink_encode_extjson" -> ((s, dir) =>
      filtered(s, dir)
        .withColumn("payload_json", Envelope.payloadExtJson)
        .select(col("event_id"), col("payload_json"),
          md5(org.apache.spark.sql.functions.encode(col("payload_json"), "UTF-8")).as("payload_md5"))),

    // S5: frames decoded back to records — the codec must invert exactly.
    "sink_decode_roundtrip" -> ((s, dir) =>
      Envelope.decodeRoundtrip(
        Envelope.messages(Envelope.encode(filtered(s, dir), nShards)))),

    // K7: duplicate-key inserts recorded as a conflict side-output.
    "sink_conflicts" -> ((s, dir) => Envelope.conflicts(filtered(s, dir))),

    // K3/K4: the socket writers against a loopback receiver.
    "sink_socket_roundtrip" -> ((s, dir) => socketRoundtrip(s, dir)),

    // K6 MockWriter: the stream drained into the noop sink with the
    // observed in-plan counter — delivered volume must equal the oracle's
    // COUNT(*) (the reference's MockWriter keeps exactly this count,
    // `tunnel/mock_writer.go`).
    "sink_mock_count" -> ((s, dir) => {
      import graft.sinks.MockSink
      val n = MockSink.write(filtered(s, dir))
      import s.implicits._
      Seq(n).toDF("n_delivered")
    }),

    // Entry point C end-to-end: the REAL `Receiver.start` streaming query
    // over a written framed feed — checksum gate, decompress, payload
    // decode, replay append, offset-commit ack — then the replayed target
    // table compared against the pre-encode oracle
    // (`receiver/replayer.go:54-146`).
    "sink_receiver_e2e" -> ((s, dir) => {
      import graft.streaming.Receiver
      val work = graft.Work.dir(s"receiver_q")
      graft.streaming.IncrSync.deletePath(s, work)
      val framed = Envelope.compressFrames(
        Envelope.messages(Envelope.encode(filtered(s, dir), nShards)))
      framed.selectExpr(Envelope.frameColumns: _*)
        .coalesce(1).write.parquet(s"$work/frames")
      val q = Receiver.start(s, s"$work/frames", s"$work/target", s"$work/ckpt")
      q.awaitTermination()
      s.read.parquet(s"$work/target/decoded")
        .select("ts_packed", "op", "ns", "doc_key", "g")
    }),

    // K5 + P12 end-to-end: zlib-compressed frames through the file
    // tunnel (magic header + block framing + checksums) and back. The
    // oracle is the plain pre-encode projection — whatever the wire does,
    // the records must invert exactly. Shard 0 only: the query verifies
    // framing/codec semantics, which are volume-independent (the oracle
    // applies the same shard predicate).
    "sink_file_tunnel" -> ((s, dir) => {
      import graft.sinks.FileSink
      val work = graft.Work.dir(s"file_tunnel_q")
      graft.streaming.IncrSync.deletePath(s, work)
      val framed = Envelope.compressFrames(
        Envelope.messages(Envelope.encode(filtered(s, dir), nShards)))
        .filter(col("shard") === 0)
      FileSink.write(s, framed, s"$work/tunnel.bin")
      // reader side: lazy driver-streamed block iteration (S5 file
      // reader); materialized here only because the oracle-gate result is
      // itself a DataFrame at test scale
      import s.implicits._
      FileSink.read(s, s"$work/tunnel.bin")
        .flatMap(_.payloads.map(new String(_, "UTF-8")))
        .toSeq
        .toDF("payload_json")
        .select(
          get_json_object(col("payload_json"), "$.ts").cast("bigint").as("ts_packed"),
          get_json_object(col("payload_json"), "$.op").as("op"),
          get_json_object(col("payload_json"), "$.ns").as("ns"),
          get_json_object(col("payload_json"), "$.key").as("doc_key"),
          get_json_object(col("payload_json"), "$.meta.g").as("g"))
    }),

    // K2/S5 at the Kafka boundary: compressed frames through the
    // deployment projections — sink rows simulated as broker output
    // (per-partition offsets in publish order), parsed back through
    // KafkaTunnel.parseFrames (big-endian header fields off the frame
    // bytes), then the receiver's checksum-gated decode. The oracle is
    // the pre-encode projection plus the routing shard.
    "sink_kafka_frames" -> ((s, dir) => {
      import graft.streaming.{KafkaTunnel, Receiver}
      val framed = Envelope.compressFrames(
        Envelope.messages(Envelope.encode(filtered(s, dir), nShards)))
      val brokerRows = framed.select(col("frame").as("value"),
        col("shard").as("partition"), col("chunk").cast("long").as("offset"))
      Receiver.decodeBatch(KafkaTunnel.parseFrames(brokerRows))
        .select(col("shard").cast("bigint").as("shard"),
          col("ts_packed"), col("op"), col("ns"), col("doc_key"), col("g"))
    }),

    // Entry point C crash/resume with post-restart data: run the real
    // receiver to termination on half the framed feed (shards 0-1), land
    // MORE frame files while it is stopped, restart with the same
    // checkpointLocation. The per-batch partition of the decoded table
    // pins attribution: phase-1 frames must decode in batch 0 and phase-2
    // in batch 1 — re-reading the old file duplicates rows, skipping it
    // loses them, either hash-diverges.
    "sink_receiver_resume" -> ((s, dir) => {
      import graft.streaming.Receiver
      val work = graft.Work.dir(s"receiver_resume_q")
      graft.streaming.IncrSync.deletePath(s, work)
      val framed = Envelope.compressFrames(
        Envelope.messages(Envelope.encode(filtered(s, dir), nShards)))
        .selectExpr(Envelope.frameColumns: _*).localCheckpoint()
      framed.filter(col("shard") < 2)
        .coalesce(1).write.parquet(s"$work/frames")
      val q1 = Receiver.start(s, s"$work/frames", s"$work/target", s"$work/ckpt")
      q1.awaitTermination()
      framed.filter(col("shard") >= 2)
        .coalesce(1).write.mode("append").parquet(s"$work/frames")
      val q2 = Receiver.start(s, s"$work/frames", s"$work/target", s"$work/ckpt")
      q2.awaitTermination()
      s.read.parquet(s"$work/target/decoded")
        .select(col("batch").cast("bigint").as("batch_id"),
          col("ts_packed"), col("op"), col("ns"), col("doc_key"), col("g"))
    }),

    // Entry point C at its production shape: a CONTINUOUS receiver tail
    // (`receiver/replayer.go:54-146` runs forever on the tunnel; the
    // drain-style e2e/resume entries above never exercise that mode).
    // The REAL `Receiver.startFrom` runs under ProcessingTime with
    // maxFilesPerTrigger = 1: two frame files pre-staged in pinned
    // mod-time order, two more landing WHILE the query runs, each its own
    // micro-batch. Frames are split by routing shard, so batch
    // attribution is closed-form: shard k decodes in batch k — a resume
    // that re-reads an old file, a listing that merges arrivals into one
    // batch, or a decode loss all hash-diverge. Progress is polled off
    // the decoded table itself (the sanctioned closed-form-count pattern
    // from cdc_soak_live — processAllAvailable cannot drive a
    // ProcessingTime tail), and a stalled stream throws at the poll site
    // instead of surfacing later as an opaque oracle divergence.
    "sink_receiver_live" -> ((s, dir) => {
      import graft.streaming.{ParquetDirSource, Receiver}
      import org.apache.spark.sql.streaming.Trigger
      val work = graft.Work.dir(s"receiver_live_q")
      graft.streaming.IncrSync.deletePath(s, work)
      val enc = Envelope.encode(filtered(s, dir), nShards).localCheckpoint()
      val framed = Envelope.compressFrames(Envelope.messages(enc))
        .selectExpr(Envelope.frameColumns: _*).localCheckpoint()
      val perShard = enc.groupBy(col("shard")).count().collect()
        .map(r => r.getAs[Number]("shard").intValue -> r.getAs[Long]("count")).toMap
      def cum(k: Int): Long = (0 to k).map(perShard.getOrElse(_, 0L)).sum

      val decodedPath = new org.apache.hadoop.fs.Path(s"$work/target/decoded")
      val fs = decodedPath.getFileSystem(s.sessionState.newHadoopConf())
      def decodedTotal(): Long =
        try {
          if (!fs.exists(decodedPath)) 0L
          else s.read.parquet(decodedPath.toString).count()
        } catch { case _: Throwable => 0L }
      def awaitTotal(n: Long): Unit = {
        val deadline = System.currentTimeMillis() + 120000L
        while (decodedTotal() < n) {
          if (System.currentTimeMillis() >= deadline)
            throw new IllegalStateException(
              s"receiver soak stalled: ${decodedTotal()} of $n rows decoded " +
                "within 120s — stream made no progress")
          Thread.sleep(100)
        }
      }

      val feedDir = s"$work/frames"
      StreamOps.stageOrdered(s, feedDir, Seq(
        framed.filter(col("shard") === 0), framed.filter(col("shard") === 1)))
      val q = Receiver.startFrom(s,
        ParquetDirSource(feedDir, Receiver.framesSchema, maxFilesPerTrigger = 1),
        s"$work/target", s"$work/ckpt",
        trigger = Trigger.ProcessingTime("250 milliseconds"))
      try {
        awaitTotal(cum(1))
        framed.filter(col("shard") === 2).coalesce(1)
          .write.mode("append").parquet(feedDir)
        awaitTotal(cum(2))
        framed.filter(col("shard") === 3).coalesce(1)
          .write.mode("append").parquet(feedDir)
        awaitTotal(cum(3))
      } finally q.stop()
      s.read.parquet(s"$work/target/decoded")
        .select(col("batch").cast("bigint").as("batch_id"),
          col("ts_packed"), col("op"), col("ns"), col("doc_key"), col("g"))
    }),

    // K5 at its production shape: one tunnel file PER SHARD, written AND
    // read executor-side (`FileSink.writeSharded` / `readSharded` — no
    // driver funnel on either side), every block's shard id validated
    // against the file it landed in. The oracle is the full pre-encode
    // projection plus the routing shard — a frame written to the wrong
    // shard file, a lost shard, or a driver-side fallback (the in-task
    // require) all fail.
    // The dump inspector (`scripts/filestat` ↔ [[FileSink.stat]]): write
    // the full 4-shard feed to ONE append log, then report its header
    // fields and per-shard message counts from the BYTES — a parse of
    // the real framing, not a replay of the writer's bookkeeping. The
    // oracle computes the same report from the logical feed (shard = the
    // routing hash, counts = group-by), so a frame that dropped or
    // double-wrote payloads, a wrong shard id in a block header, or a
    // codec id drift all hash-diverge.
    "sink_filestat" -> ((s, dir) => {
      import graft.sinks.FileSink
      val work = graft.Work.dir(s"filestat_q")
      graft.streaming.IncrSync.deletePath(s, work)
      val framed = Envelope.compressFrames(
        Envelope.messages(Envelope.encode(filtered(s, dir), nShards)))
      FileSink.write(s, framed, s"$work/tunnel.bin")
      FileSink.stat(s, s"$work/tunnel.bin")
    }),

    "sink_file_tunnel_sharded" -> ((s, dir) => {
      import graft.sinks.FileSink
      val work = graft.Work.dir(s"file_tunnel_sharded_q")
      graft.streaming.IncrSync.deletePath(s, work)
      val framed = Envelope.compressFrames(
        Envelope.messages(Envelope.encode(filtered(s, dir), nShards)))
      val shards = FileSink.writeSharded(s, framed, s"$work/tunnel.bin")
      FileSink.readSharded(s, s"$work/tunnel.bin", shards)
        .select(col("shard").cast("bigint").as("shard"),
          decode(col("payload"), "UTF-8").as("payload_json"))
        .select(col("shard"),
          get_json_object(col("payload_json"), "$.ts").cast("bigint").as("ts_packed"),
          get_json_object(col("payload_json"), "$.op").as("op"),
          get_json_object(col("payload_json"), "$.ns").as("ns"),
          get_json_object(col("payload_json"), "$.key").as("doc_key"),
          get_json_object(col("payload_json"), "$.meta.g").as("g"))
    }),

    // Small-file compaction — the maintenance pass every 100 TB landing
    // zone runs continuously (the lakehouse OPTIMIZE shape): a
    // hash-partitioned layout with ONE hot partition (bucket 16 holds
    // ~75% of rows; 0-15 are slivers) is rewritten toward a uniform
    // target size by SPLITTING the hot partition into ≤256-row pieces
    // (row_number window per bucket — the split IS the compaction
    // shuffle) and COALESCING sliver pieces via the running-sum bin
    // packer over the piece stats (a piece-count-sized aggregate; the
    // plan costs nothing at scale — production swaps row counts for FS
    // byte sizes). The rewrite lands one file per bin; the query output
    // is read BACK from the compacted files — per bin, its piece/bucket
    // span and exact content totals — so loss, duplication, or
    // corruption in the rewrite hash-diverges against the source-side
    // oracle.
    "sink_compact" -> ((s, dir) => {
      val work = graft.Work.dir(s"compact_q")
      graft.streaming.IncrSync.deletePath(s, work)
      val e = graft.Tables.loadEventsNs(s, dir)
        .select(col("event_id"),
          expr("cast(round(value * 100) as bigint)").as("cents"))
        .withColumn("bucket", least(pmod(col("event_id"), lit(64L)), lit(16L)))
      // the target scales with the corpus (≈64 output files per
      // compaction unit, floored at 256 rows) — a fixed-row toy target
      // would mint thousands of output directories at scale and drown in
      // per-directory commit overhead, the exact pathology being fixed
      val target = math.max(256L, e.count() / 64L)
      // the skewed landing zone: one file per hash bucket
      e.repartition(col("bucket")).write.partitionBy("bucket")
        .parquet(s"$work/landing")
      val landed = s.read.parquet(s"$work/landing")
        .withColumn("bucket", col("bucket").cast("long"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("bucket")).orderBy(col("event_id"))
      // pinned: both the stats aggregate and the bin join consume this —
      // without the pin the per-bucket window runs twice
      val pieces = landed
        .withColumn("rn", row_number().over(w).cast("long") - 1)
        .withColumn("piece", col("bucket") * 1000 + expr(s"rn DIV $target"))
        .drop("rn")
        .localCheckpoint()
      val stats = pieces.groupBy(col("piece")).agg(count(lit(1)).as("n"))
      val pw = org.apache.spark.sql.expressions.Window
        .orderBy(col("n").desc, col("piece"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
      val plan = stats
        .withColumn("cumx", coalesce(sum(col("n")).over(pw), lit(0L)))
        .withColumn("bin", expr(s"cumx DIV $target"))
      pieces.join(broadcast(plan.select(col("piece"), col("bin"))), Seq("piece"))
        .repartition(col("bin")).write.partitionBy("bin")
        .parquet(s"$work/compacted")
      s.read.parquet(s"$work/compacted")
        .withColumn("bin", col("bin").cast("long"))
        .groupBy(col("bin"))
        .agg(countDistinct(col("piece")).as("n_pieces"),
          countDistinct(col("bucket")).as("n_buckets"),
          count(lit(1)).as("n_rows"),
          sum(col("cents")).as("cents_sum"),
          min(col("event_id")).as("min_event"),
          max(col("event_id")).as("max_event"))
    })
  )

  /** K3/K4 end-to-end: frames through the REAL socket writers — shards
    * 0-1 over the fire-and-forget TCP writer, shards 2-3 over the RPC
    * writer (which blocks on the 8-byte ack per frame) — against an
    * in-process loopback server, then decoded back to records. The
    * oracle is the plain pre-encode projection.
    */
  private def socketRoundtrip(s: SparkSession, dir: String): DataFrame = {
    import java.io.{DataInputStream, DataOutputStream}
    import java.net.ServerSocket
    import graft.sinks.{RpcFrameWriter, TcpFrameWriter}
    val framed = Envelope.messages(Envelope.encode(filtered(s, dir), nShards))
      .select(col("shard"), col("frame")).localCheckpoint()
    val expected = framed.count()
    val received = new java.util.concurrent.ConcurrentLinkedQueue[Array[Byte]]()
    // Two receivers, as in the reference: the TCP one NEVER replies (the
    // writer is fire-and-forget and never reads — an ack written to a
    // client that already closed triggers an RST that discards buffered
    // unread frames), the RPC one acks every frame (the writer blocks on
    // the 8-byte reply).
    def serve(ack: Boolean): ServerSocket = {
      val server = new ServerSocket(0)
      val acceptor = new Thread(() => {
        try {
          while (true) {
            val sock = server.accept()
            val h = new Thread(() => {
              try {
                val in = new DataInputStream(sock.getInputStream)
                val out = new DataOutputStream(sock.getOutputStream)
                var go = true
                while (go) {
                  try {
                    val len = in.readInt()
                    require(len >= 0 && len <= (1 << 26), s"bad frame length $len")
                    val buf = new Array[Byte](len)
                    in.readFully(buf)
                    received.add(buf)
                    if (ack) {
                      out.writeLong(received.size.toLong) // the reply IS the ack
                      out.flush()
                    }
                  } catch { case _: java.io.IOException => go = false }
                }
              } finally sock.close()
            })
            h.setDaemon(true); h.start()
          }
        } catch { case _: Exception => () } // server closed
      })
      acceptor.setDaemon(true); acceptor.start()
      server
    }
    val tcpServer = serve(ack = false)
    val rpcServer = serve(ack = true)
    val (tcpPort, rpcPort) = (tcpServer.getLocalPort, rpcServer.getLocalPort)
    try {
      framed.filter(col("shard") < 2).repartition(2, col("shard"))
        .foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
          val w = new TcpFrameWriter("127.0.0.1", tcpPort)
          w.open(0L, 0L); it.foreach(w.process); w.close(null)
        }
      framed.filter(col("shard") >= 2).repartition(2, col("shard"))
        .foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
          val w = new RpcFrameWriter("127.0.0.1", rpcPort)
          w.open(0L, 0L); it.foreach(w.process); w.close(null)
        }
      // the TCP path doesn't wait for acks: drain until every frame landed
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (received.size < expected && System.nanoTime() < deadline)
        Thread.sleep(20)
      require(received.size == expected,
        s"socket round-trip incomplete: ${received.size} of $expected frames")
    } finally { tcpServer.close(); rpcServer.close() }
    import s.implicits._
    received.toArray(Array.empty[Array[Byte]]).toSeq
      .flatMap(f => Envelope.decodeMessage(f).payloads.map(new String(_, "UTF-8")))
      .toDF("payload_json")
      .select(
        get_json_object(col("payload_json"), "$.ts").cast("bigint").as("ts_packed"),
        get_json_object(col("payload_json"), "$.op").as("op"),
        get_json_object(col("payload_json"), "$.ns").as("ns"),
        get_json_object(col("payload_json"), "$.key").as("doc_key"),
        get_json_object(col("payload_json"), "$.meta.g").as("g"))
  }

  private val chainSql: String = Oplog.oracleChainSql

  /** Java `String.hashCode` folded over UTF-8 code units, then pmod —
    * DuckDB mirror of [[graft.plans.JavaStringHash]] + `pmod`.
    */
  private val shardSql: String = {
    val h = "list_reduce(list_prepend(0, range(1, length(ns)+1))," +
      " (acc,i) -> (acc*31 + ord(ns[i])) % 4294967296)"
    val signed = s"(CASE WHEN $h >= 2147483648 THEN $h - 4294967296 ELSE $h END)"
    s"((($signed % $nShards) + $nShards) % $nShards)"
  }

  private val payloadSql: String =
    """'{"ts":' || CAST(ts_packed AS VARCHAR) || ',"op":"' || op || '","ns":"' || ns
       || '","key":"' || doc_key || '","o":' || props || ',"meta":{"g":"' || g || '"}}'"""

  private def withOplog(body: String): String = Oplog.withOracleCte(body)

  def oracles: Map[String, String] = Map(
    "sink_compact" ->
      """WITH e AS (
            SELECT event_id, CAST(round(value * 100) AS BIGINT) AS cents,
              least(event_id % 64, 16) AS bucket
            FROM events),
          tgt AS (SELECT greatest(256, COUNT(*) // 64) AS t FROM e),
          p AS (
            SELECT e.*, bucket * 1000 +
              (ROW_NUMBER() OVER (PARTITION BY bucket ORDER BY event_id) - 1)
                // t AS piece
            FROM e, tgt),
          st AS (SELECT piece, COUNT(*) AS n FROM p GROUP BY 1),
          plan AS (
            SELECT piece,
              CAST(COALESCE(SUM(n) OVER (ORDER BY n DESC, piece
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) // t
                AS BIGINT) AS bin
            FROM st, tgt)
          SELECT bin, COUNT(DISTINCT piece) AS n_pieces,
            COUNT(DISTINCT bucket) AS n_buckets, COUNT(*) AS n_rows,
            CAST(SUM(cents) AS BIGINT) AS cents_sum,
            MIN(event_id) AS min_event, MAX(event_id) AS max_event
          FROM p JOIN plan USING (piece)
          GROUP BY bin""",

    "sink_encode" -> withOplog(
      s""", enc AS (SELECT event_id, $shardSql AS shard, $payloadSql AS payload_json
            FROM oplog WHERE $chainSql)
          SELECT event_id, CAST(shard AS BIGINT) AS shard, payload_json,
            CAST(octet_length(encode(payload_json)) AS BIGINT) AS payload_len,
            md5(payload_json) AS payload_md5
          FROM enc"""),

    "sink_messages" -> withOplog(
      s""", enc AS (SELECT ts_packed, event_id, $shardSql AS shard, $payloadSql AS payload_json
            FROM oplog WHERE $chainSql),
          chunked AS (
            SELECT *, CAST((ROW_NUMBER() OVER (PARTITION BY shard
              ORDER BY ts_packed, event_id) - 1) // 1024 AS INT) AS chunk
            FROM enc)
          SELECT CAST(shard AS BIGINT) AS shard, chunk, 0 AS tag, 0 AS compress,
            COUNT(*) AS n_logs,
            CAST(SUM(octet_length(encode(payload_json))) AS BIGINT) AS total_len,
            md5(string_agg(payload_json, '' ORDER BY ts_packed, event_id)) AS content_md5
          FROM chunked GROUP BY shard, chunk"""),

    "sink_encode_extjson" -> withOplog(
      s""", enc AS (
            SELECT event_id,
              '{"ts":{"$$numberLong":"' || CAST(ts_packed AS VARCHAR) || '"},"op":"' || op
              || '","ns":"' || ns || '","key":"' || doc_key || '","o":' || props
              || ',"meta":{"g":"' || g || '"}}' AS payload_json
            FROM oplog WHERE $chainSql)
          SELECT event_id, payload_json, md5(payload_json) AS payload_md5 FROM enc"""),

    "sink_decode_roundtrip" -> withOplog(
      s"SELECT ts_packed, op, ns, doc_key, g FROM oplog WHERE $chainSql"),

    "sink_file_tunnel" -> withOplog(
      s"SELECT ts_packed, op, ns, doc_key, g FROM oplog WHERE $chainSql AND $shardSql = 0"),

    "sink_file_tunnel_sharded" -> withOplog(
      s"""SELECT CAST($shardSql AS BIGINT) AS shard, ts_packed, op, ns, doc_key, g
          FROM oplog WHERE $chainSql"""),

    "sink_filestat" -> withOplog(
      s"""SELECT section, k, n, s FROM (
            SELECT 'header' AS section, 'magic' AS k, CAST(0 AS BIGINT) AS n,
              'eeeeeeeeee201314' AS s
            UNION ALL SELECT 'header', 'protocol', 1, ''
            UNION ALL
            -- one codec row per distinct compress id: the whole feed is
            -- zlib, so one row whose count = Σ_shard ceil(n/1024) blocks
            SELECT 'codec', '${graft.sinks.Envelope.CompressZlib}',
              CAST(SUM(nb) AS BIGINT), ''
            FROM (SELECT CAST(CEIL(CAST(COUNT(*) AS DOUBLE) / 1024) AS BIGINT) AS nb
                  FROM oplog WHERE $chainSql GROUP BY $shardSql)
            UNION ALL
            SELECT 'shard', CAST(CAST($shardSql AS BIGINT) AS VARCHAR),
              COUNT(*), ''
            FROM oplog WHERE $chainSql GROUP BY 2
            UNION ALL
            SELECT 'total', '', COUNT(*), '' FROM oplog WHERE $chainSql)"""),

    "sink_mock_count" -> withOplog(
      s"SELECT COUNT(*) AS n_delivered FROM oplog WHERE $chainSql"),

    "sink_receiver_e2e" -> withOplog(
      s"SELECT ts_packed, op, ns, doc_key, g FROM oplog WHERE $chainSql"),

    "sink_kafka_frames" -> withOplog(
      s"""SELECT CAST($shardSql AS BIGINT) AS shard, ts_packed, op, ns, doc_key, g
          FROM oplog WHERE $chainSql"""),

    "sink_receiver_resume" -> withOplog(
      s"""SELECT CAST(CASE WHEN $shardSql < 2 THEN 0 ELSE 1 END AS BIGINT) AS batch_id,
          ts_packed, op, ns, doc_key, g
          FROM oplog WHERE $chainSql"""),

    "sink_receiver_live" -> withOplog(
      s"""SELECT CAST($shardSql AS BIGINT) AS batch_id, ts_packed, op, ns, doc_key, g
          FROM oplog WHERE $chainSql"""),

    "sink_socket_roundtrip" -> withOplog(
      s"SELECT ts_packed, op, ns, doc_key, g FROM oplog WHERE $chainSql"),

    "sink_conflicts" -> withOplog(
      s""", eff AS (
            SELECT ns, doc_key, event_id, ts_packed, op,
              lag(op) OVER (PARTITION BY ns, doc_key ORDER BY ts_packed, event_id) AS prev_op
            FROM oplog WHERE $chainSql AND op IN ('i','u','d'))
          SELECT ns, doc_key, event_id AS conflict_event_id, ts_packed
          FROM eff WHERE op = 'i' AND prev_op IN ('i','u')""")
  )
}
