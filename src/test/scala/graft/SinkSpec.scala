package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sinks.{Envelope, FileSink}

/** Tunnel envelope + file sink tests (K2/K5/S5/P13): CRC-32 golden parity
  * with `java.util.zip.CRC32`, TMessage frame round-trip, file header and
  * block framing round-trip through the Hadoop FileSystem API.
  */
class SinkSpec extends AnyFunSuite {
  lazy val spark = SparkTest.spark
  import spark.implicits._

  private def oplogDf = {
    val rows = Seq(
      (1L, 100L, "i", "app", "users_0", "app.users_0", "k1", "", 1.0, false, """{"k": 1}"""),
      (2L, 200L, "u", "app", "users_1", "app.users_1", "k2", "", 2.0, false, """{"k": 2}"""),
      (3L, 300L, "d", "app", "users_2", "app.users_2", "k3", "", 3.0, false, """{"k": 3}"""),
      (4L, 400L, "i", "app", "users_0", "app.users_0", "k4", "", 4.0, false, """{"k": 4}"""))
    rows.toDF("event_id", "ts_packed", "op", "db", "coll", "ns",
      "doc_key", "g", "value", "from_migrate", "props")
  }

  test("payload crc32 matches java.util.zip.CRC32 over the UTF-8 payload") {
    val got = Envelope.encode(oplogDf, 4)
      .select(col("payload_json"), col("payload_crc32")).as[(String, Long)].collect()
    assert(got.nonEmpty)
    got.foreach { case (json, crc) =>
      val c = new java.util.zip.CRC32
      c.update(json.getBytes("UTF-8"))
      assert(c.getValue == crc, s"crc mismatch for $json")
    }
  }

  test("message checksum is the XOR of per-payload CRC-32s (TMessage.Crc32)") {
    val msgs = Envelope.messages(Envelope.encode(oplogDf, 2))
      .select(col("frame")).as[Array[Byte]].collect()
    assert(msgs.nonEmpty)
    msgs.foreach { frame =>
      val d = Envelope.decodeMessage(frame) // validates checksum internally
      assert(d.payloads.nonEmpty)
    }
  }

  test("frame decode inverts encode: payload bytes and shard round-trip") {
    val encoded = Envelope.encode(oplogDf, 2)
    val wantByShard = encoded
      .select(col("shard"), col("payload_json")).as[(Int, String)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val frames = Envelope.messages(encoded)
      .select(col("shard"), col("frame")).as[(Int, Array[Byte])].collect()
    assert(frames.map(_._1).toSet == wantByShard.keySet)
    frames.foreach { case (shard, frame) =>
      val d = Envelope.decodeMessage(frame)
      assert(d.shard == shard)
      assert(d.payloads.map(new String(_, "UTF-8")).toSet == wantByShard(shard))
    }
  }

  test("corrupted frame is rejected by the checksum") {
    val frame = Envelope.messages(Envelope.encode(oplogDf, 1))
      .select(col("frame")).as[Array[Byte]].head()
    val bad = frame.clone()
    bad(bad.length - 1) = (bad(bad.length - 1) ^ 0x01).toByte
    intercept[IllegalArgumentException](Envelope.decodeMessage(bad))
  }

  test("file sink: header magic + block framing round-trip via Hadoop FS") {
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_file_sink_test.bin"
    val framed = Envelope.messages(Envelope.encode(oplogDf, 2))
    FileSink.write(spark, framed, path)
    val blocks = FileSink.read(spark, path).toSeq
    assert(blocks.map(_.shard).sorted == framed.select("shard").as[Int].collect().sorted.toSeq)
    assert((blocks.head.tag & Envelope.MsgPersistent) != 0)
    assert((blocks.head.tag & Envelope.MsgStorageBackend) != 0)
    val allPayloads = blocks.flatMap(_.payloads).map(new String(_, "UTF-8")).toSet
    val want = Envelope.encode(oplogDf, 2).select("payload_json").as[String].collect().toSet
    assert(allPayloads == want)
  }

  test("K5 sharded: one file per shard, written executor-side, blocks land in their shard's file") {
    val prefix = s"${System.getProperty("java.io.tmpdir")}/graft_file_sink_sharded.bin"
    val framed = Envelope.messages(Envelope.encode(oplogDf, 4))
    val shards = FileSink.writeSharded(spark, framed, prefix)
    // ≥2 shard files — the single-writer funnel is gone (the in-lambda
    // TaskContext require already proved every write ran inside a task;
    // a driver-side fallback would have thrown during the action)
    assert(shards.size >= 2)
    assert(shards == framed.select("shard").as[Int].collect().distinct.sorted.toSeq)
    // every block in <prefix>.shard-k belongs to shard k, in chunk order,
    // and the union of all shard files is exactly the framed feed
    val wantByShard = framed.select(col("shard"), col("frame"))
      .as[(Int, Array[Byte])].collect()
      .groupBy(_._1).view.mapValues(_.flatMap(f =>
        Envelope.decodeMessage(f._2).payloads.map(new String(_, "UTF-8"))).toSet).toMap
    shards.foreach { k =>
      val blocks = FileSink.read(spark, s"$prefix.shard-$k").toSeq
      assert(blocks.nonEmpty)
      assert(blocks.forall(_.shard == k))
      assert(blocks.flatMap(_.payloads).map(new String(_, "UTF-8")).toSet == wantByShard(k))
    }
    // idempotent re-run: create(overwrite) rewrites, never appends
    val again = FileSink.writeSharded(spark, framed, prefix)
    assert(again == shards)
    assert(FileSink.read(spark, s"$prefix.shard-${shards.head}").size ==
      framed.filter(col("shard") === shards.head).count())
    // distributed read: one task per shard file, payload union identical
    val dist = FileSink.readSharded(spark, prefix, shards)
      .select(col("shard"), decode(col("payload"), "UTF-8").as("p"))
      .as[(Int, String)].collect()
    assert(dist.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap == wantByShard)
  }

  test("K5 sharded: a failing attempt drops its temp file and leaves no torn shard file") {
    val prefix = s"${System.getProperty("java.io.tmpdir")}/graft_file_sink_fail.bin"
    val dir = new java.io.File(prefix).getParentFile
    dir.listFiles().filter(_.getName.startsWith("graft_file_sink_fail")).foreach(_.delete())
    val framed = Envelope.messages(Envelope.encode(oplogDf, 2))
    // poison one frame: a null frame column NPEs inside the task mid-write
    val poisoned = framed.withColumn("frame",
      when(col("chunk") === 0 && col("shard") === framed.select(max("shard")).head().getInt(0),
        lit(null).cast("binary")).otherwise(col("frame")))
    intercept[Exception] {
      FileSink.writeSharded(spark, poisoned, prefix)
    }
    // no attempt temp files survive the failure; any shard file that DID
    // commit before the failure is complete and readable
    val leftovers = dir.listFiles().map(_.getName)
      .filter(n => n.startsWith("graft_file_sink_fail") && n.contains(".attempt-"))
    assert(leftovers.isEmpty, s"temp files leaked: ${leftovers.mkString(", ")}")
    dir.listFiles().filter(f => f.getName.startsWith("graft_file_sink_fail.bin.shard-"))
      .foreach { f =>
        val blocks = FileSink.read(spark, f.getAbsolutePath).toSeq
        assert(blocks.nonEmpty) // committed = complete, checksum-valid
      }
  }

  test("P12: every reference codec id round-trips, shrinks (where it can), and checksum-validates") {
    val framed = Envelope.messages(Envelope.encode(oplogDf, 1))
    val plain = framed.select(col("frame")).as[Array[Byte]].head()
    val want = Envelope.decodeMessage(plain).payloads.map(new String(_, "UTF-8")).toSet
    // reference wire ids: 1=gzip 2=snappy 3=zlib 4=raw deflate
    for (codec <- Seq(Envelope.CompressGzip, Envelope.CompressSnappy,
        Envelope.CompressZlib, Envelope.CompressDeflate)) {
      val compressed = Envelope.compressFrames(framed, codec)
        .select(col("frame")).as[Array[Byte]].head()
      // Compression is per payload (reference Compressor semantics), so
      // fixed-header codecs (gzip: 18 bytes/payload) can grow tiny test
      // payloads — only the headerless deflate forms must always shrink
      // this fixture.
      if (codec == Envelope.CompressZlib || codec == Envelope.CompressDeflate)
        assert(compressed.length < plain.length, s"codec $codec did not shrink")
      val d = Envelope.decodeMessage(compressed)
      assert(d.compress == codec)
      assert(d.payloads.map(new String(_, "UTF-8")).toSet == want)
    }
    // file sink round-trips compressed blocks too (default codec = zlib)
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_file_sink_z.bin"
    FileSink.write(spark, Envelope.compressFrames(framed), path)
    val blocks = FileSink.read(spark, path).toSeq
    assert(blocks.flatMap(_.payloads).map(new String(_, "UTF-8")).toSet == want)
  }

  test("S5 file reader is lazy: blocks decode on demand, a corrupt tail fails only when reached") {
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_file_sink_lazy.bin"
    val framed = Envelope.messages(Envelope.encode(oplogDf, 2))
    val nBlocks = framed.count().toInt
    assert(nBlocks >= 2)
    FileSink.write(spark, framed, path)
    // corrupt the tail: garbage appended past the last valid block
    val fos = new java.io.FileOutputStream(path, true)
    fos.write(Array.fill[Byte](64)(0x5A)); fos.close()
    // the raw append invalidates Hadoop's local .crc sidecar; drop it so
    // the read exercises OUR framing checks, not the transport checksum
    val f = new java.io.File(path)
    new java.io.File(f.getParent, "." + f.getName + ".crc").delete()
    // an eager reader would materialize (and fail on) the whole file here;
    // the lazy one yields every valid block before the tail errors
    val it = FileSink.read(spark, path)
    (1 to nBlocks).foreach(_ => assert(it.next().payloads.nonEmpty))
    intercept[IllegalArgumentException](it.next())
    // early stop: caller closes the handle after one block, no exhaustion
    val it2 = FileSink.read(spark, path)
    assert(it2.next().payloads.nonEmpty)
    it2.close()
    // normal exhaustion on an uncorrupted file self-closes via hasNext
    val clean = s"${System.getProperty("java.io.tmpdir")}/graft_file_sink_clean.bin"
    FileSink.write(spark, framed, clean)
    assert(FileSink.read(spark, clean).size == nBlocks)
  }

  test("conflict side-output flags re-inserts of live keys only") {
    val rows = Seq(
      (1L, 100L, "i", "app", "u0", "app.u0", "k1", "", 0.0, false, "{}"),
      (2L, 200L, "i", "app", "u0", "app.u0", "k1", "", 0.0, false, "{}"), // conflict
      (3L, 300L, "d", "app", "u0", "app.u0", "k1", "", 0.0, false, "{}"),
      (4L, 400L, "i", "app", "u0", "app.u0", "k1", "", 0.0, false, "{}"), // fresh after delete
      (5L, 100L, "u", "app", "u0", "app.u0", "k2", "", 0.0, false, "{}"),
      (6L, 200L, "i", "app", "u0", "app.u0", "k2", "", 0.0, false, "{}")) // conflict after upsert
    val df = rows.toDF("event_id", "ts_packed", "op", "db", "coll", "ns",
      "doc_key", "g", "value", "from_migrate", "props")
    val got = Envelope.conflicts(df).select("conflict_event_id").as[Long].collect().sorted
    assert(got.toSeq == Seq(2L, 6L))
  }

  test("sink_compact: lossless rewrite, bounded bins, hot partition split, " +
      "slivers merged, one file per bin") {
    val dir = "/root/testdata/sf0.001"
    val target = 256
    val out = graft.operators.SinkOps.queries("sink_compact")(spark, dir)
      .select("bin", "n_pieces", "n_buckets", "n_rows")
      .as[(Long, Long, Long, Long)].collect()
    val nSrc = spark.read.parquet(s"$dir/events.parquet").count()
    // lossless: every source row lands in exactly one bin
    assert(out.map(_._4).sum == nSrc)
    // bounded: a bin holds at most one overshooting piece past its budget
    assert(out.forall(_._4 <= 2 * target - 1))
    // the hot bucket (~75% of rows) was SPLIT across bins
    val compacted = spark.read.parquet(
      s"${graft.Work.dir("compact_q")}/compacted")
    assert(compacted.filter(col("bucket") === 16)
      .select("bin").distinct().count() > 1)
    // sliver buckets were MERGED: some bin spans more than one bucket
    assert(out.exists(_._3 > 1))
    // physical layout: exactly one data file per bin directory
    val root = new java.io.File(
      s"${graft.Work.dir("compact_q")}/compacted")
    val binDirs = root.listFiles().filter(f =>
      f.isDirectory && f.getName.startsWith("bin="))
    assert(binDirs.length == out.length)
    binDirs.foreach { d =>
      val dataFiles = d.listFiles().filter(_.getName.endsWith(".parquet"))
      assert(dataFiles.length == 1, s"${d.getName} has ${dataFiles.length} files")
    }
  }
}
