package graft

import java.io.{DataInputStream, DataOutputStream}
import java.net.ServerSocket

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sinks.{Envelope, RpcFrameWriter, TcpFrameWriter}
import graft.sources.Catalog
import graft.streaming.FullSync

/** S6 catalog discovery, K3/K4 socket sinks against a local receiver,
  * W10/W11 snapshot spec + drop-dest.
  */
class CatalogSocketSpec extends AnyFunSuite {
  lazy val spark = SparkTest.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("S6: catalog discovery honors ns filters and counts rows from footers") {
    val all = Catalog.listCollections(spark, sf, "tpch")
    assert(all.map(_._1).contains("lineitem") && all.size == 10)
    val filtered = Catalog.listCollections(spark, sf, "tpch",
      white = Seq("^tpch\\..*$"), black = Seq("^tpch\\.embeddings$"))
    assert(filtered.size == 9 && !filtered.map(_._1).contains("embeddings"))
    val stats = Catalog.collStats(spark, sf, "tpch", black = Seq("^tpch\\.(?!region).*$"))
    val Seq((ns, n)) = stats.as[(String, Long)].collect().toSeq
    assert(ns == "tpch.region" && n == 5)
  }

  private def oplogDf = Seq(
    (1L, 100L, "i", "app", "u0", "app.u0", "k1", "", 1.0, false, """{"k": 1}"""),
    (2L, 200L, "u", "app", "u1", "app.u1", "k2", "", 2.0, false, """{"k": 2}"""))
    .toDF("event_id", "ts_packed", "op", "db", "coll", "ns",
      "doc_key", "g", "value", "from_migrate", "props")

  test("K3/K4: frames arrive over TCP; RPC blocks for the per-frame ack") {
    val framed = Envelope.messages(Envelope.encode(oplogDf, 2)).select("frame").collect()
    assert(framed.nonEmpty)

    // Local receiver: reads length-prefixed frames, acks with a long.
    val server = new ServerSocket(0)
    val received = new java.util.concurrent.ConcurrentLinkedQueue[Array[Byte]]()
    val serverThread = new Thread(() => {
      var n = 0
      while (n < 2) { // two connections: tcp then rpc
        val sock = server.accept()
        val in = new DataInputStream(sock.getInputStream)
        val out = new DataOutputStream(sock.getOutputStream)
        try {
          while (true) {
            val len = in.readInt()
            val buf = new Array[Byte](len)
            in.readFully(buf)
            received.add(buf)
            out.writeLong(Envelope.decodeMessage(buf).payloads.size.toLong) // ack
            out.flush()
          }
        } catch { case _: java.io.IOException => () }
        sock.close(); n += 1
      }
    })
    serverThread.setDaemon(true)
    serverThread.start()

    val port = server.getLocalPort
    // Drive the ForeachWriter contract directly (foreach sink calls
    // open/process/close per partition).
    val tcp = new TcpFrameWriter("127.0.0.1", port)
    assert(tcp.open(0, 0))
    framed.foreach(tcp.process)
    tcp.close(null)
    val rpc = new RpcFrameWriter("127.0.0.1", port)
    assert(rpc.open(0, 0))
    framed.foreach(rpc.process)
    rpc.close(null)
    serverThread.join(10000)

    assert(received.size == framed.length * 2)
    received.forEach { f =>
      val d = Envelope.decodeMessage(f) // checksum validated
      assert(d.payloads.nonEmpty)
    }
    server.close()
  }

  test("W10/W11: shard spec persisted; drop-dest removes the table dir") {
    val target = s"${System.getProperty("java.io.tmpdir")}/graft_fullsync_test"
    FullSync.dropDest(spark, target, "region")
    val n = FullSync.copyTable(spark, sf, "region", "r_regionkey", target, nPieces = 2)
    FullSync.writeShardSpec(spark, target, "region", "r_regionkey", 2)
    assert(n == 5)
    val spec = spark.read.parquet(s"$target/full/region_spec")
      .as[(String, String, Int)].head()
    assert(spec == (("region", "r_regionkey", 2)))
    FullSync.dropDest(spark, target, "region")
    val fs = new org.apache.hadoop.fs.Path(target)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$target/full/region")))
  }

  test("JSONL round-trip survives adversarial strings: quotes, backslashes, " +
      "newlines, tabs, unicode, nested JSON") {
    import org.apache.spark.sql.functions._
    val work = s"${System.getProperty("java.io.tmpdir")}/graft_jsonl_adversarial"
    graft.streaming.IncrSync.deletePath(spark, work)
    val nasty = Seq(
      (1L, "quote", """he said "hi" twice"""),
      (2L, "backslash", """path\to\file and \\server"""),
      (3L, "newline", "line one\nline two\r\nline three"),
      (4L, "tab", "col1\tcol2"),
      (5L, "unicode", "naïve café — 日本語 🚀"),
      (6L, "nested", """{"k": {"deep": ["a", "b\"c", 3]}, "v": null}"""),
      (7L, "empty", ""),
      (8L, "slashquote", """end with \" tricky"""))
    val src = nasty.toDF("event_id", "event_type", "props")
    src.select(to_json(struct(col("event_id"), col("event_type"),
        col("props"))).as("value"))
      .coalesce(1).write.text(s"$work/dump")
    // one JSON object per physical line: embedded newlines must have
    // been escaped, never emitted raw
    val lines = spark.read.text(s"$work/dump").count()
    assert(lines == nasty.length.toLong)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("event_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("event_type",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("props",
        org.apache.spark.sql.types.StringType)))
    val back = spark.read.schema(schema).json(s"$work/dump")
      .as[(Long, String, String)].collect().toSet
    assert(back == nasty.toSet)
  }
}
