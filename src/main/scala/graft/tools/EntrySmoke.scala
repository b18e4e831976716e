package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.{IncrSync, OplogTail, OplogTailSource, OplogWireCursor}

/** Dev tool: the driver's t1 smoke — SparkEntry.entry row count > 0.
  *
  * `--uri` mode is the LIVE-CONNECTOR entry point (compiled but skipped
  * in-sandbox — no MongoDB here): given a deployment-provided
  * [[graft.streaming.OplogWireCursor]] implementation on the classpath,
  * it tails a real oplog into the DSv2 ts-offset source and runs the
  * full gated incr-sync path against it. See [[graft.streaming.OplogWireCursor]]
  * for the seam contract.
  *
  * {{{
  * graft.tools.EntrySmoke --uri mongodb://host:27017 \
  *   [--cursor-class graft.ext.MongoOplogCursor] \
  *   [--target /path/target] [--ckpt /path/ckpt] [--starting-ts N]
  * }}}
  */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val uriIdx = args.indexOf("--uri")
    if (uriIdx >= 0 && uriIdx + 1 < args.length) runWire(args(uriIdx + 1), args)
    else runSmoke()
  }

  private def runSmoke(): Unit = {
    val spark = session()
    println(s"entry rows = ${graft.SparkEntry.entry(spark).count()}")
    spark.stop()
  }

  private def opt(args: Array[String], flag: String, default: String): String = {
    val i = args.indexOf(flag)
    if (i >= 0 && i + 1 < args.length) args(i + 1) else default
  }

  /** Live tail: reflective cursor → buffer pump → the gated incr path. */
  private def runWire(uri: String, args: Array[String]): Unit = {
    val clsName = opt(args, "--cursor-class", "graft.ext.MongoOplogCursor")
    val target = opt(args, "--target", "/tmp/graft_wire/target")
    val ckpt = opt(args, "--ckpt", "/tmp/graft_wire/ckpt")
    val startTs = opt(args, "--starting-ts", Long.MinValue.toString).toLong
    val cursor: OplogWireCursor =
      try Class.forName(clsName).getConstructor(classOf[String])
        .newInstance(uri).asInstanceOf[OplogWireCursor]
      catch {
        case _: ClassNotFoundException =>
          System.err.println(
            s"""[wire] cursor implementation '$clsName' is not on the classpath —
               |this environment has no MongoDB driver. The connector seam is
               |compiled and ready: implement graft.streaming.OplogWireCursor
               |(a tailable cursor over local.oplog.rs with {ts: {$$gt: resumeTs}},
               |mapping entries to OplogTail.Entry) and pass --cursor-class.
               |Everything downstream — the DSv2 ts-offset source, checkpointed
               |resume, filter chain, txn assembly, idempotent apply, min-ack
               |checkpoint — is the production path already gated in-sandbox.""".stripMargin)
          sys.exit(2)
      }
    val spark = session()
    val buf = OplogTail.buffer("wire")
    val pump = new Thread(() => {
      var from = startTs
      try while (!Thread.currentThread().isInterrupted) {
        val es = cursor.tail(from, 1000L)
        if (es.nonEmpty) {
          buf.append(es)
          from = es.iterator.map(_.ts).max
        }
      } catch { case _: InterruptedException => () }
      finally cursor.close()
    }, "oplog-wire-pump")
    pump.setDaemon(true)
    pump.start()
    val q = IncrSync.startOplogFrom(spark,
      OplogTailSource("wire", startingTs = startTs), target, ckpt,
      trigger = Trigger.ProcessingTime("1 second"))
    q.awaitTermination()
  }

  private def session(): SparkSession = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", false).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark
  }
}
