package graft

import java.nio.file.Files

import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{EventTail, EventTailSource}
import graft.streaming.EventTail.Event

/** S2 resume-token offset contract ([[EventTailSource]]): the offset is
  * the OPAQUE token of the last delivered event — resume is positional
  * (`StartAfter`), never an order over tokens or timestamps. The
  * fixtures make both misreadings distinguishable: token lexicographic
  * order is the REVERSE of arrival order, and packed timestamps
  * interleave non-monotonically (a mongos-merged stream does both).
  */
class EventTailSpec extends AnyFunSuite {
  lazy val spark = SparkTest.spark
  import spark.implicits._

  private def ev(token: String, eid: Long, ts: Long,
      op: String = "insert") =
    Event(token, eid, ts, ts, op, "app", "u0", "app", "u0_r",
      s"""{"_id":$eid}""", s"""{"_id":$eid}""", "{}")

  private def drain(name: String, out: String, ckpt: String): Seq[Long] = {
    val q = EventTailSource(name).load(spark)
      .select("event_id")
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckpt).option("path", out)
      .trigger(Trigger.AvailableNow()).format("parquet").start()
    q.awaitTermination()
    spark.read.parquet(out).as[Long].collect().toSeq.sorted
  }

  test("resume is StartAfter(token): positional, not token or ts order") {
    val work = Files.createTempDirectory("graft_evtail").toFile.getAbsolutePath
    EventTail.drop("et1")
    val buf = EventTail.buffer("et1")
    // arrival tokens "zz" < "mm" < "aa" lexicographically REVERSED;
    // timestamps interleave (300, 100) — neither order is the position
    buf.append(Seq(ev("zz", 1L, 300L), ev("mm", 2L, 100L)))
    assert(drain("et1", s"$work/out", s"$work/ckpt") === Seq(1L, 2L))
    // the checkpointed offset is now token "mm" (arrival position 2).
    // new arrivals sort BELOW it both lexicographically ("aa" < "mm")
    // and by ts (50 < 100): an ordered resume would skip or re-serve;
    // the positional resume delivers exactly the two new events
    buf.append(Seq(ev("aa", 3L, 50L), ev("ba", 4L, 75L)))
    assert(drain("et1", s"$work/out", s"$work/ckpt") === Seq(1L, 2L, 3L, 4L))
    EventTail.drop("et1")
  }

  test("cold start takes the startAtOperationTime branch; warm resume ignores it") {
    val work = Files.createTempDirectory("graft_evtail").toFile.getAbsolutePath
    EventTail.drop("et2")
    val buf = EventTail.buffer("et2")
    buf.append(Seq(ev("t1", 1L, 100L), ev("t2", 2L, 200L), ev("t3", 3L, 300L)))
    // int64 start position: only events ABOVE ts 100 on the cold start
    val q = EventTailSource("et2", startAtOperationTime = 100L).load(spark)
      .select("event_id")
      .writeStream.outputMode("append")
      .option("checkpointLocation", s"$work/ckpt").option("path", s"$work/out")
      .trigger(Trigger.AvailableNow()).format("parquet").start()
    q.awaitTermination()
    assert(spark.read.parquet(s"$work/out").as[Long].collect().toSeq.sorted
      === Seq(2L, 3L))
    // warm resume: an OLDER-ts event still delivers (token position,
    // startAtOperationTime no longer consulted — change_stream.go:46-61)
    buf.append(Seq(ev("t4", 4L, 10L)))
    assert(drain("et2", s"$work/out", s"$work/ckpt") === Seq(2L, 3L, 4L))
    EventTail.drop("et2")
  }

  test("ack purges to O(unacked); the committed token's position survives") {
    EventTail.drop("et3")
    val buf = EventTail.buffer("et3")
    buf.append(Seq(ev("x1", 1L, 100L), ev("x2", 2L, 200L), ev("x3", 3L, 300L)))
    buf.purgeThrough("x2")
    assert(buf.size === 1) // only x3 retained
    assert(buf.seqOf("x2") === 1L) // the acked token still resolves
    intercept[IllegalStateException] { buf.seqOf("x1") } // history lost
    intercept[IllegalArgumentException] {
      buf.append(Seq(ev("x3", 9L, 900L))) // duplicate token
    }
    EventTail.drop("et3")
  }
}
