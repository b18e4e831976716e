package graft

import java.nio.file.Files

import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{IncrSync, OplogTail, OplogTailSource}
import graft.streaming.OplogTail.Entry

/** S1-live smoke seam: the full `startOplogFrom` pipeline over the
  * custom DSv2 tailing source ([[OplogTailSource]]) whose offsets are
  * packed BSON timestamps — tailing (mid-run arrivals become new
  * micro-batches), crash/resume through the ts-offset checkpoint, the
  * AvailableNow drain bound, and the cursor's O(unacked) purge.
  */
class TailSourceSpec extends AnyFunSuite {
  lazy val spark = SparkTest.spark
  import spark.implicits._

  private def dml(eid: Long, ts: Long, op: String, key: String, v: Double,
      ns: String = "app.u0") = Entry(eid, ts, op, ns, key, v)

  private def stateSet(target: String): Set[(String, String, Double)] =
    IncrSync.readOrEmpty(spark, s"$target/state")
      .select("ns", "doc_key", "last_value")
      .as[(String, String, Double)].collect().toSet

  /** [[stateSet]] tolerant of the target's in-flight bucket rewrite (a
    * LIVE query overwrites state files while we poll — re-listing on the
    * next tick is the read-side contract, same as the soak harness
    * polling `_ckpt`).
    */
  private def stateSetOpt(target: String): Option[Set[(String, String, Double)]] =
    try Some(stateSet(target)) catch { case scala.util.control.NonFatal(_) => None }

  test("tailing: mid-run appends become micro-batches; ack purges the cursor") {
    val work = Files.createTempDirectory("graft_tail_live").toFile.getAbsolutePath
    val buf = OplogTail.buffer("live1")
    buf.append(Seq(
      dml(1L, 100L, "i", "k1", 1.0),
      dml(2L, 200L, "u", "k1", 2.0),
      dml(3L, 300L, "i", "k2", 3.0),
      dml(4L, 400L, "i", "k9", 9.0, ns = "other.t"))) // outside the whitelist
    val q = IncrSync.startOplogFrom(spark, OplogTailSource("live1"),
      s"$work/target", s"$work/ckpt", nBuckets = 4,
      trigger = Trigger.ProcessingTime("100 milliseconds"))
    try {
      def poll(expect: Set[(String, String, Double)]): Unit = {
        val deadline = System.currentTimeMillis() + 30000L
        while (System.currentTimeMillis() < deadline &&
            !stateSetOpt(s"$work/target").contains(expect))
          Thread.sleep(100)
        assert(stateSetOpt(s"$work/target").contains(expect))
      }
      poll(Set(("app.u0", "k1", 2.0), ("app.u0", "k2", 3.0)))
      // the tail is LIVE: entries appended while the query runs are the
      // next micro-batch off the same cursor
      buf.append(Seq(
        dml(5L, 500L, "d", "k2", 0.0),
        dml(6L, 600L, "i", "k3", 6.0)))
      poll(Set(("app.u0", "k1", 2.0), ("app.u0", "k3", 6.0)))
      // ack purge — O(unacked), not O(history): Spark acks batch N when
      // batch N+1 executes, so once the second batch ran, the FIRST
      // batch's entries (ts <= 400) must be gone from the cursor; only
      // the still-unacked tail batch may remain
      val deadline = System.currentTimeMillis() + 30000L
      while (System.currentTimeMillis() < deadline &&
          buf.rowsIn(Long.MinValue, 400L).nonEmpty) Thread.sleep(100)
      assert(buf.rowsIn(Long.MinValue, 400L).isEmpty,
        "cursor retained acked batch-0 entries")
      assert(buf.size <= 2)
    } finally q.stop()
  }

  test("crash/resume: the restarted query resumes from the ts offset over a purged cursor") {
    val work = Files.createTempDirectory("graft_tail_resume").toFile.getAbsolutePath
    val buf = OplogTail.buffer("resume1")
    buf.append(Seq(
      dml(1L, 100L, "i", "k1", 1.0),
      dml(2L, 200L, "i", "k2", 2.0)))
    val q1 = IncrSync.startOplogFrom(spark, OplogTailSource("resume1"),
      s"$work/target", s"$work/ckpt", nBuckets = 4)
    q1.awaitTermination()
    assert(stateSet(s"$work/target") == Set(("app.u0", "k1", 1.0), ("app.u0", "k2", 2.0)))
    // simulate the ack a longer-lived cursor would have delivered (Spark
    // acks a batch when the NEXT one executes): phase-1 history is GONE —
    // the restart below must resume purely from the ts offset, the
    // {ts: {$gt: ckpt}} contract a real cursor enforces
    buf.purgeThrough(200L)
    assert(buf.size == 0)

    // entries land while the query is DOWN; restart resumes from the
    // checkpointed ts offset ({ts: {$gt: 200}}) and consumes ONLY them
    buf.append(Seq(
      dml(3L, 300L, "u", "k1", 10.0),
      dml(4L, 400L, "d", "k2", 0.0)))
    val q2 = IncrSync.startOplogFrom(spark, OplogTailSource("resume1"),
      s"$work/target", s"$work/ckpt", nBuckets = 4)
    q2.awaitTermination()
    assert(stateSet(s"$work/target") == Set(("app.u0", "k1", 10.0)))
    // _ckpt pins the two batches' lsn ranges: the resumed batch started
    // ABOVE phase 1's max ts (a re-read or skip would shift the range)
    val ck = spark.read.parquet(s"$work/target/_ckpt")
      .select("batch_id", "lsn_min", "lsn_max").as[(Long, Long, Long)]
      .collect().sortBy(_._1).toSeq
    assert(ck == Seq((0L, 100L, 200L), (1L, 300L, 400L)))
  }

  test("AvailableNow drain bound is pinned at prepare: later appends wait for the next run") {
    val work = Files.createTempDirectory("graft_tail_drain").toFile.getAbsolutePath
    val buf = OplogTail.buffer("drain1")
    buf.append(Seq(dml(1L, 100L, "i", "k1", 1.0)))
    val q1 = IncrSync.startOplogFrom(spark, OplogTailSource("drain1"),
      s"$work/target", s"$work/ckpt", nBuckets = 4)
    q1.awaitTermination()
    // appended AFTER the drain completed: not consumed until a new run
    buf.append(Seq(dml(2L, 200L, "i", "k2", 2.0)))
    assert(stateSet(s"$work/target") == Set(("app.u0", "k1", 1.0)))
    assert(buf.rowsIn(101L, 200L).length == 1)
    val q2 = IncrSync.startOplogFrom(spark, OplogTailSource("drain1"),
      s"$work/target", s"$work/ckpt", nBuckets = 4)
    q2.awaitTermination()
    assert(stateSet(s"$work/target") == Set(("app.u0", "k1", 1.0), ("app.u0", "k2", 2.0)))
  }

  test("maxRowsPerTrigger drains a deep backlog in bounded micro-batches") {
    val work = Files.createTempDirectory("graft_tail_limit").toFile.getAbsolutePath
    OplogTail.drop("limit1")
    val buf = OplogTail.buffer("limit1")
    // a 10k-row backlog (the fetch_batch_size scenario): distinct ts so
    // the admission cut lands exactly on the row budget
    buf.append((1 to 10000).map(i =>
      dml(i.toLong, i.toLong, "i", s"k${i % 64}", i.toDouble)))
    val q = OplogTailSource("limit1", maxRowsPerTrigger = 1000).load(spark)
      .select("event_id")
      .writeStream.outputMode("append")
      .option("checkpointLocation", s"$work/ckpt").option("path", s"$work/out")
      .trigger(Trigger.AvailableNow()).format("parquet").start()
    q.awaitTermination()
    assert(spark.read.parquet(s"$work/out").count() === 10000L)
    // the drain happened in row-budgeted batches, not one giant one
    val sizes = q.recentProgress.toSeq.map(_.numInputRows).filter(_ > 0)
    assert(sizes.length === 10, s"batch sizes: $sizes")
    assert(sizes.forall(_ <= 1000), s"batch sizes: $sizes")
    OplogTail.drop("limit1")
    // a multi-row ts-group larger than the budget is taken whole (the
    // offset is ts-granular; the cursor must not stall), and the cut
    // lands on a group boundary, never inside one
    OplogTail.drop("limit2")
    val b2 = OplogTail.buffer("limit2")
    b2.append(Seq(dml(1L, 100L, "i", "a", 1.0), dml(2L, 100L, "i", "b", 2.0),
      dml(3L, 100L, "i", "c", 3.0), dml(4L, 200L, "i", "d", 4.0)))
    assert(b2.advanceBy(0L, 2, 200L) === 100L) // oversized group: whole
    assert(b2.advanceBy(0L, 3, 200L) === 100L) // boundary cut before 200
    assert(b2.advanceBy(0L, 4, 200L) === 200L)
    OplogTail.drop("limit2")
  }

  test("cursor contract: appends at or below the acked offset are rejected") {
    val buf = OplogTail.buffer("guard1")
    buf.append(Seq(dml(1L, 100L, "i", "k1", 1.0)))
    buf.purgeThrough(100L)
    val e = intercept[IllegalArgumentException] {
      buf.append(Seq(dml(2L, 50L, "i", "k2", 2.0)))
    }
    assert(e.getMessage.contains("below the acked offset"))
  }
}
