package graft

import java.nio.file.Files

import org.apache.spark.sql.streaming.{StreamingQueryException, Trigger}
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{IncrSync, OplogTail, OplogTailSource, ShardedSync, ShardedTarget}
import graft.streaming.OplogTail.Entry

/** Sharded fan-out seams ([[IncrSync.startSharded]]): the config gates
  * the sanitize rule enforces, the batcher-seam migrate crash, and the
  * concurrent-writer state composition the `cdc_sharded_fanout` query
  * proves at corpus scale — here as fast fixed-fixture regressions.
  */
class ShardedSyncSpec extends AnyFunSuite {
  lazy val spark = SparkTest.spark
  import spark.implicits._

  private def dml(eid: Long, ts: Long, op: String, key: String, v: Double,
      mig: Boolean = false) =
    Entry(eid, ts, op, "app.u0", key, v, fromMigrate = mig)

  test("two concurrent shard writers compose into one state table") {
    val work = Files.createTempDirectory("graft_shardspec").toFile.getAbsolutePath
    OplogTail.drop("shsp_a"); OplogTail.drop("shsp_b")
    // disjoint key spaces (the chunk-ownership contract), SHARED buckets:
    // with nBuckets=1 every key lands in bucket 0, so the two writers
    // rewrite the SAME partition directory — the apply lock must compose
    OplogTail.buffer("shsp_a").append(Seq(
      dml(1L, 100L, "i", "a1", 1.0), dml(2L, 200L, "u", "a1", 2.0),
      dml(3L, 300L, "i", "a2", 3.0)))
    OplogTail.buffer("shsp_b").append(Seq(
      dml(4L, 150L, "i", "b1", 4.0), dml(5L, 250L, "d", "b1", 0.0),
      dml(6L, 350L, "i", "b2", 6.0)))
    val qs = IncrSync.startSharded(spark,
      Seq(("sa", OplogTailSource("shsp_a")), ("sb", OplogTailSource("shsp_b"))),
      s"$work/target", s"$work/ckpt", nBuckets = 1,
      trigger = Trigger.AvailableNow())
    try qs.foreach(_.awaitTermination()) finally qs.foreach(q => if (q.isActive) q.stop())
    val state = IncrSync.readOrEmpty(spark, s"$work/target/state")
      .select("doc_key", "last_value").as[(String, Double)].collect().toSet
    assert(state === Set(("a1", 2.0), ("a2", 3.0), ("b2", 6.0)))
    // per-shard ack = each shard's own newest ts; the group position is
    // the MIN across them (checkpoint.go:149-199)
    val acks = ShardedSync.shardAcks(spark, s"$work/target")
      .select("shard", "lsn_ack").as[(String, Long)].collect().toMap
    assert(acks === Map("sa" -> 300L, "sb" -> 350L))
    assert(ShardedSync.globalCheckpoint(spark, s"$work/target") === 300L)
  }

  test("hammer: interleaved applyDml from two threads loses no keys") {
    // the apply-lock regression guard: two writers with disjoint key
    // spaces but ONE shared bucket directory (nBuckets=1) interleave 20
    // merges each; an unserialized read-merge-overwrite would drop the
    // other writer's keys. Direct ShardedTarget.applyDml calls — no
    // streaming machinery, so the interleaving is tight.
    val work = Files.createTempDirectory("graft_shardspec").toFile.getAbsolutePath
    def mergeSet(shard: String, prefix: String): Unit = {
      val t = graft.streaming.ShardedTarget(s"$work/target", shard, nBuckets = 1)
      (1 to 20).foreach { i =>
        t.applyDml(Seq(("app.u0", s"$prefix$i", "i", i.toDouble, i.toLong, 1L))
          .toDF("ns", "doc_key", "op", "last_value", "last_event_id", "n_ops"))
      }
    }
    val ta = new Thread(() => mergeSet("sa", "a"))
    val tb = new Thread(() => mergeSet("sb", "b"))
    ta.start(); tb.start(); ta.join(); tb.join()
    val keys = IncrSync.readOrEmpty(spark, s"$work/target/state")
      .select("doc_key").as[String].collect().toSet
    assert(keys === ((1 to 20).map("a" + _) ++ (1 to 20).map("b" + _)).toSet)
  }

  test("a fromMigrate record crashes the shard query at the batcher seam") {
    val work = Files.createTempDirectory("graft_shardspec").toFile.getAbsolutePath
    OplogTail.drop("shsp_mig")
    OplogTail.buffer("shsp_mig").append(Seq(
      dml(1L, 100L, "i", "k1", 1.0),
      dml(2L, 200L, "i", "k2", 2.0, mig = true)))
    val qs = IncrSync.startSharded(spark,
      Seq(("s0", OplogTailSource("shsp_mig"))),
      s"$work/target", s"$work/ckpt", nBuckets = 1,
      trigger = Trigger.AvailableNow())
    val e = intercept[StreamingQueryException] { qs.head.awaitTermination() }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains(
      "move chunk oplog found, must close balancer in sharding + oplog")))
  }

  test("sanitize gates: DDL and duplicate shard names are rejected") {
    val src = Seq(("s0", OplogTailSource("shsp_cfg")))
    val eDdl = intercept[IllegalArgumentException] {
      IncrSync.startSharded(spark, src, "/tmp/x", "/tmp/y", ddlEnable = true)
    }
    assert(eDdl.getMessage.contains("DDL is not support for sharding"))
    val eDup = intercept[IllegalArgumentException] {
      IncrSync.startSharded(spark,
        Seq(("s0", OplogTailSource("a")), ("s0", OplogTailSource("b"))),
        "/tmp/x", "/tmp/y")
    }
    assert(eDup.getMessage.contains("mongo urls were duplicated"))
    val eCmd = intercept[IllegalStateException] {
      ShardedTarget("/tmp/x", "s0").applyCommand(spark, null, 0L, 0)
    }
    assert(eCmd.getMessage.contains("DDL is not support for sharding"))
  }
}
