package graft

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{FullSync, IncrSync, TxnAssembler}
import graft.streaming.TxnAssembler.{InnerOp, TxnEntry}

/** Canonical oplog row for the source-seam injection test (package level —
  * Dataset encoders must not capture the suite instance).
  */
case class SeamOplogRow(event_id: Long, ts_packed: Long, op: String, ns: String,
    doc_key: String, value: Double, props: String, g: String, from_migrate: Boolean,
    lsid: Option[String], txn_number: Option[Long], o: Option[String])

/** Raw `events` row for the events-side seam test. */
case class SeamEventRow(event_id: Long, ts: Long, user_id: Long,
    event_type: String, value: Double, props: String)

/** Sink-seam injection double: records every TargetWriter call in order
  * (what a live MongoDB connector would receive — merge sets, serialized
  * commands, the post-ack checkpoint). Package level: the foreachBatch
  * closure serializes the target, so it must not capture the suite.
  */
final class RecordingTarget extends graft.streaming.TargetWriter {
  import java.util.concurrent.ConcurrentLinkedQueue
  import scala.jdk.CollectionConverters._
  private val callsQ = new ConcurrentLinkedQueue[String]()
  private val dmlQ = new ConcurrentLinkedQueue[Set[(String, String, String, Long, Double)]]()
  private val cmdQ = new ConcurrentLinkedQueue[(Long, Int, String, Long)]()
  private val ckQ = new ConcurrentLinkedQueue[(Long, Long, Long, Long)]()

  def calls: Seq[String] = callsQ.asScala.toSeq
  def dmlSets: Seq[Set[(String, String, String, Long, Double)]] = dmlQ.asScala.toSeq
  def cmds: Seq[(Long, Int, String, Long)] = cmdQ.asScala.toSeq
  def ckpts: Seq[(Long, Long, Long, Long)] = ckQ.asScala.toSeq

  def applyDml(last: org.apache.spark.sql.DataFrame): Unit = {
    callsQ.add("dml")
    dmlQ.add(last.collect().map(r => (r.getAs[String]("ns"), r.getAs[String]("doc_key"),
      r.getAs[String]("op"), r.getAs[Long]("last_event_id"),
      r.getAs[Double]("last_value"))).toSet)
  }
  def applyCommand(spark: org.apache.spark.sql.SparkSession, row: Row,
      batchId: Long, seq: Int): Unit = {
    callsQ.add(s"cmd:$seq")
    val cmd = graft.transform.UpdateSpec.parse(row.getAs[String]("props"))
      .obj.headOption.map(_._1).getOrElse("")
    cmdQ.add((batchId, seq, cmd, row.getAs[Long]("ts_packed")))
  }
  def commitCheckpoint(ck: org.apache.spark.sql.DataFrame, batchId: Long): Unit = {
    callsQ.add("ckpt")
    val r = ck.head()
    ckQ.add((r.getAs[Long]("batch_id"), r.getAs[Long]("lsn_min"),
      r.getAs[Long]("lsn_max"), r.getAs[Long]("n_logs")))
  }
}

class StreamingSpec extends AnyFunSuite {
  lazy val spark = SparkTest.spark
  import spark.implicits._

  test("txn assembler: partial chain buffers across micro-batches, emits on commit, purges on abort") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[TxnEntry]
    val q = TxnAssembler.assemble(input.toDS(), ttlMs = 0) // no TTL under processAllAvailable
      .writeStream.format("memory").queryName("txn_out").outputMode("append").start()
    try {
      // batch 1: two partial entries of txn A, one partial of doomed txn B
      input.addData(
        TxnEntry("s1", 1, 0, "partial", Seq("a0", "a1"), 100),
        TxnEntry("s1", 1, 1, "partial", Seq("a2"), 101),
        TxnEntry("s2", 7, 0, "partial", Seq("b0"), 100))
      q.processAllAvailable()
      assert(spark.table("txn_out").count() == 0) // nothing committed yet

      // batch 2: commit A (with one more op), abort B
      input.addData(
        TxnEntry("s1", 1, 2, "commit", Seq("a3"), 200),
        TxnEntry("s2", 7, 1, "abort", Nil, 201))
      q.processAllAvailable()
      val out = spark.table("txn_out").as[InnerOp].collect().sortBy(_.idx)
      assert(out.map(_.op).toSeq == Seq("a0", "a1", "a2", "a3"))
      assert(out.forall(_.lsid == "s1"))
      // T3 ts patch: children commitTs-1, last child keeps commitTs
      assert(out.map(_.ts).toSeq == Seq(199, 199, 199, 200))

      // batch 3: aborted txn's retry with same ops commits cleanly
      input.addData(TxnEntry("s2", 7, 2, "commit", Seq("b0"), 300))
      q.processAllAvailable()
      assert(spark.table("txn_out").filter($"lsid" === "s2").count() == 1)
    } finally q.stop()
  }

  test("distributed txn: prepared partials release on the commitTransaction marker") {
    import graft.streaming.TxnAssembler.{foldEntries, TxnEntry, TxnKey}
    val key = TxnKey("d1", 9L)
    val chain = Seq(
      TxnEntry("d1", 9L, 0, "partial", Seq("p0", "p1"), 100L), // prepared
      TxnEntry("d1", 9L, 1, "commit", Nil, 200L)) // commitTransaction marker
    val (buf, out) = foldEntries(key, chain, Nil)
    assert(buf.isEmpty)
    assert(out.map(o => (o.idx, o.op, o.ts)) ==
      Seq((0, "p0", 199L), (1, "p1", 200L))) // T3 patch: last keeps commit ts
  }

  test("T2 classifier derives kind from the command body (txn_meta.go semantics)") {
    val rows = Seq(
      // (lsid, txn_number, seq, op, o, ts_packed)
      ("s1", 1L, 0L, "c", """{"applyOps":[{"a":1}],"partialTxn":true}""", 10L), // partial
      ("s1", 1L, 1L, "c", """{"applyOps":[{"b":2}]}""", 11L),                   // unprepared final → commit
      ("s2", 2L, 0L, "c", """{"commitTransaction":1}""", 12L),                  // commit marker
      ("s3", 3L, 0L, "c", """{"abortTransaction":1}""", 13L),                   // abort
      ("s4", 4L, 0L, "c", """{"applyOps":[{"c":3}],"partialTxn":true,"prepare":true}""", 14L), // prepared partial
      ("s5", 5L, 0L, "c", """{"drop":"t"}""", 15L),                             // not a txn command
      ("s6", 6L, 0L, "i", """{"applyOps":[{"d":4}]}""", 16L),                   // not op c
      (null, 7L, 0L, "c", """{"applyOps":[{"e":5}]}""", 17L))                   // no lsid
      .toDF("lsid", "txn_number", "seq", "op", "o", "ts_packed")
    val got = TxnAssembler.classifyEntries(rows).collect()
      .map(e => (e.lsid, e.kind, e.ops)).sortBy(_._1)
    assert(got.toSeq == Seq(
      ("s1", "partial", Seq("""{"a":1}""")),
      ("s1", "commit", Seq("""{"b":2}""")),
      ("s2", "commit", Nil),
      ("s3", "abort", Nil),
      ("s4", "partial", Seq("""{"c":3}"""))))
  }

  test("txn TTL: timed-out partial state is purged without emission") {
    import org.apache.spark.sql.streaming.TestGroupState
    val stale = TestGroupState.create[TxnAssembler.Buffer](
      optionalState = org.apache.spark.api.java.Optional.of(TxnAssembler.Buffer(
        List(TxnEntry("s1", 1, 0, "partial", Seq("a0"), 100)))),
      timeoutConf = org.apache.spark.sql.streaming.GroupStateTimeout.ProcessingTimeTimeout,
      batchProcessingTimeMs = 1000L,
      eventTimeWatermarkMs = org.apache.spark.api.java.Optional.empty[Long](),
      hasTimedOut = true)
    val out = TxnAssembler.assembleGroup(
      TxnAssembler.TxnKey("s1", 1), Iterator.empty, stale)
    assert(out.isEmpty && stale.isRemoved)
  }

  test("txn TTL e2e: an orphaned partial chain expires under ProcessingTimeTimeout; its late commit emits only its own ops") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[TxnEntry]
    val ttl = 1500L
    // NOTE: `processAllAvailable` cannot drive a processing-time-timeout
    // stream — the state operator demands a batch every trigger, so
    // `noNewData` is never set and the call blocks forever. Those no-data
    // batches are what expires the state; poll the sink instead.
    def awaitRows(n: Long): Unit = {
      val deadline = System.currentTimeMillis() + 60000L
      while (spark.table("txn_ttl_spec").count() < n &&
        System.currentTimeMillis() < deadline) Thread.sleep(100)
    }
    val q = TxnAssembler.assemble(input.toDS(), ttlMs = ttl)
      .writeStream.format("memory").queryName("txn_ttl_spec").outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime("100 milliseconds"))
      .start()
    try {
      // healthy txn commits in-batch; the orphan buffers two partial ops
      input.addData(
        TxnEntry("h", 1, 0, "partial", Seq("h0"), 100),
        TxnEntry("h", 1, 1, "commit", Seq("h1"), 200),
        TxnEntry("orph", 2, 0, "partial", Seq("x0", "x1"), 100))
      awaitRows(2)
      assert(spark.table("txn_ttl_spec").count() == 2) // h0, h1 released

      // past the deadline (registered at batch 1's timestamp, which is at
      // or before this sleep's start — margin is guaranteed on any box)
      Thread.sleep(ttl + 1000)
      // sentinel tick: observing its emission proves a post-deadline batch
      // ran its timeout pass, so the orphan purge has certainly happened
      input.addData(TxnEntry("tick", 0, 0, "commit", Seq("t0"), 0))
      awaitRows(3)
      assert(spark.table("txn_ttl_spec").as[InnerOp]
        .filter(_.lsid == "orph").isEmpty) // purge emitted nothing

      // late commit: state was purged, only the commit entry's op emits —
      // x0/x1 are gone (oplog/txn_buffer.go:63-301 orphan cleanup contract)
      input.addData(TxnEntry("orph", 2, 1, "commit", Seq("x2"), 300))
      awaitRows(4)
      val orph = spark.table("txn_ttl_spec").as[InnerOp]
        .filter(_.lsid == "orph").collect()
      assert(orph.map(_.op).toSeq == Seq("x2"))
      assert(orph.head.ts == 300 && orph.head.idx == 0)
      // later traffic on other keys is unaffected by the purge
      input.addData(TxnEntry("h", 2, 0, "commit", Seq("h2"), 400))
      awaitRows(5)
      assert(spark.table("txn_ttl_spec").filter($"lsid" === "h").count() == 3)
    } finally q.stop()
  }

  test("incr sync: stream → filter → two-phase apply → checkpoint; restart is a no-op; final state matches batch replay") {
    val work = Files.createTempDirectory("graft_incr").toFile.getAbsolutePath
    val src = "/root/testdata/sf0.001"
    // stream source must be a directory: stage the events file into one
    val srcDir = new java.io.File(s"$work/events_src"); srcDir.mkdirs()
    Files.createSymbolicLink(
      new java.io.File(srcDir, "events.parquet").toPath,
      new java.io.File(s"$src/events.parquet").toPath)
    val q = IncrSync.start(spark, srcDir.getAbsolutePath, s"$work/target", s"$work/ckpt")
    q.awaitTermination()

    val got = IncrSync.readOrEmpty(spark, s"$work/target/state")
    val expected = graft.apply.Replay.materialize(
      graft.model.Oplog.fromEvents(spark, src)
        .filter(graft.filters.OplogFilters.chain(Seq(""), Seq("^app\\..*$"), Nil)))
    assert(got.count() == expected.count())
    val diff = got.select("ns", "doc_key", "last_value", "last_event_id")
      .except(expected.select("ns", "doc_key", "last_value", "last_event_id"))
    assert(diff.count() == 0)

    // checkpoint row written after apply, covering the batch's ts range
    val ck = spark.read.parquet(s"$work/target/_ckpt")
    assert(ck.count() >= 1)
    assert(ck.agg(max("lsn_max")).head().getLong(0) > 0)

    // restart with same checkpointLocation: no new batches, state unchanged
    val before = got.orderBy("ns", "doc_key").collect().toSeq
    val q2 = IncrSync.start(spark, srcDir.getAbsolutePath, s"$work/target", s"$work/ckpt")
    q2.awaitTermination()
    val after = IncrSync.readOrEmpty(spark, s"$work/target/state").orderBy("ns", "doc_key").collect().toSeq
    assert(after == before)
  }

  test("§3.1 one-query dataflow: filter → txn assembly → union → barrier apply") {
    val work = Files.createTempDirectory("graft_e2e").toFile.getAbsolutePath
    def innerOp(eid: Long, op: String, ns: String, key: String, v: Double) =
      s"""{"event_id":$eid,"op":"$op","ns":"$ns","doc_key":"$key","value":$v}"""
    val rows = Seq(
      // (event_id, ts_packed, op, ns, doc_key, value, props, g, from_migrate, lsid, txn_number, o)
      (1L, 100L, "i", "app.u0", "k1", 1.0, """{"k":1}""", "", false,
        null.asInstanceOf[String], null.asInstanceOf[java.lang.Long], null.asInstanceOf[String]),
      // committed txn: partial (k2) then unprepared commit (k3); ts patch 299/300
      (20L, 200L, "c", "admin.$cmd", "", 0.0, null, "", false, "L1", 1L: java.lang.Long,
        s"""{"applyOps":[${innerOp(20, "i", "app.u0", "k2", 5.0)}],"partialTxn":true}"""),
      (21L, 300L, "c", "admin.$cmd", "", 0.0, null, "", false, "L1", 1L: java.lang.Long,
        s"""{"applyOps":[${innerOp(21, "i", "app.u1", "k3", 7.0)}]}"""),
      // aborted txn: its inner op must never apply
      (30L, 400L, "c", "admin.$cmd", "", 0.0, null, "", false, "L2", 9L: java.lang.Long,
        s"""{"applyOps":[${innerOp(30, "i", "app.u1", "k9", 9.0)}],"partialTxn":true}"""),
      (31L, 450L, "c", "admin.$cmd", "", 0.0, null, "", false, "L2", 9L: java.lang.Long,
        """{"abortTransaction":1}"""),
      // DDL barrier at 600 drops u0 (k1, k2); later insert survives
      (40L, 600L, "c", "app.$cmd", "", 0.0, """{"drop":"u0"}""", "", false,
        null.asInstanceOf[String], null.asInstanceOf[java.lang.Long], """{"drop":"u0"}"""),
      (50L, 700L, "i", "app.u0", "k4", 4.0, """{"k":4}""", "", false,
        null.asInstanceOf[String], null.asInstanceOf[java.lang.Long], null.asInstanceOf[String]),
      // non-session (atomic) applyOps: inner ops apply immediately
      (60L, 800L, "c", "admin.$cmd", "", 0.0, null, "", false,
        null.asInstanceOf[String], null.asInstanceOf[java.lang.Long],
        s"""{"applyOps":[${innerOp(60, "i", "app.u0", "k5", 6.0)}]}"""))
    val srcDir = s"$work/oplog_src"
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(Row.fromTuple)), IncrSync.oplogSchema)
      .coalesce(1).write.parquet(srcDir)
    // txnTtlMs = 0: a processing-time TTL schedules no-data batches to
    // expire state, which never terminates under AvailableNow test
    // drivers (see TxnAssembler.assemble's doc); production keeps the
    // default TTL on its continuous trigger.
    val q = IncrSync.startOplog(spark, srcDir, s"$work/target", s"$work/ckpt", txnTtlMs = 0)
    q.awaitTermination()
    val state = IncrSync.readOrEmpty(spark, s"$work/target/state")
      .select("ns", "doc_key", "last_event_id").as[(String, String, Long)].collect().toSet
    assert(state == Set(("app.u1", "k3", 21L), ("app.u0", "k4", 50L),
      ("app.u0", "k5", 60L)))
    // G7: the observed counters rode the stream into query progress
    val om = q.recentProgress.flatMap(p =>
      Option(p.observedMetrics.get(graft.metrics.Metrics.MetricsName))).lastOption
    assert(om.isDefined)
    assert(om.get.getAs[Long]("n_insert") == 5L) // k1..k5
    assert(om.get.getAs[Long]("n_command") == 1L) // the drop barrier
  }

  test("at-least-once recovery: re-applying the same batch is a state no-op") {
    val work = Files.createTempDirectory("graft_idem").toFile.getAbsolutePath
    val batch = Seq(
      (1L, 100L, "i", "app.u0", "k1", 1.0, "{}"),
      (2L, 200L, "u", "app.u0", "k1", 2.0, "{}"),
      (3L, 300L, "i", "app.u1", "k2", 3.0, "{}"),
      (4L, 400L, "d", "app.u1", "k2", 0.0, "{}"),
      (9L, 500L, "c", "app.$cmd", "", 0.0, """{"drop":"u9"}"""))
      .toDF("event_id", "ts_packed", "op", "ns", "doc_key", "value", "props")
    IncrSync.applyBatch(batch, work, 0L, nBuckets = 4)
    val first = IncrSync.readOrEmpty(spark, s"$work/state")
      .orderBy("ns", "doc_key").collect().toSeq
    IncrSync.applyBatch(batch, work, 0L, nBuckets = 4) // replayed trigger
    val second = IncrSync.readOrEmpty(spark, s"$work/state")
      .orderBy("ns", "doc_key").collect().toSeq
    assert(first == second && first.nonEmpty)
    // the observable log is exactly-once under replay: the ckpt commit and
    // the DDL log are keyed per (batch, seq) and overwrite, never append
    assert(spark.read.parquet(s"$work/_ckpt").count() == 1)
    assert(spark.read.parquet(s"$work/ddl_log").count() == 1)
  }

  test("S1 resume position: records at or below startingTs are excluded at the source") {
    val work = Files.createTempDirectory("graft_resume").toFile.getAbsolutePath
    val src = "/root/testdata/sf0.001"
    val srcDir = new java.io.File(s"$work/events_src"); srcDir.mkdirs()
    Files.createSymbolicLink(
      new java.io.File(srcDir, "events.parquet").toPath,
      new java.io.File(s"$src/events.parquet").toPath)
    val full = graft.model.Oplog.fromEvents(spark, src)
      .filter(graft.filters.OplogFilters.chain(Seq(""), Seq("^app\\..*$"), Nil))
    val mid = full.agg(expr("min(ts_packed) + (max(ts_packed) - min(ts_packed)) DIV 2"))
      .head().getLong(0)
    val q = IncrSync.start(spark, srcDir.getAbsolutePath, s"$work/target", s"$work/ckpt",
      startingTs = mid, maxFilesPerTrigger = 1)
    q.awaitTermination()
    val got = IncrSync.readOrEmpty(spark, s"$work/target/state")
    val expected = graft.apply.Replay.materialize(full.filter(col("ts_packed") > mid))
    assert(got.count() == expected.count())
    assert(got.select("ns", "doc_key", "last_event_id")
      .except(expected.select("ns", "doc_key", "last_event_id")).count() == 0)
  }

  test("LSM state: a batch appends one O(batch) delta, never rewriting " +
      "resident data; compaction folds deltas and clears them") {
    val work = Files.createTempDirectory("graft_bucket").toFile.getAbsolutePath
    def oplog(rows: Seq[(Long, Long, String, String, String, Double)]) =
      rows.toDF("event_id", "ts_packed", "op", "ns", "doc_key", "value")
    def filesUnder(dir: java.io.File): Set[(String, Long)] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      if (!dir.exists()) Set.empty
      else walk(dir).map(f => (f.getAbsolutePath, f.lastModified())).toSet
    }

    // Batch 1: many keys spread across buckets → one delta directory.
    val b1 = oplog((1 to 200).map(i =>
      (i.toLong, i.toLong, "i", "app.t", s"k$i", i.toDouble)))
    IncrSync.applyBatch(b1, work, 1L, nBuckets = 16)
    val deltaRoot = new java.io.File(s"$work/state_delta")
    assert(deltaRoot.listFiles().map(_.getName).toSet == Set("d=000000000"))
    val resident = filesUnder(new java.io.File(work))

    // Batch 2: update one key, delete another → a second delta; every
    // byte written by batch 1 (and any base) is untouched — the O(batch)
    // apply contract.
    val b2 = oplog(Seq(
      (1001L, 1001L, "u", "app.t", "k1", 999.0),
      (1002L, 1002L, "d", "app.t", "k2", 0.0)))
    IncrSync.applyBatch(b2, work, 2L, nBuckets = 16)
    assert(filesUnder(new java.io.File(work)).filterNot(
      _._1.contains("_ckpt")) // the per-batch ckpt rows are keyed dirs
      .filterNot(_._1.contains("d=000000001")) == resident.filterNot(
      _._1.contains("_ckpt")), "batch 2 rewrote resident bytes")
    // the new delta holds only the buckets batch 2 touched
    val touched = Seq("k1", "k2").map { k =>
      val b = b1.sparkSession.range(1).select(
        lit("app.t").as("ns"), lit(k).as("doc_key"))
        .select(IncrSync.bucketOf(16)).head().getInt(0)
      s"bucket=$b"
    }.toSet
    val d2 = new java.io.File(s"$work/state_delta/d=000000001")
    assert(d2.listFiles().filter(_.getName.startsWith("bucket="))
      .map(_.getName).toSet == touched)

    // merged view: last-writer-wins with tombstones
    def state = IncrSync.readOrEmpty(spark, s"$work/state")
    assert(state.filter($"doc_key" === "k1").head().getAs[Double]("last_value") == 999.0)
    assert(state.filter($"doc_key" === "k2").count() == 0)
    assert(state.count() == 199)

    // compaction folds the deltas into the base and clears them; the
    // merged view is unchanged (content-identical, bucket-partitioned)
    val beforeCompact = state.orderBy("ns", "doc_key").collect().toSeq
    IncrSync.compactState(spark, s"$work/state")
    assert(!deltaRoot.exists())
    assert(new java.io.File(s"$work/state").listFiles()
      .exists(_.getName.startsWith("bucket=")))
    assert(state.orderBy("ns", "doc_key").collect().toSeq == beforeCompact)
    // further deltas stack on the compacted base and still merge
    IncrSync.applyBatch(oplog(Seq((2001L, 2001L, "u", "app.t", "k3", 7.0))),
      work, 3L, nBuckets = 16)
    assert(state.filter($"doc_key" === "k3").head().getAs[Double]("last_value") == 7.0)
    assert(state.count() == 199)
  }

  test("pluggable source seam: a MemoryStream-backed ChangeSource drives the same oplog dataflow") {
    implicit val sqlCtx = spark.sqlContext
    val work = Files.createTempDirectory("graft_seam").toFile.getAbsolutePath
    val input = MemoryStream[SeamOplogRow]
    def dml(eid: Long, ts: Long, op: String, ns: String, key: String, v: Double) =
      SeamOplogRow(eid, ts, op, ns, key, v, "{}", "", false, None, None, None)
    input.addData(
      dml(1L, 100L, "i", "app.u0", "k1", 1.0),
      dml(2L, 200L, "u", "app.u0", "k1", 2.0),
      dml(3L, 300L, "i", "app.u1", "k2", 3.0),
      dml(4L, 400L, "i", "other.t", "k9", 9.0)) // outside the whitelist
    // Inject the live-connector seam: the dataflow (filter chain, txn
    // assembly, barrier apply, checkpoint) is untouched — only `load`
    // changes. A MongoDB connector implements the same trait.
    val src = graft.streaming.FrameSource(() => input.toDF())
    val q = IncrSync.startOplogFrom(spark, src, s"$work/target", s"$work/ckpt", nBuckets = 4)
    q.awaitTermination()
    val state = IncrSync.readOrEmpty(spark, s"$work/target/state")
      .select("ns", "doc_key", "last_value").as[(String, String, Double)].collect().toSet
    assert(state == Set(("app.u0", "k1", 2.0), ("app.u1", "k2", 3.0)))
  }

  test("pluggable source seam (events side): startFrom projects and applies an injected event stream") {
    implicit val sqlCtx = spark.sqlContext
    val work = Files.createTempDirectory("graft_seam_ev").toFile.getAbsolutePath
    val input = MemoryStream[SeamEventRow]
    input.addData(
      SeamEventRow(1L, 1000000000L, 1L, "signup", 1.0, "{}"),   // i app.users_1 k=1
      SeamEventRow(2L, 2000000000L, 1L, "purchase", 2.0, "{}"), // u app.users_1 k=1
      SeamEventRow(3L, 3000000000L, 2L, "signup", 3.0, "{}"),   // i app.users_2 k=2
      SeamEventRow(4L, 4000000000L, 50L, "signup", 9.0, "{}"))  // local db → filtered
    val q = IncrSync.startFrom(spark,
      graft.streaming.FrameSource(() => input.toDF()),
      s"$work/target", s"$work/ckpt")
    q.awaitTermination()
    val state = IncrSync.readOrEmpty(spark, s"$work/target/state")
      .select("ns", "doc_key", "last_value").as[(String, String, Double)].collect().toSet
    assert(state == Set(("app.users_1", "1", 2.0), ("app.users_2", "2", 3.0)))
  }

  test("pluggable sink seam: applyBatchTo drives a TargetWriter in T4/T8 order with reduced merge sets") {
    val rec = new RecordingTarget
    val batch = Seq(
      // segment 1 (ts <= 300): k1 folds i+u to one merge row, k2 inserts
      (1L, 100L, "i", "app.u0", "k1", 1.0, "{}"),
      (2L, 200L, "u", "app.u0", "k1", 2.0, "{}"),
      (3L, 250L, "i", "app.u1", "k2", 3.0, "{}"),
      // barrier at 300, then segment 2: k2's delete, k3's insert
      (9L, 300L, "c", "app.$cmd", "", 0.0, """{"drop":"u9"}"""),
      (4L, 400L, "d", "app.u1", "k2", 0.0, "{}"),
      (5L, 500L, "i", "app.u0", "k3", 5.0, "{}"),
      // barrier at 600 with NO trailing DML: the empty tail segment still
      // runs (and reduces to zero rows) before the checkpoint
      (8L, 600L, "c", "app.$cmd", "", 0.0, """{"drop":"u8"}"""))
      .toDF("event_id", "ts_packed", "op", "ns", "doc_key", "value", "props")
    IncrSync.applyBatchTo(batch, rec, batchId = 7L)
    // T4: segment, barrier, segment, barrier, tail segment; T8: ckpt LAST
    assert(rec.calls.toSeq == Seq("dml", "cmd:0", "dml", "cmd:1", "dml", "ckpt"))
    // the seam receives last-effective-write SETS, not raw op streams
    assert(rec.dmlSets(0) == Set(("app.u0", "k1", "u", 2L, 2.0), ("app.u1", "k2", "i", 3L, 3.0)))
    assert(rec.dmlSets(1) == Set(("app.u1", "k2", "d", 4L, 0.0), ("app.u0", "k3", "i", 5L, 5.0)))
    assert(rec.dmlSets(2).isEmpty)
    assert(rec.cmds.toSeq == Seq((7L, 0, "drop", 300L), (7L, 1, "drop", 600L)))
    assert(rec.ckpts.toSeq == Seq((7L, 100L, 600L, 7L))) // (batch, min, max, n)
  }

  test("pluggable sink seam: startOplogTo streams into an injected TargetWriter — no dataflow edits") {
    implicit val sqlCtx = spark.sqlContext
    val work = Files.createTempDirectory("graft_sink_seam").toFile.getAbsolutePath
    val input = MemoryStream[SeamOplogRow]
    def dml(eid: Long, ts: Long, op: String, ns: String, key: String, v: Double) =
      SeamOplogRow(eid, ts, op, ns, key, v, "{}", "", false, None, None, None)
    input.addData(
      dml(1L, 100L, "i", "app.u0", "k1", 1.0),
      dml(2L, 200L, "u", "app.u0", "k1", 2.0),
      dml(3L, 300L, "i", "other.t", "k9", 9.0)) // outside the whitelist
    val rec = new RecordingTarget
    val q = IncrSync.startOplogTo(spark,
      graft.streaming.FrameSource(() => input.toDF()), rec, s"$work/ckpt",
      txnTtlMs = 0)
    q.awaitTermination()
    // the filter chain ran upstream of the seam; the target saw one merged
    // row and one checkpoint, exactly the live-connector contract
    assert(rec.dmlSets.flatten.toSet == Set(("app.u0", "k1", "u", 2L, 2.0)))
    assert(rec.cmds.isEmpty)
    assert(rec.ckpts.toSeq == Seq((0L, 100L, 200L, 2L)))
  }

  test("receiver (entry point C): framed feed → checksum/decode → replay; restart is a no-op") {
    import graft.sinks.Envelope
    import graft.streaming.Receiver
    val work = Files.createTempDirectory("graft_recv").toFile.getAbsolutePath
    val src = "/root/testdata/sf0.001"
    val oplog = graft.model.Oplog.fromEvents(spark, src)
      .filter(graft.filters.OplogFilters.chain(Seq(""), Seq("^app\\..*$"), Nil))
    val framed = Envelope.compressFrames(Envelope.messages(Envelope.encode(oplog, 4)))
    framed.select("checksum", "tag", "shard", "chunk", "compress", "frame")
      .coalesce(1).write.parquet(s"$work/frames")

    val q = Receiver.start(spark, s"$work/frames", s"$work/target", s"$work/ckpt")
    q.awaitTermination()
    val decoded = spark.read.parquet(s"$work/target/decoded")
    assert(decoded.count() == oplog.count())
    // payload fidelity: the decoded (ts, op, ns, key, g) set equals the source
    val diff = decoded.select("ts_packed", "op", "ns", "doc_key", "g")
      .except(oplog.select("ts_packed", "op", "ns", "doc_key", "g"))
    assert(diff.count() == 0)
    // ack = committed offsets: a restart replays nothing
    val q2 = Receiver.start(spark, s"$work/frames", s"$work/target", s"$work/ckpt")
    q2.awaitTermination()
    assert(spark.read.parquet(s"$work/target/decoded").count() == oplog.count())
  }

  test("mongo change-stream wiring: connector rows project through the 8-way dispatch to the oplog feed") {
    // connector-shaped rows (publish.full.document.only = false): struct
    // ns/to, documentKey/fullDocument/updateDescription as JSON parts
    val base = Seq(
      (1L, (100L << 32) + 1, "insert", "app", "u0", None: Option[String], None: Option[String],
        Some("""{"_id":7,"c":1}"""), Some("""{"_id":7}"""), None: Option[String], None: Option[Seq[String]]),
      (2L, (200L << 32) + 2, "update", "app", "u0", None, None,
        None, Some("""{"_id":7}"""), Some("""{"c":2}"""), Some(Seq("k"))),
      (3L, (300L << 32) + 3, "delete", "app", "u0", None, None,
        None, Some("""{"_id":7}"""), None, None),
      (4L, (400L << 32) + 4, "drop", "app", "u1", None, None, None, None, None, None))
      .toDF("seq", "clusterTime", "operationType", "nsdb", "nscoll", "todb",
        "tocoll", "fullDocument", "documentKey", "updatedFields", "removedFields")
    val raw = base.select(col("seq"), col("clusterTime"), col("operationType"),
      struct(col("nsdb").as("db"), col("nscoll").as("coll")).as("ns"),
      struct(col("todb").as("db"), col("tocoll").as("coll")).as("to"),
      col("documentKey"), col("fullDocument"),
      struct(col("updatedFields").as("updatedFields"),
        col("removedFields").as("removedFields")).as("updateDescription"))

    import graft.streaming.MongoChangeSource
    val feed = MongoChangeSource.toOplogFeed(
      graft.transform.EventNormalizer.normalize(
        MongoChangeSource.projectConnectorEvents(raw)))
    assert(feed.columns.toSeq == IncrSync.oplogSchema.fieldNames.toSeq)
    val got = feed.select("event_id", "op", "ns", "doc_key", "props")
      .as[(Long, String, String, String, String)].collect().sortBy(_._1).toSeq
    assert(got == Seq(
      (1L, "i", "app.u0", "7", """{"_id":7,"c":1}"""),
      (2L, "u", "app.u0", "7", """{"$set":{"c":2},"$unset":{"k":1}}"""),
      (3L, "d", "app.u0", "7", """{"_id":7}"""),
      (4L, "c", "app.$cmd", "", """{"drop":"u1"}""")))
    // ts_packed carries the packed BSON timestamp through untouched
    assert(feed.select("ts_packed").as[Long].collect().sorted.toSeq ==
      Seq((100L << 32) + 1, (200L << 32) + 2, (300L << 32) + 3, (400L << 32) + 4))
    // and the feed drives the real apply: last-effective-write for _id 7
    // is the delete, the drop arrives as a barrier command
    val rec = new RecordingTarget
    IncrSync.applyBatchTo(feed, rec, batchId = 0L)
    assert(rec.dmlSets.head == Set(("app.u0", "7", "d", 3L, 0.0)))
    assert(rec.cmds.map(c => (c._3, c._4)) == Seq(("drop", (400L << 32) + 4)))
  }

  test("kafka tunnel wiring: sink projection → source parse inverts the frame contract") {
    import graft.sinks.Envelope
    import graft.streaming.{KafkaTunnel, Receiver}
    val src = "/root/testdata/sf0.001"
    val oplog = graft.model.Oplog.fromEvents(spark, src)
      .filter(graft.filters.OplogFilters.chain(Seq(""), Seq("^app\\..*$"), Nil))
    val framed = Envelope.compressFrames(Envelope.messages(Envelope.encode(oplog, 4)))
      .selectExpr(Envelope.frameColumns: _*).localCheckpoint()

    // write side: partition IS the shard (reference routing parity) and
    // the frame bytes ride `value` untouched
    val pub = KafkaTunnel.KafkaTunnelSink.toKafkaRows(framed)
    assert(pub.columns.toSeq == Seq("partition", "key", "value"))
    assert(pub.select("partition").as[Int].collect().sorted.toSeq ==
      framed.select("shard").as[Int].collect().sorted.toSeq)

    // broker stand-in: per-partition offsets assigned in publish (chunk)
    // order — exactly Kafka's per-partition append contract
    val kafkaRows = framed.select(col("frame").as("value"),
      col("shard").as("partition"), col("chunk").cast("long").as("offset"))
    val parsed = KafkaTunnel.parseFrames(kafkaRows)
    assert(parsed.columns.toSeq == Envelope.frameColumns)
    // the parse must reproduce the framed feed bit for bit
    assert(parsed.except(framed).count() == 0 && framed.except(parsed).count() == 0)
    // and the receiver's decode path consumes the parsed frames whole
    val decoded = Receiver.decodeBatch(parsed)
    assert(decoded.count() == oplog.count())
    assert(decoded.select("ts_packed", "op", "ns", "doc_key", "g")
      .except(oplog.select("ts_packed", "op", "ns", "doc_key", "g")).count() == 0)

    // a corrupt header int with the high bit set fails loudly (it would
    // otherwise cast int → NULL and degrade silently): flip the tag
    // field's first byte in one frame
    val corruptTag = udf((f: Array[Byte]) => {
      val g = f.clone(); g(4) = 0xFF.toByte; g
    })
    val badRows = kafkaRows.limit(1).withColumn("value", corruptTag(col("value")))
    val ex = intercept[Exception] {
      KafkaTunnel.parseFrames(badRows).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ msgs(e.getCause))
    assert(msgs(ex).exists(_.contains("corrupt tag")))
  }

  test("restart resume reassembles a txn chain split across stopped runs (state-store persistence)") {
    val work = Files.createTempDirectory("graft_txn_restart").toFile.getAbsolutePath
    def df(rows: Seq[Row]) = spark.createDataFrame(
      spark.sparkContext.parallelize(rows), IncrSync.oplogSchema)
    def inner(eid: Int, op: String, v: Double) =
      s"""{"event_id":$eid,"op":"$op","ns":"app.u0","doc_key":"ka","value":$v}"""
    // run 1: two partialTxn entries (chain open) + one plain row
    val p1 = Seq(
      Row(100L, 100L, "c", "admin.$cmd", "", 0.0, null, "", false, "L", 1L,
        s"""{"applyOps":[${inner(1, "i", 1.0)}],"partialTxn":true}"""),
      Row(101L, 200L, "c", "admin.$cmd", "", 0.0, null, "", false, "L", 1L,
        s"""{"applyOps":[${inner(2, "u", 2.0)}],"partialTxn":true}"""),
      Row(5L, 150L, "i", "app.u1", "kp", 9.0, "{}", "", false, null, null, null))
    df(p1).coalesce(1).write.parquet(s"$work/feed")
    val q1 = IncrSync.startOplog(spark, s"$work/feed", s"$work/target", s"$work/ckpt",
      txnTtlMs = 0, nBuckets = 4)
    q1.awaitTermination()
    // the chain is buffered, not emitted: only the plain row reached state
    val s1 = IncrSync.readOrEmpty(spark, s"$work/target/state")
      .select("ns", "doc_key").as[(String, String)].collect().toSet
    assert(s1 == Set(("app.u1", "kp")))

    // the query is STOPPED; the commit entry arrives; restart resumes the
    // buffered partials from the state store and releases the whole chain
    val p2 = Seq(
      Row(102L, 300L, "c", "admin.$cmd", "", 0.0, null, "", false, "L", 1L,
        s"""{"applyOps":[${inner(3, "u", 3.0)}]}"""))
    df(p2).coalesce(1).write.mode("append").parquet(s"$work/feed")
    val q2 = IncrSync.startOplog(spark, s"$work/feed", s"$work/target", s"$work/ckpt",
      txnTtlMs = 0, nBuckets = 4)
    q2.awaitTermination()
    val s2 = IncrSync.readOrEmpty(spark, s"$work/target/state")
      .select("ns", "doc_key", "last_value", "last_event_id")
      .as[(String, String, Double, Long)].collect().toSet
    assert(s2 == Set(("app.u1", "kp", 9.0, 5L), ("app.u0", "ka", 3.0, 3L)))
  }

  test("continuous-trigger soak: mid-stream arrivals + live TTL converge to the delivery-order fold") {
    import graft.model.Oplog
    import graft.filters.OplogFilters
    import org.apache.spark.sql.expressions.Window
    val dir = "/root/testdata/sf0.001"
    // 12 s: far above worst-case batch-1 latency on a contended host (the
    // cross-chain purge window — see the runSoak TTL note), still fast
    val out = graft.operators.StreamOps.runSoak(spark, dir, ttlMs = 12000L).collect()

    // four micro-batches, one per landed file (idle TTL triggers skipped)
    val ckN = out.find(_.getAs[String]("section") == "ckpt_n").get
    assert(ckN.getAs[Long]("y") == 4L)

    // the sentinel's application proves a post-TTL-deadline batch ran
    val state = out.filter(_.getAs[String]("section") == "state")
      .map(r => (r.getAs[String]("a"), r.getAs[String]("b"),
        r.getAs[Long]("x"), r.getAs[Double]("v"))).toSet
    assert(state.contains(("app.users_1", "-1", 8999999999L, 42.0)))

    // independent expected fold (window-rank over delivery order, vs the
    // engine's incremental bucket merge + groupBy-max): plain rows in ts
    // thirds (batches 1/2/4), cross chains whole at batch 2 with the T3
    // patch, orphan chains only their commit op at batch 4, sentinel 3.
    val keep = OplogFilters.chain(Seq(""), Seq("^app\\.users_[0-9]+$"), Seq("^app\\.users_3$"))
    val eff = Oplog.fromEvents(spark, dir).filter(keep && col("op").isin("i", "u", "d"))
    val b = eff.agg(min("ts_packed"), max("ts_packed")).head()
    val (tmin, tmax) = (b.getLong(0), b.getLong(1))
    val (t1, t2) = (tmin + (tmax - tmin) / 3, tmin + 2 * ((tmax - tmin) / 3))
    val w = Window.partitionBy(col("doc_key"))
    val mem = eff.filter(col("event_id") % 10 === 0)
      .withColumn("rn", row_number().over(w.orderBy(col("ts_packed"), col("event_id"))) - 1)
      .withColumn("n", count(lit(1)).over(w))
      .withColumn("commit_ts", max(col("ts_packed")).over(w))
      .withColumn("orphan", pmod(col("doc_key").cast("bigint"), lit(3)) === 0)
    val applied = eff.filter(col("event_id") % 10 =!= 0)
      .select(col("event_id"), col("op"), col("ns"), col("doc_key"), col("value"),
        col("ts_packed").as("ts_eff"),
        when(col("ts_packed") <= t1, 1).when(col("ts_packed") <= t2, 2).otherwise(4).as("bat"))
      .unionByName(mem.filter(!col("orphan"))
        .select(col("event_id"), col("op"), col("ns"), col("doc_key"), col("value"),
          when(col("rn") === col("n") - 1, col("commit_ts"))
            .otherwise(col("commit_ts") - 1).as("ts_eff"), lit(2).as("bat")))
      .unionByName(mem.filter(col("orphan") && col("rn") === col("n") - 1)
        .select(col("event_id"), col("op"), col("ns"), col("doc_key"), col("value"),
          col("ts_packed").as("ts_eff"), lit(4).as("bat")))
    val expected = applied
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("ns"), col("doc_key"))
          .orderBy(col("bat").desc, col("ts_eff").desc, col("event_id").desc)))
      .filter(col("rnk") === 1 && col("op") =!= "d")
      .select(col("ns"), col("doc_key"), col("event_id"), col("value"))
      .as[(String, String, Long, Double)].collect().toSet +
      (("app.users_1", "-1", 8999999999L, 42.0))
    assert(state == expected)

    // delivered-total: plain + all cross members + one op per orphan chain + sentinel
    val nPlain = eff.filter(col("event_id") % 10 =!= 0).count()
    val nCross = mem.filter(!col("orphan")).count()
    val nOrph = mem.filter(col("orphan")).select("doc_key").distinct().count()
    assert(ckN.getAs[Long]("x") == nPlain + nCross + nOrph + 1)
  }

  test("receiver: a corrupted frame fails the batch loudly — no silent drop past the checksum gate") {
    import graft.sinks.Envelope
    import graft.streaming.Receiver
    val work = Files.createTempDirectory("graft_recv_bad").toFile.getAbsolutePath
    val src = "/root/testdata/sf0.001"
    val oplog = graft.model.Oplog.fromEvents(spark, src)
      .filter(graft.filters.OplogFilters.chain(Seq(""), Seq("^app\\..*$"), Nil))
    val framed = Envelope.messages(Envelope.encode(oplog, 2))
      .selectExpr(Envelope.frameColumns: _*)
    // flip one payload byte in one frame; the stored checksum now lies
    val corrupt = udf((f: Array[Byte], flip: Boolean) => {
      if (flip) { val g = f.clone(); g(g.length - 1) = (g(g.length - 1) ^ 0x01).toByte; g }
      else f
    })
    framed.withColumn("frame", corrupt(col("frame"), col("chunk") === 0 && col("shard") === 0))
      .coalesce(1).write.parquet(s"$work/frames")
    val q = Receiver.start(spark, s"$work/frames", s"$work/target", s"$work/ckpt")
    val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q.awaitTermination()
    }
    // the failure is the checksum gate, and the batch never committed
    def rootMessages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ rootMessages(e.getCause))
    assert(rootMessages(ex).exists(_.contains("checksum")))
    // the job aborted before commit: no committed part files (an aborted
    // write may leave only the _temporary scratch dir behind)
    val committed = Option(new java.io.File(s"$work/target/decoded/batch=0").listFiles())
      .getOrElse(Array.empty).filter(_.getName.startsWith("part-"))
    assert(committed.isEmpty, s"uncommitted batch left data: ${committed.mkString(", ")}")
  }

  test("full sync: range-partitioned snapshot copy + handoff position") {
    val work = Files.createTempDirectory("graft_full").toFile.getAbsolutePath
    val src = "/root/testdata/sf0.001"
    val n = FullSync.copyTable(spark, src, "orders", "o_orderkey", work, nPieces = 4)
    assert(n == Tables.load(spark, src, "orders").count())
    // partition dirs exist per piece (partition pruning on read)
    val pieces = spark.read.parquet(s"$work/full/orders")
      .select("piece").distinct().as[Long].collect().toSet
    assert(pieces == Set(0L, 1L, 2L, 3L))
    val pos = FullSync.recordHandoff(spark, src, work)
    assert(spark.read.parquet(s"$work/_handoff").head().getLong(0) == pos && pos > 0)
  }

  test("AvailableNow + positive txn TTL is rejected at the seam, not coerced") {
    val ex = intercept[IllegalArgumentException] {
      IncrSync.startOplog(spark, "/nonexistent/feed", "/nonexistent/target",
        "/nonexistent/ckpt", txnTtlMs = 60000) // default AvailableNow trigger
    }
    assert(ex.getMessage.contains("requires a ProcessingTime trigger"))
  }

  test("rebucket: layout moves, content is a semantic no-op, wrong `from` rejected, crash recovers") {
    import graft.streaming.Rebucket
    val work = Files.createTempDirectory("graft_rebucket").toFile.getAbsolutePath
    // seed a 4-bucket state via the real apply path
    val batch = Seq(
      (1L, 10L, "i", "app.users_1", "k1", 1.0, "{}"),
      (2L, 11L, "i", "app.users_1", "k2", 2.0, "{}"),
      (3L, 12L, "i", "app.users_2", "k3", 3.0, "{}"),
      (4L, 13L, "u", "app.users_2", "k4", 4.0, "{}"),
      (5L, 14L, "i", "app.users_1", "k5", 5.0, "{}"))
      .toDF("event_id", "ts_packed", "op", "ns", "doc_key", "value", "props")
    IncrSync.applyBatch(batch, work, batchId = 0L, nBuckets = 4)
    val semCols = Seq("ns", "doc_key", "last_value", "last_event_id", "batch_ops")
    val pre = IncrSync.readOrEmpty(spark, s"$work/state")
      .select(semCols.map(col): _*).collect().toSet

    // wrong `from` is rejected before any write (stale layout belief)
    val ex = intercept[IllegalArgumentException] {
      Rebucket.migrate(spark, work, from = 16, to = 8)
    }
    assert(ex.getMessage.contains("not hash-bucketed by 16"))

    Rebucket.migrate(spark, work, from = 4, to = 8)
    val post = IncrSync.readOrEmpty(spark, s"$work/state")
    assert(post.select(semCols.map(col): _*).collect().toSet == pre)
    // every row sits in its hash-mod-8 bucket, and the layout really moved
    assert(post.filter(col("bucket") =!= IncrSync.bucketOf(8)).count() == 0)
    assert(post.filter(col("bucket") >= 4).count() > 0)

    // a post-migration apply at the new count merges correctly
    val batch2 = Seq((6L, 20L, "u", "app.users_1", "k1", 9.0, "{}"),
      (7L, 21L, "d", "app.users_2", "k3", 0.0, "{}"))
      .toDF("event_id", "ts_packed", "op", "ns", "doc_key", "value", "props")
    IncrSync.applyBatch(batch2, work, batchId = 1L, nBuckets = 8)
    val after = IncrSync.readOrEmpty(spark, s"$work/state")
    assert(after.filter(col("doc_key") === "k1").head().getAs[Double]("last_value") == 9.0)
    assert(after.filter(col("doc_key") === "k3").count() == 0)
    assert(after.count() == 4)

    // crash between the two swap renames: state gone, backup present
    val fs = new org.apache.hadoop.fs.Path(work)
      .getFileSystem(spark.sessionState.newHadoopConf())
    fs.rename(new org.apache.hadoop.fs.Path(s"$work/state"),
      new org.apache.hadoop.fs.Path(s"$work/state_mig_old"))
    Rebucket.recover(spark, work)
    assert(IncrSync.readOrEmpty(spark, s"$work/state").count() == 4)
    // migrate() itself also recovers first, then proceeds
    fs.rename(new org.apache.hadoop.fs.Path(s"$work/state"),
      new org.apache.hadoop.fs.Path(s"$work/state_mig_old"))
    Rebucket.migrate(spark, work, from = 8, to = 16)
    val rec = IncrSync.readOrEmpty(spark, s"$work/state")
    assert(rec.count() == 4 &&
      rec.filter(col("bucket") =!= IncrSync.bucketOf(16)).count() == 0)
  }

  test("Supervisor: exhausts maxRestarts on a query that always dies, reports the error") {
    val work = s"${System.getProperty("java.io.tmpdir")}/graft_supervisor_spec"
    graft.streaming.IncrSync.deletePath(spark, work)
    spark.range(5).write.parquet(s"$work/feed")
    var attempts = 0
    def start() = {
      attempts += 1
      spark.readStream
        .schema(org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("id",
            org.apache.spark.sql.types.LongType))))
        .parquet(s"$work/feed")
        .writeStream
        .option("checkpointLocation", s"$work/ckpt")
        .foreachBatch((_: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
            _: Long) => throw new RuntimeException("always fails"))
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    }
    // healthyAfterMs pinned above any run's wall-clock: every failure is
    // CONSECUTIVE, so the ladder must exhaust (the recovered-run reset
    // path is exercised by cdc_supervisor_restart, whose crashed first
    // run precedes a clean one)
    val r = graft.streaming.Supervisor.supervise(() => start(),
      maxRestarts = 2, backoffUnitMs = 1L, healthyAfterMs = 3600000L)
    assert(r.gaveUp && r.restarts == 2)
    assert(attempts == 3) // initial run + 2 restarts
    assert(r.lastError.exists(_.contains("always fails")))
  }

  test("stream_pattern: sequences straddle the staged batch boundary (CEP state carries)") {
    val dir = "/root/testdata/sf0.001"
    val out = graft.operators.StreamOps.queries("stream_pattern")(spark, dir)
      .select("user_id", "ts_view", "ts_click", "ts_purchase")
      .as[(Long, Long, Long, Long)].collect()
    assert(out.nonEmpty)
    // one first-match per user; stage times strictly ordered
    assert(out.map(_._1).distinct.length == out.length)
    assert(out.forall(m => m._2 <= m._3 && m._3 <= m._4))
    // the feed splits event time at its first decile — a match whose view
    // is in batch 1 and purchase in batch 2 proves the machine survived
    // the trigger boundary in the state store
    val ev = graft.Tables.loadEventsNs(spark, dir)
      .filter(col("event_type").isin("view", "click", "purchase"))
      .select(expr("ts DIV 1000").as("ts_us"))
    val b = ev.agg(org.apache.spark.sql.functions.min("ts_us"),
      org.apache.spark.sql.functions.max("ts_us")).head()
    val tcut = b.getLong(0) + (b.getLong(1) - b.getLong(0)) / 10
    assert(out.exists(m => m._2 <= tcut && m._4 > tcut))
  }

  test("stream_scd2: delete consumes a version without opening one; the " +
      "open version carries across invocations and closes with batch-2 ts") {
    import org.apache.spark.sql.streaming.TestGroupState
    import graft.operators.StreamOps.{Scd2Op, Scd2State}
    def st(prev: Option[Scd2State]) = TestGroupState.create[Scd2State](
      optionalState = prev.map(org.apache.spark.api.java.Optional.of[Scd2State])
        .getOrElse(org.apache.spark.api.java.Optional.empty[Scd2State]()),
      timeoutConf = org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout,
      batchProcessingTimeMs = 0L,
      eventTimeWatermarkMs = org.apache.spark.api.java.Optional.empty[Long](),
      hasTimedOut = false)
    // batch 1: i(v=1), u(v=2), d(v=3) — closes v1 and v2, leaves nothing open
    val s1 = st(None)
    val h1 = graft.operators.StreamOps.scd2Group(("app.t", "k"), Iterator(
      Scd2Op(1L, 10L, "i", "app.t", "k", 1.0),
      Scd2Op(2L, 20L, "u", "app.t", "k", 2.0),
      Scd2Op(3L, 30L, "d", "app.t", "k", 0.0)), s1).toSeq
    assert(h1.map(r => (r.version, r.valid_from, r.valid_to, r.value)) ==
      Seq((1L, 10L, 20L, 1.0), (2L, 20L, 30L, 2.0)))
    assert(s1.get == Scd2State(3L, 0L, 0L, 0.0)) // delete leaves none open
    // batch 2: reinsert opens v4 (the delete consumed v3), then an update
    // closes it — version numbering carried through state
    val s2 = st(Some(s1.get))
    val h2 = graft.operators.StreamOps.scd2Group(("app.t", "k"), Iterator(
      Scd2Op(4L, 40L, "i", "app.t", "k", 4.0),
      Scd2Op(5L, 50L, "u", "app.t", "k", 5.0)), s2).toSeq
    assert(h2.map(r => (r.version, r.valid_from, r.valid_to, r.value)) ==
      Seq((4L, 40L, 50L, 4.0)))
    assert(s2.get == Scd2State(5L, 5L, 50L, 5.0)) // v5 open in state
    // end-to-end: some version opened in batch 1 closes in batch 2
    val dir = "/root/testdata/sf0.001"
    val out = graft.operators.StreamOps.queries("stream_scd2")(spark, dir)
      .select("valid_from", "valid_to").as[(Long, Long)].collect()
    assert(out.nonEmpty)
    val eff = graft.model.Oplog.fromEvents(spark, dir)
      .filter(col("op").isin("i", "u", "d"))
    val bb = eff.agg(org.apache.spark.sql.functions.min("ts_packed"),
      org.apache.spark.sql.functions.max("ts_packed")).head()
    val tcut = bb.getLong(0) + (bb.getLong(1) - bb.getLong(0)) / 2
    assert(out.exists(r => r._1 <= tcut && r._2 > tcut))
  }

  test("stream_late_audit: the reconciliation balances — delivered splits " +
      "exactly into emitted, late-dropped, and the open tail") {
    val dir = "/root/testdata/sf0.001"
    val row = graft.operators.StreamOps.queries("stream_late_audit")(spark, dir)
      .select("n_delivered", "n_windows_emitted", "n_events_emitted",
        "n_retained_or_dropped").as[(Long, Long, Long, Long)].head()
    val (delivered, nWin, emitted, gap) = row
    assert(gap == delivered - emitted && nWin > 0 && emitted > 0)
    // closed-form split of the gap: the late lower half (dropped) plus
    // the upper-half rows in windows the watermark never closed (open),
    // plus the filler re-delivery — nothing else
    val ev = graft.Tables.loadEventsNs(spark, dir)
      .select(expr("ts DIV 1000").as("ts_us")).as[Long].collect()
    val (tmin, tmax) = (ev.min, ev.max)
    val tmid = tmin + (tmax - tmin) / 2
    val wm = tmax - 3600000000L
    val day = 86400000000L
    val late = ev.count(_ <= tmid)
    val filler = ev.count(_ == tmax)
    val open = ev.count(t => t > tmid && (t - t % day) + day > wm)
    assert(delivered == ev.length + filler)
    assert(gap == late + open + filler)
  }

  test("stream_asof_enrich: the latest version carries across invocations, " +
      "same-batch dim-then-fact order holds, pre-version facts emit NULL") {
    import org.apache.spark.sql.streaming.TestGroupState
    import graft.operators.StreamOps.{AsofRow, AsofState}
    def st(prev: Option[AsofState]) = TestGroupState.create[AsofState](
      optionalState = prev.map(org.apache.spark.api.java.Optional.of[AsofState])
        .getOrElse(org.apache.spark.api.java.Optional.empty[AsofState]()),
      timeoutConf = org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout,
      batchProcessingTimeMs = 0L,
      eventTimeWatermarkMs = org.apache.spark.api.java.Optional.empty[Long](),
      hasTimedOut = false)
    // batch 1 (delivered shuffled): fact@5 before any dim → NULL;
    // dim@10 then fact@20 → enriched, despite arrival order
    val s1 = st(None)
    val h1 = graft.operators.StreamOps.asofGroup(7L, Iterator(
      AsofRow(23L, 7L, "fact", 20L, 500L),
      AsofRow(11L, 7L, "dim", 10L, 100L),
      AsofRow(3L, 7L, "fact", 5L, 400L)), s1).toSeq
    assert(h1.map(h => (h.purchase_event, h.asof_signup_event,
      h.asof_signup_cents)) ==
      Seq((3L, None, None), (23L, Some(11L), Some(100L))))
    // batch 2: the carried version enriches; a newer dim supersedes it
    val s2 = st(Some(s1.get))
    val h2 = graft.operators.StreamOps.asofGroup(7L, Iterator(
      AsofRow(31L, 7L, "fact", 30L, 600L),
      AsofRow(41L, 7L, "dim", 40L, 200L),
      AsofRow(47L, 7L, "fact", 45L, 700L)), s2).toSeq
    assert(h2.map(h => (h.purchase_event, h.asof_signup_event,
      h.asof_signup_cents)) ==
      Seq((31L, Some(11L), Some(100L)), (47L, Some(41L), Some(200L))))
    assert(s2.get == AsofState(true, 41L, 40L, 200L))
    // end-to-end: purchases after the feed split enrich from signups
    // before it — the version crossed the trigger in the state store
    val dir = "/root/testdata/sf0.001"
    val ev = graft.Tables.loadEventsNs(spark, dir)
      .filter(col("event_type").isin("signup", "purchase"))
      .select(expr("ts DIV 1000").as("ts_us"), col("event_type"),
        col("event_id"))
    val bb = ev.agg(org.apache.spark.sql.functions.min("ts_us"),
      org.apache.spark.sql.functions.max("ts_us")).head()
    val tcut = bb.getLong(0) + (bb.getLong(1) - bb.getLong(0)) / 2
    val earlySignups = ev.filter(col("event_type") === "signup" &&
      col("ts_us") <= tcut).select("event_id").as[Long].collect().toSet
    val out = graft.operators.StreamOps.queries("stream_asof_enrich")(spark, dir)
      .select("ts_us", "asof_signup_event").as[(Long, Option[Long])].collect()
    assert(out.exists(r => r._1 > tcut && r._2.exists(earlySignups)))
  }

  test("stream_anomaly: baseline carries across invocations; warmup and " +
      "strict-prefix semantics hold") {
    import org.apache.spark.sql.streaming.TestGroupState
    import graft.operators.StreamOps.{AnomEvent, AnomState}
    // batch 1: 25 calm observations (100 cents) — warmup, no flags
    val st1 = TestGroupState.create[AnomState](
      optionalState = org.apache.spark.api.java.Optional.empty[AnomState](),
      timeoutConf = org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout,
      batchProcessingTimeMs = 0L,
      eventTimeWatermarkMs = org.apache.spark.api.java.Optional.empty[Long](),
      hasTimedOut = false)
    val b1 = (1L to 25L).map(i => AnomEvent(i, "click", i * 10, 100L))
    val hits1 = graft.operators.StreamOps.anomalyGroup(
      "click", b1.iterator, st1).toSeq
    assert(hits1.isEmpty) // warmup: nothing flags before 20 observations
    assert(st1.get == AnomState(25L, 2500L))
    // batch 2 (a later trigger): a 400-cent spike against the CARRIED
    // baseline — 400·25 > 3·2500 flags with batch-1's exact counters
    val st2 = TestGroupState.create[AnomState](
      optionalState = org.apache.spark.api.java.Optional.of(st1.get),
      timeoutConf = org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout,
      batchProcessingTimeMs = 0L,
      eventTimeWatermarkMs = org.apache.spark.api.java.Optional.empty[Long](),
      hasTimedOut = false)
    val b2 = Seq(AnomEvent(26L, "click", 300L, 400L),
      AnomEvent(27L, "click", 310L, 100L))
    val hits2 = graft.operators.StreamOps.anomalyGroup(
      "click", b2.iterator, st2).toSeq
    assert(hits2.map(h => (h.event_id, h.n_prev, h.sum_prev)) ==
      Seq((26L, 25L, 2500L)))
    // strict prefix: the spike itself joins the baseline AFTER its flag
    assert(st2.get == AnomState(27L, 3000L))
    // and the staged end-to-end run flags in BOTH halves of the feed
    val dir = "/root/testdata/sf0.001"
    val out = graft.operators.StreamOps.queries("stream_anomaly")(spark, dir)
      .select("ts_us").as[Long].collect()
    assert(out.nonEmpty)
    val ev = graft.Tables.loadEventsNs(spark, dir)
      .select(expr("ts DIV 1000").as("ts_us"))
    val b = ev.agg(org.apache.spark.sql.functions.min("ts_us"),
      org.apache.spark.sql.functions.max("ts_us")).head()
    val tcut = b.getLong(0) + (b.getLong(1) - b.getLong(0)) / 2
    assert(out.exists(_ <= tcut) && out.exists(_ > tcut))
  }

  test("stream_drift_alert: every post-baseline batch prices every lang, " +
      "the 3% gate separates alerts from noise, deltas reconcile exactly") {
    val dir = "/root/testdata/sf0.001"
    val got = graft.operators.StreamOps.queries("stream_drift_alert")(spark, dir)
      .select("batch_seq", "lang", "base_ppm", "cur_ppm", "delta_ppm", "alert")
      .as[(Long, String, Long, Long, Long, Boolean)].collect()
    assert(got.map(_._1).toSet == Set(1L, 2L))
    got.foreach { r =>
      assert(r._5 == r._4 - r._3)
      assert(r._6 == (math.abs(r._5) > 30000L))
    }
    // the gate is live in both directions
    assert(got.exists(_._6) && got.exists(!_._6))
    // exact reconciliation against the batch tercile recompute
    val d = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "lang").as[(Long, String)].collect()
    val (d0, d1) = (d.map(_._1).min, d.map(_._1).max)
    def tercile(id: Long): Long =
      if (id <= d0 + (d1 - d0) / 3) 0L
      else if (id <= d0 + 2 * (d1 - d0) / 3) 1L else 2L
    val byT = d.groupBy(r => tercile(r._1))
    def ppm(t: Long): Map[String, Long] = {
      val rows = byT(t); val tot = rows.length.toLong
      rows.groupBy(_._2).view.mapValues(_.length * 1000000L / tot).toMap
    }
    val base = ppm(0L)
    got.foreach { r =>
      assert(r._3 == base.getOrElse(r._2, 0L))
      assert(r._4 == ppm(r._1)(r._2))
    }
  }

  test("stream_schema_alert: exactly one alert per (ns, field) across a " +
      "3-batch feed; universal fields are baseline, drift fields can't precede it") {
    val dir = "/root/testdata/sf0.001"
    val got = graft.operators.StreamOps.queries("stream_schema_alert")(spark, dir)
      .select("ns", "field", "first_seen_us", "baseline")
      .as[(String, String, Long, Boolean)].collect()
    // one alert per key, despite every batch re-delivering _id/k sightings
    assert(got.map(r => (r._1, r._2)).distinct.length == got.length)
    val byNs = got.groupBy(_._1)
    assert(byNs.nonEmpty)
    byNs.foreach { case (_, rows) =>
      assert(rows.map(_._2).toSet == Set("_id", "k", "cents", "src"))
      val f = rows.map(r => r._2 -> r).toMap
      // _id and k ride every document → first batch → baseline
      assert(f("_id")._4 && f("k")._4)
      assert(f("_id")._3 == f("k")._3)
      // no conditional field can be sighted before the universal ones
      assert(f("cents")._3 >= f("_id")._3 && f("src")._3 >= f("_id")._3)
    }
  }

  test("quarantine foreachBatch is retry-idempotent: re-running one batch " +
      "rewrites its directories, never double-delivers") {
    import spark.implicits._
    val w = s"${System.getProperty("java.io.tmpdir")}/graft_quarantine_retry"
    IncrSync.deletePath(spark, w)
    val batch = Seq(
      (0L, 13L, "{bad"), // malformed
      (0L, 17L, "{}"), // missing key
      (0L, 1L, """{"k": 5}"""), // good
      (0L, 2L, """{"k": 7}""")) // good
      .toDF("b", "event_id", "props")
    graft.operators.StreamOps.quarantineBatch(batch, 0L, w)
    graft.operators.StreamOps.quarantineBatch(batch, 0L, w) // the RETRY
    val dlq = spark.read.option("basePath", s"$w/dlq")
      .parquet(s"$w/dlq/batch=*")
      .select(col("event_id"), col("reason"))
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    val good = spark.read.option("basePath", s"$w/good")
      .parquet(s"$w/good/batch=*")
      .select(col("event_id")).as[Long].collect().sorted.toSeq
    // an append-mode sink would hold 4 dlq + 4 good rows after the retry
    assert(dlq == Seq((13L, "malformed"), (17L, "missing_key")))
    assert(good == Seq(1L, 2L))
  }
}
