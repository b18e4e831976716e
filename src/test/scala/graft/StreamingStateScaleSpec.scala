package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.TxnAssembler
import graft.streaming.TxnAssembler.TxnEntry

/** Streaming-state scale guards — the stateful analogue of
  * `ScaleGuardSpec`'s batch quadratic caps. Each case drives a REAL
  * streaming query with an adversarial many-distinct-keys feed and
  * asserts the state-store row counts the progress events report:
  * state must be bounded by ACTIVE keys (buffering collapses per key,
  * closed keys leave), and the TTL/watermark eviction arms must
  * actually shrink it. Drop `state.remove()` on commit, the timeout
  * purge in `assembleGroup`, or a `withWatermark` on a join side, and
  * one of these fails — the way `ScaleGuardSpec` fails if a quadratic
  * cap is dropped.
  *
  * At 100 TB these bounds are the difference between O(open work) and
  * O(history) state: a transaction buffer that kept committed chains, or
  * a join that never evicted closed windows, would grow without bound on
  * an unbounded tail.
  */
class StreamingStateScaleSpec extends AnyFunSuite {
  lazy val spark = SparkTest.spark
  import spark.implicits._

  private def work(tag: String): String = {
    val w = s"${System.getProperty("java.io.tmpdir")}/graft_state_scale_$tag"
    graft.streaming.IncrSync.deletePath(spark, w)
    w
  }

  /** Max state rows any progress of `q` reported, and the final total. */
  private def stateTotals(q: StreamingQuery): Seq[Long] =
    q.recentProgress.toSeq.flatMap(_.stateOperators.map(_.numRowsTotal))

  /** 300 chains × 3 partials; keys with i % 3 == 0 (100) never commit. */
  private val NKeys = 300
  private val NOrphans = 100

  private def txnFeed: Seq[TxnEntry] =
    (0 until NKeys).flatMap { i =>
      val partials = (0 until 3).map(sq =>
        TxnEntry(s"k$i", 1L, sq.toLong, "partial", Seq(s"""{"i":$i,"s":$sq}"""), 1000L + sq))
      if (i % 3 == 0) partials
      else partials :+ TxnEntry(s"k$i", 1L, 3L, "commit", Seq(s"""{"i":$i,"s":3}"""), 1003L)
    }

  private def startAssemble(w: String, ttlMs: Long, trigger: Trigger): StreamingQuery = {
    txnFeed.toDF().coalesce(1).write.parquet(s"$w/feed")
    val entries = spark.readStream
      .schema(implicitly[org.apache.spark.sql.Encoder[TxnEntry]].schema)
      .parquet(s"$w/feed").as[TxnEntry]
    TxnAssembler.assemble(entries, ttlMs = ttlMs)
      .writeStream.outputMode("append")
      .option("checkpointLocation", s"$w/ckpt").option("path", s"$w/out")
      .trigger(trigger).format("parquet").start()
  }

  test("TxnAssembler state is one row per OPEN chain — commits evict, partials collapse") {
    val w = work("txn_bound")
    val q = startAssemble(w, ttlMs = 0L, Trigger.AvailableNow())
    q.awaitTermination()
    val totals = stateTotals(q)
    // 900 partial entries across 300 keys, 200 committed in-batch: state
    // ends at the 100 orphaned chains — one row per open key, NOT per
    // buffered entry (and NOT retaining the committed 200)
    assert(totals.nonEmpty && totals.max == NOrphans.toLong,
      s"state rows $totals; expected max == $NOrphans (open chains only)")
    // every committed chain delivered its 4 inner ops exactly once
    assert(spark.read.parquet(s"$w/out").count() == (NKeys - NOrphans) * 4L)
  }

  test("TxnAssembler TTL purges orphaned chains — state drains to zero") {
    val w = work("txn_ttl")
    val q = startAssemble(w, ttlMs = 2000L, Trigger.ProcessingTime("250 milliseconds"))
    try {
      val deadline = System.currentTimeMillis() + 60000L
      var totals = Seq.empty[Long]
      // live tail: poll until the no-data batches run the timeout pass
      while (System.currentTimeMillis() < deadline &&
          !(totals.contains(NOrphans.toLong) && totals.lastOption.contains(0L))) {
        Thread.sleep(200)
        totals = stateTotals(q)
      }
      assert(totals.contains(NOrphans.toLong),
        s"state never held the $NOrphans orphaned chains: $totals")
      assert(totals.lastOption.contains(0L),
        s"TTL did not purge orphan state within 60s: $totals")
    } finally q.stop()
  }

  test("stream-stream join: watermark evicts closed windows — state is active rows, then drains") {
    val w = work("join_wm")
    val users = 200
    def side(idOff: Int, tsUs: Long, n: Int): DataFrame =
      (0 until n).map(u => (u.toLong * 10 + idOff, u.toLong, tsUs)).toDF("event_id", "user_id", "ts_us")
    // one watermark-raising sentinel per side, on DISJOINT users so the
    // sentinels can't join each other
    def sentinel(idOff: Int, user: Long, tsUs: Long): DataFrame =
      Seq((idOff.toLong, user, tsUs)).toDF("event_id", "user_id", "ts_us")
    val base = 1700000000000000L // µs
    val farFuture = base + 10L * 86400 * 1000000 // +10 days: watermark sails past every window
    graft.operators.StreamOps.stageOrdered(spark, s"$w/views",
      Seq(side(0, base, users), sentinel(1, -1L, farFuture)))
    graft.operators.StreamOps.stageOrdered(spark, s"$w/buys",
      Seq(side(2, base + 1000000, users), sentinel(3, -2L, farFuture)))

    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("event_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("user_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("ts_us", org.apache.spark.sql.types.LongType)))
    def stream(path: String, prefix: String): DataFrame =
      spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(path)
        .select(col("event_id").as(s"${prefix}_event"), col("user_id").as(s"${prefix}_user"),
          timestamp_micros(col("ts_us")).as(s"${prefix}_ts"))
        .withWatermark(s"${prefix}_ts", "1 hour")
    val joined = stream(s"$w/views", "v").join(stream(s"$w/buys", "b"),
      expr("v_user = b_user AND b_ts >= v_ts AND b_ts <= v_ts + interval 1 hour"), "inner")
    val q = joined.writeStream.outputMode("append")
      .option("checkpointLocation", s"$w/ckpt").option("path", s"$w/out")
      .trigger(Trigger.AvailableNow()).format("parquet").start()
    q.awaitTermination()

    val totals = stateTotals(q)
    val removed = q.recentProgress.toSeq.flatMap(_.stateOperators.map(_.numRowsRemoved))
    // peak state = the two live sides (400 rows) + at most the 2 future
    // sentinels — NEVER more than active rows inside the watermark
    assert(totals.nonEmpty && totals.max <= (2L * users + 2),
      s"join state exceeded active rows: $totals")
    assert(totals.max >= 2L * users, s"feed did not populate both sides: $totals")
    // the future batch raises the watermark; the drain's trailing no-data
    // batch must EVICT every closed window — only the sentinels may stay
    assert(totals.last <= 2L, s"watermark did not evict closed windows: $totals")
    assert(removed.sum >= 2L * users, s"eviction never removed the closed rows: $removed")
    // and the join itself matched every user exactly once
    assert(spark.read.parquet(s"$w/out").count() == users.toLong)
  }

  test("flatMapGroupsWithState family (anomaly/SCD2 folds): state is one " +
      "row per KEY, never per event") {
    import graft.operators.StreamOps.AnomEvent
    val w = work("fmgws")
    // adversarial volume skew: 50 keys × 200 events — a fold that
    // buffered events instead of (count, sum) would report 10k rows
    val nKeys = 50
    val rows = for (k <- 0 until nKeys; i <- 0 until 200)
      yield (k.toLong * 1000 + i, s"t$k", i.toLong * 10, 100L + (i % 7))
    rows.toDF("event_id", "event_type", "ts_us", "cents")
      .coalesce(1).write.parquet(s"$w/feed")
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("event_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("event_type",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("ts_us",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("cents",
        org.apache.spark.sql.types.LongType)))
    val q = spark.readStream.schema(schema).parquet(s"$w/feed")
      .as[AnomEvent]
      .groupByKey(_.event_type)
      .flatMapGroupsWithState(
        org.apache.spark.sql.streaming.OutputMode.Append(),
        org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout)(
        graft.operators.StreamOps.anomalyGroup)
      .writeStream.outputMode("append")
      .option("checkpointLocation", s"$w/ckpt").option("path", s"$w/out")
      .trigger(Trigger.AvailableNow()).format("parquet").start()
    q.awaitTermination()
    val totals = stateTotals(q)
    assert(totals.nonEmpty && totals.max == nKeys.toLong,
      s"per-key fold state is not |keys|: $totals")
  }

  test("mview retract changelog: state is one (n, c) row per KEY, and the " +
      "changelog telescopes — replaying +/− deltas equals the final view") {
    import graft.operators.StreamOps.{MviewOp, MviewRow}
    val w = work("mview")
    // adversarial volume skew: 20 keys × 300 events across 3 batches — a
    // view that buffered batch history would report 6k state rows
    val nKeys = 20
    def part(b: Long) =
      (for (k <- 0 until nKeys; i <- 0 until 100)
        yield (b, s"t$k", (k % 10).toLong, 10L + i % 5))
        .toDF("b", "event_type", "ub", "cents")
    graft.operators.StreamOps.stageOrdered(spark, s"$w/feed",
      Seq(part(0), part(1), part(2)))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("b",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("event_type",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("ub",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("cents",
        org.apache.spark.sql.types.LongType)))
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$w/feed")
      .as[MviewOp]
      .groupByKey(o => (o.event_type, o.ub))
      .flatMapGroupsWithState(
        org.apache.spark.sql.streaming.OutputMode.Append(),
        org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout)(
        graft.operators.StreamOps.mviewGroup)
      .writeStream.outputMode("append")
      .option("checkpointLocation", s"$w/ckpt").option("path", s"$w/out")
      .trigger(Trigger.AvailableNow()).format("parquet").start()
    q.awaitTermination()
    val totals = stateTotals(q)
    assert(totals.nonEmpty && totals.max == nKeys.toLong,
      s"mview state is not |keys|: $totals")
    // telescoping: Σ(+n) − Σ(−n) per key = the key's final view count,
    // and the last '+' row per key IS the full fold of its input
    val log = spark.read.parquet(s"$w/out").as[MviewRow].collect()
    for (key <- log.map(r => (r.event_type, r.ub)).distinct) {
      val rows = log.filter(r => (r.event_type, r.ub) == key)
      val net = rows.map(r => if (r.op == "+") r.n else -r.n).sum
      val fin = rows.filter(_.op == "+").maxBy(_.b)
      assert(net == fin.n, s"$key: net $net vs final ${fin.n}")
      assert(fin.n == 300L, s"$key: final view count ${fin.n}")
    }
  }

  test("schema-alert registry state is |ns × fields| — schema-sized, " +
      "never sighting-volume-sized") {
    import graft.operators.StreamOps.{AlertSent, FieldSighting, SchemaAlert}
    val w = work("schema_alert")
    // adversarial volume: 4 namespaces × 5 fields × 500 re-sightings —
    // a store that kept sightings would report 10,000 rows; the
    // registry keeps exactly one boolean per (ns, field) = 20
    val rows = for (n <- 0 until 4; f <- 0 until 5; i <- 0 until 500)
      yield (s"app.u$n", s"field_$f", i.toLong * 100)
    rows.toDF("ns", "field", "ts_us").coalesce(1).write.parquet(s"$w/feed")
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("ns",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("field",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("ts_us",
        org.apache.spark.sql.types.LongType)))
    val q = spark.readStream.schema(schema).parquet(s"$w/feed")
      .as[FieldSighting]
      .groupByKey(r => (r.ns, r.field))
      .flatMapGroupsWithState(
        org.apache.spark.sql.streaming.OutputMode.Append(),
        org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout)(
        (key: (String, String), rs: Iterator[FieldSighting],
            state: org.apache.spark.sql.streaming.GroupState[AlertSent]) => {
          if (state.exists) Iterator.empty
          else {
            state.update(AlertSent(true))
            Iterator.single(SchemaAlert(key._1, key._2, rs.map(_.ts_us).min,
              baseline = true))
          }
        })
      .writeStream.outputMode("append")
      .option("checkpointLocation", s"$w/ckpt").option("path", s"$w/out")
      .trigger(Trigger.AvailableNow()).format("parquet").start()
    q.awaitTermination()
    val totals = stateTotals(q)
    assert(totals.nonEmpty && totals.max == 20L,
      s"registry state is not |ns×fields|: $totals")
    assert(spark.read.parquet(s"$w/out").count() == 20L)
  }

  test("near-dup ledger state is one row per band BUCKET, not per document; " +
      "later batches probe state written by earlier ones") {
    val w = work("neardup_bound")
    // 100 byte-identical documents — the adversarial boilerplate bucket
    // that forces the batch op's maxBandBucket cap. The streaming ledger
    // must hold exactly 4 rows (one per band bucket, each a single long),
    // no matter how many documents pass through it.
    val hot = (0L until 100L).map(i =>
      (i, "the same boilerplate text repeated for every single document in this corpus"))
    graft.operators.StreamOps.stageOrdered(spark, s"$w/feed", Seq(
      hot.filter(_._1 < 50).toDF("doc_id", "text"),
      hot.filter(_._1 >= 50).toDF("doc_id", "text")))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType)))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$w/feed")
    val q = graft.functions.Dedup.streamingNearDupCandidates(stream)
      .writeStream.outputMode("append")
      .option("checkpointLocation", s"$w/ckpt").option("path", s"$w/out")
      .trigger(Trigger.AvailableNow()).format("parquet").start()
    q.awaitTermination()
    val totals = stateTotals(q)
    assert(totals.nonEmpty && totals.max == 4L,
      s"ledger state is not one row per bucket: $totals")
    val out = spark.read.parquet(s"$w/out")
    // every doc except the first hits in all 4 bands, earliest mate = 0
    assert(out.count() == 99L * 4)
    assert(out.filter(col("cand") =!= 0L).count() == 0L)
    // the second file's docs hit STATE (doc 0 arrived a micro-batch earlier)
    assert(out.filter(col("doc_id") >= 50L).count() == 50L * 4)
  }

  test("stream-join state partitions auto-size to projected volume — the " +
      "measured anchors are regression-locked") {
    import graft.operators.StreamOps.stateJoinPartitions
    // floor: every corpus up to the r11 anchor (sf0.1, 50k rows/side)
    // stays at 8 — the measured base optimum (8 beat 32: 3.34 vs 7.19 s)
    assert(stateJoinPartitions(0) == 8)
    assert(stateJoinPartitions(5000) == 8) // sf0.01
    assert(stateJoinPartitions(50000) == 8) // sf0.1
    assert(stateJoinPartitions(409600) == 8) // the exact 8→16 boundary
    // 30× corpus (~1.5M rows/side) → 16
    assert(stateJoinPartitions(409601) == 16)
    assert(stateJoinPartitions(1500000) == 16)
    // 100× corpus (~5-6.4M rows/side) → 32, the measured 100× optimum
    // (SCALE_r14: 32 = 16.2 s vs 8 = 31.7 s; SCALE_r16 A/B re-confirms
    // with 64 measured too)
    assert(stateJoinPartitions(5000000) == 32)
    assert(stateJoinPartitions(6400000) == 32)
    // doubles per 4× rows past the anchors; hard cap 4096
    assert(stateJoinPartitions(26000000L) == 64)
    assert(stateJoinPartitions(Long.MaxValue) == 4096)
  }

  test("scopedStart freezes StatePartitions into the query at birth and " +
      "restores the session conf immediately - even on a failed start") {
    import graft.streaming.IncrSync
    val key = "spark.sql.shuffle.partitions"
    val sessionDefault = spark.conf.get(key)
    // restore-on-throw: a start body that fails must not leak the scoped
    // value into the shared session (the ADVICE-r18 concern)
    intercept[RuntimeException] {
      IncrSync.scopedStart(spark) { throw new RuntimeException("boom") }
    }
    assert(spark.conf.get(key) == sessionDefault)
    // a real stateful query started under scopedStart runs its state
    // operator at StatePartitions, while the session conf is already
    // restored the moment start() returns - concurrent work in the same
    // session never observes the scoped width
    val w = work("scoped_start")
    val q = IncrSync.scopedStart(spark) {
      startAssemble(w, ttlMs = 1L << 40, Trigger.AvailableNow())
    }
    assert(spark.conf.get(key) == sessionDefault)
    q.awaitTermination(120000)
    val parts = q.recentProgress.toSeq
      .flatMap(_.stateOperators.map(_.numShufflePartitions))
    assert(parts.nonEmpty &&
      parts.forall(_ == IncrSync.StatePartitions.toLong))
  }

  test("applyParts: batch-derived merge width pinned at every regime " +
      "(floor at harness batches, growth, cap, overflow edge)") {
    import graft.streaming.IncrSync.applyParts
    // floor 4: every gate/harness delivery (≤ ~200k rows) and anything
    // up to the 250k-rows-per-partition budget at width 4
    assert(applyParts(0) == 4)
    assert(applyParts(200000) == 4)
    assert(applyParts(1000000L) == 4) // 4 * 250k budget exactly
    assert(applyParts(1000001L) == 8)
    // doubles with the delivery: 10M rows -> 64 partitions (~156k rows
    // each, inside the budget)
    assert(applyParts(10000000L) == 64)
    // cap 4096 binds past ~10^9 rows - beyond any admission-controlled
    // delivery (maxRowsPerTrigger); no overflow at the Long edge
    assert(applyParts(1000000000L) == 4096)
    assert(applyParts(Long.MaxValue) == 4096)
  }

  test("applyBatchTo scopes merge width to the delivery and restores the " +
      "session conf - even when the delivery is empty or the apply throws") {
    import graft.streaming.IncrSync
    val key = "spark.sql.shuffle.partitions"
    val sessionDefault = spark.conf.get(key)
    val w = work("apply_parts_scope")
    val batch = spark.range(100).selectExpr(
      "id as event_id", "id as ts_packed", "'i' as op", "'app.t' as ns",
      "cast(id as string) as doc_key", "cast(id as double) as value",
      "cast(null as string) as props")
    IncrSync.applyBatch(batch, w, 0L, nBuckets = 4)
    assert(spark.conf.get(key) == sessionDefault)
    // the merge really happened at the scoped width's floor semantics:
    // state table holds every key exactly once
    assert(IncrSync.readOrEmpty(spark, s"$w/state").count() == 100L)
    // empty delivery: early return must not leak a scoped conf either
    IncrSync.applyBatch(batch.filter("event_id < 0"), w, 1L, nBuckets = 4)
    assert(spark.conf.get(key) == sessionDefault)
    // a failing apply (barrier over the F9 guard) restores the conf too
    val ddl = spark.range(1).selectExpr(
      "id as event_id", "id as ts_packed", "'c' as op", "'app.$cmd' as ns",
      "'k' as doc_key", "'{\"drop\":\"t\"}' as value", "'{}' as props")
    intercept[IllegalArgumentException] {
      IncrSync.applyBatch(ddl, w, 2L, nBuckets = 4,
        fullSyncFinishPosition = Long.MaxValue)
    }
    assert(spark.conf.get(key) == sessionDefault)
  }

  test("rocksdb state-store backend (flagged): identical assembled output, " +
      "changelog checkpointing engaged") {
    import graft.streaming.StateBackend
    // baseline: the engine-default backend
    val w1 = work("backend_default")
    val q1 = startAssemble(w1, ttlMs = 0L, Trigger.AvailableNow())
    q1.awaitTermination()
    val out1 = spark.read.parquet(s"$w1/out").collect().map(_.toString).sorted.toSeq
    // flagged: RocksDB + changelog checkpointing on the same feed
    val w2 = work("backend_rocksdb")
    val prev = StateBackend.RocksDbConfs.map { case (k, _) =>
      k -> spark.conf.getOption(k) }
    StateBackend.RocksDbConfs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val q2 = startAssemble(w2, ttlMs = 0L, Trigger.AvailableNow())
      q2.awaitTermination()
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
    val out2 = spark.read.parquet(s"$w2/out").collect().map(_.toString).sorted.toSeq
    assert(out2 == out1, "RocksDB backend diverged from the default backend")
    // structural proof the provider engaged: changelog files in the
    // query's state checkpoint (the default HDFS store writes .delta)
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    val stateDir = new java.io.File(s"$w2/ckpt/state")
    assert(walk(stateDir).exists(_.getName.endsWith(".changelog")),
      "no .changelog files - RocksDB changelog checkpointing did not engage")
    assert(!walk(new java.io.File(s"$w1/ckpt/state"))
      .exists(_.getName.endsWith(".changelog")))
  }

}
