package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}

import graft.filters.OplogFilters
import graft.model.Oplog
import graft.streaming.IncrSync

/** End-to-end oracle coverage of the §3.1 streaming dataflow: synthesize a
  * raw-oplog feed from the corpus (plain DML + session transactions +
  * atomic applyOps + DDL barriers), run the REAL `IncrSync.startOplog`
  * query to completion, and compare final state + ddl_log + checkpoint
  * contents against a closed-form DuckDB oracle.
  *
  * This is the driver-gated analogue of the reference's
  * `collector/batcher_test.go:719` (TestBatchMore) surface: barrier
  * segmentation order (T4), DDL replay (W5), checkpoint content (T8), the
  * F9 guard path, trigger batching (G1) and the observe counters (G7) all
  * execute inside the one streaming query this entry drives.
  *
  * Feed construction (deterministic, corpus-derived; mirrored in SQL):
  *  - chain-passing i/u/d rows split by event_id % 20: 0 → session-txn
  *    member, 1 → atomic-applyOps member, else plain; non-passing rows ride
  *    the plain branch and are dropped by the engine's own filter chain.
  *  - txn members group by (lsid = doc_key, txn = month); entries pack 2
  *    ops; earlier entries partialTxn, last the unprepared commit; txns
  *    with (lsid+txn) % 7 == 0 abort (members must never apply). The T3
  *    patch gives inner ops ts = commitTs-1 (last keeps commitTs).
  *  - atomic members group by event_id DIV 64 into one applyOps command;
  *    inner ops apply at the command's ts.
  *  - two DDL barriers: drop app.users_2 at t1 = mid-ts, rename
  *    app.users_0 → app.users_9 at t2 = 3/4-ts. State at a barrier is the
  *    fold of everything at-or-before it (segment-at-barrier semantics).
  */
object StreamOps {

  private val gids = Seq("")
  private val white = Seq("^app\\.users_[0-9]+$")
  private val black = Seq("^app\\.users_3$")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "cdc_stream_e2e" -> ((s, dir) => run(s, dir)),
    "cdc_resume_restart" -> ((s, dir) => runResume(s, dir)),
    "cdc_tail_live" -> ((s, dir) => runTailLive(s, dir)),
    "cdc_sharded_fanout" -> ((s, dir) => runShardedFanout(s, dir)),
    "cdc_token_resume" -> ((s, dir) => runTokenResume(s, dir)),
    "cdc_tail_admission" -> ((s, dir) => runTailAdmission(s, dir)),
    "cdc_supervisor_restart" -> ((s, dir) => runSupervisor(s, dir)),
    "cdc_metrics" -> ((s, dir) => runMetrics(s, dir)),
    "cdc_full_incr_handoff" -> ((s, dir) => runHandoff(s, dir)),
    "cdc_soak_live" -> ((s, dir) => runSoak(s, dir)),
    "cdc_rebucket" -> ((s, dir) => runRebucket(s, dir)),
    "cdc_ckpt_api_store" -> ((s, dir) => runCkptStores(s, dir)),
    "cdc_journal_sample" -> ((s, dir) => runJournal(s, dir)),
    // The stateful single-stream harnesses run with state partitions
    // scoped to 8 (r18, verdict task 4): HarnessProfile measured their
    // walls dominated by the per-partition state-store commit floor —
    // 20–115 s CUMULATIVE state-commit time for 2–3 micro-batches of
    // ≤100k-row state at the session's 32 partitions (stream_chained
    // 115 s, stream_topk 62 s, stream_late_audit 52 s …) — the same
    // trigger-count × partition fan-out pathology the r17 soak fix cut
    // 20×. State this small fits 8 partitions with room to spare; the
    // count freezes into each harness's own fresh checkpoint, and the
    // join family keeps its separately-derived stateJoinPartitions rule.
    "stream_window_late" -> ((s, dir) => scopedState(s)(runWindowed(s, dir))),
    "stream_chained" -> ((s, dir) => scopedState(s)(runChained(s, dir))),
    "stream_topk" -> ((s, dir) => scopedState(s)(runStreamTopk(s, dir))),
    "stream_join" -> ((s, dir) => runStreamJoin(s, dir)),
    "stream_join_outer" -> ((s, dir) => runStreamJoinOuter(s, dir)),
    "stream_sessionize" -> ((s, dir) => scopedState(s)(runSessionize(s, dir))),
    "stream_dedup_wm" -> ((s, dir) => scopedState(s)(runStreamDedup(s, dir))),
    "stream_enrich" -> ((s, dir) => scopedState(s)(runStreamEnrich(s, dir))),
    "stream_pattern" -> ((s, dir) => scopedState(s)(runPattern(s, dir))),
    "stream_join_semi" -> ((s, dir) => runStreamJoinSemi(s, dir)),
    "stream_join_autosize" -> ((s, dir) => runJoinAutosize(s, dir)),
    "stream_anomaly" -> ((s, dir) => scopedState(s)(runAnomaly(s, dir))),
    "stream_scd2" -> ((s, dir) => scopedState(s)(runScd2(s, dir))),
    "stream_mview_delta" -> ((s, dir) => scopedState(s)(runMviewDelta(s, dir))),
    "stream_quarantine" -> ((s, dir) => scopedState(s)(runQuarantine(s, dir))),
    "stream_asof_enrich" -> ((s, dir) => scopedState(s)(runAsofEnrich(s, dir))),
    "stream_late_audit" -> ((s, dir) => scopedState(s)(runLateAudit(s, dir))),
    "stream_schema_alert" -> ((s, dir) => scopedState(s)(runSchemaAlert(s, dir))),
    "stream_drift_alert" -> ((s, dir) => scopedState(s)(runDriftAlert(s, dir))))

  /** Run a harness with `spark.sql.shuffle.partitions` scoped to `n`:
    * every streaming query the body STARTS freezes n into its checkpoint
    * (StreamExecution clones the session at start), and the conf is
    * restored when the body returns — the same birth-time sizing the
    * soak and stream-join harnesses apply, packaged for the single-
    * stream family. The body's small batch pre/post work (staging
    * writes, final head aggregations over ≤100k-row outputs) also runs
    * at n, which only removes empty-partition overhead at these sizes.
    *
    * SEQUENTIAL-EXECUTION ASSUMPTION (ADVICE r18): the conf is held on
    * the shared session for the ENTIRE body, so a query running
    * CONCURRENTLY in the same session would observe the scoped value.
    * Verify and Bench both run queries strictly one at a time, which is
    * the contract this relies on; a harness that must coexist with
    * concurrent session work should instead scope only around each
    * query's `.start()` ([[graft.streaming.IncrSync.scopedStart]] is
    * that narrower idiom, and the CDC pipelines use it internally).
    */
  private[operators] def scopedState[T](s: SparkSession, n: Int = 8)(body: => T): T = {
    val key = "spark.sql.shuffle.partitions"
    val prev = s.conf.get(key)
    s.conf.set(key, n)
    try body finally s.conf.set(key, prev)
  }

  /** Stage a multi-file feed whose files must be consumed IN ORDER by a
    * `maxFilesPerTrigger = 1` file source: write each part, then pin
    * strictly increasing modification times (2 s apart) on its files.
    * Two sub-millisecond parquet writes otherwise land with the SAME
    * mod time and the source's oldest-first ordering falls back to the
    * random part-file names — a latent coin-flip in any staged harness.
    */
  private[graft] def stageOrdered(s: SparkSession, feedDir: String,
      parts: Seq[DataFrame]): Unit = {
    val path = new org.apache.hadoop.fs.Path(feedDir)
    val fs = path.getFileSystem(s.sessionState.newHadoopConf())
    var known = Set.empty[String]
    val base = System.currentTimeMillis()
    parts.zipWithIndex.foreach { case (df, i) =>
      df.coalesce(1).write.mode(if (i == 0) "overwrite" else "append").parquet(feedDir)
      val files = fs.listStatus(path).map(_.getPath)
        .filter(p => !p.getName.startsWith("_") && !p.getName.startsWith("."))
      files.filterNot(f => known(f.getName))
        .foreach(f => fs.setTimes(f, base + i * 2000L, -1))
      known ++= files.map(_.getName)
    }
  }

  /** Canonical oplog rows as a raw-oplog feed (null txn columns). */
  private def feedify(df: DataFrame): DataFrame = {
    val nullS = lit(null).cast("string")
    val nullL = lit(null).cast("long")
    df.select(
      col("event_id"), col("ts_packed"), col("op"), col("ns"), col("doc_key"),
      col("value"), col("props"), col("g"), col("from_migrate"),
      nullS.as("lsid"), nullL.as("txn_number"), nullS.as("o"))
  }

  /** Member payload: the self-describing inner-op JSON the assembler and
    * the atomic exploder re-project to canonical rows.
    */
  private def payloadCol =
    concat(lit("{\"event_id\":"), col("event_id").cast("string"),
      lit(",\"op\":\""), col("op"), lit("\",\"ns\":\""), col("ns"),
      lit("\",\"doc_key\":\""), col("doc_key"),
      lit("\",\"value\":"), col("value").cast("string"), lit("}"))

  private val feedCols = Seq("event_id", "ts_packed", "op", "ns", "doc_key",
    "value", "props", "g", "from_migrate", "lsid", "txn_number", "o")

  private def run(s: SparkSession, dir: String): DataFrame = {
    val work = graft.Work.dir(s"stream_e2e_q")
    IncrSync.deletePath(s, work)

    val base = Oplog.fromEvents(s, dir)
    val keep = OplogFilters.chain(gids, white, black)
    val eligible = keep && col("op").isin("i", "u", "d")
    // One corpus scan: the bounds action plus the three feed branches all
    // read the materialized snapshot, not four passes over the parquet.
    val roled = base.withColumn("role",
      when(eligible && col("event_id") % 20 === 0, "txn")
        .when(eligible && col("event_id") % 20 === 1, "atomic")
        .otherwise("plain"))
      .localCheckpoint()

    val bounds = roled.agg(min(col("ts_packed")), max(col("ts_packed"))).head()
    val (tmin, tmax) = (bounds.getLong(0), bounds.getLong(1))
    val t1 = tmin + (tmax - tmin) / 2
    val t2 = tmin + 3 * (tmax - tmin) / 4

    val nullS = lit(null).cast("string")
    val nullL = lit(null).cast("long")

    val plain = roled.filter(col("role") === "plain")
      .select(col("event_id"), col("ts_packed"), col("op"), col("ns"),
        col("doc_key"), col("value"), col("props"), col("g"), col("from_migrate"),
        nullS.as("lsid"), nullL.as("txn_number"), nullS.as("o"))

    val atomic = roled.filter(col("role") === "atomic")
      .withColumn("ab", expr("event_id DIV 64"))
      .withColumn("payload", payloadCol)
      .groupBy(col("ab"))
      .agg(max(col("ts_packed")).as("ts_packed"), max(col("event_id")).as("event_id"),
        concat_ws(",", transform(
          array_sort(collect_list(struct(col("ts_packed").as("t"),
            col("event_id").as("e"), col("payload").as("p")))),
          x => x.getField("p"))).as("ops_json"))
      .select(col("event_id"), col("ts_packed"), lit("c").as("op"),
        lit("admin.$cmd").as("ns"), lit("").as("doc_key"), lit(0.0).as("value"),
        nullS.as("props"), lit("").as("g"), lit(false).as("from_migrate"),
        nullS.as("lsid"), nullL.as("txn_number"),
        concat(lit("{\"applyOps\":["), col("ops_json"), lit("]}")).as("o"))

    val wOps = Window.partitionBy(col("lsid"), col("txn_number"))
      .orderBy(col("ts_packed"), col("event_id"))
    val mem = roled.filter(col("role") === "txn")
      .withColumn("lsid", col("doc_key"))
      // month-grained txn grouping: yields a mix of single-commit txns and
      // multi-entry partialTxn chains (the buffering path) in one corpus
      .withColumn("txn_number", expr("ts_us DIV 2592000000000"))
      .withColumn("rn", row_number().over(wOps) - 1)
      .withColumn("payload", payloadCol)
      .withColumn("entry_seq", expr("rn DIV 2"))
    val entries0 = mem.groupBy(col("lsid"), col("txn_number"), col("entry_seq"))
      .agg(max(col("ts_packed")).as("ts_packed"),
        concat_ws(",", transform(
          array_sort(collect_list(struct(col("rn"), col("payload")))),
          x => x.getField("payload"))).as("ops_json"))
    val wTxn = Window.partitionBy(col("lsid"), col("txn_number"))
    val entries1 = entries0
      .withColumn("max_seq", max(col("entry_seq")).over(wTxn))
      .withColumn("aborted",
        pmod(col("lsid").cast("bigint") + col("txn_number"), lit(7)) === 0)
      .withColumn("o",
        when(col("entry_seq") < col("max_seq") || col("aborted"),
          concat(lit("{\"applyOps\":["), col("ops_json"), lit("],\"partialTxn\":true}")))
          .otherwise(concat(lit("{\"applyOps\":["), col("ops_json"), lit("]}"))))
    val abortEntries = entries1
      .filter(col("aborted") && col("entry_seq") === col("max_seq"))
      .select(col("lsid"), col("txn_number"), (col("max_seq") + 1).as("entry_seq"),
        col("ts_packed"), lit("{\"abortTransaction\":1}").as("o"))
    val txnRows = entries1.select("lsid", "txn_number", "entry_seq", "ts_packed", "o")
      .unionByName(abortEntries)
      // entry event_id doubles as the assembler's chain seq — entry_seq is
      // monotone in (ts, member-id) order within each txn by construction.
      .select(col("entry_seq").as("event_id"), col("ts_packed"), lit("c").as("op"),
        lit("admin.$cmd").as("ns"), lit("").as("doc_key"), lit(0.0).as("value"),
        nullS.as("props"), lit("").as("g"), lit(false).as("from_migrate"),
        col("lsid"), col("txn_number"), col("o"))

    val dropJson = """{"drop":"users_2"}"""
    val renameJson = """{"renameCollection":"app.users_0","to":"app.users_9"}"""
    val barrierRows = Seq(
      Row(9000000001L, t1, "c", "app.$cmd", "", 0.0, dropJson, "", false, null, null, dropJson),
      Row(9000000002L, t2, "c", "app.$cmd", "", 0.0, renameJson, "", false, null, null, renameJson))
    val barriers = s.createDataFrame(
      s.sparkContext.parallelize(barrierRows), IncrSync.oplogSchema)

    val feedDir = s"$work/feed"
    plain.select(feedCols.map(col): _*)
      .unionByName(atomic.select(feedCols.map(col): _*))
      .unionByName(txnRows.select(feedCols.map(col): _*))
      .unionByName(barriers.select(feedCols.map(col): _*))
      // one file → one AvailableNow micro-batch → deterministic batch_id 0
      .coalesce(1).write.parquet(feedDir)

    // 16 buckets at test scale (same harness choice as cdc_incr_state —
    // a state-layout parameter, not operator semantics)
    val q = IncrSync.startOplog(s, feedDir, s"$work/target", s"$work/ckpt",
      gids = gids, white = white, black = black, txnTtlMs = 0, nBuckets = 16)
    q.awaitTermination()

    val state = IncrSync.readOrEmpty(s, s"$work/target/state")
      .select(lit("state").as("section"), col("ns").as("a"), col("doc_key").as("b"),
        col("last_event_id").as("x"), lit(0L).as("y"), col("last_value").as("v"))
    val ddl = s.read.parquet(s"$work/target/ddl_log")
      .select(lit("ddl").as("section"), col("ns").as("a"), col("cmd").as("b"),
        col("apply_seq").cast("long").as("x"), col("ts_packed").as("y"),
        lit(0.0).as("v"))
    val ck = s.read.parquet(s"$work/target/_ckpt")
    val ckRange = ck.select(lit("ckpt_range").as("section"), lit("").as("a"),
      lit("").as("b"), col("lsn_min").as("x"), col("lsn_max").as("y"), lit(0.0).as("v"))
    val ckN = ck.select(lit("ckpt_n").as("section"), lit("").as("a"), lit("").as("b"),
      col("n_logs").as("x"), col("batch_id").as("y"), lit(0.0).as("v"))
    state.unionByName(ddl).unionByName(ckRange).unionByName(ckN)
  }

  /** Harness fault injector: delegates to the real target but fails the
    * FIRST DML delivery (driver-side flag — foreachBatch targets run on
    * the driver, and the instance is shared across supervised restarts,
    * so exactly one run crashes).
    */
  private final class FaultOnceTarget(inner: graft.streaming.TargetWriter)
      extends graft.streaming.TargetWriter {
    @volatile private var tripped = false
    def applyDml(last: DataFrame): Unit = {
      if (!tripped) {
        tripped = true
        throw new RuntimeException("injected fault: first DML delivery dies")
      }
      inner.applyDml(last)
    }
    def applyCommand(spark: SparkSession, row: Row, batchId: Long, seq: Int): Unit =
      inner.applyCommand(spark, row, batchId, seq)
    def commitCheckpoint(ck: DataFrame, batchId: Long): Unit =
      inner.commitCheckpoint(ck, batchId)
    override def journalOps(batch: DataFrame, batchId: Long): Unit =
      inner.journalOps(batch, batchId)
  }

  /** The hypervisor restart loop end-to-end (`scripts/hypervisor.c` ↔
    * [[graft.streaming.Supervisor]]): the REAL `IncrSync.startOplogTo`
    * query dies on its FIRST DML delivery — an injected fault at the sink
    * seam, mid-batch, BEFORE the engine checkpoint commits: exactly the
    * dangerous window the at-least-once × idempotence contract exists
    * for. The supervisor restarts from the same checkpointLocation and
    * the replayed batch converges through the idempotent merge.
    * Output = the resume harness's exact sections
    * (final state + per-batch `_ckpt` rows: a re-read, a skip, or a
    * duplicated batch all hash-diverge) plus a `sup` section pinning
    * restarts = 1 and a clean (not given-up) exit. The oracle is the
    * CLEAN run's closed form — supervised crash-recovery must be
    * observationally identical to never having crashed.
    */
  private def runSupervisor(s: SparkSession, dir: String): DataFrame = {
    val work = graft.Work.dir(s"supervisor_q")
    IncrSync.deletePath(s, work)
    val keep = OplogFilters.chain(gids, white, black)
    val eff = Oplog.fromEvents(s, dir)
      .filter(keep && col("op").isin("i", "u", "d"))
    feedify(eff).coalesce(1).write.parquet(s"$work/feed")

    val target = new FaultOnceTarget(
      graft.streaming.ParquetTarget(s"$work/target", nBuckets = 16))
    val report = graft.streaming.Supervisor.supervise(
      () => IncrSync.startOplogTo(s,
        graft.streaming.ParquetDirSource(s"$work/feed", IncrSync.oplogSchema),
        target, s"$work/ckpt", gids = gids, white = white, black = black),
      maxRestarts = 3, backoffUnitMs = 10L, healthyAfterMs = 3600000L)
    require(!report.gaveUp, s"supervisor gave up: ${report.lastError}")

    val state = IncrSync.readOrEmpty(s, s"$work/target/state")
      .select(lit("state").as("section"), col("ns").as("a"), col("doc_key").as("b"),
        col("last_event_id").as("x"), lit(0L).as("y"), col("last_value").as("v"))
    val ck = s.read.parquet(s"$work/target/_ckpt")
      .select(lit("ckpt").as("section"), col("batch_id").cast("string").as("a"),
        lit("").as("b"), col("lsn_min").as("x"), col("lsn_max").as("y"),
        col("n_logs").cast("double").as("v"))
    val sup = s.range(1).select(lit("sup").as("section"),
      lit(report.restarts.toString).as("a"),
      lit(report.gaveUp.toString).as("b"), lit(0L).as("x"), lit(0L).as("y"),
      lit(0.0).as("v"))
    state.unionByName(ck).unionByName(sup)
  }

  /** Crash/resume e2e with post-restart data (the reference's checkpoint
    * reconciliation contract, `collector/ckpt/ckpt_manager.go:25-140`,
    * `checkpoint.go:81-147`): run the REAL `IncrSync.startOplog` over a
    * first feed file to termination, then — with the query stopped — land
    * MORE source files and restart with the SAME checkpointLocation.
    *
    * The restarted query must resume from the committed offset: batch 1
    * processes ONLY the new file. The oracle pins that down exactly —
    * per-batch `_ckpt` rows carry (batch_id, lsn_min, lsn_max, n_logs) in
    * closed form for each phase, so a resume that re-reads phase-1 data
    * (n_logs too high), or skips it wholesale (state missing phase-1-only
    * keys), or restarts batch numbering (duplicate batch_id 0) all
    * hash-diverge. Final state must equal the one-shot fold over BOTH
    * phases (the phases are time-split, so the idempotent merge converges
    * to the global last-effective-write).
    */
  private def runResume(s: SparkSession, dir: String): DataFrame = {
    val work = graft.Work.dir(s"resume_restart_q")
    IncrSync.deletePath(s, work)
    val keep = OplogFilters.chain(gids, white, black)
    val eff = Oplog.fromEvents(s, dir)
      .filter(keep && col("op").isin("i", "u", "d"))
      .localCheckpoint()
    val bounds = eff.agg(min(col("ts_packed")), max(col("ts_packed"))).head()
    // exact integer midpoint (doubles round above 2^53 — same arithmetic
    // as the oracle's `tmin + (tmax - tmin) // 2`)
    val t1 = bounds.getLong(0) + (bounds.getLong(1) - bounds.getLong(0)) / 2

    val feedDir = s"$work/feed"
    // phase 1: one file → one AvailableNow batch (batch_id 0)
    feedify(eff.filter(col("ts_packed") <= t1)).coalesce(1).write.parquet(feedDir)
    val q1 = IncrSync.startOplog(s, feedDir, s"$work/target", s"$work/ckpt",
      gids = gids, white = white, black = black, txnTtlMs = 0, nBuckets = 16)
    q1.awaitTermination()

    // the query is STOPPED; more data lands (a new file — the file source's
    // resumable unit), then the same checkpointLocation restarts the query
    feedify(eff.filter(col("ts_packed") > t1)).coalesce(1)
      .write.mode("append").parquet(feedDir)
    val q2 = IncrSync.startOplog(s, feedDir, s"$work/target", s"$work/ckpt",
      gids = gids, white = white, black = black, txnTtlMs = 0, nBuckets = 16)
    q2.awaitTermination()

    val state = IncrSync.readOrEmpty(s, s"$work/target/state")
      .select(lit("state").as("section"), col("ns").as("a"), col("doc_key").as("b"),
        col("last_event_id").as("x"), lit(0L).as("y"), col("last_value").as("v"))
    val ck = s.read.parquet(s"$work/target/_ckpt")
      .select(lit("ckpt").as("section"), col("batch_id").cast("string").as("a"),
        lit("").as("b"), col("lsn_min").as("x"), col("lsn_max").as("y"),
        col("n_logs").cast("double").as("v"))
    state.unionByName(ck)
  }

  /** S1 LIVE tailing end-to-end over the DSv2 ts-offset cursor source
    * ([[graft.streaming.OplogTailSource]] ↔ the reference's tailable
    * oplog cursor, `collector/reader/oplog_reader.go:100-241`): phase A
    * is in the cursor buffer before the query starts, phase B arrives
    * WHILE the query runs (tailing — mid-run appends become the next
    * micro-batch off the same cursor), the query then stops and a new
    * incarnation resumes from the checkpointed ts offset (`{ts: {$gt:
    * ckpt}}`, the cursor contract — not the file-source contract the
    * other restart harnesses exercise) before draining phase C.
    *
    * Proof sections (closed-form in the oracle):
    *  - `state`: the last-effective-write fold over all three phases —
    *    tailed and resumed delivery is complete and idempotent.
    *  - `ckpt`: ONE aggregate row (delivered-row total + global lsn
    *    bounds). Per-batch rows are timing-dependent under a live
    *    ProcessingTime trigger (an append can straddle a trigger edge);
    *    the totals are not — `_ckpt/batch=<id>` dirs are overwritten on
    *    replay, so the sum is replay-safe.
    *  - `cursor`: the ack purge held — after the drain the buffer
    *    retains at most the final (not-yet-acked) batch, never history
    *    (the reference worker's purge-on-ack, O(unacked) memory).
    */
  private def runTailLive(s: SparkSession, dir: String): DataFrame = {
    import graft.streaming.{OplogTail, OplogTailSource}
    val work = graft.Work.dir(s"tail_live_q")
    IncrSync.deletePath(s, work)
    val keep = OplogFilters.chain(gids, white, black)
    val eff = Oplog.fromEvents(s, dir)
      .filter(keep && col("op").isin("i", "u", "d"))
      .localCheckpoint()
    val bounds = eff.agg(min(col("ts_packed")), max(col("ts_packed"))).head()
    val (tmin, tmax) = (bounds.getLong(0), bounds.getLong(1))
    val t1 = tmin + (tmax - tmin) / 3
    val t2 = tmin + 2 * ((tmax - tmin) / 3)

    // Harness-side cursor staging: the collect IS the fake — the buffer
    // stands in for the mongod cursor, which a real deployment reads
    // over the wire (one cursor per shard), never through the driver.
    val all = toEntries(eff)
    val (ea, rest) = all.partition(_.ts <= t1)
    val (eb, ec) = rest.partition(_.ts <= t2)

    val bufName = "cdc_tail_live_q"
    OplogTail.drop(bufName)
    val buf = OplogTail.buffer(bufName)

    val ckptPath = new org.apache.hadoop.fs.Path(s"$work/target/_ckpt")
    val ckptFs = ckptPath.getFileSystem(s.sessionState.newHadoopConf())
    def ckptTotal(): Long =
      try {
        if (!ckptFs.exists(ckptPath)) 0L
        else s.read.parquet(s"$work/target/_ckpt")
          .agg(coalesce(sum(col("n_logs")), lit(0L))).head().getLong(0)
      } catch { case _: Throwable => 0L }
    def awaitTotal(n: Long): Unit = {
      val deadline = System.currentTimeMillis() + 120000L
      while (ckptTotal() < n) {
        if (System.currentTimeMillis() >= deadline)
          throw new IllegalStateException(
            s"tail stalled: ${ckptTotal()} of $n rows delivered within 120s")
        Thread.sleep(100)
      }
    }

    buf.append(ea)
    val q1 = IncrSync.startOplogFrom(s, OplogTailSource(bufName),
      s"$work/target", s"$work/ckpt", gids = gids, white = white, black = black,
      nBuckets = 16, trigger = Trigger.ProcessingTime("100 milliseconds"))
    try {
      awaitTotal(ea.size.toLong)
      buf.append(eb) // LIVE: the running query tails these off the cursor
      awaitTotal((ea.size + eb.size).toLong)
    } finally q1.stop()

    buf.append(ec) // lands while no query runs; the resume must pick it up
    val q2 = IncrSync.startOplogFrom(s, OplogTailSource(bufName),
      s"$work/target", s"$work/ckpt", gids = gids, white = white, black = black,
      nBuckets = 16, trigger = Trigger.ProcessingTime("100 milliseconds"))
    try awaitTotal(all.size.toLong) finally q2.stop()
    val bounded = buf.size <= ec.size
    OplogTail.drop(bufName)

    val state = IncrSync.readOrEmpty(s, s"$work/target/state")
      .select(lit("state").as("section"), col("ns").as("a"), col("doc_key").as("b"),
        col("last_event_id").as("x"), lit(0L).as("y"), col("last_value").as("v"))
    val ck = s.read.parquet(s"$work/target/_ckpt")
      .agg(min(col("lsn_min")).as("x"), max(col("lsn_max")).as("y"),
        sum(col("n_logs")).cast("double").as("v"))
      .select(lit("ckpt").as("section"), lit("total").as("a"), lit("").as("b"),
        col("x"), col("y"), col("v"))
    val cursor = s.range(1).select(lit("cursor").as("section"), lit("bounded").as("a"),
      lit(if (bounded) "true" else "false").as("b"), lit(0L).as("x"), lit(0L).as("y"),
      lit(0.0).as("v"))
    state.unionByName(ck).unionByName(cursor)
  }

  /** Canonical oplog rows collected into tail-cursor entries (the staging
    * step of every live-tail harness — stands in for the wire cursor).
    */
  private def toEntries(df: DataFrame): Seq[graft.streaming.OplogTail.Entry] =
    df.select(col("event_id"), col("ts_packed"), col("op"), col("ns"),
      col("doc_key"), col("value"), col("props"), col("g"), col("from_migrate"))
      .collect().toSeq.map(r => graft.streaming.OplogTail.Entry(
        r.getLong(0), r.getLong(1),
        r.getString(2), r.getString(3), r.getString(4), r.getDouble(5),
        Option(r.getString(6)).getOrElse("{}"), Option(r.getString(7)).getOrElse(""),
        r.getBoolean(8)))

  /** S2's ACTUAL resume contract end-to-end
    * ([[graft.streaming.EventTailSource]] ↔
    * `collector/reader/event_reader.go:109-185`,
    * `common/change_stream.go:28-161`): the offset checkpointed between
    * the two runs is the OPAQUE resume token of the last delivered
    * change-stream event (`StartAfter(token)`), not a timestamp — the
    * tokens are md5 hex, deliberately uncorrelated with arrival order,
    * so any implementation that compared or sorted them would misplan
    * the resume (EventTailSpec pins that sharper still with
    * reverse-ordered tokens). `startAtOperationTime` seeds only the
    * cold start, exactly the int64 branch of `NewChangeStreamConn`.
    *
    * Run 1 drains phase A and checkpoints its last token; phase B lands
    * while no query runs; run 2 resumes AFTER the token and the full S2
    * pipeline (8-way dispatch → oplog feed → filter chain → idempotent
    * apply) processes only B. Proof sections: `state` = the global
    * fold (resume lost nothing, re-served nothing), per-batch `ckpt`
    * rows = each phase's exact delivered volume (a token re-serve
    * doubles batch 1, a skip starves it), `cursor` = the ack purge held
    * through token commits.
    */
  private def runTokenResume(s: SparkSession, dir: String): DataFrame = {
    import graft.streaming.{EventTail, EventTailSource, IncrSync, FrameSource}
    val work = graft.Work.dir(s"token_resume_q")
    IncrSync.deletePath(s, work)
    val nsCol = concat(col("db"), lit("."), col("coll"))
    val cev = graft.model.ChangeEvent.fromEvents(s, dir)
      .filter(col("operation_type").isin("insert", "replace", "update", "delete"))
      .localCheckpoint()
    val passing = cev.filter(nsCol.rlike(white.head) && !nsCol.rlike(black.head))
    val bounds = passing.agg(min(col("ts_packed")), max(col("ts_packed"))).head()
    val t1 = bounds.getLong(0) + (bounds.getLong(1) - bounds.getLong(0)) / 2

    // the wire cursor: arrival order = (ts, event_id); tokens opaque hex
    val evs = cev.orderBy(col("ts_packed"), col("event_id"))
      .select(md5(concat(lit("tok:"), col("event_id").cast("string"))).as("token"),
        col("event_id"), col("ts_us"), col("ts_packed"), col("operation_type"),
        col("db"), col("coll"), col("to_db"), col("to_coll"),
        col("full_document"), col("document_key"), col("updated_fields"),
        col("removed_fields"))
      .collect().toSeq.map(r => EventTail.Event(r.getString(0), r.getLong(1),
        r.getLong(2), r.getLong(3), r.getString(4), r.getString(5),
        r.getString(6), r.getString(7), r.getString(8), r.getString(9),
        r.getString(10), r.getString(11), r.getSeq[String](12)))
    val (ea, eb) = evs.partition(_.tsPacked <= t1)

    val bufName = "cdc_token_resume_q"
    EventTail.drop(bufName)
    val buf = EventTail.buffer(bufName)
    // the S2 connector pipeline over the token cursor: dispatch → feed.
    // (The cursor serves each micro-batch as ONE partition — one change
    // stream, one wire cursor; a reader→workers repartition before the
    // dispatch was A/B-measured at this batch size and the shuffle cost
    // more than the parallelism bought, so the spread happens at the
    // apply's own exchange instead.)
    val source = FrameSource(() =>
      graft.streaming.MongoChangeSource.toOplogFeed(
        graft.transform.EventNormalizer.normalize(
          EventTailSource(bufName).load(s))))

    buf.append(ea)
    val q1 = IncrSync.startOplogFrom(s, source, s"$work/target", s"$work/ckpt",
      gids = gids, white = white, black = black, nBuckets = 16)
    q1.awaitTermination()
    buf.append(eb) // lands while no query runs; StartAfter(token) resumes
    val q2 = IncrSync.startOplogFrom(s, source, s"$work/target", s"$work/ckpt",
      gids = gids, white = white, black = black, nBuckets = 16)
    q2.awaitTermination()
    val bounded = buf.size <= eb.size
    EventTail.drop(bufName)

    val state = IncrSync.readOrEmpty(s, s"$work/target/state")
      .select(lit("state").as("section"), col("ns").as("a"), col("doc_key").as("b"),
        col("last_event_id").as("x"), lit(0L).as("y"), col("last_value").as("v"))
    val ck = s.read.parquet(s"$work/target/_ckpt")
      .select(lit("ckpt").as("section"), col("batch_id").cast("string").as("a"),
        lit("").as("b"), col("lsn_min").as("x"), col("lsn_max").as("y"),
        col("n_logs").cast("double").as("v"))
    val cursor = s.range(1).select(lit("cursor").as("section"), lit("bounded").as("a"),
      lit(if (bounded) "true" else "false").as("b"), lit(0L).as("x"), lit(0L).as("y"),
      lit(0.0).as("v"))
    state.unionByName(ck).unionByName(cursor)
  }

  /** Source-side admission control, oracle-gated: the tail cursor's
    * `maxRowsPerTrigger` (the reader `fetch_batch_size` analogue, via
    * the DSv2 `ReadLimit` contract) slices an AvailableNow drain of the
    * whole corpus into exactly 16 row-budgeted micro-batches. Because
    * the cursor serves in ts order, every batch boundary is closed-form:
    * batch b holds rows ranked (b·lim, (b+1)·lim] by ts — so the oracle
    * pins each batch's row count AND lsn bounds exactly. An admission
    * regression in either direction (limit ignored → one giant batch;
    * off-by-one cuts → shifted lsn ranges) hash-diverges.
    */
  private def runTailAdmission(s: SparkSession, dir: String): DataFrame = {
    import graft.streaming.{OplogTail, OplogTailSource}
    val work = graft.Work.dir(s"tail_admission_q")
    IncrSync.deletePath(s, work)
    val keep = OplogFilters.chain(gids, white, black)
    val eff = Oplog.fromEvents(s, dir)
      .filter(keep && col("op").isin("i", "u", "d"))
      .localCheckpoint()
    val n = eff.count()
    val lim = ((n + 15) / 16).toInt // 16 batches at any scale factor

    val bufName = "cdc_tail_admission_q"
    OplogTail.drop(bufName)
    OplogTail.buffer(bufName).append(toEntries(eff))
    val acct = s"$work/acct"
    val q = OplogTailSource(bufName, maxRowsPerTrigger = lim).load(s)
      .writeStream
      .option("checkpointLocation", s"$work/ckpt")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        import s.implicits._
        val r = batch.agg(count(lit(1)).as("n"),
          min(col("ts_packed")).as("lsn_min"),
          max(col("ts_packed")).as("lsn_max")).head()
        if (r.getLong(0) > 0L)
          Seq((batchId, r.getLong(0), r.getLong(1), r.getLong(2)))
            .toDF("batch_id", "n", "lsn_min", "lsn_max")
            .coalesce(1).write.mode("overwrite").parquet(s"$acct/batch=$batchId")
      }
      .start()
    q.awaitTermination()
    OplogTail.drop(bufName)

    s.read.parquet(acct)
      .select(col("batch_id").cast("long").as("batch_id"), col("n"),
        col("lsn_min"), col("lsn_max"))
  }

  /** The sharded-source fan-out dataflow END-TO-END
    * ([[graft.streaming.IncrSync.startSharded]] ↔
    * `collector/coordinator/incr.go:20-57`): the corpus splits 3 ways by
    * the F8 chunk map (uniform chunks of 8 keys, ownership round-robin —
    * each shard's cursor serves only the chunks it owns), three live
    * tail-source queries run CONCURRENTLY into ONE bucketed target, and
    * mid-run one shard crashes: after every shard drains phase A, shard
    * rs1 stops, phase B lands on all three cursors, rs0/rs2 drain it
    * live while rs1 is down, and rs1 then restarts from ITS OWN
    * checkpoint and catches up.
    *
    * Proof sections (all closed-form in the oracle):
    *  - `state`: the global last-effective-write fold — three concurrent
    *    writers into one state table lost nothing, duplicated nothing,
    *    and never clobbered each other's bucket-directory writes (the
    *    apply-lock + disjoint-key-space composition argument, observed).
    *  - `shard`: per-shard (ack, first lsn, delivered total) — the crash
    *    and resume delivered each shard's rows exactly once into `_ckpt`
    *    (overwrite-by-batch absorbs the at-least-once replay).
    *  - `ckpt`/`global_mid`: the group position WHILE rs1 was down =
    *    rs1's phase-A ack — the min-ack rule
    *    (`checkpoint.go:149-199`) visibly held back by the lagging
    *    shard, never advanced past an unacked tail.
    *  - `ckpt`/`global_final`: after catch-up, the min over the
    *    per-shard acks (each shard's own newest ts).
    */
  private def runShardedFanout(s: SparkSession, dir: String): DataFrame = {
    import graft.streaming.{OplogTail, OplogTailSource, ShardedSync}
    import graft.filters.OrphanFilter
    val work = graft.Work.dir(s"sharded_fanout_q")
    IncrSync.deletePath(s, work)
    val keep = OplogFilters.chain(gids, white, black)
    val eff = Oplog.fromEvents(s, dir)
      .filter(keep && col("op").isin("i", "u", "d"))
      .localCheckpoint()
    val bounds = eff.agg(min(col("ts_packed")), max(col("ts_packed"))).head()
    val t1 = bounds.getLong(0) + (bounds.getLong(1) - bounds.getLong(0)) / 2

    val nShards = 3
    val step = 8L
    val keyed = eff.withColumn("k", col("doc_key").cast("long"))
    // F8 machinery carves each shard's owned slice — the same chunk-map
    // join a sharded full sync uses to drop orphans
    val shardEntries: IndexedSeq[Seq[OplogTail.Entry]] =
      (0 until nShards).map { sh =>
        toEntries(OrphanFilter.keepOwned(keyed, "k",
          OrphanFilter.uniformChunks(keyed, "k", step, nShards, sh), step))
      }
    val names = (0 until nShards).map(sh => s"rs$sh")
    val bufs = names.map { n =>
      OplogTail.drop(s"cdc_sharded_$n")
      OplogTail.buffer(s"cdc_sharded_$n")
    }

    val ckptFs = new org.apache.hadoop.fs.Path(s"$work/target")
      .getFileSystem(s.sessionState.newHadoopConf())
    def shardTotal(sh: Int): Long =
      try {
        val p = s"$work/target/_ckpt/shard=${names(sh)}"
        if (!ckptFs.exists(new org.apache.hadoop.fs.Path(p))) 0L
        else s.read.parquet(p)
          .agg(coalesce(sum(col("n_logs")), lit(0L))).head().getLong(0)
      } catch { case _: Throwable => 0L }
    def awaitShard(sh: Int, n: Long): Unit = {
      val deadline = System.currentTimeMillis() + 120000L
      while (shardTotal(sh) < n) {
        if (System.currentTimeMillis() >= deadline)
          throw new IllegalStateException(
            s"shard ${names(sh)} stalled: ${shardTotal(sh)} of $n rows " +
              "delivered within 120s")
        Thread.sleep(100)
      }
    }

    def startShards(which: Seq[Int]) = IncrSync.startSharded(s,
      which.map(sh => (names(sh), OplogTailSource(s"cdc_sharded_${names(sh)}"))),
      s"$work/target", s"$work/ckpt", gids = gids, white = white, black = black,
      nBuckets = 16, trigger = Trigger.ProcessingTime("100 milliseconds"))

    val aCounts = shardEntries.map(_.count(_.ts <= t1).toLong)
    val totals = shardEntries.map(_.size.toLong)

    // phase A on every cursor; all three shards drain it concurrently
    bufs.zipWithIndex.foreach { case (b, sh) =>
      b.append(shardEntries(sh).filter(_.ts <= t1))
    }
    val qs = startShards(0 until nShards)
    val globalMid =
      try {
        (0 until nShards).foreach(sh => awaitShard(sh, aCounts(sh)))
        // CRASH shard rs1 (stop is the sandbox's kill); the others keep on
        qs(1).stop()
        bufs.zipWithIndex.foreach { case (b, sh) =>
          b.append(shardEntries(sh).filter(_.ts > t1))
        }
        awaitShard(0, totals(0)); awaitShard(2, totals(2))
        // the group position while rs1 lags: min ack = rs1's phase-A ack
        ShardedSync.globalCheckpoint(s, s"$work/target")
      } finally { qs.foreach(q => if (q.isActive) q.stop()) }

    // rs1 resumes ALONE from its own checkpoint and catches up
    val q1b = startShards(Seq(1)).head
    try awaitShard(1, totals(1)) finally q1b.stop()
    names.foreach(n => OplogTail.drop(s"cdc_sharded_$n"))

    val state = IncrSync.readOrEmpty(s, s"$work/target/state")
      .select(lit("state").as("section"), col("ns").as("a"), col("doc_key").as("b"),
        col("last_event_id").as("x"), lit(0L).as("y"), col("last_value").as("v"))
    val acks = ShardedSync.shardAcks(s, s"$work/target")
      .select(lit("shard").as("section"), col("shard").as("a"), lit("").as("b"),
        col("lsn_ack").as("x"), col("lsn_first").as("y"),
        col("n_logs").cast("double").as("v"))
    val globalFinal = ShardedSync.globalCheckpoint(s, s"$work/target")
    val globals = s.range(1).select(lit("ckpt").as("section"),
        lit("global_mid").as("a"), lit("").as("b"), lit(globalMid).as("x"),
        lit(0L).as("y"), lit(0.0).as("v"))
      .unionByName(s.range(1).select(lit("ckpt").as("section"),
        lit("global_final").as("a"), lit("").as("b"), lit(globalFinal).as("x"),
        lit(0L).as("y"), lit(0.0).as("v")))
    state.unionByName(acks).unionByName(globals)
  }

  /** State re-bucketing migration, oracle-gated end-to-end
    * ([[graft.streaming.Rebucket]]): phase 1 runs the REAL
    * `IncrSync.startOplog` at 16 buckets over the lower time-half, the
    * stopped-stream migration rewrites `state/` to 64 buckets, and the
    * SAME checkpointLocation restarts at 64 buckets over the upper half.
    *
    * Proof sections (all closed-form in the oracle):
    *  - `mig`/`diff`: row-level symmetric difference between the
    *    pre-migration and post-migration state content — 0 (the migration
    *    is a semantic no-op), alongside the count of post-migration rows
    *    whose bucket ≠ hash mod 64 — 0 (the layout really moved).
    *  - `mig`/`rows`: post-migration row count = the phase-1 fold's live
    *    key count (nothing dropped, nothing duplicated by the rewrite).
    *  - `ckpt`: per-batch rows exactly as `cdc_resume_restart` — the
    *    resumed query consumed ONLY the phase-2 file, proving the
    *    migration left the streaming checkpoint and `_ckpt` untouched.
    *  - `state`: final state = the one-shot fold over BOTH phases — the
    *    64-bucket merge after migration routes/prunes correctly.
    */
  /** Checkpoint-storage backends, oracle-gated end-to-end
    * ([[graft.streaming.CkptStore]] ↔ `ckpt_operation.go:20-190`,
    * manager `ckpt_manager.go:25-140`): phase 1 runs the REAL
    * `IncrSync.startOplog` over the lower time-half with BOTH storage
    * backends attached to the production checkpoint commit — the
    * "database" table store and the "api" JSON-body store, selected
    * through the sanitized config vocabulary exactly as the reference's
    * manager switch. The api manager's loaded position then drives ONE
    * fresh resume over the full feed via the S1 `startingTs` predicate
    * (the reference's `{ts: {$gt: ckpt}}` cursor).
    *
    * Proof sections (all closed-form in the oracle):
    *  - `ctx`: both managers load the SAME stored context — position =
    *    the phase-1 batch's lsn_max, version = the current FCV stamp,
    *    exist = true. A store that dropped/garbled the upsert diverges.
    *  - `default`: a manager over an absent store regenerates (ts floored
    *    to InitCheckpoint, not persisted) with exist = false.
    *  - `fcv`: a stored context from a pre-FCV version is REJECTED with
    *    the reference-shaped reason (`ckpt_manager.go:68-72`).
    *  - `eq`: the two stores' loaded contexts agree FIELD-FOR-FIELD
    *    (diff = 0 over every CkptContext field), count pinned
    *    closed-form. The resume pipeline is a deterministic function of
    *    the starting context, so one resume stands for both backends —
    *    a second, identically-seeded query would re-prove what equal
    *    contexts already establish (and used to cost a third full
    *    streaming run per capture).
    *  - `state`: the api-driven resume equals the fold of exactly the
    *    rows above the stored position — the resume skipped nothing and
    *    re-read nothing.
    */
  private def runCkptStores(s: SparkSession, dir: String): DataFrame = {
    import graft.streaming.{CkptContext, CkptManager, CkptStore, Fcv,
      FileApiCkptStore, GraftConfig}
    val work = graft.Work.dir(s"ckpt_store_q")
    IncrSync.deletePath(s, work)
    val keep = OplogFilters.chain(gids, white, black)
    val eff = Oplog.fromEvents(s, dir)
      .filter(keep && col("op").isin("i", "u", "d"))
      .localCheckpoint()
    val bounds = eff.agg(min(col("ts_packed")), max(col("ts_packed"))).head()
    val t1 = bounds.getLong(0) + (bounds.getLong(1) - bounds.getLong(0)) / 2

    val feedDir = s"$work/feed"
    feedify(eff.filter(col("ts_packed") <= t1)).coalesce(1).write.parquet(feedDir)

    // Both backends through the config-driven factory — the reference's
    // NewCheckpointManager storage switch, vocabulary-validated.
    val cfg = GraftConfig(sourceUrls = Seq("mongodb://src"),
      tunnelAddress = Seq("target"), checkpointStorage = "database",
      checkpointStorageUrl = s"$work/ckpt_db").sanitize
      .fold(r => sys.error(r), identity)
    val stTable = CkptStore.forConfig(s, cfg, "graft")
    val stApi = CkptStore.forConfig(s,
      cfg.copy(checkpointStorage = "api",
        checkpointStorageUrl = s"$work/ckpt_api.json"), "graft")

    val q1 = IncrSync.startOplog(s, feedDir, s"$work/t1", s"$work/ck1",
      gids = gids, white = white, black = black, txnTtlMs = 0, nBuckets = 16,
      ckptStores = Seq(stTable, stApi))
    q1.awaitTermination()

    val (ctxT, existT) = CkptManager(stTable, "graft", 1L).get()
      .fold(r => sys.error(r), identity)
    val (ctxA, existA) = CkptManager(stApi, "graft", 1L).get()
      .fold(r => sys.error(r), identity)
    val (ctxD, existD) = CkptManager(FileApiCkptStore(s"$work/absent.json"),
      "graft", 1L).get().fold(r => sys.error(r), identity)

    // FCV gate: a version-0 (pre-2.4) stored document must be rejected
    // with the reference-shaped reason.
    val badStore = FileApiCkptStore(s"$work/bad.json")
    badStore.save(CkptContext("graft", 42L, version = 0))
    val fcvReason = CkptManager(badStore, "graft", 1L).get()
      .left.getOrElse(sys.error("version-0 checkpoint must be rejected"))

    // Full feed lands; the api store's position drives ONE fresh resume.
    feedify(eff.filter(col("ts_packed") > t1)).coalesce(1)
      .write.mode("append").parquet(feedDir)
    // eq: the contexts loaded from the two backends, field-for-field.
    // With nCtxDiff = 0 the resume below is the same query either store
    // would seed — running it twice proved nothing extra and cost a
    // third full streaming run.
    val nCtxDiff = ctxT.productIterator.zip(ctxA.productIterator)
      .count { case (a, b) => a != b }.toLong
    val q2 = IncrSync.startOplog(s, feedDir, s"$work/tA", s"$work/ckA",
      gids = gids, white = white, black = black, txnTtlMs = 0, nBuckets = 16,
      startingTs = ctxA.ckpt)
    q2.awaitTermination()

    val stateA = IncrSync.readOrEmpty(s, s"$work/tA/state")
    val nDiff = nCtxDiff
    val nRows = stateA.count()

    import s.implicits._
    val meta = Seq(
      ("ctx", "database", "graft", ctxT.ckpt, ctxT.version.toLong,
        if (existT) 1.0 else 0.0),
      ("ctx", "api", "graft", ctxA.ckpt, ctxA.version.toLong,
        if (existA) 1.0 else 0.0),
      ("default", "api_absent", "graft", ctxD.ckpt, ctxD.version.toLong,
        if (existD) 1.0 else 0.0),
      ("fcv", fcvReason, "", 0L, 0L, 0.0),
      ("eq", "", "", nDiff, nRows, 0.0)
    ).toDF("section", "a", "b", "x", "y", "v")
    val state = stateA.select(lit("state").as("section"), col("ns").as("a"),
      col("doc_key").as("b"), col("last_event_id").as("x"), lit(0L).as("y"),
      col("last_value").as("v"))
    meta.unionByName(state)
  }

  /** Diagnostic-journal side output, oracle-gated (`common/journal.go:
    * 17-67`; writer call sites `collector/syncer.go:637`,
    * `executor/executor.go:228`): the REAL stream runs with
    * `journal = sampling` (frequency 16 at corpus scale — a harness
    * density choice like nBuckets, not a semantic), and the `_journal`
    * side table must contain EXACTLY the ops whose portable key hash
    * lands on 0 mod 16 — the reference's `DistributeOplogByMod == 0`
    * primary-key sample — while the final state proves the journal left
    * the apply path untouched.
    */
  private def runJournal(s: SparkSession, dir: String): DataFrame = {
    import graft.streaming.JournalConf
    val work = graft.Work.dir(s"journal_q")
    IncrSync.deletePath(s, work)
    val keep = OplogFilters.chain(gids, white, black)
    val eff = Oplog.fromEvents(s, dir)
      .filter(keep && col("op").isin("i", "u", "d"))
      .localCheckpoint()
    val feedDir = s"$work/feed"
    feedify(eff).coalesce(1).write.parquet(feedDir)
    val q = IncrSync.startOplog(s, feedDir, s"$work/target", s"$work/ckpt",
      gids = gids, white = white, black = black, txnTtlMs = 0, nBuckets = 16,
      journal = JournalConf("sampling", 16))
    q.awaitTermination()

    val journal = s.read.parquet(s"$work/target/_journal")
      .select(lit("journal").as("section"), col("ns").as("a"),
        col("doc_key").as("b"), col("event_id").as("x"),
        col("ts_packed").as("y"), col("value").as("v"))
    val state = IncrSync.readOrEmpty(s, s"$work/target/state")
      .select(lit("state").as("section"), col("ns").as("a"),
        col("doc_key").as("b"), col("last_event_id").as("x"), lit(0L).as("y"),
        col("last_value").as("v"))
    journal.unionByName(state)
  }

  private def runRebucket(s: SparkSession, dir: String): DataFrame = {
    import graft.streaming.Rebucket
    val work = graft.Work.dir(s"rebucket_q")
    IncrSync.deletePath(s, work)
    val keep = OplogFilters.chain(gids, white, black)
    val eff = Oplog.fromEvents(s, dir)
      .filter(keep && col("op").isin("i", "u", "d"))
      .localCheckpoint()
    val bounds = eff.agg(min(col("ts_packed")), max(col("ts_packed"))).head()
    val t1 = bounds.getLong(0) + (bounds.getLong(1) - bounds.getLong(0)) / 2

    val feedDir = s"$work/feed"
    feedify(eff.filter(col("ts_packed") <= t1)).coalesce(1).write.parquet(feedDir)
    val q1 = IncrSync.startOplog(s, feedDir, s"$work/target", s"$work/ckpt",
      gids = gids, white = white, black = black, txnTtlMs = 0, nBuckets = 16)
    q1.awaitTermination()

    val semCols = Seq("ns", "doc_key", "last_value", "last_event_id", "batch_ops")
    val pre = IncrSync.readOrEmpty(s, s"$work/target/state")
      .select(semCols.map(col): _*).localCheckpoint()

    Rebucket.migrate(s, s"$work/target", from = 16, to = 64)

    val post = IncrSync.readOrEmpty(s, s"$work/target/state").localCheckpoint()
    val postSem = post.select(semCols.map(col): _*)
    val diffCnt = pre.exceptAll(postSem).count() + postSem.exceptAll(pre).count()
    val offLayout = post.filter(col("bucket") =!= IncrSync.bucketOf(64)).count()
    val postRows = post.count()

    // stream resumes from the SAME checkpoint, against the 64-bucket layout
    feedify(eff.filter(col("ts_packed") > t1)).coalesce(1)
      .write.mode("append").parquet(feedDir)
    val q2 = IncrSync.startOplog(s, feedDir, s"$work/target", s"$work/ckpt",
      gids = gids, white = white, black = black, txnTtlMs = 0, nBuckets = 64)
    q2.awaitTermination()

    import s.implicits._
    val mig = Seq(
      ("mig", "diff", "", diffCnt, offLayout, 0.0),
      ("mig", "rows", "", postRows, 0L, 0.0))
      .toDF("section", "a", "b", "x", "y", "v")
    val state = IncrSync.readOrEmpty(s, s"$work/target/state")
      .select(lit("state").as("section"), col("ns").as("a"), col("doc_key").as("b"),
        col("last_event_id").as("x"), lit(0L).as("y"), col("last_value").as("v"))
    val ck = s.read.parquet(s"$work/target/_ckpt")
      .select(lit("ckpt").as("section"), col("batch_id").cast("string").as("a"),
        lit("").as("b"), col("lsn_min").as("x"), col("lsn_max").as("y"),
        col("n_logs").cast("double").as("v"))
    state.unionByName(ck).unionByName(mig)
  }

  /** The full→incr handoff (§3.2 → §3.1; the reference's parallel
    * full+incr contract, `collector/coordinator/replication.go:238-266`,
    * SURVEY T5 mapping: "snapshot at T0, then replay changes from T0"):
    * the snapshot fold of everything at-or-below T0 lands in the bucketed
    * state as the full-sync batch (batch -1, the snapshot's own
    * checkpoint namespace), then the REAL `IncrSync.startOplog` runs over
    * the WHOLE feed with `startingTs = T0` — the S1 resume predicate must
    * exclude every snapshotted record at the source, so the incr batch's
    * `_ckpt` row carries exactly the post-T0 count (re-reading the
    * snapshot rows, or skipping post-T0 ones, hash-diverges), and the
    * final state equals the one-shot fold.
    */
  private def runHandoff(s: SparkSession, dir: String): DataFrame = {
    val work = graft.Work.dir(s"handoff_q")
    IncrSync.deletePath(s, work)
    val keep = OplogFilters.chain(gids, white, black)
    val eff = Oplog.fromEvents(s, dir)
      .filter(keep && col("op").isin("i", "u", "d"))
      .localCheckpoint()
    val bounds = eff.agg(min(col("ts_packed")), max(col("ts_packed"))).head()
    val t0 = bounds.getLong(0) + (bounds.getLong(1) - bounds.getLong(0)) / 2

    // "full sync": the snapshot fold at T0, applied as the full-sync batch
    IncrSync.applyBatch(feedify(eff.filter(col("ts_packed") <= t0)),
      s"$work/target", batchId = -1L, nBuckets = 16)

    // incr over the WHOLE feed, resuming at the handoff position
    feedify(eff).coalesce(1).write.parquet(s"$work/feed")
    val q = IncrSync.startOplog(s, s"$work/feed", s"$work/target", s"$work/ckpt",
      gids = gids, white = white, black = black, txnTtlMs = 0, nBuckets = 16,
      startingTs = t0)
    q.awaitTermination()

    val state = IncrSync.readOrEmpty(s, s"$work/target/state")
      .select(lit("state").as("section"), col("ns").as("a"), col("doc_key").as("b"),
        col("last_event_id").as("x"), lit(0L).as("y"), col("last_value").as("v"))
    val ck = s.read.parquet(s"$work/target/_ckpt")
      .select(lit("ckpt").as("section"), col("batch_id").cast("string").as("a"),
        lit("").as("b"), col("lsn_min").as("x"), col("lsn_max").as("y"),
        col("n_logs").cast("double").as("v"))
    state.unionByName(ck)
  }

  /** Continuous-tail soak of the REAL `IncrSync.startOplog` under a
    * ProcessingTime trigger with a LIVE transaction TTL — the reference's
    * production shape (the tailer never drains: `collector/syncer.go`'s
    * fetch loop keeps polling and the barrier flush expires orphaned
    * chains, `oplog/txn_buffer.go:63-301`): source files land WHILE the
    * query runs, and the oracle pins the four-phase delivery in closed
    * form.
    *
    * Feed roles (mirrored 1:1 in the SQL): eligible rows with
    * `event_id % 10 == 0` become transaction-chain members keyed by
    * doc_key (one entry per op; the last entry is the commit, earlier
    * entries partialTxn); chains with `doc_key % 3 == 0` are ORPHANS
    * (commit withheld past the TTL), the rest CROSS chains (commit lands
    * in a later file than its partials — chain reassembly across
    * mid-stream arrivals). Every other row rides as plain DML, time-split
    * into thirds:
    *
    *   file 1 (pre-staged): plain(ts <= t1) + every partial entry
    *   file 2 (pre-staged): plain(t1..t2)   + cross commits → full chains
    *                        emit with the T3 ts patch
    *   [sleep past TTL]     orphan buffers purge on a no-data batch
    *   file 3 (mid-stream): one plain row at t_sent — its application
    *                        proves a post-deadline batch ran its timeout
    *                        pass, making the purge a certainty instead of
    *                        a race against the trigger clock
    *   file 4 (mid-stream): plain(ts > t2)  + orphan commits → state is
    *                        gone, each releases ONLY its own entry's op
    *
    * Files 1 and 2 are staged before the query starts, and the source
    * runs with `maxFilesPerTrigger = 1` so each file is still its OWN
    * micro-batch in mod-time order — this pins four distinct batches
    * while shrinking the cross-chain TTL race window to batch-1's
    * processing time alone (the TTL on a cross chain's partials starts at
    * batch 1 and its commit is already on disk, one trigger away; were
    * file 2 landed only after batch 1 was observed complete, the window
    * would also absorb polling latency and a parquet write, which on a
    * contended host can exceed any reasonable TTL).
    *
    * `processAllAvailable`/AvailableNow cannot drive this stream (a
    * processing-time timeout schedules no-data batches forever, so
    * `noNewData` never latches) — the harness polls `_ckpt` for
    * closed-form delivered counts, the sanctioned pattern from
    * `cdc_txn_ttl`. The oracle checks the final state (a TTL that killed
    * a cross chain before its commit, or a purge that leaked orphan
    * partials, hash-diverges), the delivered-row total, the lsn range,
    * and that the four files arrived as four distinct micro-batches
    * (possible only because idle triggers skip the checkpoint — see
    * `IncrSync.applyBatchTo`). State folds by DELIVERY order (batch,
    * then ts, then event_id) — the target's merge semantics: a later
    * batch overwrites a touched key unconditionally, exactly like the
    * reference's in-order DirectWriter replay.
    */
  private[graft] def runSoak(s: SparkSession, dir: String,
      ttlMs: Long = 0L): DataFrame = {
    // TTL margin: the cross-chain window is batch-1 processing alone (see
    // the staging note below), normally < 2 s — but on a contended host
    // query init + the first file can take several seconds, and a TTL the
    // window overruns purges cross chains before their commit (a flaked
    // oracle, not a flaked assertion). ttlMs = 0 (the default) SELF-
    // CALIBRATES from this box, right now: the harness prep below (a
    // corpus scan + localCheckpoint, five counts, three staged writes) is
    // a strictly heavier workload than batch-1 processing, so 2× its
    // measured wall-clock upper-bounds the purge window with margin —
    // floor 5 s (the old StreamingSpec setting plus headroom), ceiling
    // 15 s (the previous fixed default; a loaded box converges to the old
    // behavior). A quiet box pays ~6-8 s of orphan phase instead of a
    // flat 16.5, with the same proof: the TTL value never enters the
    // oracle — only purge-before-orphan-commit / retain-cross does.
    val tPrep0 = System.currentTimeMillis()
    val work = graft.Work.dir(s"soak_live_q")
    IncrSync.deletePath(s, work)
    val keep = OplogFilters.chain(gids, white, black)
    val eff = Oplog.fromEvents(s, dir)
      .filter(keep && col("op").isin("i", "u", "d"))
      .localCheckpoint()
    val bounds = eff.agg(min(col("ts_packed")), max(col("ts_packed"))).head()
    val (tmin, tmax) = (bounds.getLong(0), bounds.getLong(1))
    // exact integer arithmetic, mirrored verbatim in the oracle
    val t1 = tmin + (tmax - tmin) / 3
    val t2 = tmin + 2 * ((tmax - tmin) / 3)
    val tSent = tmax + 1000L

    val member = col("event_id") % 10 === 0
    val plainRows = eff.filter(!member)
    val w = Window.partitionBy(col("doc_key")).orderBy(col("ts_packed"), col("event_id"))
    val wAll = Window.partitionBy(col("doc_key"))
    val chains = eff.filter(member)
      .withColumn("payload", payloadCol)
      .withColumn("rn", row_number().over(w) - 1)
      .withColumn("n", count(lit(1)).over(wAll))
      .withColumn("orphan", pmod(col("doc_key").cast("bigint"), lit(3)) === 0)
      .withColumn("entry_o",
        when(col("rn") < col("n") - 1,
          concat(lit("{\"applyOps\":["), col("payload"), lit("],\"partialTxn\":true}")))
          .otherwise(concat(lit("{\"applyOps\":["), col("payload"), lit("]}"))))
      .select(col("rn"), col("n"), col("orphan"), col("ts_packed"),
        col("doc_key").as("chain"), col("entry_o"))
      .localCheckpoint() // frozen once: three file writes + the count math

    val nullS = lit(null).cast("string")
    // entry event_id := rn — the assembler's chain seq must be monotone in
    // entry order (member event_ids are not monotone in (ts, id) order)
    def entryRows(df: DataFrame): DataFrame =
      df.select(col("rn").as("event_id"), col("ts_packed"), lit("c").as("op"),
        lit("admin.$cmd").as("ns"), lit("").as("doc_key"), lit(0.0).as("value"),
        nullS.as("props"), lit("").as("g"), lit(false).as("from_migrate"),
        col("chain").as("lsid"), lit(1L).as("txn_number"), col("entry_o").as("o"))

    // closed-form delivery counts (partials emit nothing; a cross commit
    // releases its whole chain; a purged orphan's commit only itself)
    val nP1 = plainRows.filter(col("ts_packed") <= t1).count()
    val nP2 = plainRows.filter(col("ts_packed") > t1 && col("ts_packed") <= t2).count()
    val nP3 = plainRows.filter(col("ts_packed") > t2).count()
    val nCross = chains.filter(!col("orphan")).count()
    val nOrphanChains = chains.filter(col("orphan")).select("chain").distinct().count()

    val sentinel = s.createDataFrame(
      s.sparkContext.parallelize(Seq(Row(8999999999L, tSent, "i", "app.users_1",
        "-1", 42.0, "{}", "", false, null, null, null))), IncrSync.oplogSchema)

    val ckptPath = new org.apache.hadoop.fs.Path(s"$work/target/_ckpt")
    val ckptFs = ckptPath.getFileSystem(s.sessionState.newHadoopConf())
    def ckptTotal(): Long =
      try {
        if (!ckptFs.exists(ckptPath)) 0L
        else s.read.parquet(s"$work/target/_ckpt")
          .agg(coalesce(sum(col("n_logs")), lit(0L))).head().getLong(0)
      } catch { case _: Throwable => 0L }
    def awaitTotal(n: Long): Unit = {
      val deadline = System.currentTimeMillis() + 120000L
      while (ckptTotal() < n) {
        // throw AT the stall, not three phases later as an opaque oracle
        // hash divergence
        if (System.currentTimeMillis() >= deadline)
          throw new IllegalStateException(
            s"soak stalled: ${ckptTotal()} of $n rows delivered within 120s")
        Thread.sleep(100)
      }
    }

    val feedDir = s"$work/feed"
    // files 1 and 2 pre-staged IN ORDER (mod times pinned by
    // stageOrdered); maxFilesPerTrigger=1 below still makes each its own
    // micro-batch, so the cross commits sit one trigger behind their
    // partials — the purge race is bounded by batch-1 processing alone
    stageOrdered(s, feedDir, Seq(
      feedify(plainRows.filter(col("ts_packed") <= t1))
        .unionByName(entryRows(chains.filter(col("rn") < col("n") - 1))),
      feedify(plainRows.filter(col("ts_packed") > t1 && col("ts_packed") <= t2))
        .unionByName(entryRows(
          chains.filter(!col("orphan") && col("rn") === col("n") - 1)))))

    val prepMs = System.currentTimeMillis() - tPrep0
    val ttl = if (ttlMs > 0) ttlMs
              else math.max(5000L, math.min(15000L, 2L * prepMs))
    // State-partition scoping happens INSIDE startOplogFrom since r19
    // (IncrSync.StatePartitions — the birth-time sizing this harness
    // pioneered in r17: the 250 ms trigger fires ~26 micro-batches, most
    // empty, and EVERY batch commits EVERY state partition; 478 s
    // cumulative commit at 32 partitions, cut 4× at 8).
    val q = IncrSync.startOplogFrom(s,
        graft.streaming.ParquetDirSource(feedDir, IncrSync.oplogSchema, maxFilesPerTrigger = 1),
        s"$work/target", s"$work/ckpt",
        gids = gids, white = white, black = black, txnTtlMs = ttl,
        trigger = Trigger.ProcessingTime("250 milliseconds"), nBuckets = 16)
    try {
      awaitTotal(nP1 + nP2 + nCross)
      // the orphan deadline (batch-1 start + ttl) is certainly behind us
      // after this sleep: the anchor (now) is at or after batch 2's end
      Thread.sleep(ttl + 1500)
      sentinel.coalesce(1).write.mode("append").parquet(feedDir)
      awaitTotal(nP1 + nP2 + nCross + 1)
      feedify(plainRows.filter(col("ts_packed") > t2))
        .unionByName(entryRows(chains.filter(col("orphan") && col("rn") === col("n") - 1)))
        .coalesce(1).write.mode("append").parquet(feedDir)
      awaitTotal(nP1 + nP2 + nCross + 1 + nP3 + nOrphanChains)
    } finally q.stop()

    val state = IncrSync.readOrEmpty(s, s"$work/target/state")
      .select(lit("state").as("section"), col("ns").as("a"), col("doc_key").as("b"),
        col("last_event_id").as("x"), lit(0L).as("y"), col("last_value").as("v"))
    val ck = s.read.parquet(s"$work/target/_ckpt")
    val ckRange = ck.agg(min(col("lsn_min")).as("mn"), max(col("lsn_max")).as("mx"))
      .select(lit("ckpt_range").as("section"), lit("").as("a"), lit("").as("b"),
        col("mn").as("x"), col("mx").as("y"), lit(0.0).as("v"))
    val ckN = ck.agg(sum(col("n_logs")).as("tot"), count(lit(1)).as("nb"))
      .select(lit("ckpt_n").as("section"), lit("").as("a"), lit("").as("b"),
        col("tot").as("x"), col("nb").as("y"), lit(0.0).as("v"))
    state.unionByName(ckRange).unionByName(ckN)
  }

  /** Watermarked event-time windowing with a DETERMINISTIC late-data
    * drop: the canonical Structured Streaming aggregation surface
    * (tumbling 1-day windows, 1-hour watermark, append mode), driven so
    * the watermark race is pinned instead of flaky.
    *
    * The corpus is staged as THREE files in pinned mod-time order with
    * `maxFilesPerTrigger = 1`: the UPPER time-half first (its max sets
    * the watermark to global-max − 1 h), then a one-row filler (a
    * re-delivery of a max-ts row), then the lower half — now late. The
    * filler batch matters because Spark ≥ 3.4 splits the watermark
    * (SPARK-40925): batch N evicts state with the watermark computed
    * after batch N−1, but filters LATE INPUT with the one from batch
    * N−2 — so the drop only engages one batch after the raise (verified
    * empirically against 4.1.2: the same feed without the filler merges
    * every "late" row). Closed form: the filler batch emits exactly the
    * windows whose end is at or below the batch-1 watermark with
    * UPPER-ONLY counts; the lower half is then dropped wholesale
    * (windows into open state stay unemitted — the watermark never
    * advances again). A drop that fails (lower-half windows appear, the
    * boundary window's count inflates), over-drops, or emits open
    * windows hash-diverges from the oracle.
    *
    * Output: (w_start µs, n_events, min_event, max_event) — integer-only
    * aggregates, engine-exact.
    */
  /** TWO stateful operators CHAINED in one streaming query — watermark
    * dedup feeding a watermarked window aggregation, the multi-stateful-
    * operator pipeline Spark ≥ 3.5 plans with a single watermark
    * propagated between the state stores (an at-least-once feed dedup'd
    * AT the aggregation, not in a separate job). The feed redelivers a
    * third of the rows in a second file: without the dedup stage those
    * windows double-count and the oracle (which counts each event once)
    * hash-diverges — so the gate proves the chained state really runs.
    * Same staged watermark discipline as `stream_window_late` (upper
    * half, then dups, then the max-ts filler that brings the watermark
    * current; the filler rows are themselves redeliveries and must be
    * dropped by the dedup state while STILL advancing the watermark —
    * event-time stats are collected at the watermark node, upstream of
    * the stores).
    */
  private def runChained(s: SparkSession, dir: String): DataFrame = {
    val work = graft.Work.dir("stream_chained_q")
    IncrSync.deletePath(s, work)
    val ev = graft.Tables.loadEventsNs(s, dir)
      .select(col("event_id"), expr("ts DIV 1000").as("ts_us")).localCheckpoint()
    val b = ev.agg(min(col("ts_us")), max(col("ts_us"))).head()
    val tmid = b.getLong(0) + (b.getLong(1) - b.getLong(0)) / 2
    val up = ev.filter(col("ts_us") > tmid)
    stageOrdered(s, s"$work/feed", Seq(
      up,
      up.filter(col("event_id") % 3 === 0),
      ev.filter(col("ts_us") === b.getLong(1))))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("event_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("ts_us",
        org.apache.spark.sql.types.LongType)))
    val q = s.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$work/feed")
      .withColumn("ts", timestamp_micros(col("ts_us")))
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")
      .groupBy(window(col("ts"), "1 day").as("w"))
      .agg(count(lit(1)).as("n_events"), min(col("event_id")).as("min_event"),
        max(col("event_id")).as("max_event"))
      .select(unix_micros(col("w.start")).as("w_start"), col("n_events"),
        col("min_event"), col("max_event"))
      .writeStream.outputMode("append")
      .option("checkpointLocation", s"$work/ckpt")
      .option("path", s"$work/out")
      .trigger(Trigger.AvailableNow()).format("parquet").start()
    q.awaitTermination()
    s.read.parquet(s"$work/out")
  }

  private def runWindowed(s: SparkSession, dir: String): DataFrame = {
    val work = graft.Work.dir(s"wm_window_q")
    IncrSync.deletePath(s, work)
    val ev = graft.Tables.loadEventsNs(s, dir)
      .select(col("event_id"), expr("ts DIV 1000").as("ts_us")).localCheckpoint()
    val b = ev.agg(min(col("ts_us")), max(col("ts_us"))).head()
    val tmid = b.getLong(0) + (b.getLong(1) - b.getLong(0)) / 2
    stageOrdered(s, s"$work/feed", Seq(
      ev.filter(col("ts_us") > tmid),
      // filler: re-deliver the max-ts row(s); they join the still-open
      // last window (never emitted) and advance nothing — the batch
      // exists purely to bring the late-events watermark current
      ev.filter(col("ts_us") === b.getLong(1)),
      ev.filter(col("ts_us") <= tmid)))

    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("event_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("ts_us",
        org.apache.spark.sql.types.LongType)))
    val q = s.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$work/feed")
      .withColumn("ts", timestamp_micros(col("ts_us")))
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 day").as("w"))
      .agg(count(lit(1)).as("n_events"), min(col("event_id")).as("min_event"),
        max(col("event_id")).as("max_event"))
      .select(unix_micros(col("w.start")).as("w_start"), col("n_events"),
        col("min_event"), col("max_event"))
      .writeStream.outputMode("append")
      .option("checkpointLocation", s"$work/ckpt")
      .option("path", s"$work/out")
      .trigger(Trigger.AvailableNow()).format("parquet").start()
    q.awaitTermination()
    s.read.parquet(s"$work/out")
  }

  /** Late-data LOSS accounting — the ops question behind every watermark
    * choice ("how much data is this horizon actually costing me"), made
    * a first-class gated reconciliation: the same staged feed as
    * `stream_window_late` (upper half, watermark-advancing filler, then
    * the lower half arriving LATE), audited from the two numbers the
    * engine actually reports — rows DELIVERED to the query
    * (progress `numInputRows`, summed over batches) and rows EMITTED in
    * closed windows (the output table). Their gap is the
    * retained-or-dropped balance, and the oracle closed-forms every
    * column, so a watermark regression in either direction (late rows
    * silently admitted → emitted grows; on-time rows discarded →
    * emitted shrinks) breaks the reconciliation and hash-diverges.
    * (`numRowsDroppedByWatermark` is deliberately NOT the audited
    * number: it counts only state-operator drops, not the pre-operator
    * watermark filter — measured here: 15 of 4985 late rows.)
    */
  private def runLateAudit(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val work = graft.Work.dir(s"late_audit_q")
    IncrSync.deletePath(s, work)
    val ev = graft.Tables.loadEventsNs(s, dir)
      .select(col("event_id"), expr("ts DIV 1000").as("ts_us")).localCheckpoint()
    val b = ev.agg(min(col("ts_us")), max(col("ts_us"))).head()
    val tmid = b.getLong(0) + (b.getLong(1) - b.getLong(0)) / 2
    stageOrdered(s, s"$work/feed", Seq(
      ev.filter(col("ts_us") > tmid),
      ev.filter(col("ts_us") === b.getLong(1)),
      ev.filter(col("ts_us") <= tmid)))

    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("event_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("ts_us",
        org.apache.spark.sql.types.LongType)))
    // delivered-row count accumulates through a listener, NOT
    // q.recentProgress — recentProgress is a ring buffer capped at
    // spark.sql.streaming.numRecentProgressUpdates (default 100) and
    // would silently undercount past 100 micro-batches
    val deliveredAcc = new java.util.concurrent.atomic.AtomicLong(0L)
    val listener = new org.apache.spark.sql.streaming.StreamingQueryListener {
      override def onQueryStarted(
          e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryProgress(
          e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryProgressEvent): Unit =
        deliveredAcc.addAndGet(e.progress.numInputRows)
      override def onQueryTerminated(
          e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    }
    s.streams.addListener(listener)
    val delivered = try {
      val q = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(s"$work/feed")
        .withColumn("ts", timestamp_micros(col("ts_us")))
        .withWatermark("ts", "1 hour")
        .groupBy(window(col("ts"), "1 day").as("w"))
        .agg(count(lit(1)).as("n_events"))
        .select(unix_micros(col("w.start")).as("w_start"), col("n_events"))
        .writeStream.outputMode("append")
        .option("checkpointLocation", s"$work/ckpt")
        .option("path", s"$work/out")
        .trigger(Trigger.AvailableNow()).format("parquet").start()
      q.awaitTermination()
      // listener callbacks are async — wait until the count stabilizes
      // (bounded; the staged feed is 3 files so this settles instantly)
      var last = -1L; var spins = 0
      while (deliveredAcc.get() != last && spins < 100) {
        last = deliveredAcc.get(); spins += 1; Thread.sleep(50)
      }
      deliveredAcc.get()
    } finally s.streams.removeListener(listener)
    val emitted = s.read.parquet(s"$work/out")
      .agg(count(lit(1)).as("w"), coalesce(sum(col("n_events")), lit(0L)).as("e"))
      .head()
    Seq((delivered, emitted.getLong(0), emitted.getLong(1),
        delivered - emitted.getLong(1)))
      .toDF("n_delivered", "n_windows_emitted", "n_events_emitted",
        "n_retained_or_dropped")
  }

  /** Continuous top-k — the streaming materialized-view pattern for a
    * leaderboard: rank is not supported inside an append-mode streaming
    * aggregate, so the production shape is two-tier — the streaming
    * windowed count emits CLOSED (window, event_type) rows at watermark
    * passage, and a downstream batch rank runs over the emitted table.
    * The rank input is already aggregated (|windows|×|types| rows, never
    * the event stream), so the per-window row_number costs nothing at
    * any scale; the streaming tier's state is O(open windows × types).
    * Same staged feed discipline as `stream_window_late` (upper half,
    * watermark-advancing filler, dropped-late lower half).
    */
  private def runStreamTopk(s: SparkSession, dir: String): DataFrame = {
    val work = graft.Work.dir(s"stream_topk_q")
    IncrSync.deletePath(s, work)
    val ev = graft.Tables.loadEventsNs(s, dir)
      .select(col("event_id"), col("event_type"), expr("ts DIV 1000").as("ts_us"))
      .localCheckpoint()
    val b = ev.agg(min(col("ts_us")), max(col("ts_us"))).head()
    val tmid = b.getLong(0) + (b.getLong(1) - b.getLong(0)) / 2
    stageOrdered(s, s"$work/feed", Seq(
      ev.filter(col("ts_us") > tmid),
      ev.filter(col("ts_us") === b.getLong(1)),
      ev.filter(col("ts_us") <= tmid)))

    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("event_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("event_type",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("ts_us",
        org.apache.spark.sql.types.LongType)))
    val q = s.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$work/feed")
      .withColumn("ts", timestamp_micros(col("ts_us")))
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 day").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(unix_micros(col("w.start")).as("w_start"), col("event_type"), col("n"))
      .writeStream.outputMode("append")
      .option("checkpointLocation", s"$work/ckpt")
      .option("path", s"$work/out")
      .trigger(Trigger.AvailableNow()).format("parquet").start()
    q.awaitTermination()
    val rankW = Window.partitionBy(col("w_start"))
      .orderBy(col("n").desc, col("event_type"))
    s.read.parquet(s"$work/out")
      .withColumn("rank", row_number().over(rankW).cast("long"))
      .filter(col("rank") <= 3)
      .select(col("w_start"), col("rank"), col("event_type"), col("n"))
  }

  /** Watermarked stream-stream INNER join — `StreamingSymmetricHashJoin`,
    * the one Structured Streaming operator family no other query
    * exercises: the events corpus split into two LIVE sides by event_id
    * parity ("view" rows even, "buy" rows odd), joined per user with an
    * event-time range bound (a buy within the hour after a view — the
    * clickstream-attribution shape). Both sides carry 1-hour watermarks
    * and the join condition carries the time bound, so each side's state
    * store retains only the watermark horizon: state is O(window), not
    * O(stream) — the property that makes the operator usable at 100 TB.
    *
    * AvailableNow drain over one staged file per side: a drained inner
    * join emits exactly the batch-join pair set, closed-form in the
    * oracle. Output: one row per qualifying (view, buy) pair with the µs
    * lag — integer-exact.
    */
  private def runStreamJoin(s: SparkSession, dir: String): DataFrame =
    streamJoinRunner(s, dir, tag = "inner", joinType = "inner", pairProjection)

  /** The matched-pair projection shared by the inner and outer arms. */
  private def pairProjection(j: DataFrame): DataFrame =
    j.select(col("v_event").as("view_event"), col("b_event").as("buy_event"),
      col("v_user").as("user_id"),
      (unix_micros(col("b_ts")) - unix_micros(col("v_ts"))).as("lag_us"))

  /** Shared harness for the watermarked stream-stream join family: the
    * events corpus split into two LIVE sides by event_id parity ("view"
    * rows even, "buy" rows odd), each side watermarked 1 hour, joined
    * per user with the buy-within-the-hour event-time bound, drained
    * under AvailableNow. The three query entries differ only in join
    * type and output projection — semantics notes live on each runner.
    *
    * State partitioning: a stream-stream join keeps FOUR state stores
    * per shuffle partition, and each store pays a fixed per-batch commit
    * (delta-file create + fsync + rename) regardless of rows held —
    * measured at 32 partitions: ~76 s of cumulative commit time per
    * batch across the 128 stores, 2.5 s wall on 32 threads, dominating
    * the drain; at 8 partitions the same feed commits in ~3 s cumulative
    * and the drain halves (PROFILE_r11.md). So the harness sizes the
    * join's state partitioning to its volume (~12k rows/side/partition)
    * the way a production deployment sizes `spark.sql.shuffle.partitions`
    * before first start — the count is pinned into the checkpoint at
    * query birth, and at 100 TB the SAME knob scales it up. Scoped
    * save/restore: streaming partitioning is captured at query start, so
    * the session conf is restored right after `start()` returns.
    */
  /** Stream-join state partitions, AUTO-SIZED from projected state volume
    * at query birth (the `adaptivePlanes` move applied to the r11 sizing
    * rule — SCALE_r14 measured the fixed-8 default hitting its re-size
    * point at 100×: 31.7 s vs 16.2 s at 32 partitions, and the r15/r14
    * verdicts asked for the knob to turn itself).
    *
    * Two measured cost terms pull in opposite directions:
    *  - commit fan-out, LINEAR in partition count: each shuffle partition
    *    carries four join state stores, each paying a fixed per-batch
    *    commit (delta create + fsync + rename) — 32 partitions = 128
    *    stores ≈ 76 s cumulative commit per batch vs ~3 s at 8 on the
    *    sf0.1 feed (PROFILE_r11);
    *  - per-store size, ~LINEAR in rows per partition past heap comfort
    *    (GC pressure, then the SCALE_r14 availability cliff).
    * Balancing `α·p + β·rows/p` gives `p* ∝ sqrt(rows)`; the coefficient
    * is anchored on the two measured optima (sf0.1: 50k rows/side → 8
    * beats 32; 100×: ~5-6.4M rows/side → 32 beats both 8 and 64 —
    * SCALE_r16 A/B) as the smallest power of two `p ≥ 8` with
    * `p² · 6400 ≥ maxRowsPerSide`. Anchor walk: 50k → 8, 30×'s ~1.5M →
    * 16, 100×'s ~5-6.4M → 32, then doubling per 4× rows up to the 4096
    * cap (a 1000-executor deployment's ceiling; past it, per-store volume
    * is RocksDB territory — `GraftConfig.sanitize`'s provider gate).
    *
    * CHECKPOINT MIGRATION: the count is derived once at query birth and
    * FREEZES into the checkpoint (Spark pins the state-partition count
    * for the checkpoint's lifetime). Re-sizing a live deployment is the
    * `cdc_rebucket` move: drain the old query, start a fresh checkpoint
    * with the re-derived count, and replay from the last committed
    * offset — state rebuilds from the sources' retained window. The
    * `GRAFT_STREAM_JOIN_PARTS` env remains an explicit deployment
    * override (reference parallel: `cmd/collector/sanitize.go:206`'s
    * worker bounds — computed default, operator-overridable).
    */
  def stateJoinPartitions(maxRowsPerSide: Long): Int = {
    var p = 8
    while (p < 4096 && p.toLong * p * 6400L < maxRowsPerSide) p *= 2
    p
  }

  // NOTE (r19, superseding the r16 single-harness A/B): the CDC
  // pipelines now freeze IncrSync.StatePartitions at query birth inside
  // startOplogTo itself. The r16 measurement ("scoping cdc_token_resume
  // doesn't move its wall") sampled one harness whose wall is
  // apply/lifecycle-heavy; the r19 HarnessProfile sweep over the whole
  // family measured 29–188 s CUMULATIVE state-commit per harness at 32
  // partitions (cdc_txn_ttl: 188 s over 11 batches) for assembler state
  // of a few hundred rows — the same trigger-count × partition fan-out
  // the stream_* scoping cut 27–40% clean-confirmed in r18. The join
  // family keeps its volume-derived stateJoinPartitions rule below.

  /** Per-side projected state rows for the events-derived join feed —
    * one aggregate job at plan time over the already-checkpointed feed
    * (the stats a production run reads from catalog statistics).
    */
  private def joinSideCounts(ev: DataFrame): (Long, Long) = {
    // coalesce: sum over an EMPTY feed returns NULL, and an unguarded
    // getLong would crash every join runner on an empty corpus (ADVICE r16)
    val r = ev.agg(
      coalesce(sum(when(col("event_id") % 2 === 0, 1L).otherwise(0L)), lit(0L)),
      coalesce(sum(when(col("event_id") % 2 === 1, 1L).otherwise(0L)), lit(0L))).head()
    (r.getLong(0), r.getLong(1))
  }

  private def streamJoinRunner(s: SparkSession, dir: String, tag: String,
      joinType: String, out: DataFrame => DataFrame): DataFrame = {
    val work = graft.Work.dir(s"stream_join_${tag}_q")
    IncrSync.deletePath(s, work)
    val ev = graft.Tables.loadEventsNs(s, dir)
      .select(col("event_id"), col("user_id"), expr("ts DIV 1000").as("ts_us"))
      .localCheckpoint()
    val (nViews, nBuys) = joinSideCounts(ev)
    val derivedParts = stateJoinPartitions(math.max(nViews, nBuys))
    val joinParts = sys.env.get("GRAFT_STREAM_JOIN_PARTS")
      .map(_.toInt).getOrElse(derivedParts)
    println(s"""{"stream_join_parts":$joinParts,"derived":$derivedParts,""" +
      s""""n_views":$nViews,"n_buys":$nBuys,"tag":"$tag"}""")
    ev.filter(col("event_id") % 2 === 0).write.parquet(s"$work/views")
    ev.filter(col("event_id") % 2 === 1).write.parquet(s"$work/buys")

    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("event_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("user_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("ts_us",
        org.apache.spark.sql.types.LongType)))
    def sideStream(path: String, prefix: String): DataFrame =
      s.readStream.schema(schema).parquet(s"$work/$path")
        .select(col("event_id").as(s"${prefix}_event"),
          col("user_id").as(s"${prefix}_user"),
          timestamp_micros(col("ts_us")).as(s"${prefix}_ts"))
        .withWatermark(s"${prefix}_ts", "1 hour")
    val joined = sideStream("views", "v").join(sideStream("buys", "b"),
      expr("v_user = b_user AND b_ts >= v_ts AND b_ts <= v_ts + interval 1 hour"),
      joinType)
    val spKey = "spark.sql.shuffle.partitions"
    val prevSp = s.conf.get(spKey)
    try {
      s.conf.set(spKey, joinParts)
      val q = out(joined)
        .writeStream.outputMode("append")
        .option("checkpointLocation", s"$work/ckpt")
        .option("path", s"$work/out")
        .trigger(Trigger.AvailableNow()).format("parquet").start()
      // restore only after the drain: the stream clones the session conf
      // on its own execution thread, which may run after start() returns
      q.awaitTermination()
    } finally s.conf.set(spKey, prevSp)
    s.read.parquet(s"$work/out")
  }

  /** LEFT OUTER watermarked stream-stream join: the unmatched-view arm.
    * Same sides/condition as [[runStreamJoin]], `leftOuter` type — a view
    * with no buy in its following hour emits null-joined ONCE the
    * watermark passes its state-eviction bound (the engine cannot know
    * "no buy arrived" until the buy-side watermark clears the window).
    * Under an AvailableNow drain Spark runs the post-data no-data batch
    * that flushes evicted state, so the emitted set is deterministic:
    * matched pairs exactly as the inner join, plus one null row per view
    * whose window closed under the final watermark (global max − 1 h);
    * views whose window is still open at drain end emit nothing. The
    * oracle computes both arms closed-form — an engine that emitted
    * open-state views (premature nulls), dropped evicted ones, or
    * double-emitted a matched view hash-diverges.
    */
  private def runStreamJoinOuter(s: SparkSession, dir: String): DataFrame =
    streamJoinRunner(s, dir, tag = "outer", joinType = "leftOuter", pairProjection)

  /** LEFT SEMI watermarked stream-stream join — the EXISTS arm of the
    * streaming-join family (inner emits every matched pair; this emits
    * each matched VIEW once, no buy-side payload): "views that converted
    * within the hour", the dedup-friendly form when the consumer only
    * routes the left entity. Same sides/condition/watermarks as
    * [[runStreamJoin]]; the engine keeps the same two-sided state but
    * drops a left row from state at its FIRST match (emitting once) and
    * never emits the unmatched — so the drained output is the closed-form
    * EXISTS, deterministic without any watermark-timing subtleties. A
    * double emission (the failure the semi type exists to prevent)
    * row-count-diverges immediately.
    */
  private def runStreamJoinSemi(s: SparkSession, dir: String): DataFrame =
    streamJoinRunner(s, dir, tag = "semi", joinType = "leftSemi",
      _.select(col("v_event").as("view_event"), col("v_user").as("user_id"),
        unix_micros(col("v_ts")).as("ts_view")))

  /** The state-partition AUTO-SIZING derivation, exposed as a gated query
    * (the `dedup_embed_adaptive` pattern applied to the r11 sizing rule):
    * one row with the projected per-side state volumes and the partition
    * count [[stateJoinPartitions]] derives from them — the SAME code path
    * [[streamJoinRunner]] pins into every stream-join checkpoint at query
    * birth. The oracle re-derives the count from its own COUNT(*) with an
    * integer power-of-two scan (no float sqrt/log2), so the gate proves
    * the formula end to end: a corpus 100× this one resolves 32 instead
    * of 8 with zero config (SCALE_r16 measures that A/B).
    */
  private def runJoinAutosize(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = graft.Tables.loadEventsNs(s, dir).select(col("event_id"))
    val (nViews, nBuys) = joinSideCounts(ev)
    val parts = stateJoinPartitions(math.max(nViews, nBuys))
    Seq((nViews, nBuys, parts.toLong)).toDF("n_views", "n_buys", "parts")
  }

  /** Streaming gap sessionization via Spark's NATIVE `session_window`
    * aggregate — the merging-window state operator no other query
    * exercises (q10_sessionize is the batch rewrite of the same
    * semantics; this runs the real `UpdatingSessionsExec` path in a
    * StreamingQuery). State per key is one open session, merged /
    * extended as events arrive and emitted in append mode once the
    * watermark passes the session's close (last ts + gap) — O(open
    * sessions), not O(stream), which is what makes gap sessionization
    * viable on an unbounded 100 TB event feed.
    *
    * Drain shape: the whole corpus in one file, then two far-future
    * sentinel rows (user_id = −1) staged as their OWN micro-batches —
    * the first raises the watermark a decade past every real session's
    * close, the second runs an emission pass after the raise (state
    * eviction uses the PREVIOUS batch's watermark, SPARK-40925 — same
    * reason runWindowed stages a filler). The sentinels' own session can
    * never close, so exactly the real sessions emit, making the oracle
    * the plain closed-form gap sessionization. Boundary pinned by a
    * RelationalJoinSpec golden: a gap of exactly `gap` MERGES (Spark
    * merges adjacent session windows), hence the STRICT `>` in the
    * oracle's new-session predicate — same boundary as q10_sessionize.
    */
  private def runSessionize(s: SparkSession, dir: String): DataFrame = {
    val work = graft.Work.dir(s"stream_sess_q")
    IncrSync.deletePath(s, work)
    val ev = graft.Tables.loadEventsNs(s, dir)
      .select(col("user_id"), col("event_id"), expr("ts DIV 1000").as("ts_us"))
      .localCheckpoint()
    val tmax = ev.agg(max(col("ts_us"))).head().getLong(0)
    def sentinel(off: Long): DataFrame = s.range(1)
      .select(lit(-1L).as("user_id"), lit(-1L - off).as("event_id"),
        lit(tmax + 315360000000000L + off).as("ts_us"))
    stageOrdered(s, s"$work/feed", Seq(ev, sentinel(0), sentinel(1)))

    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("user_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("event_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("ts_us",
        org.apache.spark.sql.types.LongType)))
    val q = s.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$work/feed")
      .withColumn("ts", timestamp_micros(col("ts_us")))
      .withWatermark("ts", "1 hour")
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("w"))
      .agg(min(col("ts_us")).as("ts_start"), max(col("ts_us")).as("ts_end"),
        count(lit(1)).as("n_events"))
      // exclude the sentinels via an AGGREGATE-derived column, never the
      // grouping key: `filter(user_id >= 0)` is pushed through the agg
      // AND the watermark node to the scan, so the sentinel rows would
      // die before EventTimeWatermarkExec and the watermark would never
      // raise (observed: checkpoint watermark pinned at realmax − 1 h,
      // last-90-min sessions unemitted). `min(ts_us)` only exists above
      // the agg, so this filter cannot sink. Defense-in-depth anyway:
      // the sentinels' own session never closes under its own watermark.
      .filter(col("ts_start") <= lit(tmax))
      .select(col("user_id"), col("ts_start"), col("ts_end"), col("n_events"))
      .writeStream.outputMode("append")
      .option("checkpointLocation", s"$work/ckpt")
      .option("path", s"$work/out")
      .trigger(Trigger.AvailableNow()).format("parquet").start()
    q.awaitTermination()
    s.read.parquet(s"$work/out")
  }

  /** Native `dropDuplicatesWithinWatermark` under a REAL duplicate
    * re-delivery — the at-least-once-source dedup operator (the engine's
    * K1 idempotent-replay guarantee, expressed as Spark's built-in
    * bounded-state dedup; state is O(watermark horizon), not O(stream),
    * the property that makes exactly-once-per-key viable on an unbounded
    * feed). Batch 1 delivers the whole corpus; batch 2 re-delivers every
    * event in the final 50 minutes — strictly INSIDE the 1 h watermark
    * horizon, so their dedup state is still live by construction and the
    * re-deliveries are provably suppressed (re-delivering below the
    * horizon would instead race state eviction batch-by-batch — that
    * boundary is deliberately not part of the oracle's closed form).
    * A drained output ≡ the distinct corpus; a dedup that failed
    * (duplicates emitted) or over-dropped diverges row-count and hash.
    */
  private def runStreamDedup(s: SparkSession, dir: String): DataFrame = {
    val work = graft.Work.dir(s"stream_dedup_q")
    IncrSync.deletePath(s, work)
    val ev = graft.Tables.loadEventsNs(s, dir)
      .select(col("event_id"), col("user_id"), expr("ts DIV 1000").as("ts_us"))
      .localCheckpoint()
    val tmax = ev.agg(max(col("ts_us"))).head().getLong(0)
    stageOrdered(s, s"$work/feed", Seq(
      ev, ev.filter(col("ts_us") >= tmax - 3000000000L)))

    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("event_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("user_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("ts_us",
        org.apache.spark.sql.types.LongType)))
    val q = s.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$work/feed")
      .withColumn("ts", timestamp_micros(col("ts_us")))
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")
      .select(col("event_id"), col("user_id"), col("ts_us").as("ts"))
      .writeStream.outputMode("append")
      .option("checkpointLocation", s"$work/ckpt")
      .option("path", s"$work/out")
      .trigger(Trigger.AvailableNow()).format("parquet").start()
    q.awaitTermination()
    s.read.parquet(s"$work/out")
  }

  /** Stream-STATIC broadcast enrichment — the stateless third member of
    * the streaming-join family (inner stream-stream, outer stream-stream,
    * and this): a live event feed dimension-joined to a batch table, the
    * lookup shape of every CDC/event pipeline (enrich each change with
    * its customer/tenant attributes before routing). Unlike the
    * stream-stream joins this needs NO state store and NO watermark —
    * each micro-batch plans an ordinary BroadcastHashJoin against the
    * static side, so state is zero and the operator's scale ceiling is
    * the dimension's broadcast size, not the stream's length. The static
    * side is filtered BEFORE the join (segment gate), so the join also
    * drops events — proving the per-batch join is really applied, not a
    * pass-through. Two staged files under `maxFilesPerTrigger = 1` prove
    * every micro-batch joins independently; the drained append output ≡
    * the batch join, closed-form in the oracle.
    */
  private def runStreamEnrich(s: SparkSession, dir: String): DataFrame = {
    val work = graft.Work.dir(s"stream_enrich_q")
    IncrSync.deletePath(s, work)
    val ev = graft.Tables.loadEventsNs(s, dir)
      .select(col("event_id"), col("user_id"), col("event_type"))
      .localCheckpoint()
    stageOrdered(s, s"$work/feed", Seq(
      ev.filter(col("event_id") % 2 === 0), ev.filter(col("event_id") % 2 === 1)))
    val dim = s.read.parquet(s"$dir/customer.parquet")
      .filter(col("c_mktsegment") =!= "BUILDING")
      .select(col("c_custkey"), col("c_mktsegment"), col("c_nationkey"))

    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("event_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("user_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("event_type",
        org.apache.spark.sql.types.StringType)))
    val q = s.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$work/feed")
      .join(broadcast(dim), col("user_id") === col("c_custkey"))
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("c_mktsegment"), col("c_nationkey"))
      .writeStream.outputMode("append")
      .option("checkpointLocation", s"$work/ckpt")
      .option("path", s"$work/out")
      .trigger(Trigger.AvailableNow()).format("parquet").start()
    q.awaitTermination()
    s.read.parquet(s"$work/out")
  }

  /** CEP sequence state: stage ∈ {0 seeking view, 1 seeking click,
    * 2 seeking purchase, 3 done}; the accepted stage events' (ts, id).
    */
  case class PatternState(stage: Int, tsV: Long, evV: Long, tsC: Long, evC: Long)
  case class PatternEvent(event_id: Long, user_id: Long, event_type: String,
    ts_us: Long)
  case class PatternMatch(user_id: Long, view_event: Long, ts_view: Long,
    click_event: Long, ts_click: Long, purchase_event: Long, ts_purchase: Long)

  /** Complex-event-processing sequence detection — the custom-state
    * operator Structured Streaming exists for: per user, detect the FIRST
    * view → click → purchase sequence in event-time order, with the state
    * machine persisted in `flatMapGroupsWithState` across micro-batches
    * (a user's view can arrive triggers before their purchase; the staged
    * two-batch feed splits event time at its first DECILE — early enough
    * that many first views land in batch 1 while their purchases land in
    * batch 2, so sequences provably straddle the trigger boundary at
    * every scale factor). State is one 5-field record per ACTIVE
    * user — not a buffer of events — the O(|users|) bound that keeps CEP
    * viable on an unbounded stream. Within a batch the shuffle delivers a
    * group's rows unordered, so the machine sorts the batch's per-user
    * slice before folding (bounded by per-user-per-trigger volume; the
    * cross-batch order is the feed's event-time split). A greedy
    * first-match machine ≡ the oracle's closed form: first view, first
    * click strictly after it, first purchase strictly after that.
    */
  private def runPattern(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val work = graft.Work.dir(s"stream_pattern_q")
    IncrSync.deletePath(s, work)
    val ev = graft.Tables.loadEventsNs(s, dir)
      .filter(col("event_type").isin("view", "click", "purchase"))
      .select(col("event_id"), col("user_id"), col("event_type"),
        expr("ts DIV 1000").as("ts_us"))
      .localCheckpoint()
    val bounds = ev.agg(min(col("ts_us")), max(col("ts_us"))).head()
    val tcut = bounds.getLong(0) + (bounds.getLong(1) - bounds.getLong(0)) / 10
    stageOrdered(s, s"$work/feed", Seq(
      ev.filter(col("ts_us") <= tcut), ev.filter(col("ts_us") > tcut)))

    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("event_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("user_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("event_type",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("ts_us",
        org.apache.spark.sql.types.LongType)))
    val q = s.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$work/feed")
      .as[PatternEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout)(
        patternGroup)
      .writeStream.outputMode("append")
      .option("checkpointLocation", s"$work/ckpt")
      .option("path", s"$work/out")
      .trigger(Trigger.AvailableNow()).format("parquet").start()
    q.awaitTermination()
    s.read.parquet(s"$work/out")
  }

  /** The per-user sequence machine (see [[runPattern]]). */
  private def patternGroup(uid: Long, events: Iterator[PatternEvent],
      state: GroupState[PatternState]): Iterator[PatternMatch] = {
    var st = if (state.exists) state.get else PatternState(0, 0L, 0L, 0L, 0L)
    val out = scala.collection.mutable.ListBuffer.empty[PatternMatch]
    def after(e: PatternEvent, ts: Long, ev: Long): Boolean =
      e.ts_us > ts || (e.ts_us == ts && e.event_id > ev)
    for (e <- events.toSeq.sortBy(e => (e.ts_us, e.event_id)) if st.stage < 3) {
      st.stage match {
        case 0 if e.event_type == "view" =>
          st = PatternState(1, e.ts_us, e.event_id, 0L, 0L)
        case 1 if e.event_type == "click" && after(e, st.tsV, st.evV) =>
          st = PatternState(2, st.tsV, st.evV, e.ts_us, e.event_id)
        case 2 if e.event_type == "purchase" && after(e, st.tsC, st.evC) =>
          out += PatternMatch(uid, st.evV, st.tsV, st.evC, st.tsC,
            e.event_id, e.ts_us)
          st = PatternState(3, st.tsV, st.evV, st.tsC, st.evC)
        case _ => ()
      }
    }
    state.update(st)
    out.iterator
  }

  case class Scd2Op(event_id: Long, ts_packed: Long, op: String, ns: String,
    doc_key: String, value: Double)
  /** `openVer == 0` means no version is currently open (post-delete). */
  case class Scd2State(nOps: Long, openVer: Long, validFrom: Long,
    value: Double)
  case class Scd2Row(ns: String, doc_key: String, version: Long,
    valid_from: Long, valid_to: Long, value: Double)

  /** SCD Type-2 history build as a CONTINUOUS pipeline (the streaming
    * face of `cdc_scd2`'s batch window): per document, the open version
    * lives in `flatMapGroupsWithState` state — (op count, open version's
    * seq/valid_from/value), O(1) per key — and a version row is emitted
    * the moment the NEXT effective op closes it. Open (current) versions
    * are state, not output — exactly how a live history table works (the
    * current image lives in the target; the history table accretes
    * closed rows) — so the oracle is the batch fold's closed rows
    * (`valid_to IS NOT NULL`). Delete ops consume a version number
    * without opening one, matching the batch window's row_number
    * semantics; the feed splits at the ts midpoint so versions provably
    * close across the trigger boundary.
    */
  private def runScd2(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val work = graft.Work.dir(s"stream_scd2_q")
    IncrSync.deletePath(s, work)
    val eff = Oplog.fromEvents(s, dir)
      .filter(OplogFilters.chain(gids, white, black))
      .filter(col("op").isin("i", "u", "d"))
      .select(col("event_id"), col("ts_packed"), col("op"), col("ns"),
        col("doc_key"), col("value"))
      .localCheckpoint()
    val b = eff.agg(min(col("ts_packed")), max(col("ts_packed"))).head()
    val tcut = b.getLong(0) + (b.getLong(1) - b.getLong(0)) / 2
    stageOrdered(s, s"$work/feed", Seq(
      eff.filter(col("ts_packed") <= tcut), eff.filter(col("ts_packed") > tcut)))

    val q = s.readStream.schema(eff.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$work/feed")
      .as[Scd2Op]
      .groupByKey(o => (o.ns, o.doc_key))
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout)(
        scd2Group)
      .writeStream.outputMode("append")
      .option("checkpointLocation", s"$work/ckpt")
      .option("path", s"$work/out")
      .trigger(Trigger.AvailableNow()).format("parquet").start()
    q.awaitTermination()
    s.read.parquet(s"$work/out")
  }

  /** The per-document version machine (see [[runScd2]]). */
  private[graft] def scd2Group(key: (String, String),
      ops: Iterator[Scd2Op],
      state: GroupState[Scd2State]): Iterator[Scd2Row] = {
    var st = if (state.exists) state.get else Scd2State(0L, 0L, 0L, 0.0)
    val out = scala.collection.mutable.ListBuffer.empty[Scd2Row]
    for (o <- ops.toSeq.sortBy(o => (o.ts_packed, o.event_id))) {
      val ver = st.nOps + 1
      if (st.openVer > 0)
        out += Scd2Row(key._1, key._2, st.openVer, st.validFrom,
          o.ts_packed, st.value)
      st =
        if (o.op == "d") Scd2State(ver, 0L, 0L, 0.0)
        else Scd2State(ver, ver, o.ts_packed, o.value)
    }
    state.update(st)
    out.iterator
  }

  /** Dead-letter-queue ingestion — the bad-record pattern every
    * production feed needs: rows whose payload fails schema-on-read
    * (malformed JSON, missing required key — planted deterministically on
    * event_id moduli) route to a QUARANTINE sink with a reason, good rows
    * continue, and NOTHING is dropped silently: the read-back reconciles
    * per (batch, reason) and the oracle replays the same classification
    * closed-form, so a detector that missed a planted corruption (or
    * quarantined a good row) hash-diverges. foreachBatch is the
    * two-sink seam — the same shape the apply path uses; per batch the
    * only work is one codegen'd from_json + two appends.
    */
  private def runQuarantine(s: SparkSession, dir: String): DataFrame = {
    val work = graft.Work.dir("stream_quarantine_q")
    IncrSync.deletePath(s, work)
    // The feed is planted end-to-end: malformed = unparseable prefix,
    // missing_key = valid JSON without `k`, ok = a constructed payload
    // that provably CONTAINS `k`. The ok-arm is synthesized (not the raw
    // corpus props) so the oracle's modulus closed-form and the engine's
    // parse-based detector agree BY CONSTRUCTION — a corpus variant whose
    // props happened to lack `k` must not flip genuine rows to
    // missing_key while the oracle still calls them ok.
    val e = graft.Tables.loadEventsNs(s, dir)
      .select(col("event_id"), expr("ts DIV 1000").as("ts"),
        when(col("event_id") % 13 === 0, lit("{bad"))
          .when(col("event_id") % 17 === 0, lit("{}"))
          .otherwise(concat(lit("{\"k\":"), col("event_id").cast("string"), lit("}")))
          .as("props"))
      .localCheckpoint()
    val mm = e.agg(min(col("ts")), max(col("ts"))).head()
    val (t0, t1) = (mm.getLong(0), mm.getLong(1))
    val (c1, c2) = (t0 + (t1 - t0) / 3, t0 + 2 * (t1 - t0) / 3)
    stageOrdered(s, s"$work/feed", Seq(
      e.filter(col("ts") <= c1).withColumn("b", lit(0L)),
      e.filter(col("ts") > c1 && col("ts") <= c2).withColumn("b", lit(1L)),
      e.filter(col("ts") > c2).withColumn("b", lit(2L))))
    val q = s.readStream.schema(e.withColumn("b", lit(0L)).schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$work/feed")
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        quarantineBatch(batch, batchId, work)
      }
      .option("checkpointLocation", s"$work/ckpt")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    s.read.option("basePath", s"$work/dlq").parquet(s"$work/dlq/batch=*")
      .groupBy(col("b"), col("reason")).agg(count(lit(1)).as("n"))
      .unionByName(s.read.option("basePath", s"$work/good")
        .parquet(s"$work/good/batch=*")
        .groupBy(col("b")).agg(count(lit(1)).as("n"))
        .select(col("b"), lit("ok").as("reason"), col("n")))
  }

  /** PERMISSIVE from_json yields a row of nulls (not a null struct) on a
    * parse failure — the corrupt-record column is the documented way to
    * tell "unparseable" apart from "parsed but the key is absent".
    */
  private val QuarantineSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("k",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("_corrupt_record",
      org.apache.spark.sql.types.StringType)))
  private val QuarantineJsonOpts = Map("mode" -> "PERMISSIVE",
    "columnNameOfCorruptRecord" -> "_corrupt_record")

  /** One quarantine micro-batch (see [[runQuarantine]]). foreachBatch is
    * the AT-LEAST-ONCE seam: a crash after one sink's write and before
    * the offset commit re-runs the whole batch, so plain appends would
    * double-deliver into whichever sink already wrote. BatchId-
    * deterministic OVERWRITE directories make the retry rewrite the same
    * data instead (the standard idempotent-foreachBatch recipe — the
    * same contract TargetWriter keeps for the apply). Retry-idempotency
    * is pinned in StreamingSpec by invoking this twice for one batch.
    */
  private[graft] def quarantineBatch(batch: DataFrame, batchId: Long,
      work: String): Unit = {
    val parsed = batch
      .withColumn("p", from_json(col("props"), QuarantineSchema,
        QuarantineJsonOpts))
      .withColumn("reason",
        when(col("p").isNull || col("p._corrupt_record").isNotNull,
          "malformed")
          .when(col("p.k").isNull, "missing_key"))
    parsed.filter(col("reason").isNotNull)
      .select(col("b"), col("event_id"), col("reason"), col("props"))
      .write.mode("overwrite").parquet(s"$work/dlq/batch=$batchId")
    parsed.filter(col("reason").isNull)
      .select(col("b"), col("event_id"))
      .write.mode("overwrite").parquet(s"$work/good/batch=$batchId")
  }

  case class MviewOp(b: Long, event_type: String, ub: Long, cents: Long)
  case class MviewState(n: Long, c: Long)
  case class MviewRow(b: Long, event_type: String, ub: Long, op: String,
      n: Long, sum_cents: Long)

  /** Streaming materialized view with a RETRACT changelog — the Flink-
    * style upsert/retract stream a downstream consumer (cache, serving
    * index, second aggregation) needs to stay consistent with a
    * continuously-maintained aggregate: each micro-batch emits, per
    * TOUCHED key, a '-' row retracting the previous (count, sum) and a
    * '+' row asserting the new one. State is exactly one (n, c) pair per
    * key (the current view row — never batch history), and the changelog
    * volume is O(keys touched per batch). Batch boundaries are the
    * deterministic staged thirds, so the full changelog — not just the
    * final view — is oracle-checkable: the '+' stream at each key's last
    * batch IS the view, and replaying +/− deltas telescopes to it.
    */
  private def runMviewDelta(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val work = graft.Work.dir("stream_mview_delta_q")
    IncrSync.deletePath(s, work)
    val e = graft.Tables.loadEventsNs(s, dir)
      .select(expr("ts DIV 1000").as("ts"), col("event_type"),
        (col("user_id") % 10).as("ub"),
        expr("cast(round(value * 100) as bigint)").as("cents"))
      .localCheckpoint()
    val mm = e.agg(min(col("ts")), max(col("ts"))).head()
    val (t0, t1) = (mm.getLong(0), mm.getLong(1))
    val (c1, c2) = (t0 + (t1 - t0) / 3, t0 + 2 * (t1 - t0) / 3)
    stageOrdered(s, s"$work/feed", Seq(
      e.filter(col("ts") <= c1).withColumn("b", lit(0L)),
      e.filter(col("ts") > c1 && col("ts") <= c2).withColumn("b", lit(1L)),
      e.filter(col("ts") > c2).withColumn("b", lit(2L))))
    val q = s.readStream.schema(e.withColumn("b", lit(0L)).schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$work/feed")
      .select(col("b"), col("event_type"), col("ub"), col("cents"))
      .as[MviewOp]
      .groupByKey(o => (o.event_type, o.ub))
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout)(
        mviewGroup)
      .writeStream.outputMode("append")
      .option("checkpointLocation", s"$work/ckpt")
      .option("path", s"$work/out")
      .trigger(Trigger.AvailableNow()).format("parquet").start()
    q.awaitTermination()
    s.read.parquet(s"$work/out")
  }

  /** Per-key view maintenance (see [[runMviewDelta]]): retract the old
    * aggregate, fold the batch delta, assert the new one. Every staged
    * row in one invocation carries the same batch marker (file-per-
    * trigger), so the emitted rows are stamped with it.
    */
  private[graft] def mviewGroup(key: (String, Long), ops: Iterator[MviewOp],
      state: GroupState[MviewState]): Iterator[MviewRow] = {
    val rows = ops.toSeq
    val b = rows.map(_.b).max
    val dn = rows.size.toLong
    val dc = rows.map(_.cents).sum
    val out = scala.collection.mutable.ListBuffer.empty[MviewRow]
    if (state.exists) {
      val st = state.get
      out += MviewRow(b, key._1, key._2, "-", st.n, st.c)
      state.update(MviewState(st.n + dn, st.c + dc))
    } else {
      state.update(MviewState(dn, dc))
    }
    val st = state.get
    out += MviewRow(b, key._1, key._2, "+", st.n, st.c)
    out.iterator
  }

  /** LIVE distribution-drift monitor — pipe_drift_monitor's shift gate
    * on the ingest stream itself: batch 0 freezes the language-share
    * baseline, every later micro-batch compares its own shares (integer
    * ppm) against it and emits one row per (batch, lang) with the
    * alert verdict (|Δ| > 3%). foreachBatch is the engine-idiomatic
    * seam (the same two-phase shape IncrSync's apply uses): the
    * per-batch aggregate is |langs| rows, the baseline a |langs|-row
    * table — nothing here scales with batch size except the one
    * codegen'd groupBy.
    */
  private def runDriftAlert(s: SparkSession, dir: String): DataFrame = {
    val work = graft.Work.dir("stream_drift_alert_q")
    IncrSync.deletePath(s, work)
    val d = s.read.parquet(s"$dir/documents.parquet").select(col("doc_id"), col("lang"))
      .localCheckpoint()
    val b = d.agg(min(col("doc_id")), max(col("doc_id"))).head()
    val (d0, d1) = (b.getLong(0), b.getLong(1))
    val (c1, c2) = (d0 + (d1 - d0) / 3, d0 + 2 * (d1 - d0) / 3)
    stageOrdered(s, s"$work/feed", Seq(
      d.filter(col("doc_id") <= c1),
      d.filter(col("doc_id") > c1 && col("doc_id") <= c2),
      d.filter(col("doc_id") > c2)))

    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("lang",
        org.apache.spark.sql.types.StringType)))
    val q = s.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$work/feed")
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val agg = batch.groupBy(col("lang")).agg(count(lit(1)).as("n"))
        val tot = agg.agg(sum(col("n"))).head().getLong(0)
        val ppm = agg.select(col("lang"),
          expr(s"n * 1000000 DIV ${tot}L").as("cur_ppm"))
        // batchId-deterministic overwrite targets: foreachBatch is
        // at-least-once, and a retried batch must rewrite its own output,
        // not append a second copy (same recipe as quarantineBatch)
        if (batchId == 0L) {
          ppm.select(col("lang"), col("cur_ppm").as("base_ppm"))
            .write.mode("overwrite").parquet(s"$work/baseline")
        } else {
          val base = s.read.parquet(s"$work/baseline")
          ppm.join(base, Seq("lang"), "left_outer")
            .select(lit(batchId).as("batch_seq"), col("lang"),
              coalesce(col("base_ppm"), lit(0L)).as("base_ppm"),
              col("cur_ppm"),
              (col("cur_ppm") - coalesce(col("base_ppm"), lit(0L)))
                .as("delta_ppm"))
            .withColumn("alert", abs(col("delta_ppm")) > 30000L)
            .write.mode("overwrite").parquet(s"$work/out/batch=$batchId")
        }
        ()
      }
      .option("checkpointLocation", s"$work/ckpt")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    s.read.option("basePath", s"$work/out").parquet(s"$work/out/batch=*")
      .drop("batch")
  }

  case class FieldSighting(ns: String, field: String, ts_us: Long)
  case class AlertSent(sent: Boolean)
  case class SchemaAlert(ns: String, field: String, first_seen_us: Long,
    baseline: Boolean)

  /** LIVE schema-change alerts — cdc_schema_registry's first-sighting
    * rows as a continuous stream: each (ns, field) pair fires exactly
    * ONE alert, in the micro-batch where the field first appears, with
    * its true first-seen timestamp (the feed is time-staged, so the
    * batch-local min IS the global min) and a baseline flag separating
    * the initial schema (first tercile of the corpus) from genuine
    * mid-stream drift. State = one boolean per (ns, field) — the state
    * store holds the REGISTRY, so it is schema-sized by construction
    * (|namespaces|×|fields|), never corpus-sized: the stateful operator
    * whose memory a 100 TB deployment never has to think about.
    */
  private def runSchemaAlert(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val work = graft.Work.dir("stream_schema_alert_q")
    IncrSync.deletePath(s, work)
    val eff = Cdc.withBody(Oplog.fromEvents(s, dir)
        .filter(OplogFilters.chain(gids, white, black))
        .filter(col("op").isin("i", "u")))
      .select(col("ns"), col("ts_us"),
        explode(json_object_keys(col("body"))).as("field"))
      .localCheckpoint()
    val b = eff.agg(min(col("ts_us")), max(col("ts_us"))).head()
    val (t0, t1) = (b.getLong(0), b.getLong(1))
    val c1 = t0 + (t1 - t0) / 3
    val c2 = t0 + 2 * (t1 - t0) / 3
    stageOrdered(s, s"$work/feed", Seq(
      eff.filter(col("ts_us") <= c1),
      eff.filter(col("ts_us") > c1 && col("ts_us") <= c2),
      eff.filter(col("ts_us") > c2)))

    val q = s.readStream.schema(eff.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$work/feed")
      .as[FieldSighting]
      .groupByKey(r => (r.ns, r.field))
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout)(
        (key: (String, String), rows: Iterator[FieldSighting],
            state: GroupState[AlertSent]) => {
          if (state.exists) Iterator.empty
          else {
            state.update(AlertSent(true))
            val first = rows.map(_.ts_us).min
            Iterator.single(SchemaAlert(key._1, key._2, first, first <= c1))
          }
        })
      .writeStream.outputMode("append")
      .option("checkpointLocation", s"$work/ckpt")
      .option("path", s"$work/out")
      .trigger(Trigger.AvailableNow()).format("parquet").start()
    q.awaitTermination()
    s.read.parquet(s"$work/out")
  }

  case class AsofRow(event_id: Long, user_id: Long, kind: String,
    ts_us: Long, cents: Long)
  /** `hasDim = false` means no dimension version has arrived yet (the
    * dim fields are then meaningless — event_id 0 is a real event). */
  case class AsofState(hasDim: Boolean, dimEvent: Long, dimTs: Long,
    dimCents: Long)
  case class AsofHit(purchase_event: Long, user_id: Long, ts_us: Long,
    cents: Long, asof_signup_event: Option[Long],
    asof_signup_cents: Option[Long])

  /** Temporal (AS-OF) enrichment in streaming — each fact row picks the
    * dimension version in force AT its event time (the q14_asof_join
    * semantics, live): Structured Streaming has no native as-of join, so
    * dimension updates (signups = tier changes) and facts (purchases)
    * ride ONE keyed stream through `flatMapGroupsWithState`, the state
    * is the key's LATEST dimension version — three longs, O(1), never a
    * version history — and a fact emits with whatever version the state
    * holds. Within a batch the per-key slice sorts by (ts, event_id) so
    * a same-batch dim-then-fact pair enriches correctly; across batches
    * the ts-split feed guarantees version order, and the midpoint split
    * proves batch-2 purchases enrich from batch-1 signups out of the
    * state store. Facts before any version emit NULL — visible, never
    * dropped.
    */
  private def runAsofEnrich(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val work = graft.Work.dir(s"stream_asof_q")
    IncrSync.deletePath(s, work)
    val ev = graft.Tables.loadEventsNs(s, dir)
      .filter(col("event_type").isin("signup", "purchase"))
      .select(col("event_id"), col("user_id"),
        when(col("event_type") === "signup", "dim").otherwise("fact").as("kind"),
        expr("ts DIV 1000").as("ts_us"),
        expr("cast(round(value * 100) as bigint)").as("cents"))
      .localCheckpoint()
    val b = ev.agg(min(col("ts_us")), max(col("ts_us"))).head()
    val tcut = b.getLong(0) + (b.getLong(1) - b.getLong(0)) / 2
    stageOrdered(s, s"$work/feed", Seq(
      ev.filter(col("ts_us") <= tcut), ev.filter(col("ts_us") > tcut)))

    val q = s.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$work/feed")
      .as[AsofRow]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout)(
        asofGroup)
      .writeStream.outputMode("append")
      .option("checkpointLocation", s"$work/ckpt")
      .option("path", s"$work/out")
      .trigger(Trigger.AvailableNow()).format("parquet").start()
    q.awaitTermination()
    s.read.parquet(s"$work/out")
  }

  /** The per-user latest-version machine (see [[runAsofEnrich]]). */
  private[graft] def asofGroup(uid: Long, rows: Iterator[AsofRow],
      state: GroupState[AsofState]): Iterator[AsofHit] = {
    // presence is an explicit flag, not an event_id sentinel — event_id
    // 0 is a real id in the fixtures and must enrich like any other
    var st = if (state.exists) state.get else AsofState(false, 0L, 0L, 0L)
    val out = scala.collection.mutable.ListBuffer.empty[AsofHit]
    for (r <- rows.toSeq.sortBy(r => (r.ts_us, r.event_id))) {
      if (r.kind == "dim") st = AsofState(true, r.event_id, r.ts_us, r.cents)
      else out += AsofHit(r.event_id, uid, r.ts_us, r.cents,
        if (st.hasDim) Some(st.dimEvent) else None,
        if (st.hasDim) Some(st.dimCents) else None)
    }
    state.update(st)
    out.iterator
  }

  case class AnomEvent(event_id: Long, event_type: String, ts_us: Long,
    cents: Long)
  case class AnomState(n: Long, sumCents: Long)
  case class AnomHit(event_id: Long, event_type: String, ts_us: Long,
    cents: Long, n_prev: Long, sum_prev: Long)

  /** Streaming anomaly detection against a RUNNING baseline — the monitor
    * a live change-feed deployment runs beside the sync (the reference
    * surfaces raw rates via `/repl` and leaves thresholding to the
    * operator; here the threshold learns online): per event_type, flag an
    * event whose value exceeds 3× the running mean of everything BEFORE
    * it. State is two longs per key — (count, sum of cents) — O(1)
    * regardless of stream length, and the comparison is cross-multiplied
    * integer math (`cents·n > 3·sum`, no division, no float drift), so
    * the flag matches the oracle's closed-form prefix window exactly.
    * The feed splits at the ts midpoint so the baseline provably carries
    * across a trigger boundary; within a batch the fold sorts its per-key
    * slice (bounded by per-key-per-trigger volume). At deployment scale
    * the key would be (entity, metric) — a wide key space — and the
    * state bound stays two longs per live key.
    */
  private def runAnomaly(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val work = graft.Work.dir(s"stream_anomaly_q")
    IncrSync.deletePath(s, work)
    val ev = graft.Tables.loadEventsNs(s, dir)
      .select(col("event_id"), col("event_type"),
        expr("ts DIV 1000").as("ts_us"),
        expr("cast(round(value * 100) as bigint)").as("cents"))
      .localCheckpoint()
    val bounds = ev.agg(min(col("ts_us")), max(col("ts_us"))).head()
    val tcut = bounds.getLong(0) + (bounds.getLong(1) - bounds.getLong(0)) / 2
    stageOrdered(s, s"$work/feed", Seq(
      ev.filter(col("ts_us") <= tcut), ev.filter(col("ts_us") > tcut)))

    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("event_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("event_type",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("ts_us",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("cents",
        org.apache.spark.sql.types.LongType)))
    val q = s.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$work/feed")
      .as[AnomEvent]
      .groupByKey(_.event_type)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout)(
        anomalyGroup)
      .writeStream.outputMode("append")
      .option("checkpointLocation", s"$work/ckpt")
      .option("path", s"$work/out")
      .trigger(Trigger.AvailableNow()).format("parquet").start()
    q.awaitTermination()
    s.read.parquet(s"$work/out")
  }

  /** The per-key baseline fold (see [[runAnomaly]]): warmup of 20
    * observations before any flag, strict prefix semantics (the flagged
    * event does not count toward its own baseline — it joins AFTER).
    */
  private[graft] def anomalyGroup(key: String, events: Iterator[AnomEvent],
      state: GroupState[AnomState]): Iterator[AnomHit] = {
    var st = if (state.exists) state.get else AnomState(0L, 0L)
    val out = scala.collection.mutable.ListBuffer.empty[AnomHit]
    for (e <- events.toSeq.sortBy(e => (e.ts_us, e.event_id))) {
      if (st.n >= 20 && e.cents * st.n > 3L * st.sumCents)
        out += AnomHit(e.event_id, key, e.ts_us, e.cents, st.n, st.sumCents)
      st = AnomState(st.n + 1, st.sumCents + e.cents)
    }
    state.update(st)
    out.iterator
  }

  /** G7's queryable metrics surface (`common/metric.go:43-52,87-200`): run
    * the real `IncrSync.startOplog` over the UNFILTERED corpus feed with a
    * [[graft.metrics.MetricsRecorder]] attached; the listener writes one
    * `_metrics` row per batch alongside `_ckpt`. The query returns the
    * run's deterministic totals — per-op delivered counts, traffic bytes,
    * newest LSN, and the filter-drop count (`n_raw - n_kept`, the chain
    * dropping noops, foreign gids, system DBs, and blacklisted
    * namespaces) — summed over batches so the result is independent of
    * trigger batching. Rates (TPS) are quotients for the consumer, never
    * stored numbers.
    */
  private def runMetrics(s: SparkSession, dir: String): DataFrame = {
    val work = graft.Work.dir(s"metrics_q")
    IncrSync.deletePath(s, work)
    // the WHOLE corpus — the engine's own filter chain does the dropping
    feedify(Oplog.fromEvents(s, dir)).coalesce(1).write.parquet(s"$work/feed")
    val rec = new graft.metrics.MetricsRecorder(s, s"$work/target/_metrics")
    s.streams.addListener(rec)
    try {
      val q = IncrSync.startOplog(s, s"$work/feed", s"$work/target", s"$work/ckpt",
        gids = gids, white = white, black = black, txnTtlMs = 0, nBuckets = 16)
      q.awaitTermination()
      rec.write(q.runId.toString)
    } finally s.streams.removeListener(rec)
    s.read.parquet(s"$work/target/_metrics").agg(
      sum(col("n_raw")).as("n_raw"),
      sum(col("n_kept")).as("n_kept"),
      (sum(col("n_raw")) - sum(col("n_kept"))).as("n_filtered"),
      sum(col("n_insert")).as("n_insert"),
      sum(col("n_update")).as("n_update"),
      sum(col("n_delete")).as("n_delete"),
      sum(col("n_command")).as("n_command"),
      sum(col("n_noop")).as("n_noop"),
      sum(col("traffic_bytes")).as("traffic_bytes"),
      max(col("lsn_newest")).as("lsn_newest"))
  }

  private val chainSql: String = Oplog.oracleChainSql

  def oracles: Map[String, String] = Map(
    // Closed form of the staged watermark run: windows ending at or
    // below (global max − 1 h), counting only upper-half (batch 1) rows.
    "stream_window_late" ->
      """WITH e AS (SELECT event_id, epoch_ns(ts)//1000 AS ts_us FROM events),
          tt AS (SELECT tmin + (tmax - tmin) // 2 AS tmid,
                        tmax - 3600000000 AS wm
                 FROM (SELECT MIN(ts_us) AS tmin, MAX(ts_us) AS tmax FROM e)),
          up AS (SELECT event_id, ts_us,
                   ts_us - ts_us % 86400000000 AS w_start
                 FROM e, tt WHERE ts_us > tmid)
          SELECT w_start, COUNT(*) AS n_events,
            MIN(event_id) AS min_event, MAX(event_id) AS max_event
          FROM up, tt
          WHERE w_start + 86400000000 <= wm
          GROUP BY w_start""",

    // Identical closed form to stream_window_late — each event counted
    // ONCE. The feed redelivers every third event; only the chained
    // dedup state makes this oracle hold.
    "stream_chained" ->
      """WITH e AS (SELECT event_id, epoch_ns(ts)//1000 AS ts_us FROM events),
          tt AS (SELECT tmin + (tmax - tmin) // 2 AS tmid,
                        tmax - 3600000000 AS wm
                 FROM (SELECT MIN(ts_us) AS tmin, MAX(ts_us) AS tmax FROM e)),
          up AS (SELECT event_id, ts_us,
                   ts_us - ts_us % 86400000000 AS w_start
                 FROM e, tt WHERE ts_us > tmid)
          SELECT w_start, COUNT(*) AS n_events,
            MIN(event_id) AS min_event, MAX(event_id) AS max_event
          FROM up, tt
          WHERE w_start + 86400000000 <= wm
          GROUP BY w_start""",

    // Emitted windows ≡ stream_window_late's closed form; the rank tier
    // is a plain batch window over the (w_start, event_type) counts.
    "stream_topk" ->
      """WITH e AS (SELECT event_id, event_type, epoch_ns(ts)//1000 AS ts_us FROM events),
          tt AS (SELECT tmin + (tmax - tmin) // 2 AS tmid,
                        tmax - 3600000000 AS wm
                 FROM (SELECT MIN(ts_us) AS tmin, MAX(ts_us) AS tmax FROM e)),
          up AS (SELECT event_type, ts_us,
                   ts_us - ts_us % 86400000000 AS w_start
                 FROM e, tt WHERE ts_us > tmid),
          counts AS (
            SELECT w_start, event_type, COUNT(*) AS n
            FROM up, tt WHERE w_start + 86400000000 <= wm
            GROUP BY 1, 2)
          SELECT w_start, rank, event_type, n FROM (
            SELECT w_start, event_type, n,
              ROW_NUMBER() OVER (PARTITION BY w_start
                ORDER BY n DESC, event_type) AS rank
            FROM counts)
          WHERE rank <= 3""",

    // Drained inner stream-stream join ≡ the batch join, closed form.
    "stream_join" ->
      """WITH e AS (SELECT event_id, user_id, epoch_ns(ts)//1000 AS ts_us FROM events),
          a AS (SELECT * FROM e WHERE event_id % 2 = 0),
          b AS (SELECT * FROM e WHERE event_id % 2 = 1)
          SELECT a.event_id AS view_event, b.event_id AS buy_event,
            a.user_id, b.ts_us - a.ts_us AS lag_us
          FROM a JOIN b ON a.user_id = b.user_id
            AND b.ts_us >= a.ts_us AND b.ts_us <= a.ts_us + 3600000000""",

    // Matched pairs ≡ the inner join; plus one null row per view whose
    // state-eviction bound (v_ts + 1h) fell below the final global
    // watermark (min of both sides' max event time, − 1h). Open-window
    // views emit nothing.
    "stream_join_outer" ->
      """WITH e AS (SELECT event_id, user_id, epoch_ns(ts)//1000 AS ts_us FROM events),
          a AS (SELECT * FROM e WHERE event_id % 2 = 0),
          b AS (SELECT * FROM e WHERE event_id % 2 = 1),
          wm AS (SELECT LEAST((SELECT MAX(ts_us) FROM a),
                              (SELECT MAX(ts_us) FROM b)) - 3600000000 AS w),
          matched AS (
            SELECT a.event_id AS view_event, b.event_id AS buy_event,
              a.user_id, a.ts_us, b.ts_us - a.ts_us AS lag_us
            FROM a JOIN b ON a.user_id = b.user_id
              AND b.ts_us >= a.ts_us AND b.ts_us <= a.ts_us + 3600000000)
          SELECT view_event, buy_event, user_id, lag_us FROM matched
          UNION ALL
          SELECT a.event_id, CAST(NULL AS BIGINT), a.user_id, CAST(NULL AS BIGINT)
          FROM a, wm
          WHERE a.ts_us + 3600000000 < wm.w
            AND NOT EXISTS (SELECT 1 FROM matched m WHERE m.view_event = a.event_id)""",

    // Every real session closes under the sentinel-raised watermark, so
    // the drained stream ≡ plain gap sessionization. STRICT `>` pins
    // Spark's session_window boundary: a gap of exactly 30 min MERGES
    // (windows [t, t+gap) and [t+gap, …) are adjacent and Spark merges
    // adjacency — RelationalJoinSpec goldens this; `>=` here diverges on
    // exact-boundary data even though random µs corpora never hit it).
    "stream_sessionize" ->
      """WITH e AS (SELECT user_id, event_id, epoch_ns(ts)//1000 AS ts FROM events),
          m AS (SELECT *,
              CASE WHEN lag(ts) OVER w IS NULL OR ts - lag(ts) OVER w > 1800000000
                   THEN 1 ELSE 0 END AS new_sess
            FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
          sq AS (SELECT *,
              SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                ROWS UNBOUNDED PRECEDING) AS sess_seq
            FROM m)
          SELECT user_id, MIN(ts) AS ts_start, MAX(ts) AS ts_end,
            COUNT(*) AS n_events
          FROM sq GROUP BY user_id, sess_seq""",

    // Suppressed in-horizon re-deliveries ⇒ the drained stream is the
    // distinct corpus, verbatim.
    "stream_dedup_wm" ->
      """SELECT event_id, user_id, epoch_ns(ts)//1000 AS ts FROM events""",

    // Stateless stream-static join: the drained append stream ≡ the
    // batch join, verbatim.
    "stream_enrich" ->
      """SELECT e.event_id, e.user_id, e.event_type, c.c_mktsegment, c.c_nationkey
         FROM events e JOIN customer c ON e.user_id = c.c_custkey
         WHERE c.c_mktsegment <> 'BUILDING'""",

    // Drained left-semi stream-stream join ≡ the batch EXISTS, closed form.
    "stream_join_semi" ->
      """WITH e AS (SELECT event_id, user_id, epoch_ns(ts)//1000 AS ts_us FROM events),
          v AS (SELECT * FROM e WHERE event_id % 2 = 0),
          b AS (SELECT * FROM e WHERE event_id % 2 = 1)
          SELECT v.event_id AS view_event, v.user_id, v.ts_us AS ts_view
          FROM v
          WHERE EXISTS (SELECT 1 FROM b
            WHERE b.user_id = v.user_id
              AND b.ts_us >= v.ts_us AND b.ts_us <= v.ts_us + 3600000000)""",

    // The auto-sizing formula re-derived closed-form: smallest power of
    // two p >= 8 with p*p*6400 >= max side volume (integer-exact scan,
    // no float sqrt), capped at 4096.
    "stream_join_autosize" ->
      """WITH sides AS (
           SELECT CAST(SUM(CASE WHEN event_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_views,
                  CAST(SUM(CASE WHEN event_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_buys
           FROM events),
         cand AS (SELECT CAST(UNNEST([8,16,32,64,128,256,512,1024,2048,4096])
                    AS BIGINT) AS p),
         pick AS (SELECT CAST(COALESCE(MIN(p), 4096) AS BIGINT) AS parts
                  FROM cand, sides
                  WHERE p * p * 6400 >= GREATEST(n_views, n_buys))
         SELECT n_views, n_buys, parts FROM sides, pick""",

    // Closed form of the greedy sequence machine: first view, first click
    // strictly after it, first purchase strictly after that (row-value
    // comparison breaks equal-timestamp ties on event_id, exactly the
    // machine's `after` guard).
    // Closed form of the loss reconciliation: delivered = corpus + the
    // filler re-delivery (rows at exactly tmax); emitted windows are
    // stream_window_late's; the gap is everything the watermark retained
    // (open windows, filler included) or dropped (the late lower half).
    "stream_late_audit" ->
      """WITH e AS (SELECT event_id, epoch_ns(ts)//1000 AS ts_us FROM events),
          tt AS (SELECT tmin + (tmax - tmin) // 2 AS tmid,
                        tmax - 3600000000 AS wm, tmax
                 FROM (SELECT MIN(ts_us) AS tmin, MAX(ts_us) AS tmax FROM e)),
          up AS (SELECT ts_us - ts_us % 86400000000 AS w_start
                 FROM e, tt WHERE ts_us > tmid),
          emitted AS (SELECT w_start, COUNT(*) AS n FROM up, tt
                      WHERE w_start + 86400000000 <= wm GROUP BY w_start),
          delivered AS (
            SELECT (SELECT COUNT(*) FROM e)
              + (SELECT COUNT(*) FROM e, tt WHERE ts_us = tmax) AS d)
          SELECT (SELECT d FROM delivered) AS n_delivered,
            (SELECT COUNT(*) FROM emitted) AS n_windows_emitted,
            CAST((SELECT COALESCE(SUM(n), 0) FROM emitted) AS BIGINT)
              AS n_events_emitted,
            (SELECT d FROM delivered)
              - CAST((SELECT COALESCE(SUM(n), 0) FROM emitted) AS BIGINT)
              AS n_retained_or_dropped""",

    // The as-of closed form: per purchase, the latest same-user signup
    // strictly before it in (ts, event_id) order; no-version purchases
    // surface with NULLs.
    "stream_asof_enrich" ->
      """WITH e AS (SELECT event_id, user_id, event_type,
              epoch_ns(ts)//1000 AS ts_us,
              CAST(round(value * 100) AS BIGINT) AS cents FROM events
            WHERE event_type IN ('signup', 'purchase')),
          f AS (SELECT * FROM e WHERE event_type = 'purchase'),
          d AS (SELECT * FROM e WHERE event_type = 'signup'),
          j AS (
            SELECT f.event_id AS purchase_event, f.user_id, f.ts_us, f.cents,
              d.event_id AS s_event, d.cents AS s_cents,
              ROW_NUMBER() OVER (PARTITION BY f.event_id
                ORDER BY d.ts_us DESC, d.event_id DESC) AS rn
            FROM f JOIN d ON d.user_id = f.user_id
              AND (d.ts_us < f.ts_us
                OR (d.ts_us = f.ts_us AND d.event_id < f.event_id)))
          SELECT purchase_event, user_id, ts_us, cents,
            s_event AS asof_signup_event, s_cents AS asof_signup_cents
          FROM j WHERE rn = 1
          UNION ALL
          SELECT event_id, user_id, ts_us, cents,
            CAST(NULL AS BIGINT), CAST(NULL AS BIGINT)
          FROM f
          WHERE NOT EXISTS (SELECT 1 FROM d
            WHERE d.user_id = f.user_id
              AND (d.ts_us < f.ts_us
                OR (d.ts_us = f.ts_us AND d.event_id < f.event_id)))""",

    // The batch SCD2 fold's CLOSED rows — open versions are state, not
    // output (see runScd2).
    "stream_scd2" -> Oplog.withOracleCte(
      s"""SELECT ns, doc_key, version, valid_from, valid_to, value
          FROM (
            SELECT ns, doc_key, op, value,
              ROW_NUMBER() OVER w AS version,
              ts_packed AS valid_from,
              LEAD(ts_packed) OVER w AS valid_to
            FROM oplog WHERE $chainSql AND op IN ('i','u','d')
            WINDOW w AS (PARTITION BY ns, doc_key
              ORDER BY ts_packed, event_id))
          WHERE op <> 'd' AND valid_to IS NOT NULL"""),

    // Closed form of the one-alert-per-field stream: global first
    // sighting per (ns, field) under the body convention (see
    // Cdc.withBody), baseline = first tercile of the corpus timeline.
    "stream_schema_alert" -> Oplog.withOracleCte(
      s""", eff AS (
            SELECT ns, ts_us, event_id FROM oplog
            WHERE $chainSql AND op IN ('i','u')),
          b AS (SELECT MIN(ts_us) AS t0, MAX(ts_us) AS t1 FROM eff),
          fields AS (
            SELECT ns, ts_us, '_id' AS field FROM eff
            UNION ALL SELECT ns, ts_us, 'k' FROM eff
            UNION ALL SELECT ns, ts_us, 'cents' FROM eff WHERE event_id % 3 = 0
            UNION ALL SELECT ns, ts_us, 'src' FROM eff WHERE event_id % 7 = 0),
          first AS (
            SELECT ns, field, MIN(ts_us) AS first_seen_us
            FROM fields GROUP BY 1, 2)
          SELECT ns, field, first_seen_us,
            first_seen_us <= t0 + (t1 - t0) // 3 AS baseline
          FROM first, b"""),

    // Closed form of the DLQ classification: the corruption is planted on
    // event_id moduli, so the oracle classifies arithmetically what the
    // engine must detect by actually parsing the payload.
    "stream_quarantine" ->
      """WITH e AS (SELECT event_id, epoch_ns(ts)//1000 AS ts FROM events),
          mm AS (SELECT MIN(ts) AS t0, MAX(ts) AS t1 FROM e),
          eb AS (
            SELECT event_id,
              CASE WHEN ts <= t0 + (t1 - t0) // 3 THEN 0
                   WHEN ts <= t0 + 2 * (t1 - t0) // 3 THEN 1
                   ELSE 2 END AS b
            FROM e, mm)
          SELECT CAST(b AS BIGINT) AS b,
            CASE WHEN event_id % 13 = 0 THEN 'malformed'
                 WHEN event_id % 17 = 0 THEN 'missing_key'
                 ELSE 'ok' END AS reason,
            COUNT(*) AS n
          FROM eb GROUP BY 1, 2""",

    // Closed form of the retract changelog: per (key, staged third), the
    // '+' row is the cumulative (count, cents) through that third and the
    // '-' row (from the second appearance on) the cumulative before it.
    "stream_mview_delta" ->
      """WITH e AS (SELECT event_type, user_id % 10 AS ub,
              CAST(round(value * 100) AS BIGINT) AS cents,
              epoch_ns(ts)//1000 AS ts FROM events),
          mm AS (SELECT MIN(ts) AS t0, MAX(ts) AS t1 FROM e),
          eb AS (
            SELECT event_type, ub, cents,
              CASE WHEN ts <= t0 + (t1 - t0) // 3 THEN 0
                   WHEN ts <= t0 + 2 * (t1 - t0) // 3 THEN 1
                   ELSE 2 END AS b
            FROM e, mm),
          per AS (
            SELECT event_type, ub, b, COUNT(*) AS dn,
              CAST(SUM(cents) AS BIGINT) AS dc
            FROM eb GROUP BY 1, 2, 3),
          cum AS (
            SELECT event_type, ub, b, dn, dc,
              SUM(dn) OVER w AS n_new, SUM(dc) OVER w AS c_new,
              ROW_NUMBER() OVER w AS rn
            FROM per WINDOW w AS (PARTITION BY event_type, ub ORDER BY b
              ROWS UNBOUNDED PRECEDING))
          SELECT CAST(b AS BIGINT) AS b, event_type, ub, '+' AS op,
            CAST(n_new AS BIGINT) AS n, CAST(c_new AS BIGINT) AS sum_cents
          FROM cum
          UNION ALL
          SELECT CAST(b AS BIGINT), event_type, ub, '-',
            CAST(n_new - dn AS BIGINT), CAST(c_new - dc AS BIGINT)
          FROM cum WHERE rn > 1""",

    // Closed form of the baseline-vs-batch share comparison: the corpus
    // split at its doc_id terciles, shares in integer ppm per tercile,
    // terciles 1-2 compared against tercile 0.
    "stream_drift_alert" ->
      """WITH b AS (SELECT MIN(doc_id) AS d0, MAX(doc_id) AS d1 FROM documents),
          t AS (
            SELECT lang,
              CASE WHEN doc_id <= d0 + (d1 - d0) // 3 THEN 0
                   WHEN doc_id <= d0 + 2 * (d1 - d0) // 3 THEN 1
                   ELSE 2 END AS f
            FROM documents, b),
          s AS (
            SELECT f, lang, CAST(COUNT(*) AS BIGINT) AS n,
              CAST(SUM(COUNT(*)) OVER (PARTITION BY f) AS BIGINT) AS tot
            FROM t GROUP BY 1, 2),
          p AS (SELECT f, lang, CAST(n * 1000000 // tot AS BIGINT) AS ppm FROM s),
          base AS (SELECT lang, ppm AS base_ppm FROM p WHERE f = 0)
          SELECT CAST(c.f AS BIGINT) AS batch_seq, c.lang,
            COALESCE(bb.base_ppm, CAST(0 AS BIGINT)) AS base_ppm,
            c.ppm AS cur_ppm,
            c.ppm - COALESCE(bb.base_ppm, CAST(0 AS BIGINT)) AS delta_ppm,
            abs(c.ppm - COALESCE(bb.base_ppm, CAST(0 AS BIGINT))) > 30000 AS alert
          FROM p c LEFT JOIN base bb USING (lang) WHERE c.f > 0""",

    // Closed form of the running-baseline flag: a strict-prefix window
    // per event_type, the same integer cross-multiplied comparison.
    "stream_anomaly" ->
      """WITH e AS (SELECT event_id, event_type,
              epoch_ns(ts)//1000 AS ts_us,
              CAST(round(value * 100) AS BIGINT) AS cents FROM events),
          p AS (SELECT event_id, event_type, ts_us, cents,
              COUNT(*) OVER w AS n_prev,
              CAST(COALESCE(SUM(cents) OVER w, 0) AS BIGINT) AS sum_prev
            FROM e WINDOW w AS (PARTITION BY event_type
              ORDER BY ts_us, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
          SELECT event_id, event_type, ts_us, cents, n_prev, sum_prev
          FROM p WHERE n_prev >= 20 AND cents * n_prev > 3 * sum_prev""",

    "stream_pattern" ->
      """WITH e AS (SELECT event_id, user_id, event_type,
              epoch_ns(ts)//1000 AS ts_us FROM events
            WHERE event_type IN ('view', 'click', 'purchase')),
          v AS (SELECT user_id, ts_us AS ts_view, event_id AS view_event FROM (
              SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                ORDER BY ts_us, event_id) AS rn
              FROM e WHERE event_type = 'view') WHERE rn = 1),
          c AS (SELECT user_id, ts_us AS ts_click, event_id AS click_event FROM (
              SELECT e.*, ROW_NUMBER() OVER (PARTITION BY e.user_id
                ORDER BY e.ts_us, e.event_id) AS rn
              FROM e JOIN v USING (user_id)
              WHERE e.event_type = 'click'
                AND (e.ts_us, e.event_id) > (v.ts_view, v.view_event))
            WHERE rn = 1),
          p AS (SELECT user_id, ts_us AS ts_purchase, event_id AS purchase_event FROM (
              SELECT e.*, ROW_NUMBER() OVER (PARTITION BY e.user_id
                ORDER BY e.ts_us, e.event_id) AS rn
              FROM e JOIN c USING (user_id)
              WHERE e.event_type = 'purchase'
                AND (e.ts_us, e.event_id) > (c.ts_click, c.click_event))
            WHERE rn = 1)
          SELECT user_id, view_event, ts_view, click_event, ts_click,
            purchase_event, ts_purchase
          FROM v JOIN c USING (user_id) JOIN p USING (user_id)""",

    "cdc_soak_live" -> Oplog.withOracleCte(
      s""", eff AS (
            SELECT event_id, ts_packed, op, ns, doc_key, value
            FROM oplog WHERE $chainSql AND op IN ('i','u','d')),
          tt AS (
            SELECT tmin + (tmax - tmin) // 3 AS t1,
                   tmin + 2 * ((tmax - tmin) // 3) AS t2,
                   tmax + 1000 AS t_sent
            FROM (SELECT MIN(ts_packed) AS tmin, MAX(ts_packed) AS tmax FROM eff)),
          mem AS (
            SELECT *,
              ROW_NUMBER() OVER (PARTITION BY doc_key
                ORDER BY ts_packed, event_id) - 1 AS rn,
              COUNT(*) OVER (PARTITION BY doc_key) AS n,
              MAX(ts_packed) OVER (PARTITION BY doc_key) AS commit_ts,
              CAST(doc_key AS BIGINT) % 3 = 0 AS orphan
            FROM eff WHERE event_id % 10 = 0),
          -- delivered rows with their delivery batch: plain time-split
          -- into batches 1/2/4; cross chains emit whole on commit (batch
          -- 2, T3 ts patch); orphans purge — the late commit releases
          -- only its own op (batch 4); the sentinel is batch 3
          applied AS (
            SELECT event_id, op, ns, doc_key, value, ts_packed AS ts_eff,
              CASE WHEN ts_packed <= t1 THEN 1
                   WHEN ts_packed <= t2 THEN 2 ELSE 4 END AS bat
            FROM eff, tt WHERE event_id % 10 <> 0
            UNION ALL
            SELECT event_id, op, ns, doc_key, value,
              CASE WHEN rn = n - 1 THEN commit_ts ELSE commit_ts - 1 END, 2
            FROM mem WHERE NOT orphan
            UNION ALL
            SELECT event_id, op, ns, doc_key, value, ts_packed, 4
            FROM mem WHERE orphan AND rn = n - 1
            UNION ALL
            SELECT 8999999999, 'i', 'app.users_1', '-1', 42.0, t_sent, 3 FROM tt),
          -- delivery-order fold: a later batch overwrites a touched key
          -- unconditionally (in-order replay), within a batch the
          -- last-effective-write by (ts, event_id) wins
          state AS (
            SELECT ns, doc_key, value, event_id FROM (
              SELECT ns, doc_key, value, event_id, op,
                ROW_NUMBER() OVER (PARTITION BY ns, doc_key
                  ORDER BY bat DESC, ts_eff DESC, event_id DESC) AS rnk
              FROM applied) WHERE rnk = 1 AND op <> 'd')
          SELECT 'state' AS section, ns AS a, doc_key AS b,
            event_id AS x, CAST(0 AS BIGINT) AS y, value AS v
          FROM state
          UNION ALL
          SELECT 'ckpt_range', '', '', MIN(ts_eff), MAX(ts_eff), 0.0 FROM applied
          UNION ALL
          SELECT 'ckpt_n', '', '', COUNT(*), CAST(4 AS BIGINT), 0.0 FROM applied"""),

    "cdc_full_incr_handoff" -> Oplog.withOracleCte(
      s""", eff AS (
            SELECT event_id, ts_packed, op, ns, doc_key, value
            FROM oplog WHERE $chainSql AND op IN ('i','u','d')),
          tt AS (
            SELECT tmin + (tmax - tmin) // 2 AS t0
            FROM (SELECT MIN(ts_packed) AS tmin, MAX(ts_packed) AS tmax FROM eff)),
          state AS (
            SELECT ns, doc_key, value, event_id FROM (
              SELECT ns, doc_key, value, event_id, op,
                ROW_NUMBER() OVER (PARTITION BY ns, doc_key
                  ORDER BY ts_packed DESC, event_id DESC) AS rn
              FROM eff) WHERE rn = 1 AND op <> 'd'),
          ck AS (
            SELECT '-1' AS bid, MIN(ts_packed) AS lsn_min, MAX(ts_packed) AS lsn_max,
              COUNT(*) AS n
            FROM eff, tt WHERE ts_packed <= t0
            UNION ALL
            SELECT '0', MIN(ts_packed), MAX(ts_packed), COUNT(*)
            FROM eff, tt WHERE ts_packed > t0)
          SELECT 'state' AS section, ns AS a, doc_key AS b,
            event_id AS x, CAST(0 AS BIGINT) AS y, value AS v
          FROM state
          UNION ALL
          SELECT 'ckpt', bid, '', lsn_min, lsn_max, CAST(n AS DOUBLE) FROM ck"""),

    "cdc_metrics" -> Oplog.withOracleCte(
      s""", kept AS (SELECT * FROM oplog WHERE $chainSql)
          SELECT (SELECT COUNT(*) FROM oplog) AS n_raw,
            COUNT(*) AS n_kept,
            (SELECT COUNT(*) FROM oplog) - COUNT(*) AS n_filtered,
            CAST(SUM(CASE WHEN op = 'i' THEN 1 ELSE 0 END) AS BIGINT) AS n_insert,
            CAST(SUM(CASE WHEN op = 'u' THEN 1 ELSE 0 END) AS BIGINT) AS n_update,
            CAST(SUM(CASE WHEN op = 'd' THEN 1 ELSE 0 END) AS BIGINT) AS n_delete,
            CAST(0 AS BIGINT) AS n_command, CAST(0 AS BIGINT) AS n_noop,
            CAST(SUM(octet_length(encode(props))) AS BIGINT) AS traffic_bytes,
            MAX(ts_packed) AS lsn_newest
          FROM kept"""),

    "cdc_resume_restart" -> Oplog.withOracleCte(
      s""", eff AS (
            SELECT event_id, ts_packed, op, ns, doc_key, value
            FROM oplog WHERE $chainSql AND op IN ('i','u','d')),
          tt AS (
            SELECT tmin + (tmax - tmin) // 2 AS t1
            FROM (SELECT MIN(ts_packed) AS tmin, MAX(ts_packed) AS tmax FROM eff)),
          state AS (
            SELECT ns, doc_key, value, event_id FROM (
              SELECT ns, doc_key, value, event_id, op,
                ROW_NUMBER() OVER (PARTITION BY ns, doc_key
                  ORDER BY ts_packed DESC, event_id DESC) AS rn
              FROM eff) WHERE rn = 1 AND op <> 'd'),
          ck AS (
            SELECT '0' AS bid, MIN(ts_packed) AS lsn_min, MAX(ts_packed) AS lsn_max,
              COUNT(*) AS n
            FROM eff, tt WHERE ts_packed <= t1
            UNION ALL
            SELECT '1', MIN(ts_packed), MAX(ts_packed), COUNT(*)
            FROM eff, tt WHERE ts_packed > t1)
          SELECT 'state' AS section, ns AS a, doc_key AS b,
            event_id AS x, CAST(0 AS BIGINT) AS y, value AS v
          FROM state
          UNION ALL
          SELECT 'ckpt', bid, '', lsn_min, lsn_max, CAST(n AS DOUBLE) FROM ck"""),

    // Tailed + resumed delivery over the ts-offset cursor source must
    // land the same last-effective-write state as a one-shot fold; the
    // ckpt row pins the delivered-row total + global lsn bounds, and the
    // cursor row pins the O(unacked) purge proof.
    "cdc_tail_live" -> Oplog.withOracleCte(
      s""", eff AS (
            SELECT event_id, ts_packed, op, ns, doc_key, value
            FROM oplog WHERE $chainSql AND op IN ('i','u','d')),
          state AS (
            SELECT ns, doc_key, value, event_id FROM (
              SELECT ns, doc_key, value, event_id, op,
                ROW_NUMBER() OVER (PARTITION BY ns, doc_key
                  ORDER BY ts_packed DESC, event_id DESC) AS rn
              FROM eff) WHERE rn = 1 AND op <> 'd')
          SELECT 'state' AS section, ns AS a, doc_key AS b,
            event_id AS x, CAST(0 AS BIGINT) AS y, value AS v
          FROM state
          UNION ALL
          SELECT 'ckpt', 'total', '', MIN(ts_packed), MAX(ts_packed),
            CAST(COUNT(*) AS DOUBLE)
          FROM eff
          UNION ALL
          SELECT 'cursor', 'bounded', 'true', CAST(0 AS BIGINT),
            CAST(0 AS BIGINT), 0.0"""),

    // Admission accounting: an AvailableNow drain under maxRowsPerTrigger
    // = ceil(n/16) must land exactly 16 batches whose row counts and lsn
    // bounds are the closed-form 16-way slicing of the ts-ranked corpus.
    "cdc_tail_admission" -> Oplog.withOracleCte(
      s""", eff AS (
            SELECT event_id, ts_packed
            FROM oplog WHERE $chainSql AND op IN ('i','u','d')),
          lim AS (SELECT (COUNT(*) + 15) // 16 AS lim FROM eff),
          ranked AS (
            SELECT ts_packed, ROW_NUMBER() OVER (ORDER BY ts_packed) AS rn
            FROM eff)
          SELECT (rn - 1) // lim AS batch_id, COUNT(*) AS n,
            MIN(ts_packed) AS lsn_min, MAX(ts_packed) AS lsn_max
          FROM ranked, lim GROUP BY 1"""),

    // Token-offset resume over the S2 connector pipeline: the fold, the
    // per-phase delivered volumes, and the token-ack purge bound — all
    // with value hardwired 0.0 (the connector path carries no numeric
    // value column; the document rides props).
    "cdc_token_resume" ->
      s"""WITH cev AS (${graft.model.ChangeEvent.oracleCte}),
          eff AS (
            SELECT event_id, ts_packed,
              CASE operation_type WHEN 'insert' THEN 'i' WHEN 'delete' THEN 'd'
                ELSE 'u' END AS op,
              db || '.' || coll AS ns,
              json_extract_string(document_key, '$$._id') AS doc_key
            FROM cev
            WHERE operation_type IN ('insert','replace','update','delete')
              AND regexp_matches(db || '.' || coll, '^app\\.users_[0-9]+$$')
              AND NOT regexp_matches(db || '.' || coll, '^app\\.users_3$$')),
          tt AS (
            SELECT tmin + (tmax - tmin) // 2 AS t1
            FROM (SELECT MIN(ts_packed) AS tmin, MAX(ts_packed) AS tmax FROM eff)),
          state AS (
            SELECT ns, doc_key, event_id FROM (
              SELECT ns, doc_key, event_id, op,
                ROW_NUMBER() OVER (PARTITION BY ns, doc_key
                  ORDER BY ts_packed DESC, event_id DESC) AS rn
              FROM eff) WHERE rn = 1 AND op <> 'd'),
          ck AS (
            SELECT '0' AS bid, MIN(ts_packed) AS lsn_min, MAX(ts_packed) AS lsn_max,
              COUNT(*) AS n
            FROM eff, tt WHERE ts_packed <= t1
            UNION ALL
            SELECT '1', MIN(ts_packed), MAX(ts_packed), COUNT(*)
            FROM eff, tt WHERE ts_packed > t1)
          SELECT 'state' AS section, ns AS a, doc_key AS b,
            event_id AS x, CAST(0 AS BIGINT) AS y, 0.0 AS v
          FROM state
          UNION ALL
          SELECT 'ckpt', bid, '', lsn_min, lsn_max, CAST(n AS DOUBLE) FROM ck
          UNION ALL
          SELECT 'cursor', 'bounded', 'true', CAST(0 AS BIGINT),
            CAST(0 AS BIGINT), 0.0""",

    // Three concurrent shard writers into one state table must land the
    // global fold; per-shard ckpt totals pin exactly-once-into-_ckpt
    // delivery through the crash; the two global rows pin the min-ack
    // rule — held at the lagging shard's ack mid-run, min of the
    // per-shard newest positions after catch-up.
    "cdc_sharded_fanout" -> Oplog.withOracleCte(
      s""", eff AS (
            SELECT event_id, ts_packed, op, ns, doc_key, value,
              (CAST(doc_key AS BIGINT) // 8) % 3 AS shard
            FROM oplog WHERE $chainSql AND op IN ('i','u','d')),
          tt AS (
            SELECT tmin + (tmax - tmin) // 2 AS t1
            FROM (SELECT MIN(ts_packed) AS tmin, MAX(ts_packed) AS tmax FROM eff)),
          state AS (
            SELECT ns, doc_key, value, event_id FROM (
              SELECT ns, doc_key, value, event_id, op,
                ROW_NUMBER() OVER (PARTITION BY ns, doc_key
                  ORDER BY ts_packed DESC, event_id DESC) AS rn
              FROM eff) WHERE rn = 1 AND op <> 'd'),
          sh AS (
            SELECT 'rs' || CAST(shard AS VARCHAR) AS sname,
              MAX(ts_packed) AS ack, MIN(ts_packed) AS first_lsn,
              COUNT(*) AS n
            FROM eff GROUP BY shard)
          SELECT 'state' AS section, ns AS a, doc_key AS b,
            event_id AS x, CAST(0 AS BIGINT) AS y, value AS v
          FROM state
          UNION ALL
          SELECT 'shard', sname, '', ack, first_lsn, CAST(n AS DOUBLE) FROM sh
          UNION ALL
          SELECT 'ckpt', 'global_mid', '',
            (SELECT MAX(ts_packed) FROM eff, tt WHERE shard = 1 AND ts_packed <= t1),
            CAST(0 AS BIGINT), 0.0
          UNION ALL
          SELECT 'ckpt', 'global_final', '', (SELECT MIN(ack) FROM sh),
            CAST(0 AS BIGINT), 0.0"""),

    // The supervised crash-recovery run must be observationally identical
    // to a clean single-batch run: one _ckpt row over the whole feed, the
    // global last-effective-write state, and exactly one restart.
    "cdc_supervisor_restart" -> Oplog.withOracleCte(
      s""", eff AS (
            SELECT event_id, ts_packed, op, ns, doc_key, value
            FROM oplog WHERE $chainSql AND op IN ('i','u','d')),
          state AS (
            SELECT ns, doc_key, value, event_id FROM (
              SELECT ns, doc_key, value, event_id, op,
                ROW_NUMBER() OVER (PARTITION BY ns, doc_key
                  ORDER BY ts_packed DESC, event_id DESC) AS rn
              FROM eff) WHERE rn = 1 AND op <> 'd')
          SELECT 'state' AS section, ns AS a, doc_key AS b,
            event_id AS x, CAST(0 AS BIGINT) AS y, value AS v
          FROM state
          UNION ALL
          SELECT 'ckpt', '0', '', MIN(ts_packed), MAX(ts_packed),
            CAST(COUNT(*) AS DOUBLE)
          FROM eff
          UNION ALL
          SELECT 'sup', '1', 'false', CAST(0 AS BIGINT), CAST(0 AS BIGINT), 0.0"""),

    "cdc_rebucket" -> Oplog.withOracleCte(
      s""", eff AS (
            SELECT event_id, ts_packed, op, ns, doc_key, value
            FROM oplog WHERE $chainSql AND op IN ('i','u','d')),
          tt AS (
            SELECT tmin + (tmax - tmin) // 2 AS t1
            FROM (SELECT MIN(ts_packed) AS tmin, MAX(ts_packed) AS tmax FROM eff)),
          state1 AS (
            SELECT ns, doc_key FROM (
              SELECT ns, doc_key, op,
                ROW_NUMBER() OVER (PARTITION BY ns, doc_key
                  ORDER BY ts_packed DESC, event_id DESC) AS rn
              FROM eff, tt WHERE ts_packed <= t1) WHERE rn = 1 AND op <> 'd'),
          state AS (
            SELECT ns, doc_key, value, event_id FROM (
              SELECT ns, doc_key, value, event_id, op,
                ROW_NUMBER() OVER (PARTITION BY ns, doc_key
                  ORDER BY ts_packed DESC, event_id DESC) AS rn
              FROM eff) WHERE rn = 1 AND op <> 'd'),
          ck AS (
            SELECT '0' AS bid, MIN(ts_packed) AS lsn_min, MAX(ts_packed) AS lsn_max,
              COUNT(*) AS n
            FROM eff, tt WHERE ts_packed <= t1
            UNION ALL
            SELECT '1', MIN(ts_packed), MAX(ts_packed), COUNT(*)
            FROM eff, tt WHERE ts_packed > t1)
          SELECT 'state' AS section, ns AS a, doc_key AS b,
            event_id AS x, CAST(0 AS BIGINT) AS y, value AS v
          FROM state
          UNION ALL
          SELECT 'ckpt', bid, '', lsn_min, lsn_max, CAST(n AS DOUBLE) FROM ck
          UNION ALL
          SELECT 'mig', 'diff', '', CAST(0 AS BIGINT), CAST(0 AS BIGINT), 0.0
          UNION ALL
          SELECT 'mig', 'rows', '', (SELECT COUNT(*) FROM state1),
            CAST(0 AS BIGINT), 0.0"""),

    // Closed form of the two-backend checkpoint-store run: the stored
    // position is the phase-1 lsn_max (max lower-half ts), version is
    // the current checkpoint FCV (2), and the resumed state is the fold
    // of exactly the rows above that position. The fcv row pins the
    // reference-shaped rejection reason for a version-0 document.
    "cdc_ckpt_api_store" -> Oplog.withOracleCte(
      s""", eff AS (
            SELECT event_id, ts_packed, op, ns, doc_key, value
            FROM oplog WHERE $chainSql AND op IN ('i','u','d')),
          tt AS (
            SELECT tmin + (tmax - tmin) // 2 AS t1
            FROM (SELECT MIN(ts_packed) AS tmin, MAX(ts_packed) AS tmax FROM eff)),
          low AS (
            SELECT MAX(ts_packed) AS ck FROM eff, tt WHERE ts_packed <= t1),
          state AS (
            SELECT ns, doc_key, value, event_id FROM (
              SELECT ns, doc_key, value, event_id, op,
                ROW_NUMBER() OVER (PARTITION BY ns, doc_key
                  ORDER BY ts_packed DESC, event_id DESC) AS rn
              FROM eff, low WHERE ts_packed > ck) WHERE rn = 1 AND op <> 'd')
          SELECT 'ctx' AS section, 'database' AS a, 'graft' AS b,
            ck AS x, CAST(2 AS BIGINT) AS y, 1.0 AS v FROM low
          UNION ALL
          SELECT 'ctx', 'api', 'graft', ck, CAST(2 AS BIGINT), 1.0 FROM low
          UNION ALL
          SELECT 'default', 'api_absent', 'graft', CAST(1 AS BIGINT),
            CAST(2 AS BIGINT), 0.0
          UNION ALL
          SELECT 'fcv', 'current required checkpoint version[2] > input[0], ' ||
            'please upgrade to version >= 2.4.6', '', CAST(0 AS BIGINT),
            CAST(0 AS BIGINT), 0.0
          UNION ALL
          SELECT 'eq', '', '', CAST(0 AS BIGINT),
            (SELECT COUNT(*) FROM state), 0.0
          UNION ALL
          SELECT 'state', ns, doc_key, event_id, CAST(0 AS BIGINT), value
          FROM state"""),

    // Closed form of the sampling journal: exactly the ops whose portable
    // key hash lands on 0 mod 16, alongside the untouched state fold.
    "cdc_journal_sample" -> Oplog.withOracleCte(
      s""", eff AS (
            SELECT event_id, ts_packed, op, ns, doc_key, value
            FROM oplog WHERE $chainSql AND op IN ('i','u','d')),
          state AS (
            SELECT ns, doc_key, value, event_id FROM (
              SELECT ns, doc_key, value, event_id, op,
                ROW_NUMBER() OVER (PARTITION BY ns, doc_key
                  ORDER BY ts_packed DESC, event_id DESC) AS rn
              FROM eff) WHERE rn = 1 AND op <> 'd')
          SELECT 'journal' AS section, ns AS a, doc_key AS b,
            event_id AS x, ts_packed AS y, value AS v
          FROM eff WHERE ${graft.functions.Portable.phash64Sql("doc_key")} % 16 = 0
          UNION ALL
          SELECT 'state', ns, doc_key, event_id, CAST(0 AS BIGINT), value
          FROM state"""),

    "cdc_stream_e2e" -> Oplog.withOracleCte(
      s""", eff AS (
            SELECT event_id, ts_packed, ts_us, op, ns, doc_key, value,
              CASE WHEN event_id % 20 = 0 THEN 'txn'
                   WHEN event_id % 20 = 1 THEN 'atomic'
                   ELSE 'plain' END AS role
            FROM oplog WHERE $chainSql AND op IN ('i','u','d')),
          tt AS (
            SELECT tmin + (tmax - tmin) // 2 AS t1,
                   tmin + 3 * (tmax - tmin) // 4 AS t2
            FROM (SELECT MIN(ts_packed) AS tmin, MAX(ts_packed) AS tmax FROM oplog)),
          txn AS (
            SELECT *,
              ROW_NUMBER() OVER (PARTITION BY doc_key, ts_us // 2592000000000
                ORDER BY ts_packed, event_id) - 1 AS rn,
              COUNT(*) OVER (PARTITION BY doc_key, ts_us // 2592000000000) AS n,
              MAX(ts_packed) OVER (PARTITION BY doc_key, ts_us // 2592000000000) AS commit_ts
            FROM eff WHERE role = 'txn'),
          txn_eff AS (
            SELECT event_id, op, ns, doc_key, value,
              CASE WHEN rn = n - 1 THEN commit_ts ELSE commit_ts - 1 END AS ts_eff
            FROM txn
            WHERE (CAST(doc_key AS BIGINT) + ts_us // 2592000000000) % 7 <> 0),
          at_eff AS (
            SELECT event_id, op, ns, doc_key, value,
              MAX(ts_packed) OVER (PARTITION BY event_id // 64) AS ts_eff
            FROM eff WHERE role = 'atomic'),
          allops AS (
            SELECT event_id, op, ns, doc_key, value, ts_packed AS ts_eff
            FROM eff WHERE role = 'plain'
            UNION ALL SELECT * EXCLUDE (ts_eff), ts_eff FROM txn_eff
            UNION ALL SELECT * EXCLUDE (ts_eff), ts_eff FROM at_eff),
          -- live state: dropped ns only from post-drop ops; renamed ns only
          -- from post-rename ops (the pre-rename fold moved to users_9)
          live AS (
            SELECT ns, doc_key, value, event_id, op,
              ROW_NUMBER() OVER (PARTITION BY ns, doc_key
                ORDER BY ts_eff DESC, event_id DESC) AS rnk
            FROM allops, tt
            WHERE (ns <> 'app.users_2' OR ts_eff > t1)
              AND (ns <> 'app.users_0' OR ts_eff > t2)),
          renamed AS (
            SELECT 'app.users_9' AS ns, doc_key, value, event_id FROM (
              SELECT doc_key, value, event_id, op,
                ROW_NUMBER() OVER (PARTITION BY doc_key
                  ORDER BY ts_eff DESC, event_id DESC) AS rnk
              FROM allops, tt WHERE ns = 'app.users_0' AND ts_eff <= t2)
            WHERE rnk = 1 AND op <> 'd'),
          state AS (
            SELECT ns, doc_key, value, event_id FROM live WHERE rnk = 1 AND op <> 'd'
            UNION ALL SELECT * FROM renamed),
          ck AS (
            SELECT LEAST((SELECT MIN(ts_eff) FROM allops), t1) AS lsn_min,
              GREATEST((SELECT MAX(ts_eff) FROM allops), t2) AS lsn_max,
              (SELECT COUNT(*) FROM allops) + 2 AS n_logs
            FROM tt)
          SELECT 'state' AS section, ns AS a, doc_key AS b,
            event_id AS x, CAST(0 AS BIGINT) AS y, value AS v
          FROM state
          UNION ALL SELECT 'ddl', 'app.$$cmd', 'drop', CAST(0 AS BIGINT), t1, 0.0 FROM tt
          UNION ALL SELECT 'ddl', 'app.$$cmd', 'renameCollection', CAST(1 AS BIGINT), t2, 0.0 FROM tt
          UNION ALL SELECT 'ckpt_range', '', '', lsn_min, lsn_max, 0.0 FROM ck
          UNION ALL SELECT 'ckpt_n', '', '', n_logs, CAST(0 AS BIGINT), 0.0 FROM ck""")
  )
}
