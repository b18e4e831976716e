package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

import graft.apply.Replay
import graft.filters.OplogFilters
import graft.model.Oplog

/** Incremental sync: the streaming entry point (SURVEY.md §3.1).
  *
  * One StreamingQuery: source → canonical projection (P1/P2) → filter
  * chain (F1-F7) → `foreachBatch` two-phase apply:
  *
  *   1. normal DML merged idempotently into the target state table
  *      (last-effective-write-wins — W1-W4 as MERGE),
  *   2. barrier rows (DDL, `op == "c"`) applied serially afterwards and
  *      recorded to a DDL log (T4 barrier semantics: a barrier never
  *      executes before the batch it trails, and never splits a trigger),
  *   3. the checkpoint row (batch id, min/max applied ts) committed last
  *      (T8: checkpoint only after sink ack — never from the driver clock).
  *
  * Exactly-once state: Spark's checkpointLocation provides replayable
  * batches; the merge is idempotent, so at-least-once delivery converges
  * (the reference's recovery model, README.md:55).
  *
  * ## State layout — hash-bucketed base + append-only deltas (LSM)
  *
  * Compacted state lives at `target/state/bucket=<b>/` with
  * b = hash(ns, doc_key) mod [[StateBuckets]]; pending per-delivery
  * deltas at `target/state_delta/d=<prio>/bucket=<b>/`. A micro-batch
  * APPENDS its last-effective-write set (tombstones included) as one new
  * delta directory and never reads or rewrites the base — per-trigger
  * write I/O is O(|batch|), not O(|touched buckets| · bucket size).
  * Until r19 each trigger read and rewrote every touched bucket; on a
  * uniform key feed every bucket is touched, so the per-trigger merge
  * was O(|state|) — at 100 TB that read-modify-write cycle per trigger
  * IS the write-amplification wall (guide §6 file layout, §2.4 remove
  * shuffles outright). Readers see base ∪ deltas through
  * [[readOrEmpty]]'s last-writer-wins fold (the LSM read-side merge);
  * every [[CompactEveryDeltas]] checkpoints the deltas fold into the
  * base ([[compactState]]) so read amplification stays bounded. All
  * filesystem access goes through the Hadoop FileSystem API — the
  * layout works identically on HDFS/S3.
  */
object IncrSync {

  /** Number of state hash-buckets. Sized so one bucket (state/buckets)
    * stays well under executor memory at the target scale; at 100 TB
    * state this would be raised together with the cluster size — it is a
    * layout constant of the state table, changed only by re-bucketing.
    */
  val StateBuckets = 64

  /** Barrier batches are rare DDL; a runaway barrier set indicates a
    * misrouted stream — fail fast instead of OOMing the driver.
    */
  val MaxBarrierRows = 10000

  /** State partitions frozen into every CDC pipeline query at birth.
    *
    * The general law (PROFILE_r18): a streaming query's state-store
    * commit floor is trigger-count × state-partitions × ~0.5 s of
    * per-partition commit overhead, INDEPENDENT of state volume — the
    * TxnAssembler state these pipelines carry is a few hundred rows at
    * most, yet at the session default 32 partitions HarnessProfile
    * measured 29–188 s CUMULATIVE commit per harness (cdc_txn_ttl: 11
    * batches × 32 partitions = 188 s). Scoping `shuffle.partitions` to 8
    * around `.start()` freezes 8 into the query's checkpoint
    * (StreamExecution clones the session at start) and cuts that floor
    * 4× with partitions still far emptier than any heap bound; the
    * parent session's conf is restored immediately after start, so
    * batch work outside the query never observes the scoped value.
    * The stream-stream join family sizes its own partitions from
    * projected state volume instead (`StreamOps.stateJoinPartitions`);
    * a production deployment at real volume would do the same here.
    */
  val StatePartitions = 8

  /** Start a streaming query with [[StatePartitions]] frozen in: set,
    * run `start` (which must START the query so the cloned session
    * captures the scoped conf), restore.
    */
  private[graft] def scopedStart[T](spark: SparkSession, n: Int = StatePartitions)(
      start: => T): T = {
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(key)
    spark.conf.set(key, n)
    try start finally spark.conf.set(key, prev)
  }

  /** Shuffle width for one delivery's jobs inside [[applyBatchTo]],
    * derived from the DELIVERED row count — the same sizing discipline
    * as `Dedup.componentParts` applied to the apply path. Every
    * micro-batch runs batch-sized shuffling jobs (the lastPerKey fold
    * and the delta append's bucket clustering; until r19 also a
    * touched-bucket distinct and an anti-join base merge, removed by the
    * r20 LSM layout) whose data is the batch, orders of magnitude
    * smaller than the session width assumes: ShuffleProfile (r19)
    * measured the batch harnesses at 810–1,022 tasks for 0.4–2.2 MB of
    * total shuffle before the width derivation landed. The STATE-VOLUME
    * jobs (compaction, DDL rewrite, re-bucketing) deliberately do NOT
    * run at this width — they size from measured state bytes
    * ([[compactParts]]; ADVICE r19).
    *
    * Budget ~250k rows (~64 MB at a few hundred bytes per oplog row)
    * per partition — real shuffle-partition sizing, NOT a constant
    * tuned to the gate corpora: every harness batch (≤ ~200k rows)
    * derives the floor of 4; a 10M-row delivery derives 64; the 4096
    * cap binds past ~10⁹ rows, which admission control
    * (`maxRowsPerTrigger`) bounds far earlier on any sane deployment.
    * Written as `p * 250k < nRows` (not `2 * nRows / p`) so the loop
    * cannot overflow at Long.MaxValue.
    */
  private[graft] def applyParts(nRows: Long): Int = {
    var p = 4L
    while (p < 4096 && p * 250000L < nRows) p *= 2
    p.toInt
  }

  /** Schema of the events stream (ts as nanosecond long). */
  val eventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Stored state schema (bucket is the partition column). */
  val stateFields: Seq[(String, DataType)] = Seq(
    "ns" -> StringType, "doc_key" -> StringType,
    "last_value" -> DoubleType, "last_event_id" -> LongType,
    "batch_ops" -> LongType, "bucket" -> IntegerType)

  /** @param startingTs S1's resume predicate (`{ts: {$gt: ckpt}}`,
    *   reference `oplog_reader.go:90-97`): records at or below the
    *   checkpoint/handoff position are excluded at the source — the
    *   filter sits directly on the scan so pushdown reaches parquet.
    * @param maxFilesPerTrigger G1 adaptive-batch sizing for the file
    *   source (the analogue of `batching_max_size`; Kafka sources take
    *   [[Coordinator.qosOptions]] instead).
    */
  def start(spark: SparkSession, sourceDir: String, targetDir: String,
      checkpointDir: String,
      gids: Seq[String] = Seq(""),
      white: Seq[String] = Seq("^app\\..*$"),
      black: Seq[String] = Nil,
      startingTs: Long = Long.MinValue,
      maxFilesPerTrigger: Int = 0): StreamingQuery = {
    // The streaming file source needs a declared schema; probe the dir's
    // footers so the declaration matches the physical ts layout (ns long
    // vs µs timestamp — see Tables.normalizeTsNs), then startFrom
    // re-normalizes the decoded column to the canonical ns long.
    //
    // The probe is one-shot, so the whole dir must carry ONE physical ts
    // layout (mixed ns/µs files in a single source dir are a corpus bug,
    // not a supported shape). An empty or unreadable dir fails fast here:
    // defaulting the declared type and letting later-arriving files
    // contradict it would surface as an opaque parquet conversion error
    // mid-stream — start the stream after the first file lands instead.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val tsType =
      try spark.read.parquet(sourceDir).schema("ts").dataType
      catch {
        case scala.util.control.NonFatal(e) =>
          throw new IllegalArgumentException(
            s"cannot probe the ts layout of stream source dir '$sourceDir' " +
              "(empty or unreadable?) — the file-source stream needs at " +
              "least one parquet file before start, or use startFrom with " +
              "an explicit schema", e)
      }
    val sch = StructType(eventsSchema.map(f =>
      if (f.name == "ts") f.copy(dataType = tsType) else f))
    startFrom(spark, ParquetDirSource(sourceDir, sch, maxFilesPerTrigger),
      targetDir, checkpointDir, gids, white, black, startingTs)
  }

  /** [[start]] over any [[ChangeSource]] — the injection seam a live
    * change-stream connector implements (see [[ChangeSource]] for the
    * resume-token ↔ offset mapping).
    */
  def startFrom(spark: SparkSession, source: ChangeSource, targetDir: String,
      checkpointDir: String,
      gids: Seq[String] = Seq(""),
      white: Seq[String] = Seq("^app\\..*$"),
      black: Seq[String] = Nil,
      startingTs: Long = Long.MinValue): StreamingQuery = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val stream = graft.Tables.normalizeTsNs(spark, source.load(spark))
    val oplog = Oplog.project(stream)
      .filter(col("ts_packed") > startingTs)
      .filter(OplogFilters.chain(gids, white, black) || col("op") === "c")
    oplog.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(batch, targetDir, batchId)
      }
      .start()
  }

  /** State bucket of a (ns, doc_key) pair. */
  def bucketOf(nBuckets: Int = StateBuckets) =
    pmod(hash(col("ns"), col("doc_key")), lit(nBuckets)).cast("int")

  /** Raw-oplog stream schema (canonical record + txn fields, SURVEY §1.1). */
  val oplogSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts_packed", LongType),
    StructField("op", StringType),
    StructField("ns", StringType),
    StructField("doc_key", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType),
    StructField("g", StringType),
    StructField("from_migrate", BooleanType),
    StructField("lsid", StringType),
    StructField("txn_number", LongType),
    StructField("o", StringType)))

  /** The full §3.1 dataflow as ONE StreamingQuery over a raw oplog feed:
    *
    *   source → filter chain (F1-F7) → T1 txn assembly
    *   (`flatMapGroupsWithState` keyed by lsid+txnNumber; commit releases
    *   inner ops with the T3 ts patch, abort purges) → union with plain
    *   DML and DDL barriers → `foreachBatch` barrier-segmented apply →
    *   checkpoint commit.
    *
    * Inner ops ride the applyOps arrays as self-describing JSON and are
    * re-projected to canonical rows (then re-filtered — the reference
    * ns-filters exploded ops in the executor transform too).
    */
  /** @param txnTtlMs TTL for orphaned partial-transaction state on a
    *   continuous trigger (a partial chain whose commit never arrives is
    *   purged instead of living in the state store forever). A positive
    *   TTL is REJECTED under AvailableNow (see [[startOplogTo]]): a
    *   processing-time timeout needs the no-data batches only a
    *   continuous trigger schedules — a drain-style run would simply not
    *   terminate. Default 0 (no purge); a production ProcessingTime tail
    *   should pass [[TxnAssembler.DefaultTxnTtlMs]] or its own bound.
    * @param trigger AvailableNow (drain) by default; pass a
    *   ProcessingTime trigger for a continuous tail.
    */
  def startOplog(spark: SparkSession, sourceDir: String, targetDir: String,
      checkpointDir: String,
      gids: Seq[String] = Seq(""),
      white: Seq[String] = Seq("^app\\..*$"),
      black: Seq[String] = Nil,
      txnTtlMs: Long = 0L,
      trigger: Trigger = Trigger.AvailableNow(),
      nBuckets: Int = StateBuckets,
      startingTs: Long = Long.MinValue,
      ckptStores: Seq[CkptStore] = Nil,
      journal: JournalConf = JournalConf.Off): StreamingQuery =
    startOplogFrom(spark, ParquetDirSource(sourceDir, oplogSchema),
      targetDir, checkpointDir, gids, white, black, txnTtlMs, trigger, nBuckets,
      startingTs, ckptStores, journal)

  /** [[startOplog]] over any [[ChangeSource]] — the oplog-tailing seam
    * (S1); a live connector plugs in here without touching the dataflow.
    */
  def startOplogFrom(spark: SparkSession, source: ChangeSource, targetDir: String,
      checkpointDir: String,
      gids: Seq[String] = Seq(""),
      white: Seq[String] = Seq("^app\\..*$"),
      black: Seq[String] = Nil,
      txnTtlMs: Long = 0L,
      trigger: Trigger = Trigger.AvailableNow(),
      nBuckets: Int = StateBuckets,
      startingTs: Long = Long.MinValue,
      ckptStores: Seq[CkptStore] = Nil,
      journal: JournalConf = JournalConf.Off): StreamingQuery =
    startOplogTo(spark, source,
      ParquetTarget(targetDir, nBuckets, ckptStores, journal), checkpointDir,
      gids, white, black, txnTtlMs, trigger, startingTs)

  /** [[startOplogFrom]] against any [[TargetWriter]] — the sink seam
    * ([[ChangeSource]]'s write-side symmetric): a live MongoDB/JDBC
    * connector receives the per-segment merge sets, barrier commands, and
    * checkpoint commits without any dataflow edits (see [[TargetWriter]]
    * for the W1-W5 ↔ bulk-op mapping).
    */
  def startOplogTo(spark: SparkSession, source: ChangeSource, target: TargetWriter,
      checkpointDir: String,
      gids: Seq[String] = Seq(""),
      white: Seq[String] = Seq("^app\\..*$"),
      black: Seq[String] = Nil,
      txnTtlMs: Long = 0L,
      trigger: Trigger = Trigger.AvailableNow(),
      startingTs: Long = Long.MinValue): StreamingQuery = {
    // A rejected config, not a silent force-to-0 (GraftConfig.sanitize is
    // the declarative twin of this gate): the caller asked for a TTL the
    // drain trigger can never fire, and silently dropping it would let an
    // operator believe orphan purging is active when it is not.
    require(txnTtlMs == 0L || trigger != Trigger.AvailableNow(),
      "txnTtlMs > 0 requires a ProcessingTime trigger: an AvailableNow drain " +
        "never schedules the no-data batches that fire processing-time " +
        "timeouts, so orphan state would never purge and the query would " +
        "not terminate")
    import spark.implicits._
    // S1 resume predicate ({ts: {$gt: ckpt}}, `oplog_reader.go:90-97`) —
    // also the full→incr handoff position: records at or below the
    // snapshot's finish ts are excluded AT THE SOURCE (pushdown reaches
    // the scan), the reference's parallel full+incr replay contract.
    //
    // CONTRACT: startingTs must be a TRANSACTION-CONSISTENT position — no
    // partial session-txn chain may straddle it, or the chain's pre-cut
    // entries are dropped before assembly and its commit releases only
    // the tail (the reference's user-configured start_position has the
    // identical sharp edge: a {ts: {$gt: T}} cursor cannot resurrect a
    // chain's earlier entries either; its checkpoint manager only records
    // batch-boundary positions, which never split a chain). A snapshot
    // taken at a majority-commit point satisfies this. RESTART resume
    // (same checkpointLocation) is NOT affected: buffered partials
    // survive in the state store, so a chain split across a crash
    // reassembles.
    val stream = source.load(spark)
      .filter(col("ts_packed") > startingTs)
      .withColumn("db", substring_index(col("ns"), ".", 1))
      .withColumn("coll", substring_index(col("ns"), ".", -1))
    val o = col("o")
    val isTxnEntry = col("op") === "c" && col("lsid").isNotNull &&
      col("txn_number").isNotNull &&
      (get_json_object(o, "$.applyOps").isNotNull ||
        get_json_object(o, "$.commitTransaction").isNotNull ||
        get_json_object(o, "$.abortTransaction").isNotNull)
    // Non-session applyOps (no lsid): an ATOMIC batch — its inner ops
    // apply immediately, they are not barriers (`txn_meta.go:35-60`
    // routes only session entries to the buffer).
    val isAtomicApply = col("op") === "c" && col("lsid").isNull &&
      get_json_object(o, "$.applyOps").isNotNull

    // Commands bypass the ns whitelist (their effective ns is extracted
    // downstream) but NOT the gid/migrate guards — a foreign-gid or
    // chunk-migration DDL must never replay locally (F2/F7).
    val cmdKeep = col("op") === "c" && col("g").isin(gids: _*) && !col("from_migrate")
    val keep = OplogFilters.chain(gids, white, black) || cmdKeep
    val outCols = Seq("event_id", "ts_packed", "op", "ns", "doc_key", "value", "props")

    // Plain DML + DDL barriers (command body becomes the barrier props).
    val plain = stream.filter(!isTxnEntry && !isAtomicApply).filter(keep)
      .withColumn("props", when(col("op") === "c", coalesce(o, col("props")))
        .otherwise(col("props")))
      .select(outCols.map(col): _*)

    // Atomic applyOps: explode inner ops in place, original ts; each
    // inner op re-enters the filter chain on its real namespace.
    val atomicRows = stream.filter(isAtomicApply).filter(cmdKeep)
      .select(col("ts_packed").as("outer_ts"),
        explode(from_json(get_json_object(o, "$.applyOps"),
          ArrayType(StringType))).as("payload"))
      .select(
        get_json_object(col("payload"), "$.event_id").cast("long").as("event_id"),
        col("outer_ts").as("ts_packed"),
        get_json_object(col("payload"), "$.op").as("op"),
        get_json_object(col("payload"), "$.ns").as("ns"),
        get_json_object(col("payload"), "$.doc_key").as("doc_key"),
        get_json_object(col("payload"), "$.value").cast("double").as("value"),
        col("payload").as("props"))
      .withColumn("db", substring_index(col("ns"), ".", 1))
      .withColumn("coll", substring_index(col("ns"), ".", -1))
      .withColumn("g", lit(""))
      .withColumn("from_migrate", lit(false))
      .filter(OplogFilters.chain(gids, white, black))
      .select(outCols.map(col): _*)

    // T1/T2/T3: classify, buffer, release on commit with patched ts.
    // Session entries take the same gid/migrate guard as atomicRows and
    // plain commands (F2/F7): a foreign-gid or chunk-migration transaction
    // must be dropped BEFORE assembly — its inner ops are re-stamped
    // g=''/from_migrate=false below, so this is the only gate they cross.
    val entries = TxnAssembler.classifyEntries(
      stream.filter(isTxnEntry && col("g").isin(gids: _*) && !col("from_migrate"))
        .withColumn("seq", col("event_id")))
    val inner = TxnAssembler.assemble(entries, ttlMs = txnTtlMs)
    val innerRows = inner
      .select(get_json_object(col("op"), "$.event_id").cast("long").as("event_id"),
        col("ts").as("ts_packed"),
        get_json_object(col("op"), "$.op").as("op"),
        get_json_object(col("op"), "$.ns").as("ns"),
        get_json_object(col("op"), "$.doc_key").as("doc_key"),
        get_json_object(col("op"), "$.value").cast("double").as("value"),
        // the inner op's own body rides as props — the traffic counter
        // and any update-spec replay see the real payload, not "{}"
        col("op").as("props"))
      .withColumn("db", substring_index(col("ns"), ".", 1))
      .withColumn("coll", substring_index(col("ns"), ".", -1))
      .withColumn("g", lit(""))
      .withColumn("from_migrate", lit(false))
      .filter(OplogFilters.chain(gids, white, black))
      .select(outCols.map(col): _*)

    // G7: in-plan per-batch counters, surfaced in every query-progress
    // event (zero extra passes — the metrics ride the union pre-sink).
    // The query starts with StatePartitions frozen in (r19: the r16 A/B
    // that left this family at 32 measured ONE harness, one AvailableNow
    // incarnation; HarnessProfile r19 re-measured the whole family and
    // the per-partition commit floor dominates every ProcessingTime /
    // multi-batch harness — see StatePartitions).
    scopedStart(spark) {
      graft.metrics.Metrics.observedStream(
        plain.unionByName(atomicRows).unionByName(innerRows)).writeStream
        .option("checkpointLocation", checkpointDir)
        .trigger(trigger)
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          applyBatchTo(batch, target, batchId)
        }
        .start()
    }
  }

  /** Sharded-source fan-out (`collector/coordinator/incr.go:20-57`): one
    * tailing query per shard replica set, ALL into one bucketed target.
    * Each shard's source serves only the chunks it owns (the F8 chunk-map
    * contract), so shard key spaces are disjoint and the idempotent merge
    * composes; physical bucket-directory writes serialize on the
    * target's apply lock ([[ShardedSync.targetLock]]). Each shard resumes
    * independently from `checkpointRoot/<shard>` — a crashed shard
    * restarts alone while the others keep flowing — and the GROUP resume
    * position is the min ack across shards
    * ([[ShardedSync.globalCheckpoint]], `checkpoint.go:149-199`).
    *
    * Sharded + oplog fetch carries the reference's two sharp edges,
    * enforced here rather than documented away:
    *  - DDL cannot replay (`sanitize.go` checkConflict): `ddlEnable` is
    *    rejected, commands are filtered per shard, and the shard target's
    *    `applyCommand` throws if one ever slips through.
    *  - a `fromMigrate` record means the balancer is running — the shard
    *    query CRASHES at the batcher seam (`batcher.go:133-135`) instead
    *    of silently dropping the record ([[ShardedSync.applyShardBatch]]).
    */
  def startSharded(spark: SparkSession, shards: Seq[(String, ChangeSource)],
      targetDir: String, checkpointRoot: String,
      gids: Seq[String] = Seq(""),
      white: Seq[String] = Seq("^app\\..*$"),
      black: Seq[String] = Nil,
      nBuckets: Int = StateBuckets,
      trigger: Trigger = Trigger.AvailableNow(),
      startingTs: Long = Long.MinValue,
      ddlEnable: Boolean = false): Seq[StreamingQuery] = {
    require(shards.nonEmpty, "at least one shard source required")
    require(shards.map(_._1).distinct.length == shards.length,
      "mongo urls were duplicated")
    require(!ddlEnable,
      "DDL is not support for sharding when incr_sync.mongo_fetch_method" +
        " == 'oplog'")
    shards.map { case (shardName, source) =>
      val stream = source.load(spark)
        .filter(col("ts_packed") > startingTs)
        .withColumn("db", substring_index(col("ns"), ".", 1))
        .withColumn("coll", substring_index(col("ns"), ".", -1))
      // the migrate drop (F7) is deliberately ABSENT from this chain:
      // migrate records ride through to the batcher seam, which crashes
      val keep = OplogFilters.notNoop && OplogFilters.gidAllowed(gids) &&
        OplogFilters.notAutologous && OplogFilters.nsFilter(white, black)
      val rows = stream.filter(keep && col("op") =!= "c")
        .select(col("event_id"), col("ts_packed"), col("op"), col("ns"),
          col("doc_key"), col("value"), col("props"), col("from_migrate"))
      val target = ShardedTarget(targetDir, shardName, nBuckets)
      rows.writeStream
        .option("checkpointLocation", s"$checkpointRoot/$shardName")
        .trigger(trigger)
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          ShardedSync.applyShardBatch(batch, target, batchId)
        }
        .start()
    }
  }

  /** Batch apply + checkpoint commit, with T4 barrier segmentation: the
    * batch is cut AT each DDL barrier (reference `batcher.go:283-305` —
    * a barrier never executes before the DML that precedes it, and DML
    * that follows it in the same trigger applies after). Each DML segment
    * appends one O(batch) delta; the base is never read on the DML path.
    */
  def applyBatch(batch: DataFrame, targetDir: String, batchId: Long,
      nBuckets: Int = StateBuckets,
      fullSyncFinishPosition: Long = 0L): Unit =
    applyBatchTo(batch, ParquetTarget(targetDir, nBuckets), batchId,
      fullSyncFinishPosition)

  /** [[applyBatch]] against any [[TargetWriter]]: the T4 segmentation, F9
    * guard, and T8 checkpoint ordering live HERE (engine semantics); what
    * a merge set, a command, or a checkpoint commit physically does lives
    * behind the seam.
    */
  def applyBatchTo(batch0: DataFrame, target: TargetWriter, batchId: Long,
      fullSyncFinishPosition: Long = 0L): Unit = {
    val spark = batch0.sparkSession
    // Pin the delivery as materialized blocks (localCheckpoint), not a
    // lazy cache: JobProfile (r20) measured every post-persist action on
    // a STREAMING micro-batch re-paying ~1.3–2.2 s — the microbatch
    // source plan re-executed per job — where the same actions on a
    // plain cached batch cost 0.1–0.3 s. The checkpoint truncates the
    // plan at the delivery, so the barrier collect, the segment folds,
    // and the delta writes all read the pinned blocks. Lazy: the stats
    // pass below is the materialization (and the one firing of the
    // observe counters). Block cleanup rides the ContextCleaner once the
    // trigger's frame is unreachable — the same lifecycle every
    // localCheckpoint in the engine uses.
    val batch = batch0.localCheckpoint(eager = false)
    {
      // Materialize the cache with one FULL pass before anything else: the
      // G7 observe counters fire exactly once per delivery this way (an
      // `isEmpty`-style limit-1 probe would be cheaper for the emptiness
      // test alone, but would run the observed plan a second, partial
      // time and corrupt the counts — this full pass IS the cache
      // materialization, not a redundant job). The SAME pass also takes
      // the delivery's lsn bounds, so the T8 checkpoint row at the bottom
      // is built from literals instead of a second full-batch agg job —
      // the per-trigger floor is jobs × fixed scheduling/state-reload
      // cost (JobProfile r20: ~0.5–1.5 s per job on a cached KB-scale
      // delivery), so every fused job is wall time at every trigger.
      // Idle triggers — under a continuous
      // ProcessingTime trigger with a txn TTL the state operator schedules
      // a no-data batch EVERY interval; that is what fires processing-time
      // timeouts — deliver nothing, so nothing is ack'd: the checkpoint
      // must not move (T8 — the reference's ckpt manager only flushes on
      // ack'd traffic, `ckpt_manager.go:25-140`), and an idle tail must
      // not append one empty _ckpt row per trigger forever.
      val stats = batch.agg(
        count(lit(1)).as("n_logs"),
        min(col("ts_packed")).as("lsn_min"),
        max(col("ts_packed")).as("lsn_max")).head()
      val nRows = stats.getLong(0)
      if (nRows == 0L) return
      // Every job below (journal filter, lastPerKey fold, bucket merge,
      // checkpoint agg) operates on THIS delivery — run them at the
      // batch-derived width (see applyParts), restoring the session conf
      // on exit. Inside a streaming foreachBatch, `spark` is the query's
      // own cloned session, so concurrent queries (sharded fan-out) each
      // scope their own clone; in the batch-replay harnesses the
      // sequential-execution contract applies (see StreamOps.scopedState).
      val spKey = "spark.sql.shuffle.partitions"
      val prevSp = spark.conf.get(spKey)
      spark.conf.set(spKey, applyParts(nRows))
      try {
      // Diagnostic journal (off by default): the raw delivery, exactly
      // what the reference's syncer/executor dump per op — before the
      // last-effective-write reduction erases the sampled history.
      target.journalOps(batch, batchId)
      val normal = batch.filter(col("op") =!= "c")
      val barrier = batch.filter(col("op") === "c")

      // Barriers are rare DDL — the limit bounds the collect (one job);
      // an over-limit batch means a misrouted stream.
      val barrierRows = barrier.orderBy(col("ts_packed")).limit(MaxBarrierRows + 1).collect()
      require(barrierRows.length <= MaxBarrierRows,
        s"barrier batch exceeds $MaxBarrierRows rows — misrouted stream?")
      // F9 (`batcher.go:139-149`): DDL at or below the snapshot-finish
      // position means the snapshot and the DDL overlap — unsafe to
      // replay; fail fast like the reference.
      barrierRows.headOption.foreach { r =>
        val ts = r.getAs[Long]("ts_packed")
        require(ts > fullSyncFinishPosition,
          s"DDL ts $ts <= fullSyncFinishPosition $fullSyncFinishPosition — " +
            "snapshot/DDL overlap, cannot replay safely")
      }

      // The seam receives each segment already reduced to its
      // last-effective-write set (one groupBy pass — no second shuffle of
      // the batch; `Replay.lastPerKey` is partial-aggregatable).
      def dml(seg: DataFrame): Unit = target.applyDml(Replay.lastPerKey(seg))

      if (barrierRows.isEmpty) {
        dml(normal)
      } else {
        // Segment the DML stream at the barrier timestamps; apply each
        // segment, then its trailing barrier, serially.
        val cuts = barrierRows.map(_.getAs[Long]("ts_packed"))
        var lo = Long.MinValue
        barrierRows.zip(cuts).zipWithIndex.foreach { case ((row, cut), i) =>
          dml(normal.filter(col("ts_packed") > lo && col("ts_packed") <= cut))
          target.applyCommand(spark, row, batchId, i)
          lo = cut
        }
        dml(normal.filter(col("ts_packed") > lo))
      }

      // Checkpoint row — only after every segment is durable. Built from
      // the materialization pass's bounds (same values the old per-batch
      // agg recomputed; ordering contract unchanged — the WRITE still
      // happens strictly after every segment).
      import spark.implicits._
      val ck = Seq((stats.getLong(1), stats.getLong(2), nRows, batchId))
        .toDF("lsn_min", "lsn_max", "n_logs", "batch_id")
      target.commitCheckpoint(ck, batchId)
      } finally spark.conf.set(spKey, prevSp)
    } finally batch.unpersist()
  }

  /** Delta-batch cadence of the read-side merge: [[compactState]] folds
    * pending deltas into the base once at least this many have
    * accumulated (checked at each checkpoint commit, so the cadence is
    * ckpt-aligned). Bounds read amplification to < CompactEveryDeltas
    * batch-sized scans on top of the base; raising it trades read cost
    * for less compaction write amplification — at real state volume the
    * cadence would be byte-budgeted (compact when Σ delta bytes exceeds
    * a fraction of base bytes), which this count approximates at harness
    * delivery sizes.
    */
  val CompactEveryDeltas = 8

  /** Pending-delta root of a state table path. */
  def deltaRootOf(statePath: String): String = statePath + "_delta"

  /** Pending delta directories under `statePath`_delta, (prio, path),
    * sorted by prio ascending. Prio is the total order of the
    * last-writer-wins fold: assigned [[nextDeltaPrio]] = max existing + 1
    * at append time, so it is monotone across restarts and replays (an
    * at-least-once replayed segment re-appends the SAME content at a
    * higher prio — the fold is unchanged).
    */
  private[graft] def listDeltaDirs(spark: SparkSession,
      statePath: String): Seq[(Long, String)] = {
    val root = new Path(deltaRootOf(statePath))
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(root)) Nil
    else fs.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("d="))
      .flatMap(s => scala.util.Try(s.getPath.getName.stripPrefix("d=").toLong)
        .toOption.map(p => (p, s.getPath.toString)))
      .sortBy(_._1)
  }

  /** Next delta prio for an append: one past the newest pending delta.
    * Filesystem-derived (not an in-memory counter) so it stays monotone
    * across process restarts — the property the LWW fold needs.
    */
  private[graft] def nextDeltaPrio(spark: SparkSession, statePath: String): Long =
    listDeltaDirs(spark, statePath).lastOption.map(_._1 + 1L).getOrElse(0L)

  /** Base (compacted) state table read — no pending deltas merged. If the
    * base is mid-compaction-swap (crash window: `state` renamed away,
    * replacement not yet promoted), falls back READ-ONLY to the staged
    * backup; [[compactState]] is the mutating recovery point.
    */
  private[streaming] def readBase(spark: SparkSession, path: String): DataFrame = {
    val schema = StructType(stateFields.map { case (n, t) => StructField(n, t) })
    val fs = new Path(path).getFileSystem(spark.sessionState.newHadoopConf())
    val resolved =
      if (fs.exists(new Path(path))) Some(path)
      else if (fs.exists(new Path(path + "_cmp_old"))) Some(path + "_cmp_old")
      else None
    resolved match {
      case Some(p) =>
        // basePath keeps the bucket partition column in the projection.
        spark.read.option("basePath", p).schema(schema).parquet(p)
      case None =>
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    }
  }

  /** Read the state table (empty DataFrame if absent yet): the base plus
    * the last-writer-wins fold of any pending deltas — the LSM read-side
    * merge. With no pending deltas this is exactly the former plain
    * bucketed read (no extra plan nodes).
    */
  def readOrEmpty(spark: SparkSession, path: String): DataFrame =
    readMerged(spark, path, None)

  /** [[readOrEmpty]] pruned to a bucket subset BEFORE the merge fold — a
    * key's bucket is a pure function of (ns, doc_key), so pre-filtering
    * base and delta scans on the partition column is semantically
    * identical to filtering the merged view, and it keeps the physical
    * partition-directory pruning a point lookup relies on.
    */
  private[graft] def readStatePruned(spark: SparkSession, statePath: String,
      buckets: Seq[Int]): DataFrame =
    readMerged(spark, statePath, Some(buckets))

  private def readMerged(spark: SparkSession, statePath: String,
      prune: Option[Seq[Int]]): DataFrame = {
    def pruned(df: DataFrame): DataFrame =
      prune.fold(df)(bs => df.filter(col("bucket")
        .isin(bs.map(Integer.valueOf): _*)))
    val base = pruned(readBase(spark, statePath))
    val deltaDirs = listDeltaDirs(spark, statePath)
    if (deltaDirs.isEmpty) return base
    val deltaSchema = StructType(
      stateFields.map { case (n, t) => StructField(n, t) } ++
        Seq(StructField("op", StringType), StructField("_prio", LongType)))
    // basePath at the delta root also surfaces the `d=<prio>` directory
    // level as a partition column — project it away (the fold's order
    // comes from the in-row _prio, which unlike the dir name is typed).
    val deltas = pruned(
      spark.read.option("basePath", deltaRootOf(statePath))
        .schema(deltaSchema).parquet(deltaDirs.map(_._2): _*))
      .select(col("ns"), col("doc_key"), col("last_value"),
        col("last_event_id"), col("batch_ops"), col("bucket"),
        col("op"), col("_prio"))
    // LWW fold: the winning row per key is the one with the highest prio
    // (base = -1); a winner whose last op was a delete drops the key.
    // One row per key per side by construction (base is compacted,
    // each delta is a lastPerKey set), so the argmax never ties.
    base.withColumn("op", lit("u")).withColumn("_prio", lit(-1L))
      .unionByName(deltas)
      .groupBy(col("ns"), col("doc_key"))
      .agg(max_by(struct(col("last_value"), col("last_event_id"),
        col("batch_ops"), col("bucket"), col("op")), col("_prio")).as("m"))
      .filter(col("m.op") =!= "d")
      .select(col("ns"), col("doc_key"),
        col("m.last_value").as("last_value"),
        col("m.last_event_id").as("last_event_id"),
        col("m.batch_ops").as("batch_ops"),
        col("m.bucket").as("bucket"))
  }

  /** Complete an interrupted [[compactState]] swap: if the base is
    * missing but the staged backup exists, the crash hit between the two
    * renames — restore the backup (the tmp write, if any, is discarded:
    * it may be partial only if the crash preceded the swap; post-swap it
    * is the promoted base and this branch never triggers).
    */
  def recoverCompact(spark: SparkSession, statePath: String): Unit = {
    val state = new Path(statePath)
    val old = new Path(statePath + "_cmp_old")
    val tmp = new Path(statePath + "_cmp_tmp")
    val fs = state.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(state) && fs.exists(old)) fs.rename(old, state)
    if (fs.exists(tmp)) fs.delete(tmp, true)
    if (fs.exists(state) && fs.exists(old)) fs.delete(old, true)
  }

  /** Shuffle width for a full-state rewrite ([[compactState]], DDL
    * rewrites, re-bucketing): derived from the MEASURED on-disk bytes of
    * base + pending deltas (one getContentSummary call each), ~128 MB per
    * partition — the state-volume sizing the batch-derived [[applyParts]]
    * deliberately does not govern (ADVICE r19: a state-volume shuffle at
    * the batch-derived width is a throughput cliff at 100 TB). Floor 1:
    * harness-scale states compact in a single task; cap 4096 as
    * elsewhere.
    */
  private[graft] def compactParts(stateBytes: Long): Int = {
    var p = 1L
    while (p < 4096 && p * (128L << 20) < stateBytes) p *= 2
    p.toInt
  }

  private def stateBytes(spark: SparkSession, statePath: String,
      deltaDirs: Seq[(Long, String)]): Long = {
    val fs = new Path(statePath).getFileSystem(spark.sessionState.newHadoopConf())
    def len(p: String): Long =
      if (fs.exists(new Path(p))) fs.getContentSummary(new Path(p)).getLength else 0L
    len(statePath) + deltaDirs.map(d => len(d._2)).sum
  }

  /** Fold pending deltas into the base (optionally transforming the
    * merged view — the DDL rewrite path): write the merged state to a
    * temp dir at a state-volume-derived width, swap it in with a staged
    * backup (`state → state_cmp_old; tmp → state; drop old` — crash
    * mid-swap leaves a recoverable layout, [[recoverCompact]]), then
    * drop exactly the delta directories the fold consumed. A delta
    * appended concurrently (sharded fan-out serializes on the target
    * lock, but the capture is structural anyway) survives and re-merges
    * on the next read — and a CRASH between swap and delta-drop is
    * idempotent for the same reason: re-merging a folded delta onto the
    * compacted base re-elects the same rows.
    */
  def compactState(spark: SparkSession, statePath: String,
      transform: DataFrame => DataFrame = identity): Unit = {
    recoverCompact(spark, statePath)
    val state = new Path(statePath)
    val fs = state.getFileSystem(spark.sessionState.newHadoopConf())
    val deltaDirs = listDeltaDirs(spark, statePath)
    if (!fs.exists(state) && deltaDirs.isEmpty) return
    val parts = compactParts(stateBytes(spark, statePath, deltaDirs))
    val tmp = new Path(statePath + "_cmp_tmp")
    transform(readMerged(spark, statePath, None))
      .repartition(parts, col("bucket"))
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .partitionBy("bucket").parquet(tmp.toString)
    val old = new Path(statePath + "_cmp_old")
    if (fs.exists(state)) require(fs.rename(state, old), s"cannot stage $statePath aside")
    require(fs.rename(tmp, state), s"cannot promote compacted state at $statePath")
    fs.delete(old, true)
    deltaDirs.foreach { case (_, dir) => fs.delete(new Path(dir), true) }
    val root = new Path(deltaRootOf(statePath))
    if (fs.exists(root) && fs.listStatus(root).isEmpty) fs.delete(root, true)
  }

  /** Recursive delete via the Hadoop FileSystem (works on any scheme). */
  def deletePath(spark: SparkSession, path: String): Unit = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(p)) fs.delete(p, true)
  }
}
