package graft.streaming

/** The validated engine configuration — the Spark-native port of the
  * reference's config-sanitization sweep (`cmd/collector/sanitize.go:93-365`:
  * `checkDefaultValue` fills defaults and rejects out-of-vocabulary values,
  * `checkConflict` runs the cross-field checks). The reference runs ~40
  * checks; the subset here is everything not tied to a live server
  * connection or the REST/quorum surfaces the survey maps n-a
  * (`checkConnection`'s dial-outs, HTTP port dedup, profiling ports).
  *
  * Shape: [[GraftConfig.sanitize]] returns either the config with every
  * default filled and every forced coercion applied (the reference mutates
  * `conf.Options` in place; a case-class copy is the functional same), or
  * the FIRST violated check's reason — the reference returns on first
  * error too, so the matrix in `CoordinatorSpec` can pin reasons 1:1.
  *
  * Graft-specific fields ride the same sweep: `nBuckets` (the state-table
  * layout constant, see [[Rebucket]]) and the `trigger`/`txnTtlMs` pair —
  * a positive transaction TTL under an AvailableNow drain is REJECTED
  * here (a processing-time timeout needs the no-data batches only a
  * continuous trigger schedules; the query would never terminate).
  */
final case class GraftConfig(
    id: String = "",
    logLevel: String = "", // {debug, info, warning, error}
    logFileName: String = "",
    connectMode: String = "", // mongo_connect_mode
    syncMode: String = "", // {all, full, incr}
    sourceUrls: Seq[String] = Nil, // mongo_urls
    mongosUrl: String = "", // mongo_s_url
    configServerUrl: String = "", // mongo_cs_url
    checkpointStorage: String = "", // {database, api}
    checkpointStorageUrl: String = "",
    checkpointStorageDb: String = "", // checkpoint.storage.db
    checkpointStorageCollection: String = "", // checkpoint.storage.collection
    checkpointStartPositionSec: Long = 0,
    checkpointIntervalMs: Long = 0,
    fetchMethod: String = "", // {oplog, change_stream}
    tunnel: String = "", // {direct, rpc, tcp, file, kafka, mock}
    tunnelAddress: Seq[String] = Nil,
    tunnelMessage: String = "", // {raw, bson, json}
    tunnelWriteThread: Int = 0,
    kafkaPartitions: Int = 0,
    compressor: String = "", // {none, gzip, zlib, deflate, snappy}
    workers: Int = 0, // incr_sync.worker
    executors: Int = 0, // incr_sync.executor
    conflictWriteTo: String = "", // {none, db, sdk}
    shardKey: String = "", // {auto, id, collection}
    shardByObjectIdWhiteList: Seq[String] = Nil,
    white: Seq[String] = Nil,
    black: Seq[String] = Nil,
    ddlEnable: Boolean = false,
    watchFullDocument: Boolean = false,
    targetDelaySec: Long = 0,
    batchingMaxSize: Int = 0,
    fetcherBufferCapacity: Int = 0,
    workerBatchQueueSize: Int = 0, // incr_sync.worker.batch_queue_size
    readerFetchBatchSize: Int = 0, // incr_sync.reader.fetch_batch_size
    readerBufferTimeSec: Int = 0, // incr_sync.reader.buffer_time
    readerDebug: String = "", // incr_sync.reader.debug {"", discard, print}
    specialSourceDbFlag: String = "", // {"", aliyun_serverless}
    passSpecialDb: Seq[String] = Nil, // filter.pass.special.db → OplogFilters.notAutologousWithPass
    fullSyncParallelThread: Int = 0,
    fullSyncCollectionParallel: Int = 0, // full_sync.reader.collection_parallel
    fullSyncDocumentParallel: Int = 0, // full_sync.reader.write_document_parallel
    fullSyncParallelIndex: String = "", // full_sync.reader.parallel_index
    fullSyncDocumentBatchSize: Int = 0, // full_sync.reader.document_batch_size
    fullSyncFetchBatchSize: Int = 0, // full_sync.reader.fetch_batch_size
    fullSyncCreateIndex: String = "", // {none, foreground, background}
    fullSyncHttpPort: Int = -1, // full_sync.http_port; −1 = disabled (dev flag)
    oplogStoreDisk: Boolean = false,
    oplogStoreDiskMaxSize: Long = 0, // full_sync.reader.oplog_store_disk_max_size (MB)
    masterQuorum: Boolean = false,
    nBuckets: Int = IncrSync.StateBuckets,
    trigger: String = "", // {available_now, processing_time}
    txnTtlMs: Long = 0,
    stateStoreProvider: String = "", // {"", default, rocksdb}; "" = auto-select
    streamStateRows: Long = 0, // projected TOTAL live state rows (all stores)
    executorHeapMb: Long = 0, // 0 = detect (spark.executor.memory, else Runtime.maxMemory)
    journal: String = "", // {none, sampling, all} — sentinel OplogDump 0/1/2
    httpPort: Int = -1, // incr_sync.http_port; −1 = monitor disabled (dev flag)
    confVersion: Int = Fcv.Configuration.currentVersion) {

  /** Result of [[sanitize]]: `collisionEnable` is the one derived flag the
    * reference computes rather than validates (`sanitize.go:420`).
    */
  def collisionEnable: Boolean = executors != 1

  /** Derived storage namespaces (`sanitize.go:272-275` AppDatabase /
    * APPConflictDatabase): the checkpoint home and the conflict-dump
    * database the autologous filter must ignore. The reference's sprintf
    * quirk ("%s_%s" of "mongoshake" and "_conflict" →
    * "mongoshake__conflict", contradicting its own `common.go:43`
    * constant) is NOT reproduced — graft matches the constant, which is
    * what `OplogFilters`' ignore set and the conflict sink actually use.
    */
  def appDatabase: String =
    if (checkpointStorageDb.nonEmpty) checkpointStorageDb else "mongoshake"
  def conflictDatabase: String = appDatabase + "_conflict"

  def sanitize: Either[String, GraftConfig] = {
    var c = this

    // ---- FCV gate (`collector/configure/check.go:37-40`, run before
    // any other check in `cmd/collector/collector.go:48`): a config
    // below the feature-compatibility floor is rejected with the lowest
    // release able to read it.
    Fcv.checkConfigurationVersion(c.confVersion) match {
      case Left(reason) => return Left(reason)
      case Right(_) => ()
    }

    // ---- checkDefaultValue (`sanitize.go:73-267`): fill, then gate ----
    if (c.id.isEmpty) c = c.copy(id = "graft")
    if (c.logLevel.isEmpty) c = c.copy(logLevel = "info")
    if (!Set("debug", "info", "warning", "error")(c.logLevel))
      return Left("log.level should in {debug, info, warning, error}")
    if (c.logFileName.isEmpty) c = c.copy(logFileName = "graft.log")
    if (c.syncMode.isEmpty) c = c.copy(syncMode = "incr")
    if (!Set("all", "full", "incr")(c.syncMode))
      return Left("sync_mode should in {all, full, incr}")
    if (c.mongosUrl.isEmpty && c.sourceUrls.isEmpty)
      return Left("mongo_s_url and mongo_urls cannot be empty at the same time")
    if (c.connectMode.isEmpty) c = c.copy(connectMode = "secondaryPreferred")
    if (!Set("primary", "secondaryPreferred", "secondary", "nearest",
        "standalone")(c.connectMode))
      return Left("mongo_connect_mode should in {primary, secondaryPreferred, " +
        "secondary, nearest, standalone}")

    if (c.fetchMethod.isEmpty) c = c.copy(fetchMethod = "oplog")
    if (!Set("oplog", "change_stream")(c.fetchMethod))
      return Left("incr_sync.mongo_fetch_method should in {oplog, change_stream}")

    if (c.checkpointStorage.isEmpty) c = c.copy(checkpointStorage = "database")
    if (!Set("database", "api")(c.checkpointStorage))
      return Left("checkpoint.storage should in {database, api}")
    if (c.checkpointStorageDb.isEmpty) c = c.copy(checkpointStorageDb = "mongoshake")
    if (c.checkpointStorageCollection.isEmpty)
      c = c.copy(checkpointStorageCollection = "ckpt_default")
    if (c.checkpointStartPositionSec <= 0) c = c.copy(checkpointStartPositionSec = 1)
    if (c.checkpointIntervalMs <= 0) c = c.copy(checkpointIntervalMs = 5000)

    // full-sync reader knobs (`sanitize.go:152-182`)
    if (c.fullSyncCollectionParallel <= 0) c = c.copy(fullSyncCollectionParallel = 6)
    if (c.fullSyncDocumentParallel <= 0) c = c.copy(fullSyncDocumentParallel = 8)
    if (c.fullSyncParallelThread <= 0) c = c.copy(fullSyncParallelThread = 1)
    else if (c.fullSyncParallelThread > 128)
      return Left("full_sync.reader.parallel_thread should <= 128")
    if (c.fullSyncParallelIndex.isEmpty) c = c.copy(fullSyncParallelIndex = "_id")
    if (c.fullSyncDocumentBatchSize <= 0) c = c.copy(fullSyncDocumentBatchSize = 128)
    if (c.fullSyncFetchBatchSize <= 0) c = c.copy(fullSyncFetchBatchSize = 1024)
    if (c.fullSyncCreateIndex.isEmpty) c = c.copy(fullSyncCreateIndex = "foreground")
    if (!Set("none", "foreground", "background")(c.fullSyncCreateIndex))
      return Left("full_sync.create_index should in {none, foreground, background}")
    if (c.oplogStoreDiskMaxSize <= 0) c = c.copy(oplogStoreDiskMaxSize = 256000)

    if (c.shardKey.isEmpty) c = c.copy(shardKey = "collection")
    if (!Set("auto", "id", "collection")(c.shardKey))
      return Left("incr_sync.shard_key should in {auto, id, collection}")
    if (c.shardByObjectIdWhiteList.nonEmpty && c.shardKey != "collection")
      return Left("incr_sync.shard_by_object_id_whitelist should only be set " +
        "when 'incr_sync.shard_key == collection'")

    if (c.workers == 0) c = c.copy(workers = 8)
    else if (c.workers < 0 || c.workers > 256)
      return Left(s"incr_sync.worker[${c.workers}] should in range [1, 256]")
    if (c.tunnelWriteThread == 0) c = c.copy(tunnelWriteThread = c.workers)
    else if (c.tunnelWriteThread % c.workers != 0)
      return Left(s"incr_sync.tunnel.write_thread[${c.tunnelWriteThread}] must be " +
        s"an integer multiple of incr_sync.worker[${c.workers}]")

    if (c.compressor.isEmpty) c = c.copy(compressor = "none")
    if (!Set("none", "gzip", "zlib", "deflate", "snappy")(c.compressor))
      return Left("incr_sync.worker.oplog_compressor in {none, gzip, zlib, deflate, snappy}")
    if (c.targetDelaySec < 0) c = c.copy(targetDelaySec = 0)
    if (c.workerBatchQueueSize <= 0) c = c.copy(workerBatchQueueSize = 64)
    if (c.batchingMaxSize <= 0) c = c.copy(batchingMaxSize = 1024)
    if (c.fetcherBufferCapacity <= 0) c = c.copy(fetcherBufferCapacity = 256)
    if (c.readerFetchBatchSize <= 0) c = c.copy(readerFetchBatchSize = 1024)
    if (c.readerBufferTimeSec <= 0) c = c.copy(readerBufferTimeSec = 1)

    if (c.tunnel.isEmpty) c = c.copy(tunnel = "direct")
    if (!Set("direct", "rpc", "tcp", "file", "kafka", "mock")(c.tunnel))
      return Left("incr_sync.tunnel in {direct, rpc, tcp, file, kafka, mock}")
    if (c.tunnelMessage.isEmpty) c = c.copy(tunnelMessage = "raw")
    if (!Set("raw", "bson", "json")(c.tunnelMessage))
      return Left("incr_sync.tunnel.message in {raw, bson, json}")
    if (c.executors <= 0) c = c.copy(executors = 1)
    if (c.conflictWriteTo.isEmpty) c = c.copy(conflictWriteTo = "none")
    if (!Set("none", "db", "sdk")(c.conflictWriteTo))
      return Left("incr_sync.conflict_write_to in {none, db, sdk}")

    // ---- checkConflict (`sanitize.go:338-482`): cross-field gates ----
    // Distinct REST ports for the two sync stages (`sanitize.go:341-345`).
    // Adapted to graft's port conventions: −1 = monitor disabled, 0 =
    // ephemeral bind (the reference's MayBeRandom analogue) — the
    // inequality gate applies only to two FIXED bindings.
    if (c.fullSyncHttpPort > 65535)
      return Left(s"full_sync.http_port[${c.fullSyncHttpPort}] should be <= 65535")
    if (c.fullSyncHttpPort > 0 && c.fullSyncHttpPort == c.httpPort)
      return Left("full_sync.http_port should not equal to incr_sync.http_port")
    if (c.configServerUrl.isEmpty && c.sourceUrls.length > 1)
      return Left("mongo_cs_url be config server address when source MongoDB is sharding")
    if (c.checkpointStorageUrl.isEmpty) {
      if (c.sourceUrls.length == 1) c = c.copy(checkpointStorageUrl = c.sourceUrls.head)
      else if (c.mongosUrl.nonEmpty) c = c.copy(checkpointStorageUrl = c.mongosUrl)
      else return Left("checkpoint.storage.url should be given when source is sharding")
    }
    if (c.sourceUrls.distinct.length != c.sourceUrls.length)
      return Left("mongo urls were duplicated")
    if (c.masterQuorum && c.checkpointStorage != "database")
      return Left("context storage should set to 'database' while master election enabled")
    if (c.black.nonEmpty && c.white.nonEmpty)
      return Left("at most one of {filter.namespace.black, filter.namespace.white} can be given")
    if (c.specialSourceDbFlag.nonEmpty && c.specialSourceDbFlag != "aliyun_serverless")
      return Left("special.source.db.flag should be empty or 'aliyun_serverless'")
    if (c.specialSourceDbFlag == "aliyun_serverless" && c.fetchMethod != "change_stream")
      return Left("incr_sync.mongo_fetch_method must be 'change_stream' when " +
        "special.source.db.flag is set")

    if (c.sourceUrls.length > 1) {
      // sharded source over oplog tails one reader per shard
      if (c.fetchMethod == "oplog" && c.workers != c.sourceUrls.length)
        c = c.copy(workers = c.sourceUrls.length)
      if (c.ddlEnable && c.fetchMethod == "oplog")
        return Left("DDL is not support for sharding when incr_sync.mongo_fetch_method == 'oplog'")
      if (c.fetchMethod == "change_stream" && c.mongosUrl.isEmpty)
        return Left("mongo_s_url should be given when source is sharding and fetch method is change stream")
    }
    if (c.tunnel == "direct" && c.compressor != "none")
      c = c.copy(compressor = "none")
    if (c.tunnelAddress.isEmpty && c.tunnel != "mock")
      return Left("incr_sync.tunnel.address shouldn't be empty when incr_sync.tunnel != 'mock'")
    if (c.kafkaPartitions <= 0) c = c.copy(kafkaPartitions = 1)
    else if (c.kafkaPartitions > c.workers)
      return Left(s"tunnel.kafka.partition[${c.kafkaPartitions}] number should <= " +
        s"incr_sync.worker number[${c.workers}]")
    if (c.tunnel != "direct" && c.syncMode != "incr")
      return Left("full sync only support when tunnel type == direct")
    if (c.tunnelMessage != "raw" && c.compressor != "none")
      c = c.copy(compressor = "none")
    if (c.oplogStoreDisk && c.syncMode != "all")
      c = c.copy(oplogStoreDisk = false)
    if (c.watchFullDocument && c.tunnel == "direct")
      c = c.copy(watchFullDocument = false)
    if (c.syncMode != "incr") c = c.copy(checkpointStartPositionSec = 1)
    // inner debug vocabulary (`sanitize.go:475-479`)
    if (!Set("", "discard", "print")(c.readerDebug))
      return Left(s"incr_sync.reader.debug[${c.readerDebug}] invalid")

    // ---- graft state/stream knobs ----
    if (c.nBuckets <= 0 || c.nBuckets > (1 << 20))
      return Left(s"state.buckets[${c.nBuckets}] should in range [1, 1048576]")
    if (c.trigger.isEmpty) c = c.copy(trigger = "available_now")
    if (!Set("available_now", "processing_time")(c.trigger))
      return Left("trigger should in {available_now, processing_time}")
    if (c.journal.isEmpty) c = c.copy(journal = "none")
    if (!Set("none", "sampling", "all")(c.journal))
      return Left("incr_sync.oplog_dump should in {none, sampling, all}")
    // incr_sync.http_port: −1 keeps the REST monitor unbound (the dev
    // flag); 0 = ephemeral bind (tests); otherwise a real port
    if (c.httpPort > 65535)
      return Left(s"incr_sync.http_port[${c.httpPort}] should be <= 65535")
    if (c.txnTtlMs < 0) c = c.copy(txnTtlMs = 0)
    if (c.txnTtlMs > 0 && c.trigger == "available_now")
      return Left("txn_ttl_ms requires trigger == 'processing_time': an AvailableNow " +
        "drain never schedules the no-data batches that fire processing-time " +
        "timeouts, so the query would not terminate")

    // ---- state-store availability cliff (SCALE_r14 `tools/StateFlip`) ----
    // The HDFS-backed (default) provider holds every partition's full
    // UnsafeRow map PLUS maintenance-retained versions on heap: measured
    // ~150 B/row × ~2.5 overhead on the join shape, and at 12.8M rows/side
    // on an 8 GB heap it does not degrade — it DIES
    // (`HDFS_STORE_PROVIDER_OUT_OF_MEMORY`, the executor OOM kills the
    // JVM), while RocksDB keeps draining off-heap. So the provider choice
    // is a cross-field availability gate, not a tuning preference: fill it
    // from projected live state vs executor heap when unset, and REFUSE a
    // hand-forced default that the projection says cannot survive —
    // first-error-wins like every other rule in this sweep
    // (`cmd/collector/sanitize.go:93-365` is the reference's analogue
    // shape for computed-vs-declared conflicts).
    if (c.executorHeapMb <= 0)
      c = c.copy(executorHeapMb = GraftConfig.detectedExecutorHeapMb)
    val projectedStateMb = GraftConfig.projectedStateMb(c.streamStateRows)
    // Auto-select applies a safety factor (62.5% of heap): the measured
    // anchors are 56% of heap HEALTHY and 112% DEAD — nothing in between
    // is measured, and the JVM's non-state memory (shuffle, execution,
    // code cache) needs headroom, so auto never picks the on-heap
    // provider into the unmeasured 63-99% band (ADVICE r16). The hard
    // REFUSAL below stays at >= heap: an operator may knowingly force
    // the default into the band, but not past the measured cliff.
    if (c.stateStoreProvider.isEmpty)
      c = c.copy(stateStoreProvider =
        if (projectedStateMb * 8L < c.executorHeapMb * 5L) "default"
        else "rocksdb")
    if (!Set("default", "rocksdb")(c.stateStoreProvider))
      return Left("state_store.provider should in {default, rocksdb}")
    if (c.stateStoreProvider == "default" && c.streamStateRows > 0 &&
        projectedStateMb >= c.executorHeapMb)
      return Left(s"state_store.provider 'default' cannot hold the projected " +
        s"live state: ${c.streamStateRows} rows x ${GraftConfig.StateBytesPerRow} B " +
        s"x 2.5 heap factor = ${projectedStateMb} MB >= " +
        s"executor heap ${c.executorHeapMb} MB - the HDFS-backed provider dies with " +
        "HDFS_STORE_PROVIDER_OUT_OF_MEMORY past this point (SCALE_r14 StateFlip: " +
        "12.8M rows/side on an 8 GB heap); repartition first (halving rows per " +
        "partition moves the boundary linearly) or set state_store.provider = 'rocksdb'")

    Right(c)
  }
}

object GraftConfig {
  /** Measured per-row live-state footprint on the stream-join shape
    * (~96 B payload + key/version framing — SCALE_r14 StateFlip).
    */
  val StateBytesPerRow: Long = 150L

  /** Projected on-heap MB for `rows` live state rows under the default
    * provider: ~150 B/row raw x ~2.5 heap amplification (the in-heap
    * UnsafeRow map plus maintenance-retained versions — SCALE_r14), as
    * exact integer math (x5/2). Both measured StateFlip points land on
    * the right side of the `>= heap` gate: 12.8M total rows → 4.6 GB
    * (healthy at 16.2 s on 8 GB) vs 25.6M total → 9.2 GB (dead).
    */
  def projectedStateMb(rows: Long): Long =
    rows * StateBytesPerRow * 5L / 2L / (1024L * 1024L)

  /** Executor heap for the state-store gate when the config leaves it
    * unset: on a CLUSTER master, prefer `spark.executor.memory` from the
    * live session's conf (what the executors actually get — the driver
    * JVM's heap would understate or overstate risk, ADVICE r16), and when
    * THAT is also unset fall back to Spark's own executor default (1g) —
    * never the driver JVM's `Runtime.maxMemory`, which can grossly
    * overstate the 1g heap the executors actually launch with (ADVICE
    * r17). In LOCAL mode, use the current JVM's `Runtime.maxMemory` —
    * there the driver JVM IS the executor, and `spark.executor.memory`
    * is ignored by Spark, so a set-but-inert conf value must not win (it
    * would let the projection pass a heap the JVM does not have). Local
    * is matched strictly (`local` / `local[...]`): `local-cluster[...]`
    * launches SEPARATE executor JVMs and must take the cluster branch.
    */
  def detectedExecutorHeapMb: Long = {
    val session = org.apache.spark.sql.SparkSession.getActiveSession
      .orElse(org.apache.spark.sql.SparkSession.getDefaultSession)
    detectedExecutorHeapMb(
      session.flatMap(s => s.conf.getOption("spark.master")),
      session.flatMap(s => s.conf.getOption("spark.executor.memory")),
      Runtime.getRuntime.maxMemory() / (1024L * 1024L))
  }

  /** The detection rule with its three inputs explicit (unit-tested rows
    * in ConfigSpec — the live entry point above only wires the session).
    */
  private[graft] def detectedExecutorHeapMb(master: Option[String],
      execMem: Option[String], jvmMb: Long): Long = {
    val isLocal = master.forall(m => m == "local" || m.startsWith("local[")) // no session / no master ⇒ JVM heap
    if (isLocal) jvmMb
    else execMem
      .flatMap(v => scala.util.Try(
        org.apache.spark.network.util.JavaUtils.byteStringAsMb(v)).toOption)
      .filter(_ > 0)
      .getOrElse( // Spark's executor-memory default when the conf is silent
        org.apache.spark.network.util.JavaUtils.byteStringAsMb("1g"))
  }

  /** Spark conf value for the sanitized provider choice. */
  def providerClass(provider: String): String =
    if (provider == "rocksdb")
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
    else
      "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider"
}
