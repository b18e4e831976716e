package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.GraftConfig

/** Rule-by-rule parity table for the config-sanitization sweep:
  * EVERY check in the reference's `cmd/collector/sanitize.go` (the
  * deprecate pass, `checkDefaultValue:73-278`, `checkConnection:280-336`,
  * `checkConflict:338-482`) is enumerated with a disposition — `ported`,
  * `ported-adapted` (semantics kept, convention adapted, reason given),
  * or `n-a` (reason given). The table itself is asserted gap-free, every
  * ported row is exercised against [[GraftConfig.sanitize]] (the
  * first-error reasons are pinned verbatim in CoordinatorSpec; this spec
  * pins the rows CoordinatorSpec predates), and the two counts the
  * VERDICT audits — total rules, unexplained gaps — fall out of the data.
  */
class ConfigSpec extends AnyFunSuite {

  private val base = GraftConfig(sourceUrls = Seq("mongodb://h1:27017"), tunnel = "mock")
  private def reject(c: GraftConfig): String =
    c.sanitize.swap.getOrElse(fail(s"expected rejection, got ${c.sanitize}"))
  private def ok(c: GraftConfig): GraftConfig = c.sanitize.toOption.get

  /** (reference rule @ file:line, disposition, why / what pins it). */
  private val table: Seq[(String, String, String)] = Seq(
    // ---- handleDeprecateConf (sanitize.go:48-71) ----
    ("Tunnel<-IncrSyncTunnel alias @48", "n-a",
      "legacy Go conf-key migration; graft has exactly one field per knob"),
    ("TunnelAddress alias @53", "n-a", "same — no deprecated spellings exist"),
    ("TunnelMessage alias @57", "n-a", "same"),
    ("HTTPListenPort alias @62", "n-a", "same"),
    ("SystemProfile alias @66", "n-a", "same"),
    // ---- checkDefaultValue (sanitize.go:73-278) ----
    ("id default @75", "ported", "fills 'graft'"),
    ("full_sync.http_port default 9101 @79", "ported-adapted",
      "graft ports are -1=disabled / 0=ephemeral; no unconditional fill, bound gate kept"),
    ("incr_sync.http_port default 9100 @82", "ported-adapted", "same convention"),
    ("system_profile port default @85", "n-a",
      "Go pprof profiling port; JVM profiling is external to the engine"),
    ("log.level vocab @89", "ported", "reject reason verbatim"),
    ("log.file default @95", "ported", "fills 'graft.log'"),
    ("sync_mode default+vocab @99", "ported", "pinned in CoordinatorSpec"),
    ("urls non-empty @106", "ported", "pinned in CoordinatorSpec"),
    ("mongo_connect_mode vocab @111", "ported", "reject reason verbatim"),
    ("change_stream sharded needs mongos @123", "ported",
      "merged with its checkConflict twin @427 — one check, same reason"),
    ("checkpoint.storage vocab @130", "ported", "pinned in CoordinatorSpec"),
    ("checkpoint.storage.url no-op fill @136", "ported",
      "fill deferred to the conflict phase, as in the reference"),
    ("checkpoint.storage.db default @139", "ported", "fills 'mongoshake'"),
    ("checkpoint.storage.collection default @142", "ported", "fills 'ckpt_default'"),
    ("checkpoint start position default @145", "ported", "<=0 -> 1"),
    ("checkpoint interval default @148", "ported", "<=0 -> 5000ms"),
    ("full_sync collection_parallel default @153", "ported", "<=0 -> 6"),
    ("full_sync write_document_parallel default @156", "ported", "<=0 -> 8"),
    ("full_sync parallel_thread default+cap @159", "ported", "pinned in CoordinatorSpec"),
    ("full_sync parallel_index default @164", "ported", "fills '_id'"),
    ("full_sync document_batch_size default @167", "ported", "<=0 -> 128"),
    ("full_sync fetch_batch_size default @170", "ported", "<=0 -> 1024"),
    ("full_sync.create_index vocab @173", "ported", "reject reason verbatim"),
    ("oplog_store_disk_max_size default @180", "ported", "<=0 -> 256000"),
    ("fetch_method default+vocab @185", "ported", "pinned in CoordinatorSpec"),
    ("shard_key default+vocab @191", "ported", "pinned in CoordinatorSpec"),
    ("objectid whitelist needs shard_key=collection @198", "ported",
      "pinned in CoordinatorSpec"),
    ("worker default+range @203", "ported", "pinned in CoordinatorSpec"),
    ("tunnel write_thread multiple @208", "ported", "pinned in CoordinatorSpec"),
    ("compressor vocab @214", "ported", "pinned in CoordinatorSpec"),
    ("target_delay floor @223", "ported", "<0 -> 0"),
    ("worker batch_queue_size default @226", "ported", "<=0 -> 64"),
    ("adaptive batching max default @229", "ported", "<=0 -> 1024"),
    ("fetcher buffer capacity default @232", "ported", "<=0 -> 256"),
    ("reader fetch_batch_size default @235", "ported", "<=0 -> 1024"),
    ("tunnel vocab @238", "ported", "pinned in CoordinatorSpec"),
    ("tunnel.message vocab @248", "ported", "pinned in CoordinatorSpec"),
    ("executor default @255", "ported", "<=0 -> 1"),
    ("conflict_write_to vocab @258", "ported", "pinned in CoordinatorSpec"),
    ("reader buffer_time default @265", "ported", "<=0 -> 1"),
    ("AppDatabase/ConflictDatabase derivation @272", "ported-adapted",
      "derived defs; the reference's sprintf quirk (mongoshake__conflict, " +
        "contradicting its own common.go:43 constant) is not reproduced"),
    // ---- checkConnection (sanitize.go:280-336) ----
    ("source mongo dial @282", "n-a", "live server connection; no MongoDB in sandbox"),
    ("config-server dial @291", "n-a", "live server connection"),
    ("target dial + TargetDBVersion @301", "n-a", "live server connection"),
    ("source version >= 3.0 @328", "n-a", "needs a server buildInfo round-trip"),
    // ---- checkConflict (sanitize.go:338-482) ----
    ("http port MayBeRandom + inequality @341", "ported-adapted",
      "0=ephemeral is the MayBeRandom analogue; inequality gates two FIXED ports"),
    ("mongo_cs_url when sharding @349", "ported", "pinned in CoordinatorSpec"),
    ("checkpoint url fill/require @353", "ported", "pinned in CoordinatorSpec"),
    ("duplicated urls @364", "ported", "pinned in CoordinatorSpec"),
    ("master_quorum needs database storage @368", "ported", "pinned in CoordinatorSpec"),
    ("black/white exclusive @372", "ported", "pinned in CoordinatorSpec"),
    ("filter.pass.special.db InitNs @376", "ported-adapted",
      "the reference mutates a global ignore map; graft parameterizes " +
        "OplogFilters.notAutologousWithPass from GraftConfig.passSpecialDb"),
    ("special.source.db.flag vocab @381", "ported", "reject reason verbatim"),
    ("aliyun_serverless needs change_stream @385", "ported", "reject reason verbatim"),
    ("sharded oplog worker snap @395", "ported", "pinned in CoordinatorSpec"),
    ("sharded oplog DDL reject @401", "ported", "pinned in CoordinatorSpec"),
    ("direct tunnel -> compressor none @406", "ported", "pinned in CoordinatorSpec"),
    ("tunnel address required unless mock @410", "ported", "pinned in CoordinatorSpec"),
    ("kafka partitions default+cap @414", "ported", "pinned in CoordinatorSpec"),
    ("collisionEnable derived @420", "ported", "pinned in CoordinatorSpec"),
    ("non-direct tunnel -> incr only @421", "ported", "pinned in CoordinatorSpec"),
    ("change_stream source >= 4.0.1 @441", "n-a", "needs a server version round-trip"),
    ("message != raw -> compressor none @452", "ported", "pinned in CoordinatorSpec"),
    ("oplog_store_disk only in 'all' @458", "ported", "pinned in CoordinatorSpec"),
    ("watch_full_document off when direct @464", "ported", "pinned in CoordinatorSpec"),
    ("start position reset when != incr @470", "ported", "pinned in CoordinatorSpec"),
    ("reader.debug vocab @475", "ported", "reject reason verbatim"))

  test("the parity table is gap-free and covers the reference sweep") {
    assert(table.size >= 40 + 5 + 4, s"expected the full sweep, got ${table.size} rows")
    val bad = table.filterNot { case (_, d, why) =>
      Set("ported", "ported-adapted", "n-a")(d) && why.nonEmpty
    }
    assert(bad.isEmpty, s"rows with unexplained dispositions: $bad")
    // the audit counts
    val ported = table.count(_._2.startsWith("ported"))
    val na = table.count(_._2 == "n-a")
    assert(ported == 61 && na == 11, s"ported=$ported n-a=$na")
  }

  test("round-14 ported rows: defaults fill to the reference values") {
    val got = ok(base)
    assert(got.logLevel == "info" && got.logFileName == "graft.log")
    assert(got.connectMode == "secondaryPreferred")
    assert(got.checkpointStorageDb == "mongoshake"
      && got.checkpointStorageCollection == "ckpt_default")
    assert(got.fullSyncCollectionParallel == 6 && got.fullSyncDocumentParallel == 8)
    assert(got.fullSyncParallelIndex == "_id")
    assert(got.fullSyncDocumentBatchSize == 128 && got.fullSyncFetchBatchSize == 1024)
    assert(got.fullSyncCreateIndex == "foreground")
    assert(got.oplogStoreDiskMaxSize == 256000L)
    assert(got.workerBatchQueueSize == 64 && got.readerFetchBatchSize == 1024)
    assert(got.readerBufferTimeSec == 1)
    assert(got.appDatabase == "mongoshake"
      && got.conflictDatabase == "mongoshake_conflict")
  }

  test("round-14 ported rows: vocabulary rejects use the reference reasons") {
    assert(reject(base.copy(logLevel = "trace")) ==
      "log.level should in {debug, info, warning, error}")
    assert(reject(base.copy(connectMode = "nearest-ish")) ==
      "mongo_connect_mode should in {primary, secondaryPreferred, " +
        "secondary, nearest, standalone}")
    assert(reject(base.copy(fullSyncCreateIndex = "async")) ==
      "full_sync.create_index should in {none, foreground, background}")
    assert(reject(base.copy(specialSourceDbFlag = "aws")) ==
      "special.source.db.flag should be empty or 'aliyun_serverless'")
    assert(reject(base.copy(specialSourceDbFlag = "aliyun_serverless")) ==
      "incr_sync.mongo_fetch_method must be 'change_stream' when " +
        "special.source.db.flag is set")
    assert(ok(base.copy(specialSourceDbFlag = "aliyun_serverless",
      fetchMethod = "change_stream")).specialSourceDbFlag == "aliyun_serverless")
    assert(reject(base.copy(readerDebug = "trace")) ==
      "incr_sync.reader.debug[trace] invalid")
    assert(ok(base.copy(readerDebug = "discard")).readerDebug == "discard")
    assert(reject(base.copy(fullSyncHttpPort = 9100, httpPort = 9100)) ==
      "full_sync.http_port should not equal to incr_sync.http_port")
    assert(reject(base.copy(fullSyncHttpPort = 99999)).contains("full_sync.http_port"))
    // two ephemeral (0) or disabled (-1) ports never trip the inequality
    assert(ok(base.copy(fullSyncHttpPort = 0, httpPort = 0)).fullSyncHttpPort == 0)
  }

  test("state-store availability cliff: auto-select, refuse, and vocabulary") {
    // Heap pinned so the rows are deterministic across JVMs: 8192 MB —
    // the SCALE_r14 StateFlip heap, so the measured points ARE the rows.
    val heap = base.copy(executorHeapMb = 8192)

    // (a) auto-select, small state: 6.4M rows/side (12.8M total) was the
    // largest size the default provider survived (16.2 s) — projection
    // 12.8M x 150 B x 2.5 = 4577 MB < 8192 MB keeps the faster default.
    val small = ok(heap.copy(streamStateRows = 12800000L))
    assert(small.stateStoreProvider == "default")
    assert(GraftConfig.projectedStateMb(12800000L) == 4577L)

    // (b) auto-select, big state: 12.8M rows/side (25.6M total) killed the
    // JVM under the default provider (HDFS_STORE_PROVIDER_OUT_OF_MEMORY);
    // projection 9155 MB >= 8192 MB flips to RocksDB with no hand config.
    val big = ok(heap.copy(streamStateRows = 25600000L))
    assert(big.stateStoreProvider == "rocksdb")
    assert(GraftConfig.projectedStateMb(25600000L) == 9155L)

    // (b2) the UNMEASURED band (62.5%..100% of heap): auto-select plays
    // safe and picks RocksDB (the 56%-healthy / 112%-dead anchors leave
    // no measured headroom there), but a hand-forced default is still
    // honored — the hard refusal only starts at >= heap. 16M total rows
    // → 5722 MB = 69.8% of the 8192 MB heap.
    assert(GraftConfig.projectedStateMb(16000000L) == 5722L)
    val band = ok(heap.copy(streamStateRows = 16000000L))
    assert(band.stateStoreProvider == "rocksdb")
    assert(ok(heap.copy(streamStateRows = 16000000L,
      stateStoreProvider = "default")).stateStoreProvider == "default")
    // heap detection never returns a non-positive value (local mode:
    // Runtime.maxMemory fallback; cluster: spark.executor.memory)
    assert(GraftConfig.detectedExecutorHeapMb > 0)
    // detection rows (ADVICE r17): strict local match — `local` and
    // `local[...]` read the JVM heap (the driver IS the executor there,
    // an inert spark.executor.memory must not win)...
    assert(GraftConfig.detectedExecutorHeapMb(Some("local"), Some("64g"), 7777L) == 7777L)
    assert(GraftConfig.detectedExecutorHeapMb(Some("local[32]"), None, 7777L) == 7777L)
    assert(GraftConfig.detectedExecutorHeapMb(None, Some("64g"), 7777L) == 7777L)
    // ...but `local-cluster[...]` launches SEPARATE executor JVMs and
    // takes the cluster branch, and a cluster master with the conf unset
    // falls back to Spark's 1g executor default — never the driver JVM's
    // maxMemory, which would let the state gate pass a heap the
    // executors don't have
    assert(GraftConfig.detectedExecutorHeapMb(
      Some("local-cluster[2,1,1024]"), None, 65536L) == 1024L)
    assert(GraftConfig.detectedExecutorHeapMb(
      Some("spark://host:7077"), None, 65536L) == 1024L)
    assert(GraftConfig.detectedExecutorHeapMb(
      Some("spark://host:7077"), Some("4g"), 65536L) == 4096L)
    assert(GraftConfig.detectedExecutorHeapMb(
      Some("yarn"), Some("not-a-size"), 65536L) == 1024L)

    // (c) a hand-forced default past the cliff is REFUSED with the
    // measured numbers (first-error-wins, like every sanitize rule)
    val reason = reject(heap.copy(streamStateRows = 25600000L,
      stateStoreProvider = "default"))
    assert(reason.contains("HDFS_STORE_PROVIDER_OUT_OF_MEMORY")
      && reason.contains("9155 MB") && reason.contains("8192 MB"), reason)

    // (d) vocabulary + explicit choices pass through
    assert(reject(heap.copy(stateStoreProvider = "leveldb")) ==
      "state_store.provider should in {default, rocksdb}")
    assert(ok(heap.copy(streamStateRows = 25600000L,
      stateStoreProvider = "rocksdb")).stateStoreProvider == "rocksdb")
    // explicit default BELOW the cliff is honored (the gate only refuses
    // what the projection says cannot survive)
    assert(ok(heap.copy(streamStateRows = 12800000L,
      stateStoreProvider = "default")).stateStoreProvider == "default")
    // unknown state volume (0) never blocks a forced default
    assert(ok(heap.copy(stateStoreProvider = "default")).stateStoreProvider
      == "default")
    // provider-class mapping used by the streaming harnesses
    assert(GraftConfig.providerClass("rocksdb").endsWith("RocksDBStateStoreProvider"))
    assert(GraftConfig.providerClass("default").endsWith("HDFSBackedStateStoreProvider"))
  }

  test("filter.pass.special.db removes the configured dbs from the ignore set") {
    import org.apache.spark.sql.functions.col
    val spark = SparkTest.spark
    import spark.implicits._
    val rows = Seq(("config", "config.chunks"), ("local", "local.oplog.rs"),
      ("app", "app.users"), ("mongoshake", "mongoshake.ckpt"))
      .toDF("db", "ns")
    def kept(pass: Seq[String]): Set[String] =
      rows.filter(graft.filters.OplogFilters.notAutologousWithPass(pass))
        .select(col("ns")).as[String].collect().toSet
    assert(kept(Nil) == Set("app.users"))
    assert(kept(Seq("config")) == Set("app.users", "config.chunks"))
    assert(kept(Seq("config", "local", "mongoshake")) ==
      Set("app.users", "config.chunks", "local.oplog.rs", "mongoshake.ckpt"))
  }
}
