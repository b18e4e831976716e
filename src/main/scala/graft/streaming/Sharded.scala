package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Sharded-source fan-out support (reference
  * `collector/coordinator/incr.go:20-57`: one oplog syncer per shard
  * replica set; `collector/checkpoint.go:149-199`: the resume position
  * is the LOWEST ack across the group).
  *
  * The dataflow lives in [[IncrSync.startSharded]]; this object holds
  * the pieces shared across the N per-shard queries:
  *
  *  - the per-target apply lock — N concurrent micro-batches merge into
  *    ONE bucketed state table; shard key spaces are disjoint (chunk
  *    ownership), but two shards can touch the same hash bucket, and the
  *    read-merge-overwrite of a bucket directory must not interleave.
  *    The lock is driver-side (all StreamingQuery `foreachBatch` bodies
  *    run on the driver, even on a cluster), so one JVM-wide monitor per
  *    target directory is exactly the right scope.
  *  - the batcher-seam migrate guard: in sharded + oplog mode a
  *    `fromMigrate` record CRASHES the sync (`batcher.go:133-135`
  *    "must close balancer in sharding + oplog") — unlike the
  *    replica-set chain, it is never silently dropped.
  *  - the min-ack checkpoint reader (G6 GetAllTimestamp +
  *    `calculateWorkerLowestCheckpoint`): per-shard ack positions and
  *    their global minimum — the only position a sharded resume may use.
  */
object ShardedSync {

  private val locks = new scala.collection.concurrent.TrieMap[String, Object]

  /** One JVM-wide apply lock per target directory. */
  def targetLock(targetDir: String): Object =
    locks.getOrElseUpdate(targetDir, new Object)

  /** The per-shard batcher seam: crash on chunk-migration records
    * (`batcher.go:133-135`), then hand the batch to the standard
    * segmented apply. The guard runs on the delivered batch — the exact
    * place the reference's batcher checks — so a migrate record can
    * never reach the target, and the error fails the shard's query
    * loudly instead of dropping the record.
    */
  def applyShardBatch(batch: DataFrame, target: TargetWriter,
      batchId: Long): Unit = {
    val mig = batch.filter(col("from_migrate")).limit(1).collect()
    if (mig.nonEmpty)
      throw new IllegalStateException(
        "move chunk oplog found, must close balancer in sharding + oplog " +
          s"[ns=${mig.head.getAs[String]("ns")} " +
          s"doc_key=${mig.head.getAs[String]("doc_key")}]")
    IncrSync.applyBatchTo(batch.drop("from_migrate"), target, batchId)
  }

  /** Per-shard checkpoint summary from `target/_ckpt/shard=<s>/batch=<b>`:
    * ack = newest committed position, plus delivered bounds and volume
    * (the `/repl` Logs* vocabulary per syncer).
    */
  def shardAcks(spark: SparkSession, targetDir: String): DataFrame =
    spark.read.parquet(s"$targetDir/_ckpt")
      .groupBy(col("shard"))
      .agg(max(col("lsn_max")).as("lsn_ack"),
        min(col("lsn_min")).as("lsn_first"),
        sum(col("n_logs")).as("n_logs"))

  /** The group resume position: the LOWEST shard ack
    * (`checkpoint.go:149-199` — a position above any shard's ack could
    * skip that shard's unacked tail on restart).
    */
  def globalCheckpoint(spark: SparkSession, targetDir: String): Long =
    shardAcks(spark, targetDir).agg(min(col("lsn_ack"))).head().getLong(0)
}

/** [[TargetWriter]] for one shard of a sharded fan-out: DML merges into
  * the SHARED bucketed state table under the target's apply lock;
  * checkpoints commit under `_ckpt/shard=<name>/batch=<id>` so each
  * shard's ack history is its own (the group position is derived by
  * [[ShardedSync.shardAcks]], never stored). DDL is structurally
  * unreachable — the config gate rejects `ddlEnable` for sharded oplog
  * fetch (`sanitize.go` via `GraftConfig`), and this writer enforces the
  * same invariant at the seam.
  */
final case class ShardedTarget(targetDir: String, shard: String,
    nBuckets: Int = IncrSync.StateBuckets) extends TargetWriter {

  private def inner = ParquetTarget(targetDir, nBuckets)

  def applyDml(last: DataFrame): Unit =
    ShardedSync.targetLock(targetDir).synchronized { inner.applyDml(last) }

  def applyCommand(spark: SparkSession, row: Row, batchId: Long,
      seq: Int): Unit =
    throw new IllegalStateException(
      "DDL is not support for sharding when incr_sync.mongo_fetch_method" +
        " == 'oplog'")

  def commitCheckpoint(ck: DataFrame, batchId: Long): Unit =
    ShardedSync.targetLock(targetDir).synchronized {
      ck.coalesce(1).write.mode(SaveMode.Overwrite)
        .parquet(s"$targetDir/_ckpt/shard=$shard/batch=$batchId")
      // The shared state table compacts on the same ckpt-aligned cadence
      // as the single-writer target; the lock serializes it against the
      // other shards' delta appends and compactions.
      inner.maybeCompact(ck.sparkSession)
    }
}
