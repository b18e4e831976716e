package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** State-table re-bucketing migration.
  *
  * [[IncrSync.StateBuckets]] is a layout constant of the bucketed state
  * table (`target/state/bucket=<b>/`, b = hash(ns, doc_key) mod n). At
  * 100 TB the day-one bucket count will eventually be wrong — buckets
  * outgrow executor memory, or a grown cluster wants more write
  * parallelism — and every subsequent [[ParquetTarget.applyDml]] prunes
  * and routes by the bucket column, so the layout can only change through
  * an explicit, checkpoint-consistent rewrite. The reference sidesteps
  * this because its state IS the target MongoDB (the server re-balances);
  * a file-layout state table needs the migration the reference never had
  * to write.
  *
  * Contract:
  *  - run with the streaming query STOPPED (between [[IncrSync.startOplog]]
  *    runs). The migration touches ONLY `state/` — `_ckpt`, `ddl_log`, and
  *    Spark's checkpointLocation are untouched, so the resumed query picks
  *    up at the committed offset against the re-bucketed layout.
  *  - the resumed query must pass the NEW bucket count (`nBuckets = to`).
  *  - semantic no-op: the (ns, doc_key → last_value, last_event_id,
  *    batch_ops) content is bit-identical before and after; only the
  *    `bucket` column and directory placement change.
  *
  * Physical shape: one shuffle of |state| rows on the new bucket key (the
  * unavoidable minimum — every row may move), one writer task per new
  * bucket, then an atomic-ish directory swap staged as
  * `state → state_mig_old; tmp → state; drop old` so a crash mid-swap
  * leaves a recoverable layout, never a half-deleted one ([[recover]]
  * completes an interrupted swap).
  */
object Rebucket {

  private def fsOf(spark: SparkSession, p: Path) =
    p.getFileSystem(spark.sessionState.newHadoopConf())

  /** Complete an interrupted [[migrate]] swap: if `state` is missing but
    * the backup exists, the crash hit between the two renames — restore
    * the backup (the tmp write, if any, is discarded: it may be partial).
    */
  def recover(spark: SparkSession, targetDir: String): Unit = {
    val state = new Path(s"$targetDir/state")
    val old = new Path(s"$targetDir/state_mig_old")
    val tmp = new Path(s"$targetDir/state_mig_tmp")
    val fs = fsOf(spark, state)
    if (!fs.exists(state) && fs.exists(old)) fs.rename(old, state)
    if (fs.exists(tmp)) fs.delete(tmp, true)
    if (fs.exists(state) && fs.exists(old)) fs.delete(old, true)
  }

  /** Rewrite the state table from `from` buckets to `to` buckets.
    *
    * Fails fast (before writing anything) if the resident layout is not
    * actually `from`-bucketed — a wrong `from` would not corrupt data
    * (bucket values are recomputed from (ns, doc_key), not from `from`),
    * but it means the caller's idea of the layout is stale, and the next
    * `applyDml` with that stale count WOULD corrupt routing; surfacing
    * the mismatch here is the cheap save.
    */
  def migrate(spark: SparkSession, targetDir: String, from: Int, to: Int): Unit = {
    require(from > 0, s"from must be positive, got $from")
    require(to > 0, s"to must be positive, got $to")
    val statePath = s"$targetDir/state"
    val state = new Path(statePath)
    val fs = fsOf(spark, state)
    recover(spark, targetDir)
    IncrSync.recoverCompact(spark, statePath)
    val deltaDirs = IncrSync.listDeltaDirs(spark, statePath)
    if (!fs.exists(state) && deltaDirs.isEmpty) return // no state yet
    if (from == to) return

    // Merged view: pending deltas (appended at the OLD layout) fold in
    // and their directories drop after the swap — the migration IS a
    // compaction, just with a new bucket count.
    val st = IncrSync.readOrEmpty(spark, statePath)
    val offLayout = st.filter(col("bucket") =!= IncrSync.bucketOf(from)).count()
    require(offLayout == 0L,
      s"state at $statePath is not hash-bucketed by $from ($offLayout rows off-layout) — " +
        "wrong `from`, or a previous migration already ran")

    val tmp = new Path(s"$targetDir/state_mig_tmp")
    st.withColumn("bucket", IncrSync.bucketOf(to))
      .repartition(col("bucket"))
      .write.mode(SaveMode.Overwrite).partitionBy("bucket").parquet(tmp.toString)

    val old = new Path(s"$targetDir/state_mig_old")
    if (fs.exists(state)) // delta-only state: nothing to stage aside
      require(fs.rename(state, old), s"cannot stage $statePath aside")
    require(fs.rename(tmp, state), s"cannot promote re-bucketed state")
    fs.delete(old, true)
    deltaDirs.foreach { case (_, dir) => fs.delete(new Path(dir), true) }
    val deltaRoot = new Path(IncrSync.deltaRootOf(statePath))
    if (fs.exists(deltaRoot) && fs.listStatus(deltaRoot).isEmpty)
      fs.delete(deltaRoot, true)
  }
}
