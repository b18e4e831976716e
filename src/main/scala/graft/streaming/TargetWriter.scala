package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Pluggable sink seam — the [[ChangeSource]] symmetric for the write
  * side (reference `executor/db_writer.go:61-219`,
  * `executor/db_writer_bulk.go:23-283`): [[IncrSync.applyBatchTo]] drives
  * any target through this trait, so a live MongoDB (or JDBC, or Delta)
  * connector plugs in without touching the dataflow — exactly as a live
  * change-stream connector plugs into [[ChangeSource]] on the read side.
  * The sandbox default is the hash-bucketed parquet state table
  * ([[ParquetTarget]]); everything upstream of the seam (filter chain,
  * txn assembly, barrier segmentation, checkpoint construction) is the
  * production path either way.
  *
  * ## W1-W5 ↔ connector bulk-op mapping (`db_writer_bulk.go:23-283`)
  *
  * The engine hands the writer the per-segment '''last-effective-write
  * set''' (one row per touched (ns, doc_key), `Replay.lastPerKey`), not
  * the raw op stream — so the reference's bulk error ladder collapses to
  * a deterministic MERGE:
  *
  *  - '''W1 doInsert''' (`doInsert:23-77`): the reference bulk-inserts
  *    and, on `DuplicateKey`, downgrades to update-on-insert
  *    (`dupUpdate`). Here a row with `op = i` is an upsert (`ReplaceOne
  *    {upsert: true}`) — the dup-key branch is unreachable by
  *    construction, which IS the reference's own `FullFinishTs`-passed
  *    behavior.
  *  - '''W2 doUpdateOnInsert''' (`doUpdate:120-283` upsert arm): same
  *    upsert — insert-vs-update is a server-side outcome, not a client
  *    decision.
  *  - '''W3 doUpdate''': a row with `op = u` carries the folded final
  *    value (update specs already replayed by `UpdateSpec`); apply as
  *    `ReplaceOne {upsert: true}`. The reference's "update a missing doc"
  *    error arm becomes the insert outcome of the same upsert.
  *  - '''W4 doDelete''' (`doDelete:186-231`): a row with `op = d` is a
  *    `DeleteOne` on the key; deleting an absent doc is a no-op, not an
  *    error (at-least-once replay must converge).
  *  - '''W5 doCommand''' (`db_writer.go:61-219`): [[applyCommand]] is
  *    invoked serially between DML segments (T4 barrier order). The
  *    connector runs the command (drop/dropDatabase/renameCollection) via
  *    `runCommand` and appends it to the DDL log.
  *
  * '''Idempotence contract''': [[applyDml]] may be called again with the
  * same segment after a crash (Spark replays the last uncommitted batch).
  * Upsert+delete of a last-effective-write set is naturally idempotent;
  * any other implementation must be too. '''Ordering contract''': calls
  * arrive in batch order — DML segment, then its trailing barrier, ...,
  * then [[commitCheckpoint]] exactly once per batch, strictly after every
  * segment of that batch is durable (T8: ack-then-checkpoint, never
  * driver-clock).
  */
trait TargetWriter extends Serializable {

  /** W1-W4: merge one barrier-free DML segment, reduced to its
    * last-effective-write set — columns `(ns, doc_key, op, last_value,
    * last_event_id, n_ops)`, one row per touched key; `op = d` means the
    * key's final state is deleted.
    */
  def applyDml(last: DataFrame): Unit

  /** W5: one DDL barrier row (`op = c`; command JSON in `props`), applied
    * serially at its segmentation point. `seq` is the barrier's index
    * within the batch (DDL-log ordering).
    */
  def applyCommand(spark: SparkSession, row: Row, batchId: Long, seq: Int): Unit

  /** T8: commit the batch's checkpoint row `(lsn_min, lsn_max, n_logs,
    * batch_id)` — called once per batch delivery, after every segment
    * acked. MUST be an upsert on `batchId` (the reference's ckpt update,
    * `ckpt_operation.go:20-190`): a crash between this commit and Spark's
    * offset commit replays the whole batch, and the replayed commit must
    * overwrite, not duplicate.
    */
  def commitCheckpoint(ck: DataFrame, batchId: Long): Unit

  /** Diagnostic journal hook (`common/journal.go:17-67`; call sites
    * `collector/syncer.go:637`, `executor/executor.go:228`): the RAW op
    * stream of the delivery, before last-effective-write reduction —
    * exactly what the reference's writer sees per op. Default: no-op
    * (journal off, `JournalNothingOnDefault`). A replayed batch must
    * overwrite its own journal slice (at-least-once replay, observable
    * exactly-once).
    */
  def journalOps(batch: DataFrame, batchId: Long): Unit = ()
}

/** Journal mode ∈ {none, sampling, all} — the reference sentinel's
  * `OplogDump` 0/1/2 (`journal.go:17-29`). Sampling keeps every doc key
  * whose portable hash lands on 0 mod `sampleFrequency` — the reference's
  * `DistributeOplogByMod(oplog, SampleFrequency) == 0` primary-key sample
  * — plus ALL DDL ops (a command has no primary key; the reference's
  * hasher routes it to 0, so every DDL is journaled).
  */
final case class JournalConf(mode: String,
    sampleFrequency: Long = JournalConf.SampleFrequency)

object JournalConf {
  /** `journal.go:13`: 1-in-1000 primary-key sample. */
  val SampleFrequency = 1000L
  val Off: JournalConf = JournalConf("none")
}

object TargetWriter {

  /** The reference's write-error ladder (`executor/db_writer.go:223-265`
    * IgnoreError), for connectors implementing [[TargetWriter.applyDml]]
    * against a live store: which server error codes are benign for which
    * op, given the sync stage. During full sync, an update hitting
    * PathNotViable (28/211) or an upsert hitting DuplicateKey (11000) is
    * the snapshot racing the tailer — ignorable; a delete or command on a
    * missing namespace (26) is always ignorable (at-least-once replay).
    * Everything else is a real failure the connector must surface.
    */
  def ignorableError(op: String, code: Int, fullSyncStage: Boolean): Boolean =
    op match {
      case "u" => fullSyncStage && (code == 28 || code == 211)
      case "ui" => fullSyncStage && code == 11000
      case "d" | "c" => code == 26
      case _ => false
    }
}

/** The sandbox/cluster-file default target: the hash-bucketed parquet
  * state table of [[IncrSync]] (compacted base at `dir/state/bucket=<b>/`,
  * pending deltas at `dir/state_delta/d=<prio>/bucket=<b>/`, DDL log
  * at `dir/ddl_log`, checkpoints at `dir/_ckpt`). A micro-batch APPENDS
  * one delta directory — O(batch) write I/O per trigger, never a
  * read-modify-write of the base; deltas fold into the base on the
  * ckpt-aligned compaction cadence. See the layout note on [[IncrSync]].
  */
final case class ParquetTarget(targetDir: String,
    nBuckets: Int = IncrSync.StateBuckets,
    ckptStores: Seq[CkptStore] = Nil,
    journal: JournalConf = JournalConf.Off) extends TargetWriter {

  def applyDml(last0: DataFrame): Unit = {
    val spark = last0.sparkSession
    val statePath = s"$targetDir/state"
    val last = last0
      .withColumnRenamed("n_ops", "batch_ops")
      .withColumn("bucket", IncrSync.bucketOf(nBuckets))
    // NO emptiness probe: a probe job costs the same as writing the
    // empty delta it would skip (the per-trigger floor is job count ×
    // fixed cost — JobProfile r20), and empty segments only arise on the
    // rare barrier-segmentation path; an empty delta directory is inert
    // in the read fold and swept by the next compaction.
    // Append-only delta: the segment's last-effective-write set,
    // tombstones included (`op = d` rows drop the key in the read-side
    // merge). Prio is filesystem-derived max+1, so an at-least-once
    // replay of this segment appends the SAME content at a higher prio —
    // the LWW fold is unchanged (idempotent by content, not by keying).
    // Clustered on the partition column: one file per touched bucket per
    // delta, and the same physical bucket pruning as the base for point
    // lookups. The shuffle runs at the batch-derived applyParts width
    // set by applyBatchTo — correct here, because this job's data IS the
    // batch (the state-volume jobs size themselves from measured state
    // bytes instead: IncrSync.compactParts).
    val prio = IncrSync.nextDeltaPrio(spark, statePath)
    last.select(col("ns"), col("doc_key"), col("last_value"),
        col("last_event_id"), col("batch_ops"), col("bucket"), col("op"))
      .withColumn("_prio", lit(prio))
      .repartition(col("bucket"))
      .write.mode(SaveMode.Overwrite).partitionBy("bucket")
      .parquet(f"${IncrSync.deltaRootOf(statePath)}/d=$prio%09d")
  }

  /** W5 doCommand replay (`executor/db_writer.go:61-219`): DDL applied to
    * the state table — drop removes the ns, dropDatabase the db,
    * renameCollection rewrites ns (and re-buckets). DDL is rare and
    * serialized, so the full-table rewrite here is the reference's own
    * cost model (barriers stop the world). Every barrier is also logged.
    */
  def applyCommand(spark: SparkSession, row: Row, batchId: Long, seq: Int): Unit = {
    import org.json4s._
    val ns = row.getAs[String]("ns")
    val ts = row.getAs[Long]("ts_packed")
    val body = row.getAs[String]("props")
    val db = ns.split("\\.", 2)(0)
    val statePath = s"$targetDir/state"
    val parsed = try { graft.transform.UpdateSpec.parse(body) } catch {
      case _: Exception => JObject(Nil)
    }
    val (cmd, arg) = parsed.obj.headOption match {
      case Some((k, JString(v))) => (k, v)
      case Some((k, _)) => (k, "")
      case None => ("", "")
    }
    cmd match {
      case "drop" =>
        rewriteState(spark, statePath, s => s.filter(col("ns") =!= s"$db.$arg"))
      case "dropDatabase" =>
        rewriteState(spark, statePath, s => s.filter(!col("ns").startsWith(db + ".")))
      case "renameCollection" =>
        val to = (parsed \ "to") match { case JString(t) => t; case _ => arg }
        rewriteState(spark, statePath, s => s
          .withColumn("ns", when(col("ns") === arg, to).otherwise(col("ns")))
          .withColumn("bucket", IncrSync.bucketOf(nBuckets)))
      case _ => () // unknown/no-op command: log only
    }
    import spark.implicits._
    // Keyed by (batch, seq) directory so a replayed batch OVERWRITES its
    // own log entries instead of appending duplicates (at-least-once
    // replay must leave the observable log exactly-once).
    Seq((batchId, seq, ns, cmd, ts))
      .toDF("batch_id", "apply_seq", "ns", "cmd", "ts_packed")
      .coalesce(1).write.mode(SaveMode.Overwrite)
      .parquet(s"$targetDir/ddl_log/batch=$batchId/seq=$seq")
  }

  def commitCheckpoint(ck: DataFrame, batchId: Long): Unit = {
    // per-batch directory + overwrite = the reference's ckpt upsert; a
    // replayed batch rewrites its row, never duplicating the history
    ck.coalesce(1).write.mode(SaveMode.Overwrite)
      .parquet(s"$targetDir/_ckpt/batch=$batchId")
    // Attached context stores (`ckpt_manager.go:84-110` Update): the
    // LATEST ack'd position, upserted through whichever storage backends
    // the config selected — one tiny driver-side read of the (single-row,
    // already-aggregated) checkpoint frame.
    if (ckptStores.nonEmpty) {
      val lsnMax = ck.collect().head.getAs[Long]("lsn_max")
      ckptStores.foreach(st => CkptManager(st, "graft", 1L).update(lsnMax))
    }
    maybeCompact(ck.sparkSession)
  }

  /** Ckpt-aligned compaction cadence: fold pending deltas into the base
    * once enough have accumulated. Runs strictly AFTER the checkpoint
    * commit — compaction is an optimization of the read path, never part
    * of the batch's durability (a crash mid-compaction recovers via
    * [[IncrSync.recoverCompact]] and changes no observable state).
    */
  private[streaming] def maybeCompact(spark: SparkSession): Unit = {
    val statePath = s"$targetDir/state"
    if (IncrSync.listDeltaDirs(spark, statePath).size >= IncrSync.CompactEveryDeltas)
      IncrSync.compactState(spark, statePath)
  }

  /** Journal side-output: the delivery's raw ops (filtered per mode) to
    * `_journal/batch=<id>` — keyed-by-batch overwrite, so a replayed
    * batch rewrites its slice instead of appending duplicates. The
    * sample predicate is a codegen'd filter on the already-cached batch:
    * one cheap extra pass when enabled, zero when off.
    */
  override def journalOps(batch: DataFrame, batchId: Long): Unit = {
    if (journal.mode == "none") return
    val keep =
      if (journal.mode == "all") lit(true)
      else col("op") === "c" ||
        pmod(graft.functions.Portable.phash64(col("doc_key")),
          lit(journal.sampleFrequency)) === 0
    batch.filter(keep)
      .select(col("event_id"), col("ts_packed"), col("op"), col("ns"),
        col("doc_key"), col("value"))
      .coalesce(1).write.mode(SaveMode.Overwrite)
      .parquet(s"$targetDir/_journal/batch=$batchId")
  }

  /** Full-state rewrite (barrier-only path; DML never does this): a
    * compaction pass with the DDL transform applied to the merged view —
    * pending deltas fold in (a barrier stops the world, so everything
    * delivered before it must be visible to it), the rewritten state
    * becomes the new base through the staged swap, and the consumed
    * deltas drop. Runs at the state-volume-derived width, not the
    * batch-derived one (ADVICE r19).
    */
  private def rewriteState(spark: SparkSession, statePath: String,
      f: DataFrame => DataFrame): Unit =
    IncrSync.compactState(spark, statePath, f)
}
