package graft.streaming

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.model.Oplog
import graft.sources.Snapshot

/** Full sync: the snapshot entry point (SURVEY.md §3.2, entry point B;
  * reference `collector/coordinator/full.go`, `collector/docsyncer/`).
  *
  * Batch copy of source collections into the target, range-partitioned
  * (S3/S4 splitVector analogue → `partitionBy(piece)`), followed by the
  * full→incremental handoff: record the oplog position at snapshot start
  * (`fullSyncFinishPosition` semantics, `collector/syncer.go:52-54`) so
  * the streaming query replays changes from T0 — the standard CDC
  * initial-load pattern ("serialize" mode; the reference's parallel
  * disk-spool mode T5 is subsumed by source retention).
  */
object FullSync {

  /** Copy one table, range-partitioned into `nPieces`. Returns row count. */
  def copyTable(spark: SparkSession, sfDir: String, table: String,
      keyName: String, targetDir: String, nPieces: Int = 8): Long = {
    val src = Tables.load(spark, sfDir, table)
    val pieces = Snapshot.pieceAssign(src, keyName, nPieces)
    pieces.write.mode(SaveMode.Overwrite)
      .partitionBy("piece")
      .parquet(s"$targetDir/full/$table")
    spark.read.parquet(s"$targetDir/full/$table").count()
  }

  /** W11 drop-dest (`doc_syncer.go:64-99`): optional drop of the target
    * table before the snapshot copy.
    */
  def dropDest(spark: SparkSession, targetDir: String, table: String): Unit =
    IncrSync.deletePath(spark, s"$targetDir/full/$table")

  /** W10 sharding-spec sync (`doc_syncer.go:101-204`): the target's
    * partitioning spec, persisted next to the data so a reader (or a
    * later re-shard) knows the layout — the Spark analogue of
    * `enableSharding` + `shardCollection` from `config.collections`.
    */
  def writeShardSpec(spark: SparkSession, targetDir: String, table: String,
      keyName: String, nPieces: Int): Unit = {
    import spark.implicits._
    Seq((table, keyName, nPieces)).toDF("table", "shard_key", "n_pieces")
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$targetDir/full/${table}_spec")
  }

  /** W9 index sync (`collector/docsyncer/doc_syncer.go:206-287`): persist
    * the source's index specifications (listIndexes-style JSON documents)
    * next to the copied data, scrubbing the `background` option exactly as
    * the reference does before replaying specs on the target. Indexes are
    * catalog metadata in this engine — readers and future secondary-index
    * builds consume the spec table; nothing is silently dropped.
    */
  def writeIndexSpecs(spark: SparkSession, targetDir: String, table: String,
      indexJsons: Seq[String]): Unit = {
    import graft.transform.UpdateSpec
    import org.json4s.JObject
    import spark.implicits._
    val scrubbed = indexJsons.map { j =>
      val doc = UpdateSpec.parse(j)
      val name = (doc \ "name") match {
        case org.json4s.JString(n) => n
        case _ => ""
      }
      (table, name, UpdateSpec.render(
        JObject(doc.obj.filterNot(_._1 == "background"))))
    }
    scrubbed.toDF("table", "index_name", "index_json")
      .coalesce(1).write.mode(SaveMode.Overwrite)
      .parquet(s"$targetDir/full/${table}_indexes")
  }

  /** Read back the synced index specs (the target-side consumer). */
  def readIndexSpecs(spark: SparkSession, targetDir: String, table: String) =
    spark.read.parquet(s"$targetDir/full/${table}_indexes")

  /** Record the incremental start position (newest oplog ts at snapshot
    * time — G6 GetAllTimestamp analogue) for the handoff guard.
    */
  def recordHandoff(spark: SparkSession, sfDir: String, targetDir: String): Long = {
    val pos = Oplog.fromEvents(spark, sfDir)
      .agg(max(col("ts_packed"))).head().getLong(0)
    import spark.implicits._
    Seq(pos).toDF("full_sync_finish_position")
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$targetDir/_handoff")
    pos
  }
}
