package graft.apply

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Idempotent CDC apply (SURVEY.md §2.8, W1-W4 as MERGE semantics).
  *
  * The reference replays each oplog entry against the target with
  * per-key ordering and at-least-once delivery, relying on idempotence
  * (`README.md:55`). In Spark the whole batch collapses into one
  * deterministic "last effective write wins" materialization:
  *
  *   - upserts (op i/u) set the row state,
  *   - deletes (op d) remove it,
  *   - replaying the same batch twice yields the same table (idempotent).
  *
  * Implemented with a single window (shuffle on the document key, sort
  * within partitions only) — per-key total order without a global sort,
  * which is exactly the property that scales to 100 TB: state size is
  * |keys|, shuffle is one exchange, and AQE handles skewed keys.
  */
object Replay {

  val ord: Seq[Column] = Seq(col("ts_packed").desc, col("event_id").desc)

  /** Materialize final per-document state from an effective-op stream. */
  def materialize(oplog: DataFrame): DataFrame = {
    val effective = oplog.filter(col("op").isin("i", "u", "d"))
    val key = Window.partitionBy(col("ns"), col("doc_key"))
    val w = key.orderBy(ord: _*)
    effective
      .withColumn("rn", row_number().over(w))
      .withColumn("n_ops", count(lit(1)).over(key))
      .filter(col("rn") === 1 && col("op") =!= "d")
      .select(col("ns"), col("doc_key"), col("value").as("last_value"),
        col("event_id").as("last_event_id"), col("n_ops"))
  }

  /** G4/G6 checkpoint aggregation (`collector/checkpoint.go:149-199`,
    * `common/db_opertion.go:127-232`): the checkpoint is the minimum acked
    * ts across workers; also surfaces each worker's newest ts and volume.
    */
  def checkpointByWorker(oplogWithWorker: DataFrame): DataFrame =
    oplogWithWorker.groupBy(col("worker"))
      .agg(
        min(col("ts_packed")).as("lsn_ack_min"),
        max(col("ts_packed")).as("lsn_newest"),
        count(lit(1)).as("n_logs"))
}
