package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
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
  */
object IncrSync {

  /** Schema of the events stream (ts as nanosecond long). */
  val eventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  def start(spark: SparkSession, sourceDir: String, targetDir: String,
      checkpointDir: String,
      gids: Seq[String] = Seq(""),
      white: Seq[String] = Seq("^app\\..*$"),
      black: Seq[String] = Nil): StreamingQuery = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val stream = spark.readStream.schema(eventsSchema).parquet(sourceDir)
    val oplog = Oplog.project(stream)
      .filter(OplogFilters.chain(gids, white, black) || col("op") === "c")
    oplog.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(batch, targetDir, batchId)
      }
      .start()
  }

  /** Two-phase batch apply + checkpoint commit. */
  def applyBatch(batch: DataFrame, targetDir: String, batchId: Long): Unit = {
    val spark = batch.sparkSession
    batch.persist()
    try {
      val normal = batch.filter(col("op") =!= "c")
      val barrier = batch.filter(col("op") === "c")

      // Phase 1: idempotent merge of DML into the state table.
      val delta = Replay.materialize(normal)
        .withColumnRenamed("n_ops", "batch_ops")
      val statePath = s"$targetDir/state"
      val existing = readOrEmpty(spark, statePath, delta.schema.fields.map(f => (f.name, f.dataType)))
      // new state: batch keys replace old rows (delete-aware: keys whose
      // last op was a delete are absent from `delta` and must also drop
      // from the old state).
      val touched = normal.select(col("ns"), col("doc_key")).distinct()
      val kept = existing.join(touched, Seq("ns", "doc_key"), "left_anti")
      overwrite(kept.unionByName(delta), statePath)

      // Phase 2: barrier ops, serial, in oplog order, after phase 1.
      val barrierRows = barrier.orderBy(col("ts_packed")).collect()
      if (barrierRows.nonEmpty) {
        import spark.implicits._
        val log = barrierRows.zipWithIndex.map { case (r, i) =>
          (batchId, i, r.getAs[String]("ns"), r.getAs[Long]("ts_packed"))
        }.toSeq.toDF("batch_id", "apply_seq", "ns", "ts_packed")
        log.coalesce(1).write.mode(SaveMode.Append).parquet(s"$targetDir/ddl_log")
      }

      // Phase 3: checkpoint row — only after both phases are durable.
      val ck = batch.agg(
        min(col("ts_packed")).as("lsn_min"), max(col("ts_packed")).as("lsn_max"),
        count(lit(1)).as("n_logs"))
        .withColumn("batch_id", lit(batchId))
      ck.coalesce(1).write.mode(SaveMode.Append).parquet(s"$targetDir/_ckpt")
    } finally batch.unpersist()
  }

  private def readOrEmpty(spark: SparkSession, path: String,
      fields: Seq[(String, org.apache.spark.sql.types.DataType)]): DataFrame = {
    val schema = StructType(fields.map { case (n, t) => StructField(n, t) })
    if (new java.io.File(path).exists()) spark.read.schema(schema).parquet(path)
    else spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
  }

  /** Atomic-enough local overwrite: write next to the live dir, swap. */
  private def overwrite(df: DataFrame, path: String): Unit = {
    val tmp = path + ".tmp"
    df.write.mode(SaveMode.Overwrite).parquet(tmp)
    val live = new java.io.File(path)
    val old = new java.io.File(path + ".old")
    if (old.exists()) delete(old)
    if (live.exists()) live.renameTo(old)
    new java.io.File(tmp).renameTo(live)
    delete(old)
  }

  private def delete(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(delete)
    f.delete()
  }
}
