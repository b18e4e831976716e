package graft.apply

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** W12 CollisionMatrix (`executor/collision_matrix.go:28-383`): split a
  * worker's batch into segments such that no two ops in one segment touch
  * the same unique-index value; segments execute serially, ops within a
  * segment in parallel.
  *
  * The reference builds segments greedily over the batch in oplog order.
  * Level scheduling is the same contract expressed declaratively: an op's
  * segment is its occurrence rank within its (worker, unique-key) group —
  * the k-th op on a key runs in the k-th segment, so a segment never holds
  * two ops on one key, and per-key oplog order across segments is exactly
  * the serial-segment guarantee. One window over the routing shuffle the
  * batch already does — no extra exchange, no driver-side matrix.
  */
object Collision {

  /** Assign `segment` per (worker, uk) occurrence rank (0-based). Ops
    * with a null unique-key value touch no unique index and are mutually
    * conflict-free — they all run in segment 0 (the reference only
    * serializes ops sharing an actual index value,
    * `collision_matrix.go:208-233`).
    */
  def segments(batch: DataFrame, uk: Column): DataFrame =
    batch
      .withColumn("uk", uk)
      .withColumn("segment",
        when(col("uk").isNull, 0).otherwise(
          row_number().over(
            Window.partitionBy(col("worker"), col("uk"))
              .orderBy(col("ts_packed"), col("event_id"))) - 1))
}
