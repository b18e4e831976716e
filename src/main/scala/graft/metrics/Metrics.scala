package graft.metrics

import org.apache.spark.sql.{DataFrame, Observation}
import org.apache.spark.sql.functions._

/** G7 metrics accumulation (`common/metric.go:43-200`,
  * `executor/executor.go:417-471`): the reference samples per-second
  * counters (TPS, traffic, success/filter counts) on every pipeline stage.
  *
  * Spark-native shape: `Dataset.observe` metrics evaluated inside the
  * running plan (zero extra passes, streamed to listeners per batch) — the
  * idiomatic replacement for hand-rolled atomic counters. Attach
  * [[observed]] ahead of the sink; read the [[Observation]] after the
  * action (batch) or from a `StreamingQueryListener` (streaming).
  */
object Metrics {

  /** Attach the standard counter set; returns the df + its observation. */
  def observed(oplog: DataFrame): (DataFrame, Observation) = {
    val obs = Observation("graft_metrics")
    val df = oplog.observe(obs,
      count(lit(1)).as("n_total"),
      count(when(col("op") === "i", 1)).as("n_insert"),
      count(when(col("op") === "u", 1)).as("n_update"),
      count(when(col("op") === "d", 1)).as("n_delete"),
      count(when(col("op") === "c", 1)).as("n_command"),
      count(when(col("op") === "n", 1)).as("n_noop"),
      sum(octet_length(col("props"))).as("traffic_bytes"),
      max(col("ts_packed")).as("lsn_newest"))
    (df, obs)
  }
}
