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

  val MetricsName = "graft_metrics"

  private def counters = Seq(
    count(when(col("op") === "i", 1)).as("n_insert"),
    count(when(col("op") === "u", 1)).as("n_update"),
    count(when(col("op") === "d", 1)).as("n_delete"),
    count(when(col("op") === "c", 1)).as("n_command"),
    count(when(col("op") === "n", 1)).as("n_noop"),
    sum(octet_length(col("props"))).as("traffic_bytes"),
    max(col("ts_packed")).as("lsn_newest"))

  /** Batch form: attach counters + an [[Observation]] readable after the
    * action completes.
    */
  def observed(oplog: DataFrame): (DataFrame, Observation) = {
    val obs = Observation(MetricsName)
    (oplog.observe(obs, count(lit(1)).as("n_total"), counters: _*), obs)
  }

  /** Streaming form: named observe — per-micro-batch values arrive in
    * `QueryProgressEvent.progress.observedMetrics(MetricsName)` (or
    * `query.lastProgress`), the Spark replacement for the reference's
    * per-second sampled counters.
    */
  def observedStream(oplog: DataFrame): DataFrame =
    oplog.observe(MetricsName, count(lit(1)).as("n_total"), counters: _*)
}
