package graft.metrics

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Observation, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryListener

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

/** One `_metrics` row per micro-batch (the queryable snapshot the
  * reference's REST monitor serves, `common/metric.go:43-52,87-200` —
  * counts, not rates: TPS is a quotient the consumer takes over
  * `batch_id` timestamps, never a stored number).
  *
  * `n_raw` is the source's rows-ingested count for the batch
  * (`numInputRows`), so `n_raw - n_kept` is the filter-chain drop count
  * without a second pass over the stream; the per-op counters come from
  * the in-plan [[Metrics.observedStream]] aggregate.
  */
final case class MetricsSnapshot(run_id: String, batch_id: Long,
    n_raw: Long, n_kept: Long, n_insert: Long, n_update: Long,
    n_delete: Long, n_command: Long, n_noop: Long,
    traffic_bytes: Option[Long], lsn_newest: Option[Long])

/** G7's queryable surface: a [[StreamingQueryListener]] that buffers every
  * batch's observed counters and, once the run's terminated event arrives
  * (the listener bus is ordered per query, so termination implies every
  * progress event has been delivered), writes them as a `_metrics` parquet
  * table alongside `_ckpt`.
  *
  * Driver-resident state is one small row per micro-batch of the runs
  * observed since the last [[write]] — never data volume. [[write]]
  * drains the written run's rows from the buffer, so the
  * attach → run → write → detach lifecycle holds no residue; a recorder
  * left attached across many runs only grows by the unwritten ones.
  */
final class MetricsRecorder(spark: SparkSession, path: String)
    extends StreamingQueryListener {

  private val buf = new java.util.concurrent.ConcurrentLinkedQueue[MetricsSnapshot]()
  private val terminated = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()

  override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
    val p = e.progress
    Option(p.observedMetrics.get(Metrics.MetricsName)).foreach { m =>
      buf.add(MetricsSnapshot(p.runId.toString, p.batchId,
        p.sources.map(_.numInputRows).sum,
        m.getAs[Long]("n_total"), m.getAs[Long]("n_insert"),
        m.getAs[Long]("n_update"), m.getAs[Long]("n_delete"),
        m.getAs[Long]("n_command"), m.getAs[Long]("n_noop"),
        Option(m.getAs[java.lang.Long]("traffic_bytes")).map(_.longValue),
        Option(m.getAs[java.lang.Long]("lsn_newest")).map(_.longValue)))
    }
  }

  override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = {
    terminated.add(e.runId.toString)
  }

  /** Wait for `runId`'s terminated event, then write its snapshots. */
  def write(runId: String, timeoutMs: Long = 30000L): Unit = {
    val deadline = System.currentTimeMillis() + timeoutMs
    while (!terminated.contains(runId.toString) && System.currentTimeMillis() < deadline)
      Thread.sleep(20)
    require(terminated.contains(runId),
      "metrics recorder: query termination event not delivered in time")
    import spark.implicits._
    // keyed per run + overwrite: re-invoking write for a run replaces its
    // snapshot rows instead of appending duplicates
    buf.asScala.filter(_.run_id == runId).toSeq.toDF()
      .coalesce(1).write.mode("overwrite").parquet(s"$path/run=$runId")
    // drain what was written (and the terminated marker) — the buffer
    // holds only not-yet-written runs, not the session's full history
    buf.removeIf(_.run_id == runId)
    terminated.remove(runId)
  }
}
