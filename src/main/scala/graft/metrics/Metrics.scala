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

  /** The reference's `/repl` REST snapshot (`collector/syncer.go:640-700`
    * `RestAPI`, fields from `common/metric.go:43-75`), rendered from the
    * queryable `_metrics` table instead of live atomics — same JSON
    * vocabulary, so a monitor written against the reference parses this
    * unchanged. [[MonitorServer]] serves exactly this body for GET
    * `/repl` (the table stays the engine surface; the listener is the
    * dev-flagged serving shell).
    *
    * Counter mapping (counts, not rates — the table stores per-batch
    * deltas): `logs_get` = rows ingested (`numInputRows` sum, the
    * reference's OplogGet), `logs_repl` = op rows applied (i/u/d/c sums,
    * OplogApply), `logs_success` = rows surviving the chain (n_kept sum,
    * OplogSuccess — apply implies ack here), `tps` = the LAST batch's
    * n_kept (the per-second delta analogue at trigger granularity).
    * `lsn`/`lsn_ack` ride the newest applied packed LSN (applied == acked
    * in the idempotent-merge model); `lsn_ckpt` the newest committed
    * `_ckpt` lsn_max when a checkpoint table is given.
    *
    * `nowMs` is injected (never sampled here) so snapshots are
    * deterministic and testable.
    */
  def replSnapshot(spark: SparkSession, metricsPath: String,
      ckptPath: Option[String], who: String, replset: String,
      nowMs: Long): String = {
    val m = spark.read.parquet(metricsPath)
    val agg = m.agg(
      coalesce(sum(col("n_raw")), lit(0L)).as("logs_get"),
      coalesce(sum(col("n_insert") + col("n_update") + col("n_delete") +
        col("n_command")), lit(0L)).as("logs_repl"),
      coalesce(sum(col("n_kept")), lit(0L)).as("logs_success"),
      coalesce(max(col("lsn_newest")), lit(0L)).as("lsn"),
      coalesce(sum(col("traffic_bytes")), lit(0L)).as("traffic"),
      coalesce(max(col("traffic_bytes")), lit(0L)).as("traffic_max")).head()
    val tps = m.orderBy(col("batch_id").desc).select(col("n_kept"))
      .limit(1).collect().headOption.map(_.getLong(0)).getOrElse(0L)
    val lsnCkpt = ckptPath.map { p =>
      spark.read.parquet(p).agg(coalesce(max(col("lsn_max")), lit(0L)))
        .head().getLong(0)
    }.getOrElse(agg.getAs[Long]("lsn"))

    def timeStr(sec: Long): String =
      java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")
        .withZone(java.time.ZoneOffset.UTC)
        .format(java.time.Instant.ofEpochSecond(sec))
    // packed LSN → MongoTime {ts, unix, time}: unix is the seconds word
    // (the reference's ExtractMongoTimestamp = ts >> 32)
    def mongoTime(packed: Long): String = {
      val unix = packed >>> 32
      s"""{"ts":"$packed","unix":$unix,"time":"${timeStr(unix)}"}"""
    }
    val logsSuccess = agg.getAs[Long]("logs_success")
    val avg = if (logsSuccess == 0) 0L else agg.getAs[Long]("traffic") / logsSuccess
    val lsn = agg.getAs[Long]("lsn")
    s"""{"who":"$who","tag":"graft","replset":"$replset",""" +
      s""""logs_get":${agg.getAs[Long]("logs_get")},""" +
      s""""logs_repl":${agg.getAs[Long]("logs_repl")},""" +
      s""""logs_success":$logsSuccess,"tps":$tps,""" +
      s""""lsn":${mongoTime(lsn)},"lsn_ack":${mongoTime(lsn)},""" +
      s""""lsn_ckpt":${mongoTime(lsnCkpt)},""" +
      s""""now":{"unix":${nowMs / 1000},"time":"${timeStr(nowMs / 1000)}"},""" +
      s""""log_size_avg":"$avg","log_size_max":"${agg.getAs[Long]("traffic_max")}"}"""
  }
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
