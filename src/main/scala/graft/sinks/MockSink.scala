package graft.sinks

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** K6 MockWriter (`tunnel/mock_writer.go`): a sink that swallows the
  * stream — used for throughput measurement and tests where the tunnel
  * side-effects are irrelevant.
  *
  * Spark-native wiring: the built-in `noop` source executes the full plan
  * and discards rows; an `observe` counter rides the batch so callers can
  * still assert on delivered volume (the reference's MockWriter keeps a
  * message count for exactly this).
  */
object MockSink {

  val MetricsName = "mock_sink"

  private val callSeq = new java.util.concurrent.atomic.AtomicLong(0)

  /** Batch form: execute and discard, returning the row count observed
    * on the way through (one pass — the count is not a second action).
    * The observe name is unique per call: QueryExecutionListeners are
    * session-global, so a shared name would let a concurrent observed
    * query satisfy this call's latch with ITS count.
    */
  def write(df: DataFrame): Long = {
    val name = s"${MetricsName}_${callSeq.incrementAndGet()}"
    @volatile var seen = -1L
    val done = new java.util.concurrent.CountDownLatch(1)
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, durationNs: Long): Unit = {
        qe.observedMetrics.get(name).foreach { r =>
          seen = r.getAs[Long]("n_rows")
          done.countDown()
        }
      }
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, exception: Exception): Unit = ()
    }
    val spark = df.sparkSession
    spark.listenerManager.register(listener)
    try {
      df.observe(name, count(lit(1)).as("n_rows"))
        .write.format("noop").mode("overwrite").save()
      // listener callbacks are asynchronous; bounded wait for the metric,
      // and a miss is an error — never a plausible-looking sentinel
      require(done.await(30, java.util.concurrent.TimeUnit.SECONDS),
        "mock sink: observed metric did not arrive within 30s")
    } finally spark.listenerManager.unregister(listener)
    seen
  }

  /** Streaming form: drain to the noop sink (metrics surface through the
    * normal query-progress channel, as in [[graft.metrics.Metrics]]).
    */
  def writeStream(df: DataFrame, checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    df.observe(MetricsName, count(lit(1)).as("n_rows"))
      .writeStream.format("noop")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()
}
