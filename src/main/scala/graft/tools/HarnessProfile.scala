package graft.tools

import scala.collection.mutable
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Per-harness streaming-cost breakdown — the measured artifact behind
  * PROFILE's "the streaming walls are lifecycle + state-commit cost"
  * attribution (r16 verdict task 5): instead of asserting it, capture it
  * per bench query from the engine's own progress events.
  *
  * For each named query (default: the expensive streaming tail), runs it
  * once with a global [[StreamingQueryListener]] attached and prints ONE
  * JSON line: wall, number of StreamingQuery LIFECYCLES the harness
  * schedules (distinct runIds), micro-batches executed, and the summed
  * per-batch duration components Spark reports — `addBatch` (the data
  * plane), `commitOffsets` + `walCommit` (the per-batch durability
  * floor), `stateCommit` (summed state-store commit walls across
  * operators × partitions), plus `lifecycleOverheadS` = wall − Σ
  * triggerExecution (query start/stop, driver staging, awaitTermination
  * gaps — the cost that batches cannot explain). Future drift is then
  * attributable by diffing columns, not re-profiling.
  *
  * Usage: `graft.tools.HarnessProfile [query ...]`, env
  * SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS.
  * One query per invocation is the honest mode (JVM-isolated timing);
  * multi-query invocations amortize the session for quick sweeps.
  */
object HarnessProfile {
  val DefaultQueries: Seq[String] = Seq(
    "cdc_soak_live", "cdc_token_resume", "pipe_live_corpus",
    "cdc_sharded_fanout", "cdc_tail_live", "cdc_active_active_loop",
    "cdc_ckpt_api_store", "cdc_stream_e2e")

  private final case class Batch(runId: String, durs: Map[String, Long],
      stateCommitMs: Long, triggerMs: Long)

  def main(args: Array[String]): Unit = {
    val queries = if (args.nonEmpty) args.toSeq else DefaultQueries
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val batches = new java.util.concurrent.ConcurrentLinkedQueue[Batch]()
    val listener = new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        batches.add(Batch(p.runId.toString,
          p.durationMs.asScala.map { case (k, v) => k -> v.longValue }.toMap,
          p.stateOperators.map(_.commitTimeMs).sum,
          Option(p.durationMs.get("triggerExecution")).map(_.longValue).getOrElse(0L)))
      }
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    }
    spark.streams.addListener(listener)

    // JVM/session warmup outside the measurement
    try spark.range(1000000).selectExpr("sum(id)").collect() catch { case _: Throwable => () }

    queries.foreach { name =>
      batches.clear()
      val t0 = System.nanoTime()
      val n = try graft.SparkEntry.queries(name)(spark, dir).count()
        catch { case e: Throwable =>
          System.err.println(s"[profile] $name FAILED: ${e.getMessage}"); -1L }
      val wallS = (System.nanoTime() - t0) / 1e9
      // listener delivery is async; drain until the count holds stable
      // for THREE consecutive windows — one stable 100 ms window let a
      // straggling progress event from query N be charged to N+1
      var last = -1; var stable = 0; var spins = 0
      while (stable < 3 && spins < 80) {
        if (batches.size == last) stable += 1 else { stable = 0; last = batches.size }
        spins += 1; Thread.sleep(100)
      }
      // an exit via the spin cap means events were STILL arriving after
      // ~8 s — a straggler past this point is charged to the next query,
      // exactly the mis-attribution the stable-window drain exists to
      // prevent; say so instead of silently mis-counting (ADVICE r17)
      if (stable < 3) System.err.println(
        s"[profile] $name: listener drain hit the spin cap with events still arriving — " +
          "batch counters for the NEXT query may include stragglers from this one")
      val bs = batches.asScala.toVector
      def sumOf(key: String): Long = bs.flatMap(_.durs.get(key)).sum
      val triggerS = bs.map(_.triggerMs).sum / 1e3
      println(f"""{"query":"$name","rows":$n,"wall_s":$wallS%.2f,""" +
        f""""n_lifecycles":${bs.map(_.runId).distinct.size},""" +
        f""""n_batches":${bs.size},""" +
        f""""trigger_s":$triggerS%.2f,""" +
        f""""add_batch_s":${sumOf("addBatch") / 1e3}%.2f,""" +
        f""""offset_commit_s":${(sumOf("commitOffsets") + sumOf("walCommit")) / 1e3}%.2f,""" +
        f""""state_commit_s":${bs.map(_.stateCommitMs).sum / 1e3}%.2f,""" +
        f""""query_plan_s":${sumOf("queryPlanning") / 1e3}%.2f,""" +
        f""""lifecycle_overhead_s":${math.max(0.0, wallS - triggerS)}%.2f}""")
      // the same inter-query cleanup Bench performs: terminated-query
      // registry + state-store maintenance threads otherwise accumulate
      // and inflate LATER queries' walls (the documented 3.9 s → 49 s
      // debris effect), mis-attributing exactly what this tool measures
      try {
        spark.sharedState.cacheManager.clearCache()
        spark.streams.resetTerminated()
        org.apache.spark.sql.execution.streaming.state.StateStore.stop()
      } catch { case _: Throwable => () }
    }
    spark.streams.removeListener(listener)
    spark.stop()
  }
}
