package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Measure the HDFS-backed vs RocksDB state-store flip point on a
  * stream-stream join — the PROFILE_r13 prediction ("the provider
  * decision inverts once per-partition state no longer fits heap
  * comfort") turned into a number.
  *
  * Harness: both sides of an inner equi-join arrive as 4 ordered files of
  * disjoint key ranges (`maxFilesPerTrigger = 1` → 4 micro-batches; state
  * grows monotonically to `rows` per side, ~96 B of payload per row).
  * No watermark, so nothing evicts — the run measures pure state-store
  * add/commit/lookup cost at a controlled store size. One drain per
  * (size, provider) on a fresh work dir; wall-clock of the AvailableNow
  * drain is the metric. The flip is where the RocksDB row undercuts the
  * HDFS-backed row: the default provider holds every partition's full
  * map (plus retained versions) on heap, RocksDB holds it off-heap in
  * native memory — small stores pay RocksDB's native setup + changelog
  * overhead for nothing, large stores trade it for not thrashing the GC.
  *
  * Usage: `graft.tools.StateFlip [rowsPerSide ...]` (default
  * 100k 400k 1.6M 6.4M), env SPARK_GRAFT_CPUS (default 8). The heap the
  * JVM was launched with is part of the result line — the flip point is
  * a rows-vs-heap statement, not an absolute.
  */
object StateFlip {

  private val Batches = 4

  def main(args: Array[String]): Unit = {
    val sizes =
      if (args.nonEmpty) args.toSeq.map(_.toLong)
      else Seq(100000L, 400000L, 1600000L, 6400000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    def build(): SparkSession = {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      val s = SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      s.sparkContext.setLogLevel("WARN")
      s
    }
    // An over-heap HDFS-backed run kills the whole local SparkContext
    // (executor OOM → context shutdown) — that death IS the flip
    // evidence, so the harness rebuilds the session and keeps measuring.
    var spark = build()
    val heapGb = Runtime.getRuntime.maxMemory() / (1024.0 * 1024 * 1024)
    // JVM/session warmup so the first timed drain isn't the cold one
    runOne(spark, 20000L, "hdfs")

    val lines = sizes.flatMap { n =>
      // GRAFT_STATEFLIP_PROVIDERS limits the arms (e.g. "rocksdb") so an
      // over-heap HDFS run — which can take the whole local JVM down with
      // a driver OOM — can be isolated in its own process by the caller.
      sys.env.getOrElse("GRAFT_STATEFLIP_PROVIDERS", "hdfs,rocksdb")
        .split(",").toSeq.map { prov =>
        // A provider that cannot HOLD the state is itself the measurement
        // (the HDFS-backed provider dies with HDFS_STORE_PROVIDER_OUT_OF_
        // MEMORY once a partition's map outgrows heap) — record it as the
        // flip evidence instead of dying with it.
        if (spark.sparkContext.isStopped) spark = build()
        val res = try Right(runOne(spark, n, prov)) catch {
          case e: Throwable =>
            val root = Option(e.getCause).getOrElse(e)
            Left(root.getClass.getSimpleName +
              Option(root.getMessage).map(m => ": " + m.take(120)).getOrElse(""))
        }
        val j = res match {
          case Right(dt) =>
            f"""{"rows_per_side":$n,"provider":"$prov","drain_s":$dt%.2f,""" +
              f""""heap_gb":$heapGb%.1f,"batches":$Batches,"partitions":$cpus}"""
          case Left(err) =>
            s"""{"rows_per_side":$n,"provider":"$prov","drain_s":-1,""" +
              f""""heap_gb":$heapGb%.1f,"batches":$Batches,"partitions":$cpus,""" +
              s""""failed":${ujsonStr(err)}}"""
        }
        println(j)
        j
      }
    }
    val outFile = sys.env.getOrElse("GRAFT_STATEFLIP_REPORT",
      "/tmp/graft_stateflip.jsonl")
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(outFile),
      lines.mkString("", "\n", "\n"))
    catch { case e: Throwable => System.err.println(s"[stateflip] write failed: ${e.getMessage}") }
    spark.stop()
  }

  private def ujsonStr(s: String): String =
    "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"")
      .replaceAll("[\\n\\r\\t]", " ") + "\""

  /** One (size, provider) drain; returns wall-clock seconds.
    *
    * `provider = "auto"` routes the choice through
    * [[graft.streaming.GraftConfig.sanitize]]'s availability gate — the
    * projected live state (2 sides x `rows` x ~150 B x ~2.5) against this
    * JVM's heap picks default-vs-RocksDB exactly as a production config
    * would, so the 12.8M-row shape that kills a hand-configured default
    * provider survives with ZERO hand configuration (the r15 verdict's
    * task-2 done bar).
    */
  def runOne(spark: SparkSession, rows: Long, providerArg: String): Double = {
    val provider =
      if (providerArg != "auto") providerArg
      else {
        val cfg = graft.streaming.GraftConfig(
          sourceUrls = Seq("mongodb://src"), tunnel = "mock",
          streamStateRows = 2L * rows).sanitize
          .getOrElse(sys.error("sanitize rejected the auto-provider config"))
        val chosen = if (cfg.stateStoreProvider == "rocksdb") "rocksdb" else "hdfs"
        println(s"""{"auto_provider":"$chosen","rows_per_side":$rows,""" +
          s""""projected_mb":${graft.streaming.GraftConfig.projectedStateMb(2L * rows)},""" +
          s""""heap_mb":${cfg.executorHeapMb}}""")
        chosen
      }
    val work = graft.Work.dir(s"stateflip_${rows}_$provider")
    graft.streaming.IncrSync.deletePath(spark, work)
    val per = rows / Batches
    def side(tag: String): Unit =
      graft.operators.StreamOps.stageOrdered(spark, s"$work/$tag",
        (0 until Batches).map { i =>
          spark.range(per)
            .select((col("id") + lit(i * per)).as("k"),
              timestamp_seconds(lit(1700000000L)).as("ts"),
              concat(lit(s"${tag}_payload_"), lpad(col("id").cast("string"), 20, "0"),
                lit("_"), lit("x" * 56)).as(s"${tag}_payload"))
        })
    side("l")
    side("r")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      if (provider == "rocksdb")
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
      else
        "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider")
    val lSchema = spark.read.parquet(s"$work/l").schema
    val rSchema = spark.read.parquet(s"$work/r").schema
    val l = spark.readStream.schema(lSchema)
      .option("maxFilesPerTrigger", 1).parquet(s"$work/l")
    val r = spark.readStream.schema(rSchema)
      .option("maxFilesPerTrigger", 1).parquet(s"$work/r")
      .withColumnRenamed("k", "rk").withColumnRenamed("ts", "rts")
    val t0 = System.nanoTime()
    val q = l.join(r, col("k") === col("rk"))
      .writeStream.format("noop")
      .option("checkpointLocation", s"$work/ckpt")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val dt = (System.nanoTime() - t0) / 1e9
    try {
      org.apache.spark.sql.execution.streaming.state.StateStore.stop()
      spark.streams.resetTerminated()
    } catch { case _: Throwable => () }
    graft.streaming.IncrSync.deletePath(spark, work)
    dt
  }
}
