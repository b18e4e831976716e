package graft.tools

import java.util.concurrent.atomic.LongAdder

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Per-query data-plane volume profile — the measured artifact behind
  * "this query's shuffle/spill is larger than its output warrants"
  * findings (r19, verdict task 3): runs each named bench query once with
  * a task-metrics listener attached and prints ONE JSON line per query
  * with wall plus the summed task metrics that explain io-contention
  * sensitivity — input bytes read, shuffle bytes written, shuffle bytes
  * read, memory/disk spill. A query whose wall inflates under disk
  * pressure far beyond the suite median will show it here as
  * shuffle+spill volume far beyond its input/output sizes.
  *
  * Usage: `graft.tools.ShuffleProfile <query ...>`, env
  * SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS.
  */
object ShuffleProfile {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: ShuffleProfile <query ...>")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val input = new LongAdder; val shW = new LongAdder; val shR = new LongAdder
    val spillMem = new LongAdder; val spillDisk = new LongAdder
    val tasks = new LongAdder
    val listener = new SparkListener {
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        val m = e.taskMetrics
        if (m != null) {
          tasks.increment()
          input.add(m.inputMetrics.bytesRead)
          shW.add(m.shuffleWriteMetrics.bytesWritten)
          shR.add(m.shuffleReadMetrics.totalBytesRead)
          spillMem.add(m.memoryBytesSpilled)
          spillDisk.add(m.diskBytesSpilled)
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    // warmup outside the measurement
    try spark.range(1000000).selectExpr("sum(id)").collect() catch { case _: Throwable => () }

    args.foreach { name =>
      Seq(input, shW, shR, spillMem, spillDisk, tasks).foreach(_.reset())
      val t0 = System.nanoTime()
      val n = try graft.SparkEntry.queries(name)(spark, dir).count()
        catch { case e: Throwable =>
          System.err.println(s"[shuffle] $name FAILED: ${e.getMessage}"); -1L }
      val wallS = (System.nanoTime() - t0) / 1e9
      // listener delivery is async — wait until the task-count sum holds
      // stable (the bus is private API; the stable-window drain is the
      // same recipe HarnessProfile uses)
      var last = -1L; var stable = 0
      while (stable < 3) {
        if (tasks.sum == last) stable += 1 else { stable = 0; last = tasks.sum }
        Thread.sleep(100)
      }
      def mb(a: LongAdder): Double = a.sum / 1e6
      println(f"""{"query":"$name","rows":$n,"wall_s":$wallS%.2f,""" +
        f""""tasks":${tasks.sum},"input_mb":${mb(input)}%.1f,""" +
        f""""shuffle_write_mb":${mb(shW)}%.1f,"shuffle_read_mb":${mb(shR)}%.1f,""" +
        f""""spill_mem_mb":${mb(spillMem)}%.1f,"spill_disk_mb":${mb(spillDisk)}%.1f}""")
      try {
        spark.sharedState.cacheManager.clearCache()
        spark.streams.resetTerminated()
        org.apache.spark.sql.execution.streaming.state.StateStore.stop()
      } catch { case _: Throwable => () }
    }
    spark.sparkContext.removeSparkListener(listener)
    spark.stop()
  }
}
