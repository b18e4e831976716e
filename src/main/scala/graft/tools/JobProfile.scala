package graft.tools

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Per-JOB wall attribution for one bench query — the drill-down below
  * [[HarnessProfile]]'s per-batch components: when a harness's add_batch
  * dominates, WHICH driver-side actions (jobs) inside the trigger carry
  * the time? Prints one line per Spark job ≥ `minMs` (job id, wall,
  * description/callsite), then a by-description rollup — enough to tell
  * a source-plan materialization from a barrier collect from a delta
  * write without the Spark UI (disabled in the bench session shape).
  *
  * Usage: `graft.tools.JobProfile <query> [minMs]`, env
  * SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS.
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: JobProfile <query> [minMs]")
    val name = args(0)
    val minMs = if (args.length > 1) args(1).toLong else 50L
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val rows = mutable.ArrayBuffer.empty[(Int, Long, String)]
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        // callSite first: the streaming job description is a multiline
        // id/runId/batch block that is useless for rollups.
        val p = Option(js.properties)
        val call = p.flatMap(x => Option(x.getProperty("callSite.short")))
        val batch = p.flatMap(x => Option(x.getProperty("spark.job.description")))
          .flatMap(_.linesIterator.find(_.startsWith("batch")))
        val desc = (call, batch) match {
          case (Some(c), Some(b)) => s"$c [$b]"
          case (Some(c), None) => c
          case (None, Some(b)) => b
          case _ => "?"
        }
        starts.put(js.jobId, (js.time, desc))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        Option(starts.remove(je.jobId)).foreach { case (t0, desc) =>
          rows.synchronized { rows += ((je.jobId, je.time - t0, desc)) }
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val t0 = System.nanoTime()
    val n = graft.SparkEntry.queries(name)(spark, dir).count()
    val wall = (System.nanoTime() - t0) / 1e9
    spark.sparkContext.removeSparkListener(listener)
    Thread.sleep(500) // drain listener bus
    println(f"== $name%s rows=$n wall=$wall%.2f s, jobs=${rows.size}")
    rows.filter(_._2 >= minMs).sortBy(_._1).foreach { case (id, ms, desc) =>
      println(f"job $id%4d ${ms / 1000.0}%7.2f s  ${desc.take(140)}")
    }
    println("-- rollup by description --")
    rows.groupBy(_._3).view.mapValues(v => (v.map(_._2).sum, v.size)).toSeq
      .sortBy(-_._2._1).take(25).foreach { case (desc, (ms, cnt)) =>
        println(f"${ms / 1000.0}%8.2f s  n=$cnt%-4d ${desc.take(120)}")
      }
    spark.stop()
  }
}
