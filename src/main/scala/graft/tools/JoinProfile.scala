package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Throwaway profiler for the stream-join trio's wall-clock (r11 task):
  * replicates the `streamJoinRunner` harness with per-phase timers and a
  * per-batch progress dump, so the drift conversation starts from a
  * measured breakdown instead of a guess.
  */
object JoinProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]").appName("join-profile")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "32").toInt)
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    val work = graft.Work.dir(s"join_profile")
    graft.streaming.IncrSync.deletePath(spark, work)

    val ev = t("prep: load+split+localCheckpoint") {
      val e = graft.Tables.loadEventsNs(spark, sfDir)
        .select(col("event_id"), col("user_id"), expr("ts DIV 1000").as("ts_us"))
        .localCheckpoint()
      e
    }
    t("prep: write views feed") {
      ev.filter(col("event_id") % 2 === 0).write.parquet(s"$work/views")
    }
    t("prep: write buys feed") {
      ev.filter(col("event_id") % 2 === 1).write.parquet(s"$work/buys")
    }

    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("event_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("user_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("ts_us", org.apache.spark.sql.types.LongType)))
    def sideStream(path: String, prefix: String): DataFrame =
      spark.readStream.schema(schema).parquet(s"$work/$path")
        .select(col("event_id").as(s"${prefix}_event"),
          col("user_id").as(s"${prefix}_user"),
          timestamp_micros(col("ts_us")).as(s"${prefix}_ts"))
        .withWatermark(s"${prefix}_ts", "1 hour")

    val joined = sideStream("views", "v").join(sideStream("buys", "b"),
      expr("v_user = b_user AND b_ts >= v_ts AND b_ts <= v_ts + interval 1 hour"),
      "inner")
      .select(col("v_event").as("view_event"), col("b_event").as("buy_event"),
        col("v_user").as("user_id"),
        (unix_micros(col("b_ts")) - unix_micros(col("v_ts"))).as("lag_us"))

    val q = t("stream: start+drain") {
      val q0 = joined.writeStream.outputMode("append")
        .option("checkpointLocation", s"$work/ckpt").option("path", s"$work/out")
        .trigger(Trigger.AvailableNow()).format("parquet").start()
      q0.awaitTermination(); q0
    }
    q.recentProgress.foreach { p =>
      import scala.jdk.CollectionConverters._
      val d = p.durationMs.asScala
      println(s"[profile] batch ${p.batchId}: total=${d.getOrElse("triggerExecution", -1L)}ms " +
        s"addBatch=${d.getOrElse("addBatch", -1L)}ms " +
        s"commit=${d.getOrElse("commitOffsets", -1L)}ms " +
        s"getBatch=${d.getOrElse("getBatch", -1L)}ms " +
        s"walCommit=${d.getOrElse("walCommit", -1L)}ms " +
        s"stateRows=${p.stateOperators.map(_.numRowsTotal).mkString(",")} " +
        s"stateCommitMs=${p.stateOperators.map(_.allUpdatesTimeMs).mkString(",")}/" +
        s"${p.stateOperators.map(_.commitTimeMs).mkString(",")} " +
        s"inputRows=${p.numInputRows}")
    }
    t("read result") { println(spark.read.parquet(s"$work/out").count()) }
    spark.stop()
  }
}
