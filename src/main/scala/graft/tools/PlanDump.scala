package graft.tools
import org.apache.spark.sql.SparkSession

/** Dev tool: dump the FULL `.explain("formatted")` text of named queries
  * to `<outDir>/<query>_<tag>.txt` — the before/after plan evidence the
  * optimization rounds commit under `plans/rNN/`.
  *
  * Usage: PlanDump <names,csv> <sfDir> <outDir> <tag>
  *
  * Runs at the bench's session shape — local[$SPARK_GRAFT_CPUS] with
  * `spark.sql.shuffle.partitions` set to the SAME cpus value, exactly as
  * Bench.scala does (including Bench's default of "4" when the env var
  * is unset — ADVICE r19: a diverging default would dump Exchange
  * partitioning the bench never executes).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").toSeq
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val out = if (args.length > 2) args(2) else "plans/r20"
    val tag = if (args.length > 3) args(3) else "after"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", false).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(out))
    for (q <- names) {
      println(s"===== $q")
      val plan = graft.SparkEntry.queries(q)(spark, dir).queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(out, s"${q}_$tag.txt"), plan)
    }
    spark.stop()
  }
}
