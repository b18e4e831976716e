package graft.tools
import org.apache.spark.sql.SparkSession

/** Dev tool: print scan/exchange/codegen lines of selected query plans. */
object ExplainCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", false).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val names = if (args.nonEmpty) args(0).split(",").toSeq
                else Seq("mm_meta", "sink_encode", "cdc_top3_ns", "mm_near_dup")
    for (q <- names) {
      println(s"===== $q")
      val plan = graft.SparkEntry.queries(q)(spark, dir).queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      println(plan.split("\n").filter(l => l.contains("Scan") || l.contains("ReadSchema")
        || l.contains("Exchange") || l.contains("PushedFilters")
        || l.contains("WholeStageCodegen") || l.contains("Join")
        || l.contains("CartesianProduct")).mkString("\n"))
    }
    spark.stop()
  }
}
