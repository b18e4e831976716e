package graft.tools
import org.apache.spark.sql.SparkSession

/** Dev tool: the driver's t1 smoke — SparkEntry.entry row count > 0. */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", false).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println(s"entry rows = ${graft.SparkEntry.entry(spark).count()}")
    spark.stop()
  }
}
