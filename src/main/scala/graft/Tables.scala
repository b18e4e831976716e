package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table access for the driver-generated parquet corpus (TESTDATA.md).
  *
  * All readers go through here so scan-level concerns (schema pruning,
  * pushdown-friendly layout) live in one place. At cluster scale the same
  * entry point would resolve catalog tables / bucketed layouts instead of
  * raw parquet paths.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, table: String): DataFrame =
    spark.read.parquet(s"$sfDir/$table.parquet")

  /** Dimension tables small enough to broadcast at any realistic scale
    * factor (region/nation are fixed-cardinality; supplier/customer grow
    * with SF but stay tiny relative to the fact tables).
    */
  val broadcastable: Set[String] = Set("region", "nation", "supplier")
}
