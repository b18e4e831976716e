package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Full-sync snapshot scan planning (SURVEY.md §2.1 S3/S4).
  *
  * The reference sizes a collection (`collStats`), splits it into ≤8 GB
  * key-range pieces via `splitVector`, and runs one range scan per piece
  * (`collector/docsyncer/doc_reader.go:18-172,188-335`). The Spark-native
  * equivalent: derive piece bounds from a cheap min/max aggregate (the
  * `splitVector` analogue), then assign rows to pieces with pure integer
  * arithmetic — each piece is a partition-prunable range predicate.
  */
object Snapshot {

  /** Assign every row to one of `n` contiguous key-range pieces. The
    * bounds aggregate is a scalar broadcast (no collect, one tiny job).
    */
  def pieceAssign(df: DataFrame, keyName: String, n: Int): DataFrame = {
    val bounds = df.agg(min(col(keyName)).as("piece_lo"), max(col(keyName)).as("piece_hi"))
    df.crossJoin(broadcast(bounds))
      .withColumn("piece",
        expr(s"(($keyName - piece_lo) * $n) DIV (piece_hi - piece_lo + 1)"))
      .drop("piece_lo", "piece_hi")
  }

  /** One piece as a range-predicate scan (partition pruning / pushdown
    * path — what each DocumentReader task would execute).
    */
  def pieceScan(spark: SparkSession, path: String, keyName: String,
      lo: Long, hi: Long): DataFrame =
    spark.read.parquet(path).where(col(keyName) >= lo && col(keyName) < hi)
}
