package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S6 catalog/topology scans (SURVEY.md §2.1; reference
  * `common/db_opertion.go:311-407` GetAllNamespace,
  * `collector/docsyncer/doc_syncer.go:101-204`): enumerate the source's
  * collections, apply the ns white/black filters, and surface per-table
  * stats for the snapshot planner (collStats sizing feeds S3's split
  * planning).
  *
  * Discovery walks the storage directory via the Hadoop FileSystem API
  * (works on HDFS/S3); stats come from the parquet footers via a
  * metadata-only count.
  */
object Catalog {

  /** List collections (parquet tables) under a data dir with their total
    * file bytes; ns filters apply to `db.table` names.
    */
  def listCollections(spark: SparkSession, dir: String, db: String,
      white: Seq[String] = Nil, black: Seq[String] = Nil): Seq[(String, Long)] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tables = fs.listStatus(p).toSeq
      .filter(s => s.getPath.getName.endsWith(".parquet"))
      .map(s => (s.getPath.getName.stripSuffix(".parquet"), s.getLen))
      .sortBy(_._1)
    tables.filter { case (t, _) =>
      val ns = s"$db.$t"
      val w = white.isEmpty || white.exists(ns.matches)
      val b = black.exists(ns.matches)
      w && !b
    }
  }

  /** collStats analogue: rows + bytes per discovered collection. The row
    * count is a parquet metadata read (no data scan — Spark answers
    * count-only plans from footers).
    */
  def collStats(spark: SparkSession, dir: String, db: String,
      white: Seq[String] = Nil, black: Seq[String] = Nil): DataFrame = {
    import spark.implicits._
    // events.parquet carries TIMESTAMP(NANOS); Spark 4 rejects it unless
    // read as long. Set here — never rely on another query having run.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    listCollections(spark, dir, db, white, black).map { case (t, _) =>
      val rows = spark.read.parquet(s"$dir/$t.parquet").count()
      (s"$db.$t", rows)
    }.toDF("ns", "n_rows")
  }
}
