package graft.transform

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-record namespace/gid transforms (SURVEY.md §2.3, P3/P4/P10). */
object Transforms {

  /** P3 NamespaceTransform (`collector/transform/transform.go:13-41`):
    * ordered rule list `src -> dst`; the first rule whose source matches
    * the namespace (exact, or as a "db" prefix of "db.coll") rewrites it.
    * Compiled to one nested CASE expression — pure Catalyst, no UDF.
    */
  def nsTransform(rules: Seq[(String, String)], ns: Column = col("ns")): Column = {
    val quoted = rules.map { case (src, dst) =>
      (java.util.regex.Pattern.quote(src), src, dst)
    }
    quoted.foldRight(ns) { case ((qsrc, src, dst), acc) =>
      when(ns === src, lit(dst))
        .when(ns.startsWith(src + "."),
          concat(lit(dst), regexp_replace(ns, "^" + qsrc, "")))
        .otherwise(acc)
    }
  }

  /** P4 DBTransform (`transform.go:43-71`): db → multiple target dbs.
    * 1→N fanout via a broadcast left join against the mapping table (a
    * source db with k targets matches k rows); unmapped dbs pass through
    * unchanged. No shuffle: the mapping is always tiny.
    */
  def dbFanout(df: DataFrame, mapping: Seq[(String, String)]): DataFrame = {
    val m = broadcast(df.sparkSession.createDataFrame(mapping).toDF("db_src", "db_dst"))
    df.join(m, col("db") === col("db_src"), "left")
      .withColumn("db", coalesce(col("db_dst"), col("db")))
      .withColumn("ns", concat(col("db"), lit("."), col("coll")))
      .drop("db_src", "db_dst")
  }

  /** P10 gid scrub (`collector/syncer.go:618-633`): blank the gid field. */
  def gidScrub(df: DataFrame): DataFrame = df.withColumn("g", lit(""))
}
