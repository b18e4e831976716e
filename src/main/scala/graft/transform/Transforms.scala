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

  /** P5 TransformDBRef (`collector/transform/transform.go:73-106`):
    * recursive rewrite of `{$ref, $id, $db}` sub-documents under the ns
    * rules. A DBRef is identified by its FIRST key being `$ref` (BSON key
    * order is significant, SURVEY.md §1.3); the referenced ns is
    * `($db | enclosing db).$ref`, rewritten through [[nsTransformStr]],
    * and `$db` is always set to the rewritten db after a rewrite
    * (appended when absent) — the reference's TransformDBRef does this
    * unconditionally, whether or not the db actually changed.
    *
    * Document algebra (json4s, order-preserving) — applied inside the
    * per-record transform stage like the reference's executor.
    */
  def dbRefTransform(docJson: String, db: String, rules: Seq[(String, String)]): String = {
    import org.json4s._
    val doc = UpdateSpec.parse(docJson)
    UpdateSpec.render(walkDbRef(doc, db, rules))
  }

  private def walkDbRef(doc: org.json4s.JObject, db: String,
      rules: Seq[(String, String)]): org.json4s.JObject = {
    import org.json4s._
    doc.obj.headOption match {
      case Some(("$ref", JString(coll))) =>
        val refDb = doc.obj.collectFirst { case ("$db", JString(d)) => d }.getOrElse(db)
        val Array(newDb, newColl) = nsTransformStr(s"$refDb.$coll", rules).split("\\.", 2)
        val withRef = doc.obj.map {
          case ("$ref", _) => "$ref" -> (JString(newColl): JValue)
          case ("$db", _) => "$db" -> (JString(newDb): JValue)
          case kv => kv
        }
        val hasDb = doc.obj.exists(_._1 == "$db")
        JObject(if (hasDb) withRef else withRef :+ ("$db" -> (JString(newDb): JValue)))
      case _ =>
        JObject(doc.obj.map {
          case (k, o: JObject) => k -> (walkDbRef(o, db, rules): JValue)
          case kv => kv
        })
    }
  }

  /** JVM-side mirror of [[nsTransform]] (same first-match rule semantics). */
  def nsTransformStr(ns: String, rules: Seq[(String, String)]): String =
    rules.collectFirst {
      case (src, dst) if ns == src => dst
      case (src, dst) if ns.startsWith(src + ".") => dst + ns.stripPrefix(src)
    }.getOrElse(ns)
}
