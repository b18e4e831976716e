package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.transform.DdlNs

/** DDL-aware namespace filtering/transform queries (F4 + F5-DDL + P6) with
  * exact DuckDB oracles.
  *
  * Corpus: command oplogs synthesized deterministically from `view` events
  * — one of the 10 shapes below per row (event_id % 10), covering every
  * command class in the reference table (`oplog/cmd_oplog.go:14-31`) plus
  * a `system.indexes` DML insert and an unknown command:
  *   0 drop, 1 renameCollection, 2 dropDatabase, 3 create(+idIndex),
  *   4 createIndexes, 5 startIndexBuild, 6 abortIndexBuild,
  *   7 commitIndexBuild, 8 system.indexes insert, 9 shardCollection(unknown)
  */
object DdlOps {

  private val white = Seq("^app\\.users_[0-9]+$")
  private val black = Seq("^app\\.users_3$")
  private val whiteDbs = Seq("app")
  private val rules = Seq("app.users_0" -> "app.u0", "app" -> "appx")

  /** Synthesized command-op corpus. `localCheckpoint` truncates lineage so
    * the DDL predicates reference stored attributes: without it Catalyst
    * pushes the keep-filter through this projection and inlines the
    * 10-branch `o` synthesis into every one of its ~12 references — a
    * >64 KB codegen method that falls back to interpreted execution. In
    * production `o` is a stored column and that same pushdown reaches the
    * scan, which is the desired shape.
    */
  def corpus(s: SparkSession, dir: String): DataFrame =
    corpusPlan(s, dir).localCheckpoint()

  private def corpusPlan(s: SparkSession, dir: String): DataFrame = {
    val ev = graft.Tables.loadEventsNs(s, dir).filter(col("event_type") === "view")
    val db = when(col("user_id") % 50 === 0, "local").otherwise("app")
    val coll = concat(lit("users_"), (col("user_id") % 4).cast("string"))
    val nsFull = concat(db, lit("."), coll)
    val m = col("event_id") % 10
    ev.select(
      col("event_id"),
      (shiftleft(expr("ts DIV 1000000000"), 32) +
        pmod(col("event_id"), lit(4294967296L))).as("ts_packed"),
      db.as("db"), coll.as("coll"), m.as("m"),
      when(m === 8, "i").otherwise("c").as("op"),
      when(m === 8, concat(db, lit(".system.indexes")))
        .otherwise(concat(db, lit(".$cmd"))).as("ns"),
      when(m === 0, concat(lit("{\"drop\":\""), coll, lit("\"}")))
        .when(m === 1, concat(lit("{\"renameCollection\":\""), nsFull,
          lit("\",\"to\":\""), nsFull, lit("_r\",\"stayTemp\":false}")))
        .when(m === 2, lit("{\"dropDatabase\":1}"))
        .when(m === 3, concat(lit("{\"create\":\""), coll,
          lit("\",\"idIndex\":{\"v\":2,\"key\":{\"_id\":1},\"name\":\"_id_\",\"ns\":\""),
          nsFull, lit("\"}}")))
        .when(m === 4, concat(lit("{\"createIndexes\":\""), coll, lit("\",\"v\":2}")))
        .when(m === 5, concat(lit("{\"startIndexBuild\":\""), coll, lit("\"}")))
        .when(m === 6, concat(lit("{\"abortIndexBuild\":\""), coll, lit("\"}")))
        .when(m === 7, concat(lit("{\"commitIndexBuild\":\""), coll, lit("\"}")))
        .when(m === 8, concat(lit("{\"v\":2,\"key\":{\"date\":1},\"name\":\"date_1\",\"ns\":\""),
          nsFull, lit("\"}")))
        .otherwise(concat(lit("{\"shardCollection\":\""), nsFull, lit("\"}"))).as("o"))
  }

  /** Display command name: known commands only (mirrors ExtraCommandName's
    * found flag).
    */
  private def shownCmd = {
    val c = DdlNs.cmdName(col("o"))
    when(col("op") === "c" && c.isin(DdlNs.knownCmds: _*), c).otherwise(lit(""))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // F4 + F5-DDL: filter command ops by the namespace they operate ON.
    "cdc_ddl_ns_filter" -> ((s, dir) =>
      corpus(s, dir)
        .withColumn("cmd", shownCmd)
        .withColumn("ns_eff", DdlNs.effectiveNs())
        .filter(DdlNs.ddlAwareKeep(white, black, whiteDbs))
        .select("event_id", "op", "cmd", "ns", "ns_eff")),

    // P6: command-aware ns rewrite of both the ns column and the body.
    "cdc_ddl_ns_transform" -> ((s, dir) =>
      DdlNs.transformCommand(corpus(s, dir).withColumn("cmd", shownCmd), rules)
        .select("event_id", "op", "cmd", "ns", "o"))
  )

  // ---- oracle SQL ----------------------------------------------------------

  private val collCmdsSql = DdlNs.collCmds.map("'" + _ + "'").mkString("(", ",", ")")
  private val knownCmdsSql = DdlNs.knownCmds.map("'" + _ + "'").mkString("(", ",", ")")

  /** nsTransform(rules) as a DuckDB CASE over an expression. */
  private def nsT(x: String): String =
    s"""CASE WHEN $x = 'app.users_0' THEN 'app.u0'
        WHEN $x LIKE 'app.users_0.%' THEN 'app.u0' || substr($x, 12)
        WHEN $x = 'app' THEN 'appx'
        WHEN $x LIKE 'app.%' THEN 'appx' || substr($x, 4)
        ELSE $x END"""

  private val corpusCte: String =
    """WITH base AS (
         SELECT event_id,
           ((epoch_ns(ts)//1000000000) << 32) + (event_id % 4294967296) AS ts_packed,
           CASE WHEN user_id % 50 = 0 THEN 'local' ELSE 'app' END AS db,
           'users_' || CAST(user_id % 4 AS VARCHAR) AS coll,
           event_id % 10 AS m
         FROM events WHERE event_type = 'view'),
       corpus AS (
         SELECT event_id, ts_packed, db, coll, m,
           CASE WHEN m = 8 THEN 'i' ELSE 'c' END AS op,
           CASE WHEN m = 8 THEN db || '.system.indexes' ELSE db || '.$cmd' END AS ns,
           CASE m
             WHEN 0 THEN '{"drop":"' || coll || '"}'
             WHEN 1 THEN '{"renameCollection":"' || db || '.' || coll || '","to":"'
               || db || '.' || coll || '_r","stayTemp":false}'
             WHEN 2 THEN '{"dropDatabase":1}'
             WHEN 3 THEN '{"create":"' || coll
               || '","idIndex":{"v":2,"key":{"_id":1},"name":"_id_","ns":"'
               || db || '.' || coll || '"}}'
             WHEN 4 THEN '{"createIndexes":"' || coll || '","v":2}'
             WHEN 5 THEN '{"startIndexBuild":"' || coll || '"}'
             WHEN 6 THEN '{"abortIndexBuild":"' || coll || '"}'
             WHEN 7 THEN '{"commitIndexBuild":"' || coll || '"}'
             WHEN 8 THEN '{"v":2,"key":{"date":1},"name":"date_1","ns":"'
               || db || '.' || coll || '"}'
             ELSE '{"shardCollection":"' || db || '.' || coll || '"}' END AS o
         FROM base),
       typed AS (
         SELECT *,
           regexp_extract(o, '^\s*\{\s*"([^"]+)"', 1) AS raw_cmd,
           CASE WHEN op = 'c' AND regexp_extract(o, '^\s*\{\s*"([^"]+)"', 1)
                     IN KNOWN_CMDS
             THEN regexp_extract(o, '^\s*\{\s*"([^"]+)"', 1) ELSE '' END AS cmd
         FROM corpus)"""
      .replace("KNOWN_CMDS", knownCmdsSql)

  private val effNsSql: String =
    s"""CASE WHEN op = 'c' THEN
          CASE WHEN raw_cmd IN $collCmdsSql
                 THEN split_part(ns, '.', 1) || '.' || json_extract_string(o, '$$.' || raw_cmd)
               WHEN raw_cmd = 'renameCollection' THEN json_extract_string(o, '$$.renameCollection')
               ELSE ns END
        WHEN ns LIKE '%system.indexes' THEN json_extract_string(o, '$$.ns')
        ELSE ns END"""

  private def nsKeepSql(x: String): String =
    s"""(($x LIKE '%.$$cmd' AND split_part($x, '.', 1) IN ('app'))
        OR (regexp_matches($x, '^app\\.users_[0-9]+$$')
            AND NOT regexp_matches($x, '^app\\.users_3$$')))"""

  def oracles: Map[String, String] = Map(
    "cdc_ddl_ns_filter" ->
      s"""$corpusCte,
          eff AS (SELECT *, $effNsSql AS ns_eff FROM typed)
          SELECT event_id, op, cmd, ns, ns_eff FROM eff
          WHERE NOT (op = 'c' AND raw_cmd IN ('startIndexBuild','abortIndexBuild'))
            AND (CASE WHEN op = 'c'
                   THEN raw_cmd = 'applyOps' OR raw_cmd NOT IN $knownCmdsSql
                        OR ${nsKeepSql("ns_eff")}
                   ELSE ${nsKeepSql("ns_eff")} END)""",

    "cdc_ddl_ns_transform" ->
      s"""$corpusCte,
          coll_t AS (
            SELECT *,
              ${nsT(s"split_part(ns, '.', 1) || '.' || json_extract_string(o, '$$.' || raw_cmd)")} AS coll_new_ns
            FROM typed)
          SELECT event_id, op, cmd,
            CASE WHEN op <> 'c' THEN ${nsT("ns")}
                 WHEN raw_cmd IN $collCmdsSql THEN coll_new_ns
                 WHEN raw_cmd = 'renameCollection'
                   THEN ${nsT("json_extract_string(o, '$.renameCollection')")}
                 ELSE ${nsT("ns")} END AS ns,
            CASE WHEN op <> 'c' THEN
                   (CASE WHEN ns LIKE '%system.indexes'
                      THEN regexp_replace(o, '"ns":"[^"]*"',
                        '"ns":"' || ${nsT("json_extract_string(o, '$.ns')")} || '"')
                      ELSE o END)
                 WHEN raw_cmd IN $collCmdsSql THEN
                   (CASE WHEN raw_cmd = 'create' AND json_extract(o, '$$.idIndex') IS NOT NULL
                      THEN regexp_replace(
                        regexp_replace(o, '"' || raw_cmd || '":"[^"]*"',
                          '"' || raw_cmd || '":"' || regexp_replace(coll_new_ns, '^[^.]*\\.', '') || '"'),
                        '"ns":"[^"]*"', '"ns":"' || coll_new_ns || '"')
                      ELSE regexp_replace(o, '"' || raw_cmd || '":"[^"]*"',
                        '"' || raw_cmd || '":"' || regexp_replace(coll_new_ns, '^[^.]*\\.', '') || '"')
                      END)
                 WHEN raw_cmd = 'renameCollection' THEN
                   regexp_replace(
                     regexp_replace(o, '"renameCollection":"[^"]*"',
                       '"renameCollection":"' || ${nsT("json_extract_string(o, '$.renameCollection')")} || '"'),
                     '"to":"[^"]*"', '"to":"' || ${nsT("json_extract_string(o, '$.to')")} || '"')
                 ELSE o END AS o
          FROM coll_t
          WHERE op <> 'c' OR raw_cmd IN $knownCmdsSql"""
  )
}
