package graft.model

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Canonical change-stream event model (SURVEY.md §1.2; reference
  * `oplog/changestram_event.go:56-67`) — the engine's SECOND ingest
  * format, next to the raw-oplog shape in [[Oplog]].
  *
  * Columns (dynamic documents ride as JSON strings, §1.3):
  *   event_id, ts_us, ts_packed       — identity + event time
  *   operation_type                   — insert | delete | replace | update |
  *                                      drop | rename | dropDatabase | invalidate
  *   db, coll, to_db, to_coll         — ns{db,coll} and rename target
  *   full_document                    — post-image (insert/replace; update
  *                                      only in fullDocument=updateLookup mode)
  *   document_key                     — {_id...} JSON
  *   updated_fields, removed_fields   — updateDescription parts
  */
object ChangeEvent {

  /** Deterministic change-stream corpus over the driver's `events` table
    * (mirrored 1:1 in [[oracleCte]]):
    *  - operation_type: signup→insert, purchase→replace, click→update,
    *    error→delete; view fans across DDL by event_id%4:
    *    0→drop, 1→rename, 2→dropDatabase, 3→invalidate
    *  - ns: same db/coll convention as [[Oplog.project]]
    *  - documents: {_id, cents, k} built from user_id / round(value·100) /
    *    props.k with fixed JSON formatting so both engines byte-agree
    *  - updateDescription: updatedFields {} when event_id%7=0 (empty-diff
    *    coverage), removedFields ["k"] when event_id%5=0
    */
  def fromEvents(spark: SparkSession, sfDir: String): DataFrame =
    project(graft.Tables.loadEventsNs(spark, sfDir))

  def project(events: DataFrame): DataFrame = {
    val tsUs = expr("ts DIV 1000")
    val tsSec = expr("ts DIV 1000000000")
    val uid = col("user_id").cast("string")
    val cents = expr("CAST(round(value * 100) AS BIGINT)").cast("string")
    val k = expr("CAST(get_json_object(props, '$.k') AS BIGINT)").cast("string")
    events.select(
      col("event_id"),
      tsUs.as("ts_us"),
      (shiftleft(tsSec, 32) + pmod(col("event_id"), lit(4294967296L))).as("ts_packed"),
      when(col("event_type") === "signup", "insert")
        .when(col("event_type") === "purchase", "replace")
        .when(col("event_type") === "click", "update")
        .when(col("event_type") === "error", "delete")
        .otherwise(
          when(col("event_id") % 4 === 0, "drop")
            .when(col("event_id") % 4 === 1, "rename")
            .when(col("event_id") % 4 === 2, "dropDatabase")
            .otherwise("invalidate")).as("operation_type"),
      when(col("user_id") % 50 === 0, "local").otherwise("app").as("db"),
      concat(lit("users_"), (col("user_id") % 4).cast("string")).as("coll"),
      when(col("user_id") % 50 === 0, "local").otherwise("app").as("to_db"),
      concat(lit("users_"), (col("user_id") % 4).cast("string"), lit("_r")).as("to_coll"),
      concat(lit("{\"_id\":"), uid, lit(",\"cents\":"), cents,
        lit(",\"k\":"), k, lit("}")).as("full_document"),
      concat(lit("{\"_id\":"), uid, lit("}")).as("document_key"),
      when(col("event_id") % 7 === 0, "{}")
        .otherwise(concat(lit("{\"cents\":"), cents, lit("}"))).as("updated_fields"),
      when(col("event_id") % 5 === 0, array(lit("k")))
        .otherwise(array().cast("array<string>")).as("removed_fields"))
  }

  /** DuckDB CTE equivalent of [[fromEvents]] — prefix oracle SQL with
    * `WITH cev AS (...)`. Must stay in lockstep with the projection above.
    */
  val oracleCte: String =
    """SELECT event_id,
       epoch_ns(ts)//1000 AS ts_us,
       ((epoch_ns(ts)//1000000000) << 32) + (event_id % 4294967296) AS ts_packed,
       CASE event_type WHEN 'signup' THEN 'insert' WHEN 'purchase' THEN 'replace'
            WHEN 'click' THEN 'update' WHEN 'error' THEN 'delete'
            ELSE (CASE event_id % 4 WHEN 0 THEN 'drop' WHEN 1 THEN 'rename'
                  WHEN 2 THEN 'dropDatabase' ELSE 'invalidate' END) END AS operation_type,
       CASE WHEN user_id % 50 = 0 THEN 'local' ELSE 'app' END AS db,
       'users_' || CAST(user_id % 4 AS VARCHAR) AS coll,
       CASE WHEN user_id % 50 = 0 THEN 'local' ELSE 'app' END AS to_db,
       'users_' || CAST(user_id % 4 AS VARCHAR) || '_r' AS to_coll,
       '{"_id":' || CAST(user_id AS VARCHAR) || ',"cents":' ||
         CAST(CAST(round(value * 100) AS BIGINT) AS VARCHAR) || ',"k":' ||
         CAST(CAST(json_extract_string(props, '$.k') AS BIGINT) AS VARCHAR) || '}' AS full_document,
       '{"_id":' || CAST(user_id AS VARCHAR) || '}' AS document_key,
       CASE WHEN event_id % 7 = 0 THEN '{}'
            ELSE '{"cents":' || CAST(CAST(round(value * 100) AS BIGINT) AS VARCHAR) || '}'
            END AS updated_fields,
       CASE WHEN event_id % 5 = 0 THEN ['k'] ELSE CAST([] AS VARCHAR[]) END AS removed_fields
       FROM events"""
}
