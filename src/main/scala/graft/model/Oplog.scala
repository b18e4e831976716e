package graft.model

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Canonical CDC record model (SURVEY.md §1.1; reference `oplog/oplog.go:24-41`).
  *
  * The engine's universal record mirrors MongoShake's `ParsedLog`: a packed
  * `ts` (seconds<<32 | intra-second seq), `op` ∈ {i,u,d,c,n}, namespace
  * `ns` = "db.coll" (plus derived `db`/`coll`), a document key, a gid for
  * active-active loop prevention, and the document/update-spec payload as a
  * JSON string (documents are dynamic-schema — SURVEY.md §1.3).
  */
object Oplog {

  /** Columns of the canonical oplog DataFrame. */
  val columns: Seq[String] = Seq(
    "event_id", "ts_us", "ts_packed", "op", "db", "coll", "ns",
    "doc_key", "g", "value", "props", "from_migrate")

  /** Project the driver's `events` table into canonical oplog form
    * (FIXTURES.md §B usage mapping; the P1/P2 normalizer analogue —
    * reference `collector/syncer.go:441-503`, `oplog/changestram_event.go:77-452`).
    *
    * Deterministic corpus convention (mirrored 1:1 in the DuckDB oracle):
    *  - op:   signup→i, purchase→u, click→u, error→d, view→n
    *  - db:   user_id % 50 == 0 → "local" (system-db rows exercising the
    *          autologous filter), else "app"
    *  - coll: "users_" + (user_id % 4)
    *  - gid:  event_id % 97 == 0 → "ext" (foreign-source record), else ""
    *  - ts:   parquet TIMESTAMP(NANOS) read as long; all derived values use
    *          microseconds so the oracle (µs-precision timestamps) agrees.
    */
  def fromEvents(spark: SparkSession, sfDir: String): DataFrame =
    project(graft.Tables.loadEventsNs(spark, sfDir))

  /** The projection itself, applicable to a batch or streaming `events`
    * DataFrame whose `ts` column is already a nanosecond long.
    */
  def project(events: DataFrame): DataFrame = {
    // Integer division: `/` on Column is double division, which is lossy
    // above 2^53 — int64 nanos (~1.7e18) would round. DIV is exact.
    val tsUs = expr("ts DIV 1000")
    val tsSec = expr("ts DIV 1000000000")
    events
      .select(
        col("event_id"),
        tsUs.as("ts_us"),
        (shiftleft(tsSec, 32) + pmod(col("event_id"), lit(4294967296L))).as("ts_packed"),
        when(col("event_type") === "signup", "i")
          .when(col("event_type").isin("purchase", "click"), "u")
          .when(col("event_type") === "error", "d")
          .otherwise("n").as("op"),
        when(col("user_id") % 50 === 0, "local").otherwise("app").as("db"),
        concat(lit("users_"), (col("user_id") % 4).cast("string")).as("coll"),
        col("user_id").cast("string").as("doc_key"),
        when(col("event_id") % 97 === 0, "ext").otherwise("").as("g"),
        col("value"),
        col("props"),
        lit(false).as("from_migrate"))
      .withColumn("ns", concat(col("db"), lit("."), col("coll")))
  }

  /** DuckDB CTE equivalent of [[fromEvents]] — prefix oracle SQL with
    * `WITH oplog AS (...)`. Must stay in lockstep with the projection above.
    */
  val oracleCte: String =
    """SELECT event_id,
       epoch_ns(ts)//1000 AS ts_us,
       ((epoch_ns(ts)//1000000000) << 32) + (event_id % 4294967296) AS ts_packed,
       CASE event_type WHEN 'signup' THEN 'i' WHEN 'purchase' THEN 'u'
            WHEN 'click' THEN 'u' WHEN 'error' THEN 'd' ELSE 'n' END AS op,
       CASE WHEN user_id % 50 = 0 THEN 'local' ELSE 'app' END AS db,
       'users_' || CAST(user_id % 4 AS VARCHAR) AS coll,
       (CASE WHEN user_id % 50 = 0 THEN 'local' ELSE 'app' END) || '.users_' || CAST(user_id % 4 AS VARCHAR) AS ns,
       CAST(user_id AS VARCHAR) AS doc_key,
       CASE WHEN event_id % 97 = 0 THEN 'ext' ELSE '' END AS g,
       value, props, false AS from_migrate
       FROM events"""

  /** Keep-chain WHERE fragment of the verified pipeline configuration
    * (gids = {""}, whitelist `app.users_*`, blacklist `app.users_3`) —
    * mirrors `OplogFilters.chain`. Single source for every oracle that
    * filters the corpus; a drift here would desynchronize all of them at
    * once (and loudly), instead of one of three copies silently.
    */
  val oracleChainSql: String =
    """op <> 'n' AND g IN ('')
       AND (db NOT IN ('admin','local','config','mongoshake','mongoshake_conflict') OR ns = 'admin.$cmd')
       AND regexp_matches(ns, '^app\.users_[0-9]+$')
       AND NOT regexp_matches(ns, '^app\.users_3$')
       AND NOT from_migrate"""

  /** Prefix an oracle body with the canonical corpus CTE. */
  def withOracleCte(body: String): String = s"WITH oplog AS ($oracleCte) $body"
}
