package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.filters.OplogFilters
import graft.model.Oplog
import graft.streaming.Coordinator

/** Operational-envelope queries (SURVEY.md §2.4 F10, §2.7 T6/T11): the
  * target-delay holdback and the exit-point truncation, parameterized from
  * the corpus itself (deterministic) and mirrored exactly in DuckDB.
  */
object ControlOps {

  private val gids = Seq("")
  private val white = Seq("^app\\.users_[0-9]+$")
  private val black = Seq("^app\\.users_3$")
  private val delaySec = 1800L

  private def filtered(s: SparkSession, dir: String): DataFrame =
    Oplog.fromEvents(s, dir).filter(OplogFilters.chain(gids, white, black))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // T6: rows older than (now - delay + 3s slack) ship, the rest are held
    // for a later trigger; rows at/below fullSyncFinishPosition never wait.
    // `now` = the corpus's newest event (deterministic stand-in for the
    // trigger clock); fsfp = the oldest record.
    "cdc_delay_holdback" -> ((s, dir) => {
      val df = filtered(s, dir)
      // One-row scalar fetch (trigger parameters), not a data collect.
      val r = df.agg(max(shiftrightunsigned(col("ts_packed"), 32)), min(col("ts_packed"))).head()
      // held pinned to int: bool is absent from the rest of the oracle
      // surface, and the hash gate compares canonicalized values by type.
      Coordinator.delayHoldback(df, delaySec, nowSec = r.getLong(0), fullSyncFinishPosition = r.getLong(1))
        .groupBy(col("held").cast("int").as("held"), col("ns"))
        .agg(count(lit(1)).as("n"), max(col("ts_packed")).as("max_ts"))
    }),

    // T7 QoS token bucket: day-grained ticks with a 50-record budget so
    // admission genuinely truncates busy ticks (refill-full semantics —
    // the memoryless closed form of tokenBucketAdmit).
    "cdc_qos_admission" -> ((s, dir) =>
      Coordinator.qosAdmission(filtered(s, dir), tickSec = 86400L, budget = 50L)),

    // T7 + sentinel resize (`common/sentinel.go:20-37`): the admission
    // budget comes from a control table — 50/tick from the corpus start,
    // resized to 20 at the mid tick and 80 at the 3/4 tick (two sentinel
    // updates mid-stream, no restart). The first window also proves the
    // default-budget fallback stays inert when a control row covers it.
    "cdc_qos_reload" -> ((s, dir) => {
      val df = filtered(s, dir)
      val b = df.agg(
        expr("min((ts_packed >> 32) DIV 86400)"),
        expr("max((ts_packed >> 32) DIV 86400)")).head()
      val (t0, t1) = (b.getLong(0), b.getLong(1))
      import s.implicits._
      val limits = Seq((t0, 50L), (t0 + (t1 - t0) / 2, 20L),
        (t0 + 3 * (t1 - t0) / 4, 80L)).toDF("from_tick", "budget")
      Coordinator.qosAdmissionDynamic(df, tickSec = 86400L, limits,
        defaultBudget = 50L)
    }),

    // F10/T11: graceful-exit truncation at the corpus's midpoint ts.
    "cdc_exit_point" -> ((s, dir) => {
      val df = filtered(s, dir)
      val exit = df.agg(expr("min(ts_packed) + (max(ts_packed) - min(ts_packed)) DIV 2")).head().getLong(0)
      Coordinator.exitTruncate(df, exit)
        .groupBy(col("ns"))
        .agg(count(lit(1)).as("n_kept"), max(col("ts_packed")).as("last_ts"))
    })
  )

  private val chainSql: String = Oplog.oracleChainSql

  private def withOplog(body: String): String = Oplog.withOracleCte(body)

  def oracles: Map[String, String] = Map(
    "cdc_delay_holdback" -> withOplog(
      s""", eff AS (SELECT * FROM oplog WHERE $chainSql),
          params AS (
            SELECT max(ts_packed >> 32) AS now_sec, min(ts_packed) AS fsfp FROM eff)
          SELECT CAST(eff.ts_packed > params.fsfp
                  AND (eff.ts_packed >> 32) > (params.now_sec - $delaySec + 3) AS INT) AS held,
            ns, COUNT(*) AS n, MAX(ts_packed) AS max_ts
          FROM eff, params GROUP BY 1, 2"""),

    "cdc_qos_admission" -> withOplog(
      s""", eff AS (SELECT * FROM oplog WHERE $chainSql)
          SELECT (ts_packed >> 32) // 86400 AS tick, COUNT(*) AS n_arrived,
            LEAST(COUNT(*), 50) AS n_admitted,
            COUNT(*) - LEAST(COUNT(*), 50) AS n_deferred
          FROM eff GROUP BY 1"""),

    "cdc_qos_reload" -> withOplog(
      s""", eff AS (SELECT * FROM oplog WHERE $chainSql),
          ticks AS (
            SELECT (ts_packed >> 32) // 86400 AS tick, COUNT(*) AS n_arrived
            FROM eff GROUP BY 1),
          bounds AS (SELECT MIN(tick) AS t0, MAX(tick) AS t1 FROM ticks),
          limits AS (
            SELECT t0 AS from_tick, 50 AS budget FROM bounds
            UNION ALL SELECT t0 + (t1 - t0) // 2, 20 FROM bounds
            UNION ALL SELECT t0 + 3 * (t1 - t0) // 4, 80 FROM bounds),
          act AS (
            SELECT t.tick, t.n_arrived,
              -- budget DESC mirrors the engine's deterministic tie-break
              -- for (degenerate) duplicate from_ticks on a tiny tick span
              CAST(COALESCE((SELECT budget FROM limits l WHERE l.from_tick <= t.tick
                ORDER BY l.from_tick DESC, l.budget DESC LIMIT 1), 50) AS BIGINT) AS budget
            FROM ticks t)
          SELECT tick, n_arrived, budget,
            LEAST(n_arrived, budget) AS n_admitted,
            n_arrived - LEAST(n_arrived, budget) AS n_deferred
          FROM act"""),

    "cdc_exit_point" -> withOplog(
      s""", eff AS (SELECT * FROM oplog WHERE $chainSql),
          params AS (
            SELECT min(ts_packed) + (max(ts_packed) - min(ts_packed)) // 2 AS exit_ts
            FROM eff)
          SELECT ns, COUNT(*) AS n_kept, MAX(ts_packed) AS last_ts
          FROM eff, params WHERE eff.ts_packed <= params.exit_ts GROUP BY 1""")
  )
}
