package graft.metrics

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import scala.util.control.NonFatal

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.json4s._
import org.json4s.jackson.JsonMethods

/** The reference's sentinel option set for incremental sync
  * (`common/sentinel.go:20-37` `IncrSentinelOptions`) — one mutable
  * process-wide struct the REST surface reads and writes. Field names
  * (and so the JSON vocabulary) match the reference's exported Go
  * fields, so a monitor or `curl` script written against the reference
  * drives this unchanged.
  *
  * `TargetDelay`/`ExitPoint` default to −1 = unset, like the reference's
  * `init()`.
  */
final class SentinelOptions {
  @volatile var oplogDump: Long = 0L
  @volatile var duplicatedDump: Boolean = false
  @volatile var pause: Boolean = false
  @volatile var tps: Long = 0L
  @volatile var targetDelay: Long = -1L
  @volatile var exitPoint: Long = -1L
  @volatile var shutdown: Boolean = false

  /** Marshal with the reference's exact key vocabulary. */
  def toJson: String =
    s"""{"OplogDump":$oplogDump,"DuplicatedDump":$duplicatedDump,""" +
      s""""Pause":$pause,"TPS":$tps,"TargetDelay":$targetDelay,""" +
      s""""ExitPoint":$exitPoint,"Shutdown":$shutdown}"""
}

/** The REST monitor the survey previously mapped as a deployment concern,
  * now an actual listener (`common/http.go` + `collector/syncer.go:640-700`
  * `RestAPI` + `common/sentinel.go:71-127` `Register`), serving:
  *
  *   - `GET /repl`             → [[Metrics.replSnapshot]] (the reference's
  *     total-replication-info body, consumed by `scripts/mongoshake-stat`)
  *   - `GET /sentinel`         → the current [[SentinelOptions]]
  *   - `POST /sentinel/options`→ partial-update of the options with the
  *     reference's consistency contract: EVERY key in the body must name
  *     an existing option or nothing is applied; a type-mismatched value
  *     rejects; `TargetDelay < 0` clamps to 0 on write.
  *
  * The sentinel is not just state: an accepted `TPS` write is upserted
  * into the `(from_tick, budget)` CONTROL TABLE at `controlPath` — the
  * same table shape `Coordinator.qosAdmissionDynamic` (and so the
  * `cdc_qos_reload` gate) consumes — at the tick supplied by `tickNow`.
  * A same-tick update REPLACES the row (the dynamic-admission contract:
  * the sentinel holds ONE current value per effective-from tick);
  * `TPS = 0` means unlimited in the reference (`speed.go`), mapped to an
  * effectively-infinite budget row so the as-of lookup still resolves.
  *
  * Dev-flagged: nothing in the engine binds a port unless
  * `GraftConfig.httpPort` is set (default −1 = disabled) or a harness
  * constructs this directly; port 0 binds ephemerally for tests.
  * Clock injection (`tickNow`, `nowMs`) keeps every response body
  * deterministic under test, per the engine-wide no-sampled-clock rule.
  */
final class MonitorServer(
    spark: SparkSession,
    metricsPath: String,
    ckptPath: Option[String],
    controlPath: String,
    who: String,
    replset: String,
    tickNow: () => Long,
    nowMs: () => Long = () => System.currentTimeMillis(),
    port: Int = 0) {

  val sentinel = new SentinelOptions
  // (from_tick → budget) mirror of the control table; TreeMap keeps the
  // parquet rows ordered so re-writes are byte-stable
  private val limitRows = new java.util.TreeMap[Long, Long]()

  private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)

  /** Bound port (useful when constructed with port 0). */
  def boundPort: Int = server.getAddress.getPort

  private def respond(x: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    x.getResponseHeaders.set("Content-Type", "application/json")
    x.sendResponseHeaders(code, bytes.length.toLong)
    val os = x.getResponseBody
    try os.write(bytes) finally os.close()
  }

  server.createContext("/repl", (x: HttpExchange) =>
    if (x.getRequestMethod != "GET") respond(x, 405, """{"error":"method"}""")
    else try {
      respond(x, 200, Metrics.replSnapshot(spark, metricsPath, ckptPath,
        who, replset, nowMs()))
    } catch {
      case NonFatal(e) => respond(x, 500, s"""{"error":"${e.getClass.getName}"}""")
    })

  server.createContext("/sentinel", (x: HttpExchange) => {
    (x.getRequestMethod, x.getRequestURI.getPath) match {
      case ("GET", "/sentinel") => respond(x, 200, sentinel.toJson)
      case ("POST", "/sentinel/options") =>
        val body = new String(x.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
        respond(x, 200, applyOptions(body))
      case _ => respond(x, 404, """{"error":"not found"}""")
    }
  })

  /** The `POST /sentinel/options` contract (`common/sentinel.go:78-126`):
    * reject malformed JSON; verify EVERY key names an option before
    * applying ANY (the reference's "operation consistency" pass); then
    * set, type-checked per field, clamping negative `TargetDelay` to 0.
    * Synchronized — the reference serializes through one struct too.
    */
  private[metrics] def applyOptions(body: String): String = synchronized {
    val parsed =
      try JsonMethods.parse(body) match {
        case JObject(fields) => fields
        case _ => return """{"sentinel":"request json options wrong format"}"""
      } catch {
        case NonFatal(_) => return """{"sentinel":"request json options wrong format"}"""
      }
    val known = Set("OplogDump", "DuplicatedDump", "Pause", "TPS",
      "TargetDelay", "ExitPoint", "Shutdown")
    parsed.collectFirst { case (name, _) if !known(name) => name } match {
      case Some(bad) => return s"""{"sentinel":"$bad is not exist"}"""
      case None => ()
    }
    def asLong(v: JValue): Option[Long] = v match {
      case JInt(n) => Some(n.toLong)
      case JLong(n) => Some(n)
      case JDouble(d) if d.isWhole => Some(d.toLong)
      case _ => None
    }
    def asBool(v: JValue): Option[Boolean] =
      v match { case JBool(b) => Some(b); case _ => None }
    for ((name, value) <- parsed) {
      val ok = name match {
        case "OplogDump" => asLong(value).exists { v => sentinel.oplogDump = v; true }
        case "DuplicatedDump" => asBool(value).exists { v => sentinel.duplicatedDump = v; true }
        case "Pause" => asBool(value).exists { v => sentinel.pause = v; true }
        case "TPS" => asLong(value).exists { v => sentinel.tps = v; recordTps(v); true }
        case "TargetDelay" =>
          asLong(value).exists { v => sentinel.targetDelay = math.max(v, 0L); true }
        case "ExitPoint" => asLong(value).exists { v => sentinel.exitPoint = v; true }
        case "Shutdown" => asBool(value).exists { v => sentinel.shutdown = v; true }
      }
      if (!ok) return s"""{"sentinel":"$name option isn't correct"}"""
    }
    """{"sentinel":"success"}"""
  }

  /** Upsert the accepted TPS into the admission control table: one row
    * per effective-from tick, overwritten whole (the table is a handful
    * of sentinel events — rewriting it is cheaper than any merge).
    */
  private def recordTps(tps: Long): Unit = {
    val budget = if (tps > 0) tps else Long.MaxValue // 0 = unlimited (speed.go)
    limitRows.put(tickNow(), budget)
    val rows = new java.util.ArrayList[Row]()
    limitRows.forEach((t, b) => { rows.add(Row(t, b)); () })
    spark.createDataFrame(rows, StructType(Seq(
        StructField("from_tick", LongType, nullable = false),
        StructField("budget", LongType, nullable = false))))
      .coalesce(1).write.mode("overwrite").parquet(controlPath)
  }

  /** The control table as `qosAdmissionDynamic`'s `limits` argument. */
  def limits(s: SparkSession): DataFrame = s.read.parquet(controlPath)

  def start(): MonitorServer = { server.start(); this }
  def stop(): Unit = server.stop(0)
}

object MonitorServer {
  /** Config-gated entrypoint: binds only when `httpPort` is enabled —
    * the dev flag the survey's REST mapping called for.
    */
  def maybeStart(spark: SparkSession, config: graft.streaming.GraftConfig,
      metricsPath: String, ckptPath: Option[String], controlPath: String,
      replset: String, tickNow: () => Long): Option[MonitorServer] =
    if (config.httpPort < 0) None
    else Some(new MonitorServer(spark, metricsPath, ckptPath, controlPath,
      config.id, replset, tickNow, port = config.httpPort).start())
}
