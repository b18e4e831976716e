package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

import org.apache.spark.sql.functions._
import org.json4s._
import org.scalatest.funsuite.AnyFunSuite

import graft.metrics.{MetricsSnapshot, MonitorServer}
import graft.streaming.Coordinator

/** The REST monitor surface (`common/http.go`, `collector/syncer.go:640-700`,
  * `common/sentinel.go:71-127`): a REAL listener on an ephemeral port,
  * driven over the wire — GET `/repl` must serve the reference's Info
  * vocabulary; `POST /sentinel/options` must honor the all-keys-exist
  * consistency contract and actually CHANGE admission through the control
  * table the dynamic QoS reload reads.
  */
class MonitorServerSpec extends AnyFunSuite {
  lazy val spark = SparkTest.spark
  import spark.implicits._

  private val client = HttpClient.newHttpClient()

  private def get(port: Int, path: String): (Int, String) = {
    val r = client.send(
      HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path")).GET().build(),
      HttpResponse.BodyHandlers.ofString())
    (r.statusCode(), r.body())
  }

  private def post(port: Int, path: String, body: String): (Int, String) = {
    val r = client.send(
      HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path"))
        .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
      HttpResponse.BodyHandlers.ofString())
    (r.statusCode(), r.body())
  }

  /** Ephemeral server over a fixture metrics/_ckpt pair; `setTick`
    * advances the injected sentinel clock between posts.
    */
  private def withServer(f: (MonitorServer, Long => Unit) => Unit): Unit = {
    val work = s"${System.getProperty("java.io.tmpdir")}/graft_monitor_spec"
    graft.streaming.IncrSync.deletePath(spark, work)
    Seq(
      MetricsSnapshot("r1", 0L, 100L, 90L, 40L, 30L, 10L, 2L, 8L, Some(900L), Some(7L << 32)),
      MetricsSnapshot("r1", 1L, 50L, 45L, 20L, 15L, 5L, 1L, 4L, Some(450L), Some(9L << 32)))
      .toDF().write.parquet(s"$work/metrics")
    Seq((5L, (8L << 32), 135L, 1L)).toDF("lsn_min", "lsn_max", "n_logs", "batch_id")
      .write.parquet(s"$work/ckpt")
    var tick = 0L
    val srv = new MonitorServer(spark, s"$work/metrics", Some(s"$work/ckpt"),
      s"$work/control", who = "graft", replset = "rs0",
      tickNow = () => tick, nowMs = () => 1700000000000L).start()
    try f(srv, t => tick = t)
    finally srv.stop()
  }

  test("GET /repl over the wire serves the reference Info vocabulary") {
    withServer { (srv, setTick) =>
      val (code, body) = get(srv.boundPort, "/repl")
      assert(code == 200)
      val j = org.json4s.jackson.JsonMethods.parse(body).asInstanceOf[JObject]
      assert(j.obj.map(_._1) == List("who", "tag", "replset", "logs_get",
        "logs_repl", "logs_success", "tps", "lsn", "lsn_ack", "lsn_ckpt",
        "now", "log_size_avg", "log_size_max"))
      def lng(k: String) = (j \ k).asInstanceOf[JInt].num.toLong
      assert((j \ "who") == JString("graft") && (j \ "replset") == JString("rs0"))
      assert(lng("logs_get") == 150L && lng("logs_repl") == 123L && lng("logs_success") == 135L)
      assert((j \ "lsn" \ "unix") == JInt(9) && (j \ "lsn_ckpt" \ "unix") == JInt(8))
      assert((j \ "now" \ "unix") == JInt(1700000000L))
    }
  }

  test("GET /sentinel returns defaults; POST applies, validates, clamps") {
    withServer { (srv, setTick) =>
      val p = srv.boundPort
      val (c0, b0) = get(p, "/sentinel")
      assert(c0 == 200)
      assert(org.json4s.jackson.JsonMethods.parse(b0) ==
        org.json4s.jackson.JsonMethods.parse(
          """{"OplogDump":0,"DuplicatedDump":false,"Pause":false,"TPS":0,
             "TargetDelay":-1,"ExitPoint":-1,"Shutdown":false}"""))
      // unknown key rejects the WHOLE batch (operation consistency):
      // Pause must stay false even though it precedes the bad key
      assert(post(p, "/sentinel/options", """{"Pause":true,"NoSuch":1}""")._2
        == """{"sentinel":"NoSuch is not exist"}""")
      assert(!srv.sentinel.pause)
      // malformed JSON
      assert(post(p, "/sentinel/options", """not json""")._2
        == """{"sentinel":"request json options wrong format"}""")
      // type mismatch
      assert(post(p, "/sentinel/options", """{"Pause":5}""")._2
        == """{"sentinel":"Pause option isn't correct"}""")
      // success path + TargetDelay clamp (sentinel.go:106-108)
      assert(post(p, "/sentinel/options",
        """{"Pause":true,"TargetDelay":-7,"ExitPoint":42}""")._2
        == """{"sentinel":"success"}""")
      assert(srv.sentinel.pause && srv.sentinel.targetDelay == 0L &&
        srv.sentinel.exitPoint == 42L)
    }
  }

  test("POST TPS lands in the control table and changes dynamic admission") {
    withServer { (srv, setTick) =>
      val p = srv.boundPort
      // three ticks × 100 arrivals each
      val feed = (0 until 300).map(i => ((i / 100).toLong << 32) + i)
        .toDF("ts_packed")
      def admitted(): Seq[(Long, Long)] =
        Coordinator.qosAdmissionDynamic(feed, tickSec = 1L,
            srv.limits(spark), defaultBudget = 50L)
          .select("tick", "n_admitted").as[(Long, Long)].collect().sorted.toSeq

      // sentinel at tick 1: TPS 20 — tick 0 keeps the default 50,
      // ticks 1..2 drop to 20
      setTick(1L)
      assert(post(p, "/sentinel/options", """{"TPS":20}""")._2
        == """{"sentinel":"success"}""")
      assert(admitted() == Seq((0L, 50L), (1L, 20L), (2L, 20L)))

      // second sentinel at tick 2: TPS 80 — the admission CHANGES again
      setTick(2L)
      assert(post(p, "/sentinel/options", """{"TPS":80}""")._2
        == """{"sentinel":"success"}""")
      assert(admitted() == Seq((0L, 50L), (1L, 20L), (2L, 80L)))

      // same-tick update REPLACES (upsert, not append): TPS 0 = unlimited
      assert(post(p, "/sentinel/options", """{"TPS":0}""")._2
        == """{"sentinel":"success"}""")
      assert(srv.limits(spark).count() == 2)
      assert(admitted() == Seq((0L, 50L), (1L, 20L), (2L, 100L)))
    }
  }

  test("config gate: httpPort -1 stays unbound; 0 binds ephemerally") {
    val work = s"${System.getProperty("java.io.tmpdir")}/graft_monitor_gate"
    graft.streaming.IncrSync.deletePath(spark, work)
    Seq(MetricsSnapshot("r1", 0L, 1L, 1L, 1L, 0L, 0L, 0L, 0L, Some(1L), Some(1L)))
      .toDF().write.parquet(s"$work/metrics")
    val base = graft.streaming.GraftConfig(sourceUrls = Seq("mongodb://s"),
      tunnel = "mock").sanitize.toOption.get
    assert(MonitorServer.maybeStart(spark, base, s"$work/metrics", None,
      s"$work/control", "rs0", () => 0L).isEmpty)
    val bound = MonitorServer.maybeStart(spark, base.copy(httpPort = 0),
      s"$work/metrics", None, s"$work/control", "rs0", () => 0L)
    try {
      assert(bound.nonEmpty)
      assert(get(bound.get.boundPort, "/repl")._1 == 200)
    } finally bound.foreach(_.stop())
    // sanitize rejects an out-of-range port
    assert(graft.streaming.GraftConfig(sourceUrls = Seq("mongodb://s"),
      tunnel = "mock", httpPort = 70000).sanitize
      == Left("incr_sync.http_port[70000] should be <= 65535"))
  }
}
