package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.transform.DdlNs

/** DDL-aware ns extraction/filter/transform golden cases
  * (reference `collector/filter/oplog_filter.go:98-291`,
  * `executor/executor.go:279-373`, table `oplog/cmd_oplog.go:14-31`).
  */
class DdlNsSpec extends AnyFunSuite {
  lazy val spark = SparkTest.spark
  import spark.implicits._

  private def df(rows: (String, String, String)*) =
    rows.toSeq.zipWithIndex
      .map { case ((op, ns, o), i) => (i.toLong, op, ns, o) }
      .toDF("event_id", "op", "ns", "o")

  private val white = Seq("^my\\.tbl$")

  test("command ops filter by the namespace they operate on, not db.$cmd") {
    val rows = df(
      ("c", "my.$cmd", """{"drop":"tbl"}"""),            // eff my.tbl → keep
      ("c", "my.$cmd", """{"drop":"other"}"""),          // eff my.other → drop
      ("c", "my.$cmd", """{"renameCollection":"my.tbl","to":"my.x"}"""), // keep
      ("c", "my.$cmd", """{"startIndexBuild":"tbl"}"""), // F4 drop
      ("c", "my.$cmd", """{"abortIndexBuild":"tbl"}"""), // F4 drop
      ("c", "my.$cmd", """{"commitIndexBuild":"tbl"}"""), // keep (4.4 commit replays)
      ("c", "admin.$cmd", """{"applyOps":[]}"""),        // txn container: always keep
      ("c", "my.$cmd", """{"weirdCmd":1}"""),            // unknown: warn-and-keep
      ("i", "my.system.indexes", """{"v":2,"name":"d_1","ns":"my.tbl"}"""), // keep by inner ns
      ("i", "my.system.indexes", """{"v":2,"name":"d_1","ns":"my.other"}"""), // drop
      ("i", "my.tbl", """{"_id":1}"""),                  // plain DML keep
      ("i", "my.other", """{"_id":1}"""))                // plain DML drop
    val kept = rows.filter(DdlNs.ddlAwareKeep(white, Seq.empty))
      .select("event_id").as[Long].collect().toSet
    assert(kept === Set(0L, 2L, 5L, 6L, 7L, 8L, 10L))
  }

  test("white-db $cmd override keeps dropDatabase on a replicated db") {
    val rows = df(
      ("c", "my.$cmd", """{"dropDatabase":1}"""),
      ("c", "zz.$cmd", """{"dropDatabase":1}"""))
    val kept = rows.filter(DdlNs.ddlAwareKeep(white, Seq.empty, whiteDbs = Seq("my")))
      .select("event_id").as[Long].collect().toSet
    assert(kept === Set(0L))
  }

  test("transformCommand rewrites ns and command bodies under rules") {
    val rules = Seq("my.tbl" -> "dst.t2", "my" -> "mydst")
    val rows = df(
      ("c", "my.$cmd", """{"drop":"tbl"}"""),
      ("c", "my.$cmd", """{"renameCollection":"my.tbl","to":"my.x","stayTemp":false}"""),
      ("c", "my.$cmd", """{"create":"tbl","idIndex":{"v":2,"name":"_id_","ns":"my.tbl"}}"""),
      ("i", "my.system.indexes", """{"v":2,"name":"d_1","ns":"my.tbl"}"""),
      ("i", "my.tbl", """{"_id":1}"""),
      ("c", "my.$cmd", """{"unknownCmd":1}"""))         // dropped (executor returns nil)
    val out = DdlNs.transformCommand(rows, rules)
      .select("event_id", "ns", "o").as[(Long, String, String)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(0L) === (("dst.t2", """{"drop":"t2"}""")))
    assert(out(1L) ===
      (("dst.t2", """{"renameCollection":"dst.t2","to":"mydst.x","stayTemp":false}""")))
    assert(out(2L) ===
      (("dst.t2", """{"create":"t2","idIndex":{"v":2,"name":"_id_","ns":"dst.t2"}}""")))
    assert(out(3L) ===
      (("mydst.system.indexes", """{"v":2,"name":"d_1","ns":"dst.t2"}""")))
    assert(out(4L) === (("dst.t2", """{"_id":1}""")))
    assert(!out.contains(5L))
  }
}
