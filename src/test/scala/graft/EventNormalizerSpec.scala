package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.transform.EventNormalizer

/** Golden event→oplog conversions, one per operationType — the ScalaTest
  * mirror of the reference's `oplog/changestram_event_test.go` corpus
  * (semantics at `oplog/changestram_event.go:77-452`).
  */
class EventNormalizerSpec extends AnyFunSuite {
  lazy val spark = SparkTest.spark
  import spark.implicits._

  private val cols = Seq("event_id", "ts_us", "ts_packed", "operation_type",
    "db", "coll", "to_db", "to_coll", "full_document", "document_key",
    "updated_fields", "removed_fields")

  // (opType, fullDoc, docKey, updatedFields, removedFields)
  private def event(opType: String, fullDoc: String = """{"_id":1,"kick":1}""",
      docKey: String = """{"_id":1}""", updated: String = "{}",
      removed: Seq[String] = Seq.empty) =
    Seq((1L, 10L, 100L, opType, "zz", "test", "zz", "test_rename",
      fullDoc, docKey, updated, removed))
      .toDF(cols: _*)

  private def norm(df: org.apache.spark.sql.DataFrame, fullDocMode: Boolean = false) =
    EventNormalizer.normalize(df, fullDocMode)
      .select("op", "ns", "o", "o2").as[(String, String, String, String)]
      .collect().head

  test("insert → op i with fullDocument as o (changestram_event.go:101-140)") {
    assert(norm(event("insert")) ===
      (("i", "zz.test", """{"_id":1,"kick":1}""", "{}")))
  }

  test("delete → op d with documentKey as o (changestram_event.go:141-176)") {
    assert(norm(event("delete")) ===
      (("d", "zz.test", """{"_id":1}""", "{}")))
  }

  test("replace → op u, o = {$set: fullDocument}, o2 = documentKey (:177-223)") {
    assert(norm(event("replace", fullDoc = """{"_id":1,"kick":10,"ok":true}""")) ===
      (("u", "zz.test", """{"$set":{"_id":1,"kick":10,"ok":true}}""", """{"_id":1}""")))
  }

  test("update diff → $set + $unset from updateDescription (:224-302)") {
    assert(norm(event("update", updated = """{"plus_field":2}""", removed = Seq("ok"))) ===
      (("u", "zz.test", """{"$set":{"plus_field":2},"$unset":{"ok":1}}""", """{"_id":1}""")))
  }

  test("update diff with only updatedFields emits $set alone") {
    assert(norm(event("update", updated = """{"a":3}"""))._3 === """{"$set":{"a":3}}""")
  }

  test("update diff with only removedFields emits $unset alone") {
    assert(norm(event("update", removed = Seq("a", "b")))._3 ===
      """{"$unset":{"a":1,"b":1}}""")
  }

  test("update with empty diff emits {} (reference leaves Object empty)") {
    assert(norm(event("update"))._3 === "{}")
  }

  test("update in fullDocument=updateLookup mode takes the post-image (:282-284)") {
    assert(norm(event("update", fullDoc = """{"_id":1,"kick":10}""",
      updated = """{"a":3}"""), fullDocMode = true)._3 ===
      """{"$set":{"_id":1,"kick":10}}""")
  }

  test("drop → op c on db.$cmd with {drop: coll} (:304-345)") {
    assert(norm(event("drop")) === (("c", "zz.$cmd", """{"drop":"test"}""", "{}")))
  }

  test("rename → op c with renameCollection/to full namespaces (:346-394)") {
    assert(norm(event("rename")) ===
      (("c", "zz.$cmd",
        """{"renameCollection":"zz.test","to":"zz.test_rename"}""", "{}")))
  }

  test("dropDatabase → op c with {dropDatabase: 1} (:395-431)") {
    assert(norm(event("dropDatabase")) ===
      (("c", "zz.$cmd", """{"dropDatabase":1}""", "{}")))
  }

  test("invalidate routes to op x; assertNoInvalid raises (:432-439)") {
    assert(norm(event("invalidate"))._1 === "x")
    val ex = intercept[Exception] {
      EventNormalizer.assertNoInvalid(
        EventNormalizer.normalize(event("invalidate"))).collect()
    }
    assert(ex.getMessage.contains("invalidate"))
  }

  test("dead-letter route: op x rows land in the errors table, valid rows flow on") {
    val work = java.nio.file.Files.createTempDirectory("graft_dlq").toFile.getAbsolutePath
    val errDir = s"$work/errors"
    val mixed = EventNormalizer.normalize(
      event("insert").union(event("invalidate")).union(event("delete")))
    val valid = EventNormalizer.routeInvalid(mixed, errDir, batchId = 0L)
    assert(valid.filter(col("op") === "x").count() == 0)
    assert(valid.count() == 2)
    val errs = spark.read.parquet(errDir)
    assert(errs.count() == 1 && errs.head().getAs[String]("op") == "x")
    // a later batch's poison rows land beside (not over) batch 0's; a
    // REPLAY of batch 1 overwrites its own directory, never appends
    EventNormalizer.routeInvalid(mixed, errDir, batchId = 1L).count()
    EventNormalizer.routeInvalid(mixed, errDir, batchId = 1L).count()
    assert(spark.read.parquet(errDir).count() == 2)
    // a clean batch appends nothing (and never creates a spurious table)
    val work2 = java.nio.file.Files.createTempDirectory("graft_dlq2").toFile.getAbsolutePath
    val clean = EventNormalizer.routeInvalid(
      EventNormalizer.normalize(event("insert")), s"$work2/errors", batchId = 0L)
    assert(clean.count() == 1)
    assert(!new java.io.File(s"$work2/errors").exists())
  }

  test("W9 index sync: specs persisted with background scrubbed (doc_syncer.go:206-287)") {
    import graft.streaming.FullSync
    val work = java.nio.file.Files.createTempDirectory("graft_idx").toFile.getAbsolutePath
    FullSync.writeIndexSpecs(spark, work, "users", Seq(
      """{"v":2,"key":{"_id":1},"name":"_id_"}""",
      """{"v":2,"key":{"email":1},"name":"email_1","unique":true,"background":true}"""))
    val got = FullSync.readIndexSpecs(spark, work, "users")
      .orderBy("index_name")
      .select("table", "index_name", "index_json")
      .as[(String, String, String)].collect().toSeq
    assert(got.map(_._2) == Seq("_id_", "email_1"))
    assert(got.forall(_._1 == "users"))
    assert(!got(1)._3.contains("background")) // scrubbed like the reference
    assert(got(1)._3.contains("\"unique\":true")) // everything else kept
  }

  test("K6 mock sink swallows the batch and reports the observed count") {
    import graft.sinks.MockSink
    val n = MockSink.write(spark.range(1234).toDF("id"))
    assert(n == 1234L)
  }
}
