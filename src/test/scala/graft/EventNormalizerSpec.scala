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
}
