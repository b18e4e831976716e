package graft

import org.apache.spark.sql.functions._
import org.json4s._
import org.json4s.jackson.JsonMethods
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.MongoComputeHash
import graft.transform.UpdateSpec

/** Golden update-spec cases from FIXTURES.md §A (mirroring the reference's
  * oplog/oplog_test.go and changestram_event_test.go behaviors).
  */
class UpdateSpecSpec extends AnyFunSuite {
  lazy val spark = SparkTest.spark
  import spark.implicits._

  private def j(s: String) = JsonMethods.parse(s)

  test("v1 partial update: $set + $unset applied to document") {
    val got = UpdateSpec.applySpecJson(
      """{"_id":1,"ok":true,"name":"apple"}""",
      """{"$set":{"plus_field":2},"$unset":{"ok":true}}""")
    assert(j(got) == j("""{"_id":1,"name":"apple","plus_field":2}"""))
  }

  test("v2 diff normalization: d/i/u/s-prefix recursion → $set/$unset (oplog.go:281-392)") {
    val spec = UpdateSpec.normalizeV2Spec(
      """{"$v":2,"diff":{"d":{"ok":false},"i":{"plus_field":2},"u":{"name":"orange"},
          "ssub":{"u":{"x":9},"d":{"y":false}}}}""")
    val parsed = j(spec)
    assert(parsed \ "$set" \ "plus_field" == JInt(2))
    assert(parsed \ "$set" \ "name" == JString("orange"))
    assert(parsed \ "$set" \ "sub.x" == JInt(9))
    assert(parsed \ "$unset" \ "ok" == JBool(true))
    assert(parsed \ "$unset" \ "sub.y" == JBool(true))
  }

  test("v2 diff end-to-end application on nested doc") {
    val got = UpdateSpec.applySpecJson(
      """{"_id":1,"ok":true,"name":"apple","sub":{"x":1,"y":2}}""",
      """{"$v":2,"diff":{"d":{"ok":false},"u":{"name":"orange"},"ssub":{"u":{"x":9},"d":{"y":false}}}}""")
    assert(j(got) == j("""{"_id":1,"name":"orange","sub":{"x":9}}"""))
  }

  test("v2 array diff: a-marker, s<idx>/u<idx> → dotted numeric paths (oplog_test.go TestDelteOplog)") {
    // Mirrors the reference golden: {d:{info}, i:{extra}, sarrname:{a:true,
    // s0:{u:{count,nm}, i:{extra}}, s1:{u:{count}}}, snestobj:{sm1:{d:{n}}}}
    val spec = UpdateSpec.normalizeV2Spec(
      """{"$v":2,"diff":{"d":{"info":false},"i":{"extra":"c"},
          "sarrname":{"a":true,
            "s0":{"u":{"count":5,"nm":"c"},"i":{"extra":"ps"}},
            "s1":{"u":{"count":6}},
            "u2":{"count":10,"nm":"e"}},
          "snestobj":{"sm1":{"d":{"n":false}}}}}""")
    val p = j(spec)
    assert(p \ "$unset" \ "info" == JBool(true))
    assert(p \ "$set" \ "extra" == JString("c"))
    assert(p \ "$set" \ "arrname.0.count" == JInt(5))
    assert(p \ "$set" \ "arrname.0.nm" == JString("c"))
    assert(p \ "$set" \ "arrname.0.extra" == JString("ps"))
    assert(p \ "$set" \ "arrname.1.count" == JInt(6))
    assert((p \ "$set" \ "arrname.2") \ "count" == JInt(10))
    assert(p \ "$unset" \ "nestobj.m1.n" == JBool(true))
  }

  test("v2 lone l → $slice pipeline; applied truncates the array (oplog.go:354-369)") {
    val spec = UpdateSpec.normalizeV2Spec(
      """{"$v":2,"diff":{"sarrname":{"a":true,"l":1}}}""")
    assert(j(spec) == j("""[{"$set":{"arrname":{"$slice":["$arrname",1]}}}]"""))
    val got = UpdateSpec.applySpecJson(
      """{"_id":1,"arrname":[10,20,30]}""", """{"$v":2,"diff":{"sarrname":{"a":true,"l":1}}}""")
    assert(j(got) == j("""{"_id":1,"arrname":[10]}"""))
  }

  test("v2 l next to other entries at the same level is rejected") {
    intercept[IllegalArgumentException] {
      UpdateSpec.normalizeV2Spec("""{"$v":2,"diff":{"sarr":{"a":true,"u0":5,"l":1}}}""")
    }
  }

  test("v2 l with sibling-level entries: pipeline wins, siblings dropped (reference parity, oplog.go:330-335)") {
    // The reference propagates the $slice pipeline up immediately,
    // discarding entries at other nesting levels without error — locked
    // here so a future 'fix' is a conscious divergence decision.
    val spec = UpdateSpec.normalizeV2Spec(
      """{"$v":2,"diff":{"u":{"x":1},"sarr":{"a":true,"l":2}}}""")
    assert(j(spec) == j("""[{"$set":{"arr":{"$slice":["$arr",2]}}}]"""))
  }

  test("$pull/$pop on a missing or non-array field are no-ops (MongoDB parity)") {
    val g1 = UpdateSpec.applySpecJson("""{"_id":1}""", """{"$pull":{"tags":3}}""")
    assert(j(g1) == j("""{"_id":1}"""))
    val g2 = UpdateSpec.applySpecJson("""{"_id":1}""", """{"$pop":{"tags":1}}""")
    assert(j(g2) == j("""{"_id":1}"""))
    val g3 = UpdateSpec.applySpecJson("""{"tags":5}""", """{"$pull":{"tags":5}}""")
    assert(j(g3) == j("""{"tags":5}""")) // non-array value untouched
  }

  test("array element set/unset through numeric paths: pad with null, unset nulls in place") {
    val got = UpdateSpec.applySpecJson(
      """{"a":[1,2]}""", """{"$set":{"a.4":9,"a.0":7}}""")
    assert(j(got) == j("""{"a":[7,2,null,null,9]}"""))
    val got2 = UpdateSpec.applySpecJson("""{"a":[1,2,3]}""", """{"$unset":{"a.1":true}}""")
    assert(j(got2) == j("""{"a":[1,null,3]}"""))
  }

  test("$push plain, $push $each + negative $slice, $pop both ends") {
    val g1 = UpdateSpec.applySpecJson("""{"a":[1]}""", """{"$push":{"a":2}}""")
    assert(j(g1) == j("""{"a":[1,2]}"""))
    val g2 = UpdateSpec.applySpecJson(
      """{"a":[1,2,3]}""", """{"$push":{"a":{"$each":[4,5],"$slice":-3}}}""")
    assert(j(g2) == j("""{"a":[3,4,5]}"""))
    val g3 = UpdateSpec.applySpecJson("""{"a":[1,2,3]}""", """{"$pop":{"a":1}}""")
    assert(j(g3) == j("""{"a":[1,2]}"""))
    val g4 = UpdateSpec.applySpecJson("""{"a":[1,2,3]}""", """{"$pop":{"a":-1}}""")
    assert(j(g4) == j("""{"a":[2,3]}"""))
    // $push onto a missing field creates the array (MongoDB upsert-ish)
    val g5 = UpdateSpec.applySpecJson("""{}""", """{"$push":{"a":{"$each":[1,1]}}}""")
    assert(j(g5) == j("""{"a":[1,1]}"""))
  }

  test("$pull equality and $in; $addToSet dedups") {
    val g1 = UpdateSpec.applySpecJson("""{"a":[1,2,1,3]}""", """{"$pull":{"a":1}}""")
    assert(j(g1) == j("""{"a":[2,3]}"""))
    val g2 = UpdateSpec.applySpecJson(
      """{"a":[1,2,3,4]}""", """{"$pull":{"a":{"$in":[2,4]}}}""")
    assert(j(g2) == j("""{"a":[1,3]}"""))
    val g3 = UpdateSpec.applySpecJson(
      """{"a":[1,2]}""", """{"$addToSet":{"a":{"$each":[2,3,3]}}}""")
    assert(j(g3) == j("""{"a":[1,2,3]}"""))
  }

  test("$pullAll removes every listed value; numeric-type-insensitive; missing/non-array no-op") {
    val g1 = UpdateSpec.applySpecJson(
      """{"a":[1,2,1,3,4]}""", """{"$pullAll":{"a":[1,4]}}""")
    assert(j(g1) == j("""{"a":[2,3]}"""))
    // BSON numeric equality: 2.0 pulls 2
    val g2 = UpdateSpec.applySpecJson(
      """{"a":[1,2,3]}""", """{"$pullAll":{"a":[2.0]}}""")
    assert(j(g2) == j("""{"a":[1,3]}"""))
    // missing field: never created; non-array argument: no-op
    val g3 = UpdateSpec.applySpecJson("""{"b":1}""", """{"$pullAll":{"a":[1]}}""")
    assert(j(g3) == j("""{"b":1}"""))
    val g4 = UpdateSpec.applySpecJson("""{"a":[1,2]}""", """{"$pullAll":{"a":1}}""")
    assert(j(g4) == j("""{"a":[1,2]}"""))
  }

  test("replace-update semantics: non-$ spec replaces the whole document") {
    val got = UpdateSpec.applySpecJson("""{"_id":1,"a":1}""", """{"_id":1,"b":2}""")
    assert(j(got) == j("""{"_id":1,"b":2}"""))
  }

  test("$inc creates missing fields and adds to existing, dotted paths create objects") {
    val got = UpdateSpec.applySpecJson(
      """{"v":5}""",
      """{"$inc":{"v":3,"new":7},"$set":{"deep.a.b":1}}""")
    assert(j(got) \ "v" == JInt(8))
    assert(j(got) \ "new" == JInt(7))
    assert(j(got) \ "deep" \ "a" \ "b" == JInt(1))
  }

  test("MongoComputeHash: stable golden values, type-tagged md5 LE semantics") {
    // Independent spec-level recomputation with MessageDigest
    def expected(v: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val bb = java.nio.ByteBuffer.allocate(16).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.putInt(0); bb.putInt(10); bb.putLong(v)
      java.nio.ByteBuffer.wrap(md.digest(bb.array()), 0, 8)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN).getLong
    }
    val inputs = Seq(0L, 1L, -1L, 106402199L, 106296614L, Long.MaxValue)
    val got = inputs.toDF("k").select(MongoComputeHash(col("k"))).as[Long].collect().toSeq
    assert(got == inputs.map(expected))
    assert(got.distinct.size == inputs.size) // no trivial collisions
  }

  test("MongoComputeHash string/oid variants: BSON-layout md5 LE parity") {
    import org.apache.spark.unsafe.types.UTF8String
    def expectBytes(parts: Array[Byte]*): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      parts.foreach(md.update)
      java.nio.ByteBuffer.wrap(md.digest(), 0, 8)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN).getLong
    }
    def le32(v: Int): Array[Byte] =
      java.nio.ByteBuffer.allocate(4).order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(v).array()
    // string: seed | tag 15 | len+1 LE | bytes | NUL (orphan_filter.go:101-108)
    val s = "user-42"
    val wantS = expectBytes(le32(0), le32(15), le32(s.length + 1),
      s.getBytes("UTF-8"), Array(0.toByte))
    assert(MongoComputeHash.hashString(UTF8String.fromString(s)) == wantS)
    // oid: seed | tag 35 | 12 raw bytes (orphan_filter.go:124-128)
    val hex = "642295e8bd4ab3cbd9632f7e"
    val raw = hex.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    val wantO = expectBytes(le32(0), le32(35), raw)
    assert(MongoComputeHash.hashObjectId(UTF8String.fromString(hex)) == wantO)
    // column-level evaluation agrees with the JVM helpers
    val got = Seq((s, hex)).toDF("s", "h")
      .select(MongoComputeHash.ofString(col("s")), MongoComputeHash.ofObjectId(col("h")))
      .as[(Long, Long)].head()
    assert(got == ((wantS, wantO)))
  }

  test("hashed-shard orphan filter keeps exactly the owned residue class") {
    import graft.filters.OrphanFilter
    val df = (1 to 200).map(i => s"key-$i").toDF("doc_key")
    val kept = OrphanFilter.keepOwnedHashed(df, col("doc_key"),
      isString = true, nShards = 3, ownedShard = 1)
      .as[String].collect().toSet
    val want = (1 to 200).map(i => s"key-$i").filter { k =>
      val h = MongoComputeHash.hashString(
        org.apache.spark.unsafe.types.UTF8String.fromString(k))
      java.lang.Math.floorMod(h, 3L) == 1L
    }.toSet
    assert(kept == want && kept.nonEmpty && kept.size < 200)
  }

  test("orphan compound keys: BSON type-ordered tuple compare, MinKey/MaxKey, exclusive max") {
    import graft.filters.OrphanFilter._
    val df = Seq(
      (1L, "A", 10L),   // in chunk 1 (A, <100)
      (2L, "A", 100L),  // == max of chunk 1 → excluded (max exclusive)
      (3L, "B", 5L),    // rank: "B" > all numbers; in chunk 2 [(B,MinKey),(MaxKey,MaxKey))
      (4L, "0", 999L)   // "0" < "B" string-wise, > (A,100) → gap chunk, dropped
    ).toDF("id", "flag", "k")
    val chunks = chunkTable(spark, Seq(
      (Seq(encMinKey, encMinKey), Seq(encString(lit("A")), encNumber(lit(100L))), true),
      (Seq(encString(lit("A")), encNumber(lit(100L))),
        Seq(encString(lit("B")), encMinKey), false),
      (Seq(encString(lit("B")), encMinKey), Seq(encMaxKey, encMaxKey), true)))
    val kept = keepOwnedRanged(df,
      keyTuple(encString(col("flag")), encNumber(col("k"))), chunks)
      .select("id").as[Long].collect().toSet
    // id 2: (A,100) >= (A,100) mins of the unowned middle chunk → dropped.
    // id 4: "0" < "A"? No — "0" < "A" lexicographically, so (0,999) < (A,100)
    //       → lands in chunk 1 (owned) since >= (MinKey,MinKey).
    assert(kept == Set(1L, 3L, 4L))
    // int64 sentinels encode as Min/MaxKey: everything is >= MinKey tuple
    val all = keepOwnedRanged(df,
      keyTuple(encNumber(lit(Long.MinValue)), encNumber(lit(0L))), chunks)
      .count()
    assert(all == 4) // (MinKey, 0) falls in chunk 1 for every row
  }

  test("nested resize beats a later same-diff l: first pipeline found propagates (oplog.go:330-335)") {
    // A nested s-field that yields a resize returns IMMEDIATELY — a later
    // 'l' at the outer level must not overwrite the nested pipeline's path.
    val spec = UpdateSpec.normalizeV2Spec(
      """{"$v":2,"diff":{"sA":{"a":true,"l":3},"l":5}}""")
    assert(j(spec) == j("""[{"$set":{"A":{"$slice":["$A",3]}}}]"""))
  }

  test("$pull and $addToSet match numerics across JSON numeric types (BSON numeric equality)") {
    // Spec parses 5 as JInt; a programmatically-built doc may hold 5.0.
    val g1 = UpdateSpec.applySpecJson("""{"a":[5.0,2,3.0]}""", """{"$pull":{"a":5}}""")
    assert(j(g1) == j("""{"a":[2,3.0]}"""))
    val g2 = UpdateSpec.applySpecJson(
      """{"a":[1.0,2]}""", """{"$pull":{"a":{"$in":[2.0,9]}}}""")
    assert(j(g2) == j("""{"a":[1.0]}"""))
    val g3 = UpdateSpec.applySpecJson("""{"a":[2.0]}""", """{"$addToSet":{"a":2}}""")
    assert(j(g3) == j("""{"a":[2.0]}""")) // 2 == 2.0 → not re-added
  }

  test("$rename moves values through dotted paths; missing source is a no-op") {
    val g1 = UpdateSpec.applySpecJson(
      """{"a":{"b":7},"keep":1}""", """{"$rename":{"a.b":"c.d"}}""")
    assert(j(g1) == j("""{"a":{},"keep":1,"c":{"d":7}}"""))
    val g2 = UpdateSpec.applySpecJson("""{"x":1}""", """{"$rename":{"gone":"y"}}""")
    assert(j(g2) == j("""{"x":1}"""))
  }

  test("$mul multiplies preserving integer types; missing field becomes typed zero") {
    val g1 = UpdateSpec.applySpecJson("""{"v":6}""", """{"$mul":{"v":7}}""")
    assert(j(g1) \ "v" == JInt(42))
    val g2 = UpdateSpec.applySpecJson("""{"v":4}""", """{"$mul":{"v":2.5}}""")
    assert(j(g2) \ "v" == JDouble(10.0))
    val g3 = UpdateSpec.applySpecJson("""{}""", """{"$mul":{"v":3}}""")
    assert(j(g3) \ "v" == JInt(0)) // created as zero
  }

  test("$min/$max: update only when the comparison says so; missing field is set") {
    val g1 = UpdateSpec.applySpecJson("""{"v":5}""", """{"$min":{"v":3},"$max":{"w":9}}""")
    assert(j(g1) \ "v" == JInt(3) && j(g1) \ "w" == JInt(9))
    val g2 = UpdateSpec.applySpecJson("""{"v":5}""", """{"$min":{"v":8}}""")
    assert(j(g2) \ "v" == JInt(5)) // 8 not < 5 → untouched
    val g3 = UpdateSpec.applySpecJson("""{"v":5.0}""", """{"$max":{"v":6}}""")
    assert(j(g3) \ "v" == JInt(6)) // cross-numeric-type compare
    val g4 = UpdateSpec.applySpecJson("""{"s":"mango"}""", """{"$min":{"s":"apple"}}""")
    assert(j(g4) \ "s" == JString("apple"))
  }

  test("positional $[] fans out to every element; $ resolves to the first") {
    val g1 = UpdateSpec.applySpecJson(
      """{"a":[{"x":1},{"x":2}]}""", """{"$set":{"a.$[].x":9}}""")
    assert(j(g1) == j("""{"a":[{"x":9},{"x":9}]}"""))
    val g2 = UpdateSpec.applySpecJson(
      """{"a":[{"x":1},{"x":2}]}""", """{"$inc":{"a.$.x":10}}""")
    assert(j(g2) == j("""{"a":[{"x":11},{"x":2}]}"""))
    // positional over a missing/non-array path is a no-op, never creates
    val g3 = UpdateSpec.applySpecJson("""{"b":1}""", """{"$set":{"a.$[].x":9}}""")
    assert(j(g3) == j("""{"b":1}"""))
    // $mul through $[] touches every element independently
    val g4 = UpdateSpec.applySpecJson(
      """{"a":[{"v":2},{"v":3}]}""", """{"$mul":{"a.$[].v":10}}""")
    assert(j(g4) == j("""{"a":[{"v":20},{"v":30}]}"""))
  }

  test("$push modifiers: $position inserts, $sort orders, $slice trims — in that order") {
    // $position 0 prepends; positive $slice keeps the head
    val g1 = UpdateSpec.applySpecJson("""{"a":[1,2]}""",
      """{"$push":{"a":{"$each":[9],"$position":0,"$slice":3}}}""")
    assert(j(g1) == j("""{"a":[9,1,2]}"""))
    // negative $position counts from the end (-1 → before the last)
    val g2 = UpdateSpec.applySpecJson("""{"a":[1,2,3]}""",
      """{"$push":{"a":{"$each":[9],"$position":-1}}}""")
    assert(j(g2) == j("""{"a":[1,2,9,3]}"""))
    // out-of-range positions clamp (past-end appends, past-start prepends)
    val g3 = UpdateSpec.applySpecJson("""{"a":[1]}""",
      """{"$push":{"a":{"$each":[9],"$position":50}}}""")
    assert(j(g3) == j("""{"a":[1,9]}"""))
    val g4 = UpdateSpec.applySpecJson("""{"a":[1]}""",
      """{"$push":{"a":{"$each":[9],"$position":-50}}}""")
    assert(j(g4) == j("""{"a":[9,1]}"""))
    // whole-element $sort ascending and descending
    val g5 = UpdateSpec.applySpecJson("""{"a":[3,1]}""",
      """{"$push":{"a":{"$each":[2],"$sort":1}}}""")
    assert(j(g5) == j("""{"a":[1,2,3]}"""))
    // document $sort orders elements by the keyed subfield
    val g6 = UpdateSpec.applySpecJson(
      """{"a":[{"s":3,"t":"x"},{"s":1,"t":"y"}]}""",
      """{"$push":{"a":{"$each":[{"s":2,"t":"z"}],"$sort":{"s":-1}}}}""")
    assert(j(g6) == j("""{"a":[{"s":3,"t":"x"},{"s":2,"t":"z"},{"s":1,"t":"y"}]}"""))
    // full pipeline: insert at 0, sort desc, keep last 2 (slice AFTER sort)
    val g7 = UpdateSpec.applySpecJson("""{"a":[5,1]}""",
      """{"$push":{"a":{"$each":[3],"$position":0,"$sort":-1,"$slice":-2}}}""")
    assert(j(g7) == j("""{"a":[3,1]}"""))
    // $push on a missing field creates it through the same pipeline
    val g8 = UpdateSpec.applySpecJson("""{}""",
      """{"$push":{"a":{"$each":[2,1],"$sort":1}}}""")
    assert(j(g8) == j("""{"a":[1,2]}"""))
  }

  test("pipeline updates: $set constants, $unset, $replaceWith stages") {
    // constant $set alongside the $slice resize form
    val g1 = UpdateSpec.applySpecJson("""{"a":1}""",
      """[{"$set":{"b":2,"c.d":"x"}}]""")
    assert(j(g1) == j("""{"a":1,"b":2,"c":{"d":"x"}}"""))
    // $unset: single field and list form, dotted paths
    val g2 = UpdateSpec.applySpecJson("""{"a":1,"b":{"c":2,"d":3}}""",
      """[{"$unset":"b.c"},{"$unset":["a"]}]""")
    assert(j(g2) == j("""{"b":{"d":3}}"""))
    // $replaceWith swaps the document wholesale; later stages see the new root
    val g3 = UpdateSpec.applySpecJson("""{"old":1}""",
      """[{"$replaceWith":{"fresh":true}},{"$set":{"n":1}}]""")
    assert(j(g3) == j("""{"fresh":true,"n":1}"""))
    val g4 = UpdateSpec.applySpecJson("""{"old":1}""",
      """[{"$replaceRoot":{"newRoot":{"r":9}}}]""")
    assert(j(g4) == j("""{"r":9}"""))
    // the reference's resize form still applies unchanged
    val g5 = UpdateSpec.applySpecJson("""{"arr":[1,2,3]}""",
      """[{"$set":{"arr":{"$slice":["$arr",2]}}}]""")
    assert(j(g5) == j("""{"arr":[1,2]}"""))
    // an unevaluated field-path expression is an error, not a silent literal
    intercept[IllegalArgumentException] {
      UpdateSpec.applySpecJson("""{"a":1}""", """[{"$set":{"b":"$a"}}]""")
    }
  }

  test("$bit: int64 and/or/xor, missing field starts at zero") {
    val g1 = UpdateSpec.applySpecJson("""{"v":13}""", """{"$bit":{"v":{"and":10}}}""")
    assert(j(g1) == j("""{"v":8}"""))
    val g2 = UpdateSpec.applySpecJson("""{"v":3}""", """{"$bit":{"v":{"or":5}}}""")
    assert(j(g2) == j("""{"v":7}"""))
    val g3 = UpdateSpec.applySpecJson("""{"v":5}""", """{"$bit":{"v":{"xor":3}}}""")
    assert(j(g3) == j("""{"v":6}"""))
    // missing → 0 op arg; chained ops apply in spec order
    val g4 = UpdateSpec.applySpecJson("""{}""", """{"$bit":{"v":{"xor":9}}}""")
    assert(j(g4) == j("""{"v":9}"""))
    val g5 = UpdateSpec.applySpecJson("""{"v":12}""",
      """{"$bit":{"v":{"and":10,"or":1}}}""")
    assert(j(g5) == j("""{"v":9}""")) // (12 & 10) = 8, then | 1 = 9
  }

  test("$setOnInsert applies only on the upsert-insert path") {
    val spec = """{"$set":{"m":7},"$setOnInsert":{"v":42,"arr":[1]}}"""
    // insert path: both $set and $setOnInsert land
    val ins = UpdateSpec.applyUpdateJson("""{}""", spec, "[]", isInsert = true)
    assert(j(ins) == j("""{"m":7,"v":42,"arr":[1]}"""))
    // plain update: $setOnInsert is a no-op, existing v untouched
    val upd = UpdateSpec.applyUpdateJson("""{"v":5}""", spec, "[]", isInsert = false)
    assert(j(upd) == j("""{"v":5,"m":7}"""))
    // legacy entry point (no insert flag) must also treat it as a no-op,
    // not a silent $set — the pre-round-9 behavior dropped it entirely,
    // which happens to match the update path; lock it
    val legacy = UpdateSpec.applySpecJson("""{"v":5}""", spec)
    assert(j(legacy) == j("""{"v":5,"m":7}"""))
  }

  test("arrayFilters $[ident]: element and subfield conditions, unknown ident errors") {
    // element-level condition: only elements < 3 incremented
    val g1 = UpdateSpec.applyUpdateJson(
      """{"arr":[1,5,2,9]}""", """{"$inc":{"arr.$[lo]":10}}""",
      """[{"lo":{"$lt":3}}]""", isInsert = false)
    assert(j(g1) == j("""{"arr":[11,5,12,9]}"""))
    // subfield condition (MongoDB's grades example shape)
    val g2 = UpdateSpec.applyUpdateJson(
      """{"grades":[{"grade":80,"mean":75},{"grade":90,"mean":75}]}""",
      """{"$set":{"grades.$[e].mean":100}}""",
      """[{"e.grade":{"$gte":85}}]""", isInsert = false)
    assert(j(g2) == j("""{"grades":[{"grade":80,"mean":75},{"grade":90,"mean":100}]}"""))
    // $in + $ne conditions, numeric cross-type matching
    val g3 = UpdateSpec.applyUpdateJson(
      """{"a":[1.0,2,3]}""", """{"$mul":{"a.$[x]":-1}}""",
      """[{"x":{"$in":[1,3],"$ne":3}}]""", isInsert = false)
    assert(j(g3) == j("""{"a":[-1.0,2,3]}"""))
    // no matching element: no-op; missing array: no-op
    val g4 = UpdateSpec.applyUpdateJson(
      """{"arr":[5,6]}""", """{"$inc":{"arr.$[lo]":10}}""",
      """[{"lo":{"$lt":3}}]""", isInsert = false)
    assert(j(g4) == j("""{"arr":[5,6]}"""))
    val g5 = UpdateSpec.applyUpdateJson(
      """{"b":1}""", """{"$inc":{"arr.$[lo]":10}}""",
      """[{"lo":{"$lt":3}}]""", isInsert = false)
    assert(j(g5) == j("""{"b":1}"""))
    // unknown identifier is an error (server parity: "No array filter found")
    intercept[IllegalArgumentException] {
      UpdateSpec.applyUpdateJson(
        """{"arr":[1]}""", """{"$set":{"arr.$[nope]":0}}""", "[]", isInsert = false)
    }
    // a filter document mixing identifiers is rejected
    intercept[IllegalArgumentException] {
      UpdateSpec.parseArrayFilters("""[{"a":1,"b":2}]""")
    }
  }

  test("applyOps: i/u/d fold with $inc accumulation and upsert-on-update") {
    val rows = Seq(
      // (event_id, ts_packed, op, db, coll, ns, doc_key, g, value, from_migrate, props)
      (1L, 10L, "i", "app", "u", "app.u", "k1", "", 1.00, false, """{"k": 5}"""),
      (2L, 20L, "u", "app", "u", "app.u", "k1", "", 2.50, false, """{"k": 6}"""),
      (3L, 30L, "u", "app", "u", "app.u", "k1", "", 0.25, false, """{"k": 7}"""),
      (4L, 10L, "u", "app", "u", "app.u", "k2", "", 9.00, false, """{"k": 1}"""), // upsert, no insert
      (5L, 10L, "i", "app", "u", "app.u", "k3", "", 4.00, false, """{"k": 2}"""),
      (6L, 20L, "d", "app", "u", "app.u", "k3", "", 0.00, false, """{"k": 0}"""))
    val df = rows.toDF("event_id", "ts_packed", "op", "db", "coll", "ns",
      "doc_key", "g", "value", "from_migrate", "props")
    val got = graft.apply.Replay.applyOps(df)
      .orderBy("doc_key").as[(String, Long, Long)].collect().toSeq
    // k1: insert 100 then +250 +25 = 375 cents, k = last = 7
    // k2: upserted by update → 900 cents; k3 deleted
    assert(got == Seq(("k1", 7L, 375L), ("k2", 1L, 900L)))
  }
}
