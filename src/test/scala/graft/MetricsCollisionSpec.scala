package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.apply.Collision
import graft.metrics.Metrics
import graft.partition.Hashers
import graft.transform.Transforms

/** G7 observe-based metrics, W12 collision-segment invariant, P5 DBRef
  * golden cases, X4 auto shard-key selection.
  */
class MetricsCollisionSpec extends AnyFunSuite {
  lazy val spark = SparkTest.spark
  import spark.implicits._

  test("G7: observed metrics accumulate per-op counts, traffic, newest lsn") {
    val df = Seq(
      ("i", 10L, "{\"a\":1}"), ("u", 20L, "{\"b\":2}"), ("u", 30L, "{}"),
      ("d", 40L, "{}"), ("c", 50L, "{}"), ("n", 60L, "{}"))
      .toDF("op", "ts_packed", "props")
    val (observed, obs) = Metrics.observed(df)
    observed.write.format("noop").mode("overwrite").save()
    val m = obs.get
    assert(m("n_total") == 6L && m("n_insert") == 1L && m("n_update") == 2L)
    assert(m("n_delete") == 1L && m("n_command") == 1L && m("n_noop") == 1L)
    assert(m("traffic_bytes") == 22L) // octet lengths: 7+7+2+2+2+2
    assert(m("lsn_newest") == 60L)
  }

  test("G7: replSnapshot serves the reference /repl JSON vocabulary (syncer.go:640-700)") {
    import graft.metrics.MetricsSnapshot
    import org.json4s._
    val work = s"${System.getProperty("java.io.tmpdir")}/graft_replsnap_spec"
    graft.streaming.IncrSync.deletePath(spark, work)
    // two batches of a run, as MetricsRecorder writes them
    Seq(
      MetricsSnapshot("r1", 0L, 100L, 90L, 40L, 30L, 10L, 2L, 8L, Some(900L), Some(7L << 32)),
      MetricsSnapshot("r1", 1L, 50L, 45L, 20L, 15L, 5L, 1L, 4L, Some(450L), Some(9L << 32)))
      .toDF().write.parquet(s"$work/metrics")
    Seq((5L, (8L << 32), 135L, 1L)).toDF("lsn_min", "lsn_max", "n_logs", "batch_id")
      .write.parquet(s"$work/ckpt")
    val body = Metrics.replSnapshot(spark, s"$work/metrics",
      Some(s"$work/ckpt"), who = "graft", replset = "rs0",
      nowMs = 1700000000000L)
    val j = org.json4s.jackson.JsonMethods.parse(body).asInstanceOf[JObject]
    // exact field vocabulary of the reference's Info struct
    assert(j.obj.map(_._1) == List("who", "tag", "replset", "logs_get",
      "logs_repl", "logs_success", "tps", "lsn", "lsn_ack", "lsn_ckpt",
      "now", "log_size_avg", "log_size_max"))
    def lng(k: String) = (j \ k).asInstanceOf[JInt].num.toLong
    assert((j \ "who") == JString("graft") && (j \ "replset") == JString("rs0"))
    assert(lng("logs_get") == 150L && lng("logs_repl") == 123L &&
      lng("logs_success") == 135L)
    assert(lng("tps") == 45L) // the LAST batch's kept count
    // MongoTime triple: packed string, seconds word, rendered UTC time
    assert((j \ "lsn") == org.json4s.jackson.JsonMethods.parse(
      s"""{"ts":"${9L << 32}","unix":9,"time":"1970-01-01 00:00:09"}"""))
    assert((j \ "lsn" \ "unix") == (j \ "lsn_ack" \ "unix"))
    assert((j \ "lsn_ckpt" \ "unix") == JInt(8)) // from the _ckpt table
    assert((j \ "now" \ "unix") == JInt(1700000000L))
    assert((j \ "log_size_avg") == JString((1350L / 135L).toString))
    assert((j \ "log_size_max") == JString("900"))
  }

  test("W12: no segment contains two ops on the same unique-key value; per-key order across segments") {
    val rows = (1 to 40).map { i =>
      (i.toLong, (100 + i).toLong, "i", s"k${i % 5}", i % 3)
    }.toDF("event_id", "ts_packed", "op", "doc_key", "ukv")
      .withColumn("worker", lit(0))
    val seg = Collision.segments(rows, col("ukv"))
    // ops with NO unique-key value are mutually conflict-free: segment 0
    val nullable = rows.withColumn("ukv",
      when(col("event_id") <= 20, col("ukv")).otherwise(lit(null)))
    val nullSegs = Collision.segments(nullable, col("ukv"))
      .filter(col("uk").isNull).select("segment").distinct().collect().map(_.getInt(0)).toSeq
    assert(nullSegs == Seq(0))
    // invariant: (worker, segment, uk) unique
    val dup = seg.groupBy("worker", "segment", "uk").count().filter(col("count") > 1)
    assert(dup.isEmpty)
    // per-key order: segment index increases with ts within a key
    val viol = seg.as("a").join(seg.as("b"),
      col("a.uk") === col("b.uk") && col("a.worker") === col("b.worker") &&
      col("a.ts_packed") < col("b.ts_packed") && col("a.segment") >= col("b.segment"))
    assert(viol.isEmpty)
  }

  test("P5: DBRef rewrite — $db override, enclosing-db default with $db append, recursion") {
    val rules = Seq("app.users_0" -> "app.u0", "app" -> "appx")
    // $db present, exact-match rule
    val g1 = Transforms.dbRefTransform(
      """{"order":{"$ref":"users_0","$id":7,"$db":"app"}}""", "other", rules)
    assert(g1 == """{"order":{"$ref":"u0","$id":7,"$db":"app"}}""")
    // no $db: enclosing db used, $db appended after $id (reference appends)
    val g2 = Transforms.dbRefTransform(
      """{"order":{"$ref":"users_1","$id":8}}""", "app", rules)
    assert(g2 == """{"order":{"$ref":"users_1","$id":8,"$db":"appx"}}""")
    // non-DBRef first key: untouched, but nested docs recursed
    val g3 = Transforms.dbRefTransform(
      """{"a":1,"nested":{"$ref":"users_2","$id":9,"$db":"app"}}""", "x", rules)
    assert(g3 == """{"a":1,"nested":{"$ref":"users_2","$id":9,"$db":"appx"}}""")
  }

  test("SQL function registration: custom expressions callable from spark.sql") {
    graft.plans.GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT mongo_hash(5L), mongo_hash_string('user-42'),
                mongo_hash_oid('642295e8bd4ab3cbd9632f7e'), java_string_hash('app.users_0')""")
      .head()
    assert(r.getLong(0) == graft.plans.MongoComputeHash.hashLong(5L))
    assert(r.getLong(1) == graft.plans.MongoComputeHash.hashString(
      org.apache.spark.unsafe.types.UTF8String.fromString("user-42")))
    assert(r.getLong(2) == graft.plans.MongoComputeHash.hashObjectId(
      org.apache.spark.unsafe.types.UTF8String.fromString("642295e8bd4ab3cbd9632f7e")))
    assert(r.getInt(3) == "app.users_0".hashCode)
  }

  test("skew salting: salted join equals the plain join, salt spreads a hot key") {
    val big = (1 to 1000).map(i => (if (i <= 900) "hot" else s"k$i", i.toLong))
      .toDF("key", "v") // 90% of rows on one key
    val dim = Seq(("hot", "H"), ("k901", "A"), ("k950", "B")).toDF("key", "tag")
    val plain = big.join(dim, Seq("key")).select("key", "v", "tag")
      .collect().toSet
    val salted = Hashers.saltedJoin(big, dim, "key", col("v"), salts = 8)
      .select("key", "v", "tag").collect().toSet
    assert(salted == plain && plain.size == 902)
    // the hot key's rows actually spread across salts
    val spread = big.filter(col("key") === "hot")
      .withColumn("s", pmod(graft.functions.Portable.phash64(col("v")), lit(8L)))
      .select("s").distinct().count()
    assert(spread > 1)
  }

  test("X4: unique non-_id index forces by-namespace routing") {
    val cat1 = Seq(("app.u0", "_id_", true), ("app.u0", "email_1", true))
      .toDF("ns", "name", "unique")
    val cat2 = Seq(("app.u0", "_id_", true), ("app.u0", "age_1", false))
      .toDF("ns", "name", "unique")
    assert(Hashers.autoShardKey(cat1) == "collection")
    assert(Hashers.autoShardKey(cat2) == "id")
  }
}
