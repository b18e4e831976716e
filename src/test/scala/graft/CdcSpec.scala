package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.apply.Replay
import graft.filters.OplogFilters
import graft.partition.Hashers
import graft.plans.JavaStringHash
import graft.transform.Transforms

object SparkTest {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
}

class CdcSpec extends AnyFunSuite {
  lazy val spark = SparkTest.spark
  import spark.implicits._

  private def oplogDf(rows: Seq[(Long, Long, String, String, String, String, String, String, Double, Boolean)]) =
    rows.toDF("event_id", "ts_packed", "op", "db", "coll", "ns", "doc_key", "g", "value", "from_migrate")
      .withColumn("ts_us", col("ts_packed"))

  test("JavaStringHash matches java.lang.String.hashCode (golden, incl. unicode/empty)") {
    val samples = Seq("app.users_0", "db.$cmd", "", "a", "Ωmega.코드", "local.oplog.rs")
    val got = samples.toDF("s").select(JavaStringHash(col("s"))).as[Int].collect()
    assert(got.toSeq == samples.map(_.hashCode))
  }

  test("filter chain: noop/gid/system-db/blacklist verdicts (reference filter_test.go cases)") {
    val rows = Seq(
      (1L, 1L, "n", "app", "users_0", "app.users_0", "1", "", 0.0, false),   // noop → drop
      (2L, 2L, "i", "app", "users_0", "app.users_0", "1", "", 0.0, false),   // keep
      (3L, 3L, "i", "local", "users_0", "local.users_0", "1", "", 0.0, false), // system db → drop
      (4L, 4L, "c", "admin", "$cmd", "admin.$cmd", "1", "", 0.0, false),     // txn override → keep by F3, dropped by ns whitelist
      (5L, 5L, "i", "app", "users_3", "app.users_3", "1", "", 0.0, false),   // blacklist → drop
      (6L, 6L, "u", "app", "users_1", "app.users_1", "1", "ext", 0.0, false), // foreign gid → drop
      (7L, 7L, "d", "app", "users_2", "app.users_2", "1", "", 0.0, true))    // fromMigrate → drop
    val chain = OplogFilters.chain(Seq(""), Seq("^app\\.users_[0-9]+$"), Seq("^app\\.users_3$"))
    val kept = oplogDf(rows).filter(chain).select("event_id").as[Long].collect().toSet
    assert(kept == Set(2L))
    // F3 alone must keep the admin.$cmd transaction entry
    val f3 = oplogDf(rows).filter(OplogFilters.notAutologous).select("event_id").as[Long].collect().toSet
    assert(f3.contains(4L) && !f3.contains(3L))
  }

  test("nsTransform: first-match rule order, exact and prefix rewrite (transform.go:13-41)") {
    val rules = Seq("app.users_0" -> "app.u0", "app" -> "appx")
    val in = Seq("app.users_0", "app.users_1", "app", "other.t").toDF("ns")
    val out = in.select(Transforms.nsTransform(rules).as("ns2")).as[String].collect().toSeq
    assert(out == Seq("app.u0", "appx.users_1", "appx", "other.t"))
  }

  test("replay is order/partitioning-invariant and delete-aware") {
    val rows = Seq(
      (1L, 10L, "i", "app", "u", "app.u", "k1", "", 1.0, false),
      (2L, 20L, "u", "app", "u", "app.u", "k1", "", 2.0, false),
      (3L, 30L, "d", "app", "u", "app.u", "k2", "", 9.0, false),
      (4L, 25L, "i", "app", "u", "app.u", "k2", "", 3.0, false), // earlier than the delete
      (5L, 40L, "u", "app", "u", "app.u", "k3", "", 4.0, false))
    val df = oplogDf(rows)
    val base = Replay.materialize(df).orderBy("doc_key")
      .select("doc_key", "last_value", "last_event_id").as[(String, Double, Long)].collect().toSeq
    assert(base == Seq(("k1", 2.0, 2L), ("k3", 4.0, 5L))) // k2 deleted last → absent
    // shuffled input partitioning must not change the result
    val shuffled = Replay.materialize(df.repartition(7)).orderBy("doc_key")
      .select("doc_key", "last_value", "last_event_id").as[(String, Double, Long)].collect().toSeq
    assert(shuffled == base)
    // at-least-once: replaying the batch twice yields the same final state
    val doubled = Replay.materialize(df.union(df)).orderBy("doc_key")
      .select("doc_key", "last_value", "last_event_id").as[(String, Double, Long)].collect().toSeq
    assert(doubled == base)
  }

  test("hash routing: DDL pins to worker 0, routing stable across value space") {
    val rows = Seq(
      (1L, 1L, "c", "app", "$cmd", "app.$cmd", "x", "", 0.0, false),
      (2L, 2L, "i", "app", "users_1", "app.users_1", "42", "", 0.0, false),
      (3L, 3L, "i", "app", "users_2", "app.users_2", "42", "", 0.0, false))
    val df = oplogDf(rows).withColumn("w", Hashers.workerWhitelist(Seq("users_1"), 8))
    val byId = df.filter(col("event_id") === 2).select("w").as[Long].head()
    val byNs = df.filter(col("event_id") === 3).select("w").as[Long].head()
    assert(df.filter(col("op") === "c").select("w").as[Long].head() == 0L)
    assert(byId >= 0 && byId < 8 && byNs >= 0 && byNs < 8)
    // same doc on a non-whitelisted collection routes by ns, not id
    val w2 = oplogDf(Seq((4L, 4L, "i", "app", "users_2", "app.users_2", "43", "", 0.0, false)))
      .withColumn("w", Hashers.workerWhitelist(Seq("users_1"), 8))
      .select("w").as[Long].head()
    assert(w2 == byNs) // ns-routed: key change must not move the worker
  }

  test("diffStates classifies equal / mismatch / src_only / dst_only per namespace") {
    def state(rows: Seq[(String, String, Double, Long)]) =
      rows.toDF("ns", "doc_key", "last_value", "last_event_id")
    val src = state(Seq(
      ("app.a", "k1", 1.0, 10L), // equal
      ("app.a", "k2", 2.0, 20L), // mismatch (value drift)
      ("app.a", "k3", 3.0, 30L), // src_only (lost on target)
      ("app.b", "k4", 4.0, 40L))) // equal
    val dst = state(Seq(
      ("app.a", "k1", 1.0, 10L),
      ("app.a", "k2", 2.5, 20L),
      ("app.b", "k4", 4.0, 40L),
      ("app.b", "k9", 9.0, 90L))) // dst_only (phantom write)
    val got = graft.apply.Replay.diffStates(src, dst)
      .as[(String, Long, Long, Long, Long)].collect().toSet
    assert(got == Set(
      ("app.a", 1L, 1L, 1L, 0L),
      ("app.b", 1L, 0L, 0L, 1L)))
  }

  test("repairPlan/applyRepairs: classifies the three classes, converges, " +
      "is idempotent, and plans nothing on equal states") {
    def state(rows: Seq[(String, String, Double, Long)]) =
      rows.toDF("ns", "doc_key", "last_value", "last_event_id")
    val src = state(Seq(
      ("app.a", "k1", 1.0, 10L), // equal — must NOT be planned
      ("app.a", "k2", 2.0, 20L), // mismatch → update
      ("app.a", "k3", 3.0, 30L))) // src_only → insert
    val dst = state(Seq(
      ("app.a", "k1", 1.0, 10L),
      ("app.a", "k2", 2.5, 20L),
      ("app.b", "k9", 9.0, 90L))) // dst_only → delete
    val plan = graft.apply.Replay.repairPlan(src, dst)
    val actions = plan.select("ns", "doc_key", "action")
      .as[(String, String, String)].collect().toSet
    assert(actions == Set(
      ("app.a", "k2", "u"), ("app.a", "k3", "i"), ("app.b", "k9", "d")))
    // applying the plan converges the target onto the source…
    val once = graft.apply.Replay.applyRepairs(dst, plan)
    val diffAfter = graft.apply.Replay.diffStates(src, once)
      .as[(String, Long, Long, Long, Long)].collect().toSet
    assert(diffAfter == Set(("app.a", 3L, 0L, 0L, 0L)))
    // …a second application is a no-op, and equal states plan nothing
    val twice = graft.apply.Replay.applyRepairs(once, plan)
    assert(graft.apply.Replay.diffStates(once, twice)
      .agg(org.apache.spark.sql.functions.sum(col("n_mismatch") +
        col("n_src_only") + col("n_dst_only"))).head().getLong(0) == 0L)
    assert(graft.apply.Replay.repairPlan(src, once).count() == 0L)
  }

  test("idempotent replay gate: doubled delivery folds identical; an " +
      "additive fold would not") {
    val dir = "/root/testdata/sf0.001"
    val out = graft.operators.Cdc.queries("cdc_idempotent_replay")(spark, dir)
      .select("ns", "n_equal", "n_mismatch", "n_src_only", "n_dst_only")
      .as[(String, Long, Long, Long, Long)].collect()
    assert(out.nonEmpty)
    assert(out.forall(r => r._2 > 0 && r._3 == 0 && r._4 == 0 && r._5 == 0))
    // negative control: a non-idempotent (additive) fold DOES diverge
    // under the same doubled delivery — the gate is not vacuous
    val ops = Seq((1L, 1L, "i", "app.t", "k", 2.0))
      .toDF("event_id", "ts_packed", "op", "ns", "doc_key", "value")
    def additive(df: org.apache.spark.sql.DataFrame) =
      df.groupBy(col("ns"), col("doc_key"))
        .agg(sum(col("value")).as("last_value"),
          max(col("event_id")).as("last_event_id"))
    val diff = Replay.diffStates(additive(ops), additive(ops.unionByName(ops)))
      .select("n_mismatch").as[Long].collect()
    assert(diff.sum == 1L)
  }

  test("point lookup physically prunes to the probe buckets: inputFiles " +
      "confined to their directories, strictly fewer than a full scan") {
    val dir = "/root/testdata/sf0.001"
    val work = s"${System.getProperty("java.io.tmpdir")}/graft_point_lookup_spec"
    graft.streaming.IncrSync.deletePath(spark, work)
    val eff = graft.model.Oplog.fromEvents(spark, dir)
      .filter(graft.filters.OplogFilters.chain(
        Seq(""), Seq("^app\\.users_[0-9]+$"), Seq("^app\\.users_3$")))
      .filter(col("op").isin("i", "u", "d"))
    graft.streaming.IncrSync.applyBatch(eff, work, 0L, nBuckets = 16)
    val keys = Seq(("app.users_0", "8"), ("app.users_1", "13"))
    val probeBuckets = keys.toDF("ns", "doc_key")
      .withColumn("bucket", graft.streaming.IncrSync.bucketOf(16))
      .select("bucket").distinct().as[Int].collect().toSet
    // merged view (base + pending deltas); the probe-bucket pruned read
    // filters BOTH scans on the bucket partition directories
    val full = graft.streaming.IncrSync.readOrEmpty(spark, s"$work/state")
    val pruned = graft.streaming.IncrSync.readStatePruned(
      spark, s"$work/state", probeBuckets.toSeq)
    // the pruned read SELECTS only files under the probe buckets' dirs —
    // proven at the physical scan (FileSourceScan.selectedPartitions is
    // the post-partition-pruning file set; inputFiles on the frame is
    // relation-level and blind to pruning, and input_file_name() does
    // not survive the merge fold's exchange)
    val readFiles = pruned.queryExecution.sparkPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.flatMap(_.selectedPartitions.toPartitionArray.map(_.filePath.toString))
    assert(readFiles.nonEmpty)
    assert(readFiles.forall(f =>
      probeBuckets.exists(b => f.contains(s"bucket=$b/"))))
    assert(readFiles.length < full.inputFiles.length)
    // and the lookup returns exactly the live probe states
    val got = graft.operators.Cdc.pointLookup(spark, work, keys, nBuckets = 16)
      .select("ns", "doc_key").as[(String, String)].collect().toSet
    val expect = graft.apply.Replay.materialize(eff)
      .filter(col("doc_key").isin("8", "13"))
      .select("ns", "doc_key").as[(String, String)].collect().toSet
    assert(got == expect)
  }

  test("scd2 lookup agrees with the history's validity intervals: resolved " +
      "facts land inside their version's window, gap facts inside none") {
    val dir = "/root/testdata/sf0.001"
    val hist = graft.operators.Cdc.queries("cdc_scd2")(spark, dir)
      .filter(col("ns") === "app.users_0")
      .select("doc_key", "version", "valid_from", "valid_to")
      .as[(String, Long, Long, Option[Long])].collect()
      .groupBy(_._1)
    val looked = graft.operators.Cdc.queries("cdc_scd2_lookup")(spark, dir)
      .select("doc_key", "ts_packed", "asof_version")
      .as[(String, Long, Option[Long])].collect()
    assert(looked.nonEmpty)
    assert(looked.exists(_._3.isDefined) && looked.exists(_._3.isEmpty))
    looked.foreach { case (key, ts, ver) =>
      val intervals = hist.getOrElse(key, Array.empty)
      val covering = intervals.filter { case (_, _, from, to) =>
        from <= ts && to.forall(ts < _) }
      ver match {
        case Some(v) =>
          assert(covering.map(_._2).toSeq == Seq(v),
            s"fact($key,$ts) resolved v$v but intervals say ${covering.toSeq}")
        case None =>
          assert(covering.isEmpty,
            s"fact($key,$ts) resolved nothing but ${covering.toSeq} covers it")
      }
    }
  }

  test("active-active merge: tombstones win over stale remote upserts; " +
      "later site wins conflicts; site-exclusive keys survive") {
    def siteState(rows: Seq[(String, String, Long, Long, String, Double)]) =
      rows.toDF("ns", "doc_key", "ts_packed", "event_id", "op", "value")
        .groupBy(col("ns"), col("doc_key"))
        .agg(max(struct(col("ts_packed"), col("event_id"), col("op"),
          col("value"))).as("m"))
    // site A: deleted K at ts 5; wrote X (exclusive); wrote M at ts 2
    val a = siteState(Seq(
      ("app.t", "K", 5L, 50L, "d", 0.0),
      ("app.t", "X", 3L, 30L, "i", 3.0),
      ("app.t", "M", 2L, 20L, "i", 2.0)))
    // site B: stale upsert of K at ts 1; wrote M later at ts 4
    val b = siteState(Seq(
      ("app.t", "K", 1L, 10L, "i", 1.0),
      ("app.t", "M", 4L, 40L, "u", 4.5)))
    val got = graft.operators.Cdc.mergeSiteStates(a, b)
      .select("doc_key", "last_value", "last_event_id")
      .as[(String, Double, Long)].collect().toSet
    assert(got == Set(
      ("X", 3.0, 30L), // site-exclusive survives
      ("M", 4.5, 40L))) // later site wins the conflict
    // K is ABSENT: A's tombstone beat B's stale upsert — the resurrection
    // bug a delete-free merge would have
    assert(!got.exists(_._1 == "K"))
  }

  test("cdc_delta_export restore law: state(t1) + delta(t1,t2] == state(t2), " +
      "tombstones retract, untouched keys stay silent") {
    val ops = Seq(
      (1L, 1L, "i", "app.t", "k1", 1.0),
      (2L, 2L, "i", "app.t", "k2", 2.0),
      (3L, 3L, "i", "app.t", "k3", 3.0),
      // window (5, 10]: k1 updated, k2 deleted, k4 born, k3 untouched
      (4L, 6L, "u", "app.t", "k1", 1.5),
      (5L, 7L, "d", "app.t", "k2", 0.0),
      (6L, 8L, "i", "app.t", "k4", 4.0),
      // after t2: must NOT leak into the export
      (7L, 11L, "u", "app.t", "k3", 9.0)
    ).toDF("event_id", "ts_packed", "op", "ns", "doc_key", "value")
    val (t1, t2) = (5L, 10L)
    val delta = Replay.lastPerKey(
      ops.filter(col("ts_packed") > t1 && col("ts_packed") <= t2))
    val exported = delta.select("doc_key", "op")
      .as[(String, String)].collect().toSet
    // untouched k3 silent; tombstone for k2 present
    assert(exported == Set(("k1", "u"), ("k2", "d"), ("k4", "i")))
    // restore: merge the export into state(t1) and compare to state(t2)
    val v1 = Replay.materialize(ops.filter(col("ts_packed") <= t1))
      .select("ns", "doc_key", "last_value", "last_event_id")
    val restored = v1
      .join(delta.select(col("ns"), col("doc_key")), Seq("ns", "doc_key"), "left_anti")
      .unionByName(delta.filter(col("op") =!= "d")
        .select("ns", "doc_key", "last_value", "last_event_id"))
      .as[(String, String, Double, Long)].collect().toSet
    val v2 = Replay.materialize(ops.filter(col("ts_packed") <= t2))
      .select("ns", "doc_key", "last_value", "last_event_id")
      .as[(String, String, Double, Long)].collect().toSet
    assert(restored == v2)
  }

  test("incrementalJoinView: a row appears only when both sides exist, " +
      "one-side updates refresh it, deletes retract it, reinserts restore it, " +
      "untouched households carry") {
    val ops = Seq(
      // batch 1 (ts ≤ 10): hh1 complete, hh0 half, hh2 complete
      (1L, 1L, "i", "app.t0", "0", 1.0), // hh0 A only — no view row yet
      (2L, 2L, "i", "app.t0", "4", 2.0), // hh1 A
      (3L, 3L, "i", "app.t1", "5", 3.0), // hh1 B → view row
      (4L, 4L, "i", "app.t0", "8", 5.0), // hh2 A
      (5L, 5L, "i", "app.t1", "9", 6.0), // hh2 B → view row, then untouched
      // batch 2 (10, 20]: B completes hh0 (A carried from batch 1);
      // A updates hh1 (B carried)
      (6L, 11L, "i", "app.t1", "1", 4.0),
      (7L, 12L, "u", "app.t0", "4", 2.5),
      // batch 3 (20, 30]: retractions — B leaves hh1, A leaves hh0
      (8L, 21L, "d", "app.t1", "5", 0.0),
      (9L, 22L, "d", "app.t0", "0", 0.0),
      // batch 4 (> 30): A reinserts hh0 — the view row returns with the
      // CARRIED batch-2 B side
      (10L, 31L, "i", "app.t0", "0", 7.0)
    ).toDF("event_id", "ts_packed", "op", "ns", "doc_key", "value")
    val got = graft.operators.Cdc.incrementalJoinView(ops, "app.t0", "app.t1",
        Seq(Long.MinValue, 10L, 20L, 30L, Long.MaxValue))
      .select("household", "a_key", "a_value", "a_event", "b_key", "b_value",
        "b_event")
      .as[(Long, String, Double, Long, String, Double, Long)].collect().toSet
    assert(got == Set(
      (0L, "0", 7.0, 10L, "1", 4.0, 6L), // retract + reinsert, carried B
      (2L, "8", 5.0, 4L, "9", 6.0, 5L))) // untouched since batch 1
  }

  test("incrementalAgg: delta algebra across batches — upsert-of-absent, " +
      "delete/reinsert, delete-of-absent no-op, fully-deleted ns dropped") {
    val ops = Seq(
      // batch 1 (ts ≤ 10)
      (1L, 1L, "i", "app.t", "k1", 10.0),
      (2L, 2L, "i", "app.t", "k2", 5.0),
      (3L, 3L, "i", "app.t", "k6", 9.0),
      (13L, 5L, "i", "app.u", "z", 2.0),
      // batch 2 (10, 20]: update, upsert-of-absent, insert+delete folded
      (4L, 11L, "u", "app.t", "k1", 3.5),
      (5L, 12L, "u", "app.t", "k3", 2.0), // k3 never inserted → +1
      (6L, 13L, "i", "app.t", "k5", 1.0),
      (7L, 14L, "d", "app.t", "k5", 0.0), // same-batch i+d → delete-of-absent no-op
      (8L, 15L, "d", "app.t", "k6", 0.0),
      // batch 3 (20, 30]: delete present, delete absent
      (9L, 21L, "d", "app.t", "k1", 0.0),
      (10L, 22L, "d", "app.t", "k4", 0.0), // never present → no-op
      (14L, 25L, "d", "app.u", "z", 0.0), // empties app.u entirely
      // batch 4 (> 30): reinsert after delete, second update
      (11L, 31L, "i", "app.t", "k1", 7.25),
      (12L, 32L, "u", "app.t", "k3", 4.0)
    ).toDF("event_id", "ts_packed", "op", "ns", "doc_key", "value")
    val work = s"${System.getProperty("java.io.tmpdir")}/graft_incr_agg_spec"
    val got = graft.operators.Cdc.incrementalAgg(ops, work,
        Seq(Long.MinValue, 10L, 20L, 30L, Long.MaxValue), nBuckets = 4)
      .as[(String, Long, Double)].collect().toSet
    // final state: k1=7.25, k2=5.0, k3=4.0; app.u empty → no row
    assert(got == Set(("app.t", 3L, 16.25)))
  }

  test("schema registry: universal fields at full coverage, conditional " +
      "fields partial; versions follow the (first_seen, name) dense rank") {
    val dir = "/root/testdata/sf0.001"
    val reg = graft.operators.Cdc.queries("cdc_schema_registry")(spark, dir)
      .select("ns", "field", "first_seen", "coverage_ppm", "schema_ver")
      .as[(String, String, Long, Long, Long)].collect()
    val byNs = reg.groupBy(_._1)
    assert(byNs.nonEmpty)
    byNs.foreach { case (_, rows) =>
      val f = rows.map(r => r._2 -> r).toMap
      assert(f.keySet == Set("_id", "k", "cents", "src"))
      // _id and k ride every document: full coverage, tied first_seen
      assert(f("_id")._4 == 1000000L && f("k")._4 == 1000000L)
      assert(f("_id")._3 == f("k")._3)
      // conditional fields: strictly partial coverage
      assert(f("cents")._4 < 1000000L && f("src")._4 < 1000000L)
      // version law: dense rank of (first_seen, field-name) — "_id" is
      // always version 1 (earliest first_seen, lexicographically first)
      val expected = rows.sortBy(r => (r._3, r._2)).map(_._2).zipWithIndex
        .map { case (fld, i) => fld -> (i + 1).toLong }.toMap
      rows.foreach(r => assert(r._5 == expected(r._2), s"field ${r._2}"))
      assert(f("_id")._5 == 1L)
    }
  }

  test("cdc_rebootstrap: clean drill verifies every document; a corrupted " +
      "re-seed flips exactly one counter (the gate is not vacuous)") {
    val dir = "/root/testdata/sf0.001"
    val report = graft.operators.Cdc.queries("cdc_rebootstrap")(spark, dir)
      .select("ns", "n_equal", "n_mismatch", "n_src_only", "n_dst_only")
      .as[(String, Long, Long, Long, Long)].collect()
    assert(report.nonEmpty)
    assert(report.forall(r => r._2 > 0 && r._3 == 0 && r._4 == 0 && r._5 == 0))
    // corrupt one bootstrap insert: the drill must SEE it
    val state = Replay.materialize(
      graft.model.Oplog.fromEvents(spark, dir)
        .filter(OplogFilters.chain(Seq(""),
          Seq("^app\\.users_[0-9]+$"), Seq("^app\\.users_3$"))))
    val someKey = state.select("doc_key").orderBy("doc_key").head().getString(0)
    val corrupt = state.select(
      col("last_event_id").as("event_id"), lit(0L).as("ts_packed"),
      lit("i").as("op"), col("ns"), col("doc_key"),
      when(col("doc_key") === someKey, col("last_value") + 1.0)
        .otherwise(col("last_value")).as("value"))
    val diff = Replay.diffStates(state, Replay.materialize(corrupt))
      .agg(sum(col("n_mismatch")), sum(col("n_equal"))).head()
    assert(diff.getLong(0) >= 1L)
    assert(diff.getLong(0) + diff.getLong(1) == report.map(_._2).sum)
  }

  test("cdc_oplog_sizing: per-worker rates are integer-consistent and " +
      "op totals reconcile with the routing stats") {
    val dir = "/root/testdata/sf0.001"
    val got = graft.operators.Cdc.queries("cdc_oplog_sizing")(spark, dir)
      .select("worker", "n_ops", "span_us", "approx_bytes",
        "ops_per_ksec", "bytes_per_ksec", "window_mb_1h")
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
    assert(got.nonEmpty)
    got.foreach { case (_, n, span, bytes, opsK, bytesK, mb1h) =>
      assert(n > 0 && span > 0 && bytes > n * 26)
      assert(opsK == n * 1000000000L / span)
      assert(bytesK == bytes * 1000000000L / span)
      assert(mb1h == (bytes * 3600000000L / span) / 1048576L)
    }
    val routed = graft.operators.Cdc.queries("cdc_route_stats")(spark, dir)
      .select("worker", "n").as[(Long, Long)].collect().toMap
    assert(got.map(r => r._1 -> r._2).toMap == routed)
  }

  test("cdc_journal_gaps: runs are exactly the maximal consecutive " +
      "delivery-position islands of the loss set") {
    val dir = "/root/testdata/sf0.001"
    val got = graft.operators.Cdc.queries("cdc_journal_gaps")(spark, dir)
      .select("worker", "from_event", "to_event", "n_missing")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got.nonEmpty)
    assert(got.forall(r => r._2 % 211 == 0 && r._3 % 211 == 0))
    // exact local reconstruction from the same feed + routing
    val feed = graft.operators.Cdc.queries("cdc_checkpoint")(spark, dir) // warm
    val rows = graft.model.Oplog.fromEvents(spark, dir)
      .filter(graft.filters.OplogFilters.chain(Seq(""),
        Seq("^app\\.users_[0-9]+$"), Seq("^app\\.users_3$")))
      .withColumn("worker",
        graft.partition.Hashers.workerWhitelist(Seq("users_1"), 8))
      .select("worker", "ts_packed", "event_id")
      .as[(Long, Long, Long)].collect()
    val expect = rows.groupBy(_._1).flatMap { case (w, rs) =>
      val ordered = rs.sortBy(r => (r._2, r._3)).map(_._3).zipWithIndex
      val lost = ordered.filter(_._1 % 211 == 0)
      // group by pos - index-within-lost (maximal consecutive runs)
      lost.zipWithIndex.groupBy { case ((_, pos), i) => pos - i }
        .values.map { run =>
          val es = run.map(_._1._1)
          (w, es.min, es.max, es.length.toLong)
        }
    }.toSet
    assert(got == expect)
    assert(feed.count() > 0)
  }

  test("schema evolution: wide union schema over cdc_apply's winners, " +
      "NULL exactly where the winning doc predates the field") {
    val dir = "/root/testdata/sf0.001"
    val evo = graft.operators.Cdc.queries("cdc_schema_evolution")(spark, dir)
    assert(evo.columns.toSeq == Seq("ns", "doc_key", "last_ts", "k", "cents", "src"))
    val rows = evo.select("ns", "doc_key", "k", "cents", "src")
      .as[(String, String, String, Option[String], Option[String])].collect()
    assert(rows.nonEmpty)
    // same winner set as the apply materialization
    val applied = graft.operators.Cdc.queries("cdc_apply")(spark, dir)
      .select("ns", "doc_key").as[(String, String)].collect().toSet
    assert(rows.map(r => (r._1, r._2)).toSet == applied)
    // k is universal; the conditional columns are genuinely mixed
    assert(rows.forall(_._3 != null))
    assert(rows.exists(_._4.isDefined) && rows.exists(_._4.isEmpty))
    assert(rows.flatMap(_._5).toSet.subsetOf(Set("web", "app")))
  }
}
