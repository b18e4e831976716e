package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Relational

/** Edge-semantics goldens for the round-9 relational additions: the as-of
  * join (`Relational.asofJoin`), the binned range join
  * (`Relational.binnedRangeJoin`), the salted top-k rewrite, and the
  * `session_window` gap boundary the stream_sessionize oracle pins.
  * PlanAuditSpec guards the plan SHAPES; these tests guard the answers a
  * driver-level oracle over random data would rarely reach (exact ties,
  * exact tolerance/radius boundaries, empty sides).
  */
class RelationalJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTest.spark
  import spark.implicits._

  private def asof(left: Seq[(Long, Long, Long)], right: Seq[(Long, Long, Long)],
                   tolUs: Long = 100L) = {
    val l = left.toDF("user_id", "event_id", "ts")
    val r = right.toDF("user_id", "event_id", "ts")
      .withColumn("click_id", col("event_id"))
    Relational.asofJoin(l, r, key = "user_id", ts = "ts", id = "event_id",
        payload = Seq("click_id"), tolUs = tolUs)
      .select("event_id", "click_id", "asof_gap_us")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
  }

  test("asofJoin: at-or-before — an equal-ts right row matches with gap 0") {
    assert(asof(Seq((1L, 10L, 50L)), Seq((1L, 2L, 50L))) == Set((10L, 2L, 0L)))
  }

  test("asofJoin: two right rows at the same ts — the larger id wins deterministically") {
    assert(asof(Seq((1L, 10L, 60L)), Seq((1L, 2L, 50L), (1L, 3L, 50L))) ==
      Set((10L, 3L, 10L)))
  }

  test("asofJoin: tolerance boundary inclusive; one past it is null, row kept") {
    assert(asof(Seq((1L, 10L, 150L)), Seq((1L, 2L, 50L))) == Set((10L, 2L, 100L)))
    assert(asof(Seq((1L, 10L, 151L)), Seq((1L, 2L, 50L))) == Set((10L, -1L, -1L)))
  }

  test("asofJoin: later right rows never match; keys are isolated; empty right keeps lefts") {
    // right row strictly after the left ts
    assert(asof(Seq((1L, 10L, 40L)), Seq((1L, 2L, 50L))) == Set((10L, -1L, -1L)))
    // a perfect match on another key is invisible
    assert(asof(Seq((1L, 10L, 50L)), Seq((2L, 2L, 50L))) == Set((10L, -1L, -1L)))
    // left-outer: no right side at all still yields every left row
    assert(asof(Seq((1L, 10L, 50L), (2L, 11L, 9L)), Seq.empty) ==
      Set((10L, -1L, -1L), (11L, -1L, -1L)))
  }

  test("asofJoin: the match is the LATEST qualifying right row, not the first") {
    assert(asof(Seq((1L, 10L, 100L)),
      Seq((1L, 2L, 10L), (1L, 3L, 60L), (1L, 4L, 90L), (1L, 5L, 101L))) ==
      Set((10L, 4L, 10L)))
  }

  private def pairs(left: Seq[Long], right: Seq[Long], radius: Long) = {
    val l = left.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("lid", "lts")
    val r = right.zipWithIndex.map { case (t, i) => (i.toLong + 100L, t) }
      .toDF("rid", "rts")
    Relational.binnedRangeJoin(l, r, leftTs = "lts", rightTs = "rts",
        radiusUs = radius)
      .select("lid", "rid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("binnedRangeJoin: radius boundary inclusive both sides, beyond excluded") {
    // left at 1000, radius 100: right at 900 and 1100 match, 899/1101 don't
    assert(pairs(Seq(1000L), Seq(900L, 1100L, 899L, 1101L), 100L) ==
      Set((0L, 100L), (0L, 101L)))
  }

  test("binnedRangeJoin: pairs that straddle a bin boundary are found, no duplicates") {
    // radius 100 => bins of width 100. 195 and 205 sit in different bins
    // but are 10 apart; the pair must appear exactly once.
    val l = Seq((0L, 195L)).toDF("lid", "lts")
    val r = Seq((100L, 205L)).toDF("rid", "rts")
    val out = Relational.binnedRangeJoin(l, r, "lts", "rts", 100L)
      .select("lid", "rid").collect()
    assert(out.length == 1 && out.head.getLong(1) == 100L)
  }

  test("binnedRangeJoin: empty right side yields no rows (inner semantics)") {
    assert(pairs(Seq(1000L, 2000L), Seq.empty, 100L) == Set.empty)
  }

  test("binnedRangeJoin: matches the naive quadratic join on a dense cluster") {
    val lts = (0L until 50L).map(_ * 37L)
    val rts = (0L until 50L).map(_ * 53L + 11L)
    val expected = (for {
      (lt, li) <- lts.zipWithIndex
      (rt, ri) <- rts.zipWithIndex
      if math.abs(rt - lt) <= 100L
    } yield (li.toLong, ri.toLong + 100L)).toSet
    assert(pairs(lts, rts, 100L) == expected)
  }

  test("saltedTopK: equals the one-window top-k, including ties broken by (orderkey, linenumber)") {
    val rows = (1 to 200).map { i =>
      (if (i % 2 == 0) "A" else "B", i.toLong, (i % 4).toLong + 1L,
        (i % 7).toDouble) // many duplicate prices to force tie-breaks
    }.toDF("l_returnflag", "l_orderkey", "l_linenumber", "price")
    val got = Relational.saltedTopK(rows, "l_returnflag", k = 3, salts = 4)
      .orderBy("l_returnflag", "rank")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(4)))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("l_returnflag"))
      .orderBy(col("price").desc, col("l_orderkey").asc, col("l_linenumber").asc)
    val want = rows.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 3).orderBy("l_returnflag", "rank")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(4)))
    assert(got.toSeq == want.toSeq)
  }

  test("q24_salted_join: result identical to the plain join; plan is a shuffle " +
      "SortMergeJoin (salting is pointless under a broadcast)") {
    val dir = "/root/testdata/sf0.001"
    val salted = graft.operators.Relational.queries("q24_salted_join")(spark, dir)
    val plan = salted.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), s"salted join lost its merge pin:\n$plan")
    assert(!plan.contains("BroadcastHashJoin"), s"dim side got broadcast:\n$plan")
    val li = graft.Tables.load(spark, dir, "lineitem")
    val o = graft.Tables.load(spark, dir, "orders")
    val want = li.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(graft.functions.Portable.revenueSum(
          col("l_extendedprice"), col("l_discount")).as("revenue"),
        count(lit(1)).as("n_items"))
      .as[(String, Double, Long)].collect().toSet
    assert(salted.as[(String, Double, Long)].collect().toSet == want)
  }

  test("session_window boundary: a gap of exactly the window size MERGES (strict > in the oracle)") {
    // [t, t+gap) and [t+gap, …) are adjacent; Spark merges adjacency, so
    // the new-session predicate in every oracle must be diff > gap — this
    // golden is what pins stream_sessionize's (and q10's) boundary.
    val df = Seq(
      (1L, 0L), (1L, 1000000L),            // 1 s apart: same session
      (1L, 1000000L + 1800000000L),        // exactly 30 min later: STILL merged
      (1L, 1000000L + 1800000000L + 1800000001L), // 30 min + 1 µs: new session
      (2L, 5L)
    ).toDF("user_id", "ts_us").withColumn("ts", timestamp_micros(col("ts_us")))
    val sess = df.groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n"))
      .select("user_id", "n").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(sess.toSet == Set((1L, 3L), (1L, 1L), (2L, 1L)) && sess.length == 3)
  }

  test("rankGate attests exact quantile values and trips on a value at the wrong rank") {
    // v = 1..1000 on one key: the exact p50/p90/p99 values are 500/900/990
    // (CDF at each is exactly its target quantile).
    val fact = (1 to 1000).map(i => ("k", i.toDouble)).toDF("key", "v")
    def gate(ap: Seq[Double]): Boolean = {
      val sk = Seq(("k", ap)).toDF("key", "ap")
      Relational.rankGate(fact, sk, key = "key", value = "v",
          qs = Seq(0.5, 0.9, 0.99), tol = 0.01)
        .head().getAs[Boolean]("within_bound")
    }
    assert(gate(Seq(500.0, 900.0, 990.0)))
    // the p90 value claimed as p50: observed CDF 0.9 vs target 0.5 → trip
    assert(!gate(Seq(900.0, 900.0, 990.0)))
    // off by just past the ±1% rank tolerance (CDF 0.511 at p50) → trip
    assert(!gate(Seq(511.0, 900.0, 990.0)))
    // inside the tolerance (CDF 0.509) → attests
    assert(gate(Seq(509.0, 900.0, 990.0)))
  }

  test("zorderInterleave golden: x bits land on even z positions, y bits on odd") {
    val z = Seq((3L, 5L), (1L, 1L), (0L, 0L), (65535L, 0L), (0L, 65535L))
      .toDF("x", "y")
      .select(Relational.zorderInterleave(col("x"), col("y")).as("z"))
      .as[Long].collect().toSeq
    // x=3 (bits 0,1) → z bits 0,2 = 5; y=5 (bits 0,2) → z bits 1,5 = 34
    assert(z == Seq(39L, 3L, 0L,
      (0 until 16).map(i => 1L << (2 * i)).sum,
      (0 until 16).map(i => 1L << (2 * i + 1)).sum))
  }

  test("q26_zorder skipping stats are sound: a bucket the box stats exclude holds zero box rows") {
    val out = Relational.queries("q26_zorder")(spark, "/root/testdata/sf0.001")
      .select("box_overlaps", "n_box").as[(Boolean, Long)].collect()
    assert(out.nonEmpty)
    // soundness (no false pruning): every box row lives in an overlapping bucket
    assert(out.filter(!_._1).forall(_._2 == 0L))
    // the layout is useful: the box does NOT overlap every bucket
    assert(out.exists(!_._1) && out.exists(_._2 > 0L))
  }

  test("q19's HLL bound gate holds on real data at sf0.001") {
    val out = graft.operators.Relational.queries("q19_approx_distinct")(
      spark, "/root/testdata/sf0.001")
    val rows = out.collect()
    assert(rows.nonEmpty && rows.forall(_.getAs[Boolean]("within_bound")))
  }

  test("q33 time-weighted sums match an independent sequential fold, and " +
      "the TWA lies inside the value range") {
    val dir = "/root/testdata/sf0.001"
    val events = graft.Tables.loadEventsNs(spark, dir)
      .select(col("event_type"), expr("ts DIV 1000").as("ts_us"),
        expr("cast(round(value * 100) as bigint)").as("cents"),
        col("event_id"))
      .as[(String, Long, Long, Long)].collect()
    // independent fold: per type, sort by (ts, id) and accumulate
    val expected = events.groupBy(_._1).map { case (t, rows) =>
      val srt = rows.sortBy(r => (r._2, r._4))
      val holds = srt.zip(srt.tail).map { case (a, b) => (a._3, b._2 - a._2) }
      t -> (holds.map { case (c, h) => c * h }.sum, holds.map(_._2).sum,
        srt.map(_._3))
    }
    val out = graft.operators.Relational.queries("q33_time_weighted")(spark, dir)
      .select("event_type", "weighted_cents_us", "span_us")
      .as[(String, Long, Long)].collect()
    assert(out.length == expected.size)
    out.foreach { case (t, wsum, span) =>
      val (eWsum, eSpan, vals) = expected(t)
      assert(wsum == eWsum && span == eSpan, s"$t fold mismatch")
      val twa = wsum.toDouble / span
      assert(twa >= vals.min && twa <= vals.max, s"$t TWA out of range")
    }
  }

  test("q32's two-phase prefix sum equals the naive global window, and the " +
      "sweep is conservative (every prefix nonnegative, ends at zero)") {
    import org.apache.spark.sql.expressions.Window
    val dir = "/root/testdata/sf0.001"
    // rebuild the delta stream exactly as the query does
    val gapUs = 1800000000L
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val sess = graft.Tables.loadEventsNs(spark, dir)
      .select(col("user_id"), col("event_id"), expr("ts DIV 1000").as("ts"))
      .withColumn("new_sess",
        when(lag(col("ts"), 1).over(w).isNull ||
          col("ts") - lag(col("ts"), 1).over(w) > gapUs, 1).otherwise(0))
      .withColumn("sess_seq", sum(col("new_sess")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("sess_seq"))
      .agg(min(col("ts")).as("ts_start"), max(col("ts")).as("ts_end"))
    val deltas = sess.select(col("ts_start").as("ts"), lit(1L).as("d"))
      .unionByName(sess.select((col("ts_end") + 1).as("ts"), lit(-1L).as("d")))
      .groupBy(col("ts")).agg(sum(col("d")).as("net_delta"))
    val naive = deltas.withColumn("concurrency",
        sum(col("net_delta")).over(Window.orderBy(col("ts"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select("ts", "concurrency").as[(Long, Long)].collect().toMap
    // conservation: the sweep never goes negative and closes at zero
    assert(naive.values.forall(_ >= 0))
    assert(naive(naive.keys.max) == 0L)
    // the query's two-phase values agree with the naive prefix at its moments
    val out = graft.operators.Relational.queries("q32_concurrency")(spark, dir)
      .select("ts", "concurrency").as[(Long, Long)].collect()
    assert(out.length == 10)
    assert(out.forall { case (ts, c) => naive(ts) == c })
    // and they really are the top-10 (concurrency desc, ts asc)
    val expected = naive.toSeq.sortBy { case (ts, c) => (-c, ts) }.take(10)
    assert(out.sortBy { case (ts, c) => (-c, ts) }.toSeq == expected)
  }

  test("prefixSum equals the sequential running sum across bucket boundaries") {
    import graft.operators.Relational
    // values keyed by a unique order column; buckets of width 10 — the
    // two-phase result must match the single-threaded fold exactly,
    // including at bucket edges and for negative deltas
    val rows = (1L to 95L).map(i => (i, (i % 7) - 3))
    val df = rows.toDF("ord", "v")
    val got = Relational.prefixSum(df, col("v"), col("ord"),
        expr("ord DIV 10"), "ps")
      .select("ord", "ps").as[(Long, Long)].collect().toMap
    var run = 0L
    rows.foreach { case (o, v) =>
      run += v
      assert(got(o) === run, s"at ord=$o")
    }
    // a single row per bucket and an empty-prefix first bucket both hold
    val tiny = Seq((5L, 100L), (25L, 1L)).toDF("ord", "v")
    val got2 = Relational.prefixSum(tiny, col("v"), col("ord"),
        expr("ord DIV 10"), "ps")
      .select("ord", "ps").as[(Long, Long)].collect().toMap
    assert(got2 === Map(5L -> 100L, 25L -> 101L))
  }

  test("q34_attribution: every purchase's credits sum to exactly 1e6 ppm, " +
      "touches respect the user + window, direct purchases complete the set") {
    val dir = "/root/testdata/sf0.001"
    val got = graft.operators.Relational.queries("q34_attribution")(spark, dir)
      .select("purchase_event", "user_id", "p_ts", "click_event",
        "touch_seq", "n_touch", "credit_ppm")
      .as[(Long, Long, Long, Option[Long], Long, Long, Long)].collect()
    assert(got.nonEmpty)
    // conservation: each purchase allocates exactly one million ppm
    got.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.map(_._7).sum == 1000000L)
      val n = rows.head._6
      if (n == 0) assert(rows.length == 1 && rows.head._4.isEmpty)
      else assert(rows.length == n &&
        rows.map(_._5).sorted.toSeq == (1L to n))
    }
    // the attribution set covers every purchase exactly once
    val ev = graft.Tables.loadEventsNs(spark, dir)
      .select(col("event_id"), expr("ts DIV 1000").as("ts"),
        col("user_id"), col("event_type"))
      .as[(Long, Long, Long, String)].collect()
    val purchases = ev.filter(_._4 == "purchase")
    assert(got.map(_._1).distinct.length == purchases.length)
    // window + user membership on every touch, against raw events
    val clicks = ev.filter(_._4 == "click").map(e => e._1 -> e).toMap
    val pByEvent = purchases.map(e => e._1 -> e).toMap
    got.filter(_._4.isDefined).foreach { r =>
      val cl = clicks(r._4.get)
      val pu = pByEvent(r._1)
      assert(cl._3 == pu._3) // same user
      assert(cl._2 <= pu._2 && cl._2 > pu._2 - 86400000000L)
    }
    // directs are genuinely touchless
    val direct = got.filter(_._4.isEmpty).map(_._1).toSet
    direct.foreach { pe =>
      val pu = pByEvent(pe)
      assert(!ev.exists(e => e._4 == "click" && e._3 == pu._3 &&
        e._2 <= pu._2 && e._2 > pu._2 - 86400000000L))
    }
    assert(direct.nonEmpty && got.exists(_._6 > 1))
  }

  test("pageRank: hand-computed star-graph fixpoint prefix, spoke symmetry, " +
      "integer determinism across partitionings") {
    // Star: hub h ↔ spokes s1..s4, all weights 1 (undirected → 8 edges).
    // K=1: r(h) = 150000 + 85·(4·1e6) DIV 100 = 3550000
    //      r(s) = 150000 + 85·(1e6 DIV 4) DIV 100 = 362500
    // K=2: r(h) = 150000 + 85·(4·362500) DIV 100 = 1382500
    //      r(s) = 150000 + 85·(3550000 DIV 4) DIV 100 = 904375
    val base = Seq("s1", "s2", "s3", "s4").flatMap(s =>
      Seq(("h", s, 1L), (s, "h", 1L)))
    def run(iters: Int, parts: Int) = Relational.pageRank(
        base.toDF("src", "dst", "w").repartition(parts), iters)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val k1 = run(1, 3)
    assert(k1("h") == 3550000L)
    assert(Seq("s1", "s2", "s3", "s4").forall(k1(_) == 362500L))
    val k2 = run(2, 3)
    assert(k2("h") == 1382500L)
    assert(Seq("s1", "s2", "s3", "s4").forall(k2(_) == 904375L))
    // Integer floors make the result bit-stable under any partitioning.
    assert(run(2, 7) == k2)
  }

  test("q36_cube_incr: the incremental merge equals a one-shot CUBE, cell " +
      "for cell, and the grand-total cell carries the full corpus") {
    val dir = "/root/testdata/sf0.001"
    val merged = graft.operators.Relational.queries("q36_cube_incr")(spark, dir)
      .collect().map(r => (r.getLong(0), Option(r.getString(1)),
        Option(r.get(2)).map(_.toString.toLong), r.getLong(3), r.getLong(4)))
      .toSet
    val full = graft.Tables.loadEventsNs(spark, dir)
      .select(col("event_type"), (col("user_id") % 10).as("user_bucket"),
        expr("cast(round(value * 100) as bigint)").as("cents"))
      .cube(col("event_type"), col("user_bucket"))
      .agg(grouping_id().as("gid"), count(lit(1)).as("n"),
        sum(col("cents")).as("sum_cents"))
      .select(col("gid"), col("event_type"), col("user_bucket"), col("n"),
        col("sum_cents"))
      .collect().map(r => (r.getLong(0), Option(r.getString(1)),
        Option(r.get(2)).map(_.toString.toLong), r.getLong(3), r.getLong(4)))
      .toSet
    assert(merged == full)
    // gid=3 is the grand total: exactly one cell, n = |events|
    val grand = merged.filter(_._1 == 3L)
    assert(grand.size == 1 &&
      grand.head._4 == graft.Tables.loadEventsNs(spark, dir).count())
  }

  test("q37's union gate has teeth: dropping day sketches loses their " +
      "users' cardinality, and the sf gate passes for real") {
    import spark.implicits._
    // day-partitioned users (day d owns users d·100..d·100+99) so partial
    // unions MUST under-estimate — the fixture corpus can't show this
    // (its 15 users all appear every day)
    val e = (for (d <- 0L until 10L; u <- 0L until 100L)
      yield (d, d * 100 + u)).toDF("day", "user_id").repartition(4)
    val daily = e.groupBy(col("day"))
      .agg(hll_sketch_agg(col("user_id"), lit(12)).as("sk"))
      .localCheckpoint()
    def unionEst(pred: org.apache.spark.sql.Column): Long =
      daily.filter(pred)
        .agg(hll_sketch_estimate(hll_union_agg(col("sk")))).head().getLong(0)
    val full = unionEst(lit(true))
    val half = unionEst(col("day") % 2 === 0)
    assert(math.abs(full - 1000L).toDouble / 1000 <= 0.05) // complete union ≈ exact
    assert(math.abs(half - 500L).toDouble / 500 <= 0.05) // partial union = its days only
    // and the gated query itself passes on the fixture corpus
    val out = graft.operators.Relational.queries("q37_sketch_union")(
      spark, "/root/testdata/sf0.001").head()
    assert(out.getAs[Boolean]("within_bound"))
  }

  test("q40's bitmap algebra law: n_both/n_either equal direct distinct-set " +
      "intersection/union on random event sets") {
    import spark.implicits._
    val rnd = new scala.util.Random(40913)
    val types = Seq("a", "b", "c")
    // users span several 63-bit words, with duplicates (bit_or must be
    // idempotent) and sparse high ids (empty words must not phantom-count)
    val rows = (0 until 600).map { _ =>
      (types(rnd.nextInt(3)), rnd.nextInt(40) match {
        case u if u < 35 => rnd.nextInt(200).toLong
        case _ => 1000L + rnd.nextInt(50)
      })
    }
    val df = rows.toDF("event_type", "user_id").repartition(4)
    val b = df
      .select(col("event_type"), expr("user_id DIV 63").as("w"),
        expr("shiftleft(1L, cast(user_id % 63 as int))").as("bit"))
      .groupBy(col("event_type"), col("w")).agg(expr("bit_or(bit)").as("bits"))
    val counts = b.groupBy(col("event_type"))
      .agg(sum(expr("bit_count(bits)")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val both = b.select(col("event_type").as("ta"), col("w"), col("bits").as("ba"))
      .join(b.select(col("event_type").as("tb"), col("w").as("w2"),
        col("bits").as("bb")), col("w") === col("w2") && col("ta") < col("tb"))
      .groupBy(col("ta"), col("tb"))
      .agg(sum(expr("bit_count(ba & bb)")).as("n_both"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val sets = rows.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    for (t <- types) assert(counts(t) == sets(t).size.toLong, s"count $t")
    for (ta <- types; tb <- types if ta < tb) {
      val want = (sets(ta) intersect sets(tb)).size.toLong
      assert(both.getOrElse((ta, tb), 0L) == want, s"both $ta $tb")
      val either = counts(ta) + counts(tb) - both.getOrElse((ta, tb), 0L)
      assert(either == (sets(ta) union sets(tb)).size.toLong, s"either $ta $tb")
    }
  }

  test("q39's forward fill matches a sequential per-user fold on the fixture") {
    val dir = "/root/testdata/sf0.001"
    val rows = graft.Tables.loadEventsNs(spark, dir)
      .select(col("user_id"), expr("ts DIV 1000").as("ts_us"), col("event_id"),
        col("event_type"), expr("cast(round(value * 100) as bigint)").as("cents"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3), r.getLong(4)))
    val want = rows.groupBy(_._1).map { case (uid, es) =>
      var lastGood: Option[Long] = None
      var (gaps, filled, sumFilled) = (0L, 0L, 0L)
      for (e <- es.sortBy(t => (t._2, t._3))) {
        if (e._4 == "error") { // the planted missing-measurement class
          gaps += 1
          if (lastGood.isDefined) filled += 1
        } else lastGood = Some(e._5)
        sumFilled += lastGood.getOrElse(0L)
      }
      uid -> (es.size.toLong, gaps, filled, sumFilled)
    }
    val got = graft.operators.Relational.queries("q39_forward_fill")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got == want)
  }

  test("q38_semi_additive matches an independent sequential fold of " +
      "last-observation-per-user") {
    val dir = "/root/testdata/sf0.001"
    val rows = graft.Tables.loadEventsNs(spark, dir)
      .select(col("user_id"), col("event_type"), expr("ts DIV 1000").as("ts_us"),
        col("event_id"), expr("cast(round(value * 100) as bigint)").as("cents"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    val want = rows.groupBy(t => (t._1, t._2)).view.mapValues(
        _.maxBy(t => (t._3, t._4))._5).toSeq
      .groupBy(_._1._2)
      .map { case (tpe, vs) => tpe -> (vs.size.toLong, vs.map(_._2).sum) }
    val got = graft.operators.Relational.queries("q38_semi_additive")(spark, dir)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == want)
  }
}
