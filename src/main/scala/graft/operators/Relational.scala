package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Portable._

/** The relational query surface (SURVEY.md §2.9).
  *
  * MongoShake itself has no join/window/group-by query operators — Spark
  * supplies them — but the driver's acceptance bar exercises the standard
  * scan → filter → join → agg → sort/limit surface over the test corpus.
  * Each query is written Catalyst-first: filters early (parquet pushdown),
  * explicit `broadcast()` on fixed-cardinality dimensions, exact decimal
  * aggregation (see [[graft.functions.Portable]]).
  */
object Relational {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Q1-style scan + partial-aggregatable group-by: the canonical
    // map-side-combine pattern; shuffles only |groups| rows per partition.
    "q1_agg" -> ((s, dir) => {
      Tables.load(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-01").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          moneySum(col("l_quantity")).as("sum_qty"),
          moneySum(col("l_extendedprice")).as("sum_base_price"),
          revenueSum(col("l_extendedprice"), col("l_discount")).as("sum_disc_price"),
          count(lit(1)).as("count_order"))
    }),

    // Star join: fact tables join on keys; dimensions broadcast so the
    // only shuffle is the lineitem⋈orders⋈customer key exchange.
    "q2_join_agg" -> ((s, dir) => {
      val li = Tables.load(s, dir, "lineitem")
      val o  = Tables.load(s, dir, "orders")
      val c  = Tables.load(s, dir, "customer")
      val n  = Tables.load(s, dir, "nation")
      val r  = Tables.load(s, dir, "region")
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(
          revenueSum(col("l_extendedprice"), col("l_discount")).as("revenue"),
          count(lit(1)).as("n_items"))
    }),

    // Top-k: agg then orderBy().limit(k) — Spark plans TakeOrderedAndProject,
    // which is a per-partition heap + driver merge (no full sort at scale).
    "q3_topk" -> ((s, dir) => {
      Tables.load(s, dir, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(revenueSum(col("l_extendedprice"), col("l_discount")).as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    }),

    // Window functions: rank + running total per customer; one shuffle on
    // the partition key, sort within partitions only.
    "q4_window" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      Tables.load(s, dir, "orders")
        .withColumn("order_rank", row_number().over(w).cast("long"))
        .withColumn("running_spend",
          sum(dec2(col("o_totalprice")))
            .over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("double"))
        .filter(col("order_rank") <= 3)
        .select(col("o_custkey"), col("o_orderkey"), col("order_rank"), col("running_spend"))
    }),

    // Semi/anti joins (EXISTS / NOT EXISTS): customers having an open
    // order but no finished order. left_semi/left_anti never widen rows.
    "q5_semi_anti" -> ((s, dir) => {
      val c = Tables.load(s, dir, "customer")
      val o = Tables.load(s, dir, "orders")
      val open = o.filter(col("o_orderstatus") === "O").select(col("o_custkey"))
      val done = o.filter(col("o_orderstatus") === "F").select(col("o_custkey"))
      c.join(open, col("c_custkey") === open("o_custkey"), "left_semi")
        .join(done, col("c_custkey") === done("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
    }),

    // Q6-style selective scan: every predicate reaches the parquet reader
    // (PushedFilters), single-row global aggregate.
    "q6_filter" -> ((s, dir) => {
      Tables.load(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
                col("l_shipdate") <  lit("1997-01-01").cast("timestamp") &&
                col("l_discount").between(0.05, 0.07) &&
                col("l_quantity") < 24)
        .agg(
          sum(dec2(col("l_extendedprice")) * dec2(col("l_discount")))
            .cast("double").as("revenue"),
          count(lit(1)).as("n_rows"))
    }),

    // Exact distinct aggregation (expands to two-phase hash aggregate).
    "q7_distinct" -> ((s, dir) => {
      Tables.load(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          countDistinct(col("l_partkey")).as("n_parts"),
          countDistinct(col("l_suppkey")).as("n_supps"),
          count(lit(1)).as("n_rows"))
    }),

    // Rollup hierarchy: one pass emits all grouping levels with a
    // grouping id (Catalyst expands to a single shuffle).
    "q8_rollup" -> ((s, dir) => {
      Tables.load(s, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(
          grouping_id().as("gid"),
          moneySum(col("l_quantity")).as("sum_qty"),
          count(lit(1)).as("n_rows"))
    }),

    // Set algebra: customers active in both periods (intersect) and
    // one-period-only (except) — plans as semi/anti hash joins.
    "q9_setops" -> ((s, dir) => {
      val o = Tables.load(s, dir, "orders")
      val y96 = o.filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
        .select(col("o_custkey"))
      val y97 = o.filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
        .select(col("o_custkey"))
      val both = y96.intersect(y97).withColumn("kind", lit("both"))
      val only96 = y96.except(y97).withColumn("kind", lit("only_1996"))
      both.unionByName(only96)
        .groupBy(col("kind")).agg(count(lit(1)).as("n_custs"))
    }),

    // Gap-based sessionization of the event stream (30-min inactivity
    // cut): lag + conditional flag + running sum + one aggregate, all
    // inside the SAME user_id hash partitioning — Catalyst plans one
    // exchange, the two windows and the final group-by reuse its sort.
    // Pure integer (ns) arithmetic, so sessions are engine-identical.
    "q10_sessionize" -> ((s, dir) => {
      val gapUs = 1800000000L // 30 min (µs — the oracle's timestamp grain)
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      Tables.loadEventsNs(s, dir)
        // µs precision: the oracle's epoch_ns(ts)//1000 grain — same as
        // Oplog.project

        .select(col("user_id"), col("event_id"), expr("ts DIV 1000").as("ts"))
        .withColumn("new_sess",
          when(lag(col("ts"), 1).over(w).isNull ||
            col("ts") - lag(col("ts"), 1).over(w) > gapUs, 1).otherwise(0))
        .withColumn("sess_seq", sum(col("new_sess")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("user_id"), col("sess_seq"))
        .agg(min(col("ts")).as("ts_start"), max(col("ts")).as("ts_end"),
          count(lit(1)).as("n_events"))
    }),

    // Exact per-group quantiles (discrete: value at rank ceil(p·n)) via
    // one windowed sort per group — the honest cost of EXACT quantiles
    // at scale (an approximate path would use a mergeable sketch, which
    // no cross-engine oracle can hash-match). The value at a rank is
    // deterministic even when values tie, so the result is stable under
    // any partitioning.
    "q11_quantiles" -> ((s, dir) => {
      val w = Window.partitionBy(col("l_returnflag")).orderBy(col("l_quantity"))
      val wAll = Window.partitionBy(col("l_returnflag"))
      Tables.load(s, dir, "lineitem")
        .select(col("l_returnflag"), col("l_quantity"))
        .withColumn("rn", row_number().over(w))
        .withColumn("n", count(lit(1)).over(wAll))
        .groupBy(col("l_returnflag"))
        .agg(
          max(when(col("rn") === ceil(col("n") * 0.5), col("l_quantity"))).as("p50"),
          max(when(col("rn") === ceil(col("n") * 0.9), col("l_quantity"))).as("p90"),
          max(when(col("rn") === ceil(col("n") * 0.99), col("l_quantity"))).as("p99"))
    }),

    // Skew-safe two-phase top-k — the SALTING pattern for skewed window
    // partitions at 100 TB: a plain `row_number over (partition by
    // l_returnflag)` would sort each flag's entire row set on ONE task
    // (3 keys × millions of rows — the straggler that kills the stage).
    // Phase 1 ranks within (key, salt) — salt = hash(l_orderkey) mod 16,
    // deterministic — so 16 tasks share each hot key and each keeps only
    // its local top-k; phase 2 ranks the surviving k·salts rows per key.
    // Identical result to the one-window plan, bounded per-task sort.
    "q13_salted_topk" -> ((s, dir) =>
      saltedTopK(
        Tables.load(s, dir, "lineitem")
          .select(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"),
            dec2(col("l_extendedprice")).cast("double").as("price")),
        keyCol = "l_returnflag", k = 3, salts = 16)),

    // As-of join (the operator Spark lacks natively): each purchase is
    // matched to the latest click at-or-before it by the same user,
    // within a 1 h tolerance. NOT a join at all in the plan — the
    // union+window rewrite shuffles ONCE on user_id and resolves every
    // match in a single running-`last` pass, which is the 100 TB shape:
    // a per-key sorted merge with no pairwise candidate explosion (a
    // naive t1.ts >= t2.ts join is quadratic per user).
    "q14_asof_join" -> ((s, dir) => {
      val e = Tables.loadEventsNs(s, dir)
        .select(col("user_id"), col("event_id"), expr("ts DIV 1000").as("ts"),
          col("event_type"))
      asofJoin(
        left = e.filter(col("event_type") === "purchase").drop("event_type"),
        right = e.filter(col("event_type") === "click").drop("event_type")
          .withColumn("click_id", col("event_id")),
        key = "user_id", ts = "ts", id = "event_id",
        payload = Seq("click_id"), tolUs = 3600000000L)
    }),

    // Keyless range join via binning — the pattern that keeps a pure
    // interval join off BroadcastNestedLoop/Cartesian at 100 TB: bin
    // width = the range radius, the probe side explodes to its 2-3
    // candidate bins, the build side sits in its home bin, and the join
    // is a plain equi-join on bin with the exact |Δt| predicate as a
    // post-filter. Work is O(n · avg bin occupancy), not O(n²).
    "q15_range_join" -> ((s, dir) => {
      val e = Tables.loadEventsNs(s, dir)
        .select(col("event_id"), expr("ts DIV 1000").as("ts"),
          col("event_type"), col("value"))
      binnedRangeJoin(
        left = e.filter(col("event_type") === "error")
          .select(col("event_id").as("err_id"), col("ts").as("err_ts")),
        right = e.filter(col("event_type") === "purchase")
          .select(col("ts").as("p_ts"), col("value")),
        leftTs = "err_ts", rightTs = "p_ts", radiusUs = 120000000L)
        .groupBy(col("err_id"), col("err_ts"))
        .agg(count(lit(1)).as("n_nearby"),
          moneySum(col("value")).as("v_sum"),
          min(abs(col("p_ts") - col("err_ts"))).as("min_gap_us"))
    }),

    // Trailing time-range window (RANGE frame over µs epochs): each
    // event's 1-hour look-back count/sum per user. One exchange on
    // user_id; the range frame is a per-partition sorted sliding scan —
    // at 100 TB the same shape as the sessionize/as-of family, no
    // self-join (the naive rewrite is an O(events × window) range join).
    // Decimal sum keeps the rolling aggregate order-independent.
    "q16_rolling" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"))
        .rangeBetween(-3600000000L, 0L)
      Tables.loadEventsNs(s, dir)
        .select(col("user_id"), col("event_id"), expr("ts DIV 1000").as("ts"),
          col("value"))
        .withColumn("n_1h", count(lit(1)).over(w))
        .withColumn("v_1h", sum(dec2(col("value"))).over(w).cast("double"))
        .select("user_id", "event_id", "ts", "n_1h", "v_1h")
    }),

    // Pivot with EXPLICIT value list — the scale-correct form: passing
    // the values avoids the driver-side `distinct` collect Spark runs
    // for an open pivot, so the plan is a plain one-shuffle conditional
    // aggregation any engine can run at 100 TB.
    "q17_pivot" -> ((s, dir) =>
      Tables.load(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .pivot("l_linestatus", Seq("F", "O"))
        .agg(moneySum(col("l_extendedprice")))),

    // Full cube: all 2^n grouping combinations in ONE pass — Catalyst
    // expands the grouping sets before the aggregate, so the plan stays
    // a single shuffle (same shape as q8's rollup, wider set list).
    // The marginal-by-linestatus rows are the ones rollup cannot emit.
    "q18_cube" -> ((s, dir) => {
      Tables.load(s, dir, "lineitem")
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(
          grouping_id().as("gid"),
          moneySum(col("l_quantity")).as("sum_qty"),
          count(lit(1)).as("n_rows"))
    }),

    // The general GROUPING SETS form (rollup and cube are its two fixed
    // instances): detail + one subtotal + grand total — the exact set
    // list a reporting layer asks for, WITHOUT paying for the cube's
    // unwanted fourth set ((priority) alone) at 100 TB. Catalyst expands
    // the sets before the aggregate: still ONE shuffle, rows replicated
    // only |sets| times map-side; nation broadcasts into the join.
    "q23_grouping_sets" -> ((s, dir) => {
      val o = Tables.load(s, dir, "orders")
      val c = Tables.load(s, dir, "customer")
      val n = Tables.load(s, dir, "nation")
      o.join(c, col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .groupingSets(
          Seq(Seq(col("n_name"), col("o_orderpriority")),
            Seq(col("n_name")), Seq()),
          col("n_name"), col("o_orderpriority"))
        .agg(
          grouping_id().as("gid"),
          moneySum(col("o_totalprice")).as("sum_price"),
          count(lit(1)).as("n_orders"))
    }),

    // Skew-safe SALTED equi-join (the join-side companion to
    // q13_salted_topk's agg-side salting): when one fact key is hot
    // enough that its shuffle partition exceeds an executor, AQE's skew
    // split only helps the sort — a single hot HASH partition still
    // lands on one task. The manual cure: the fact side salts each row
    // into one of `salts` deterministic sub-keys, the dimension side
    // replicates ×salts (a |dim|·salts explode — cheap when dim ≪
    // fact, the only regime where salting is ever needed), and the join
    // key becomes (key, salt), spreading every hot key over `salts`
    // tasks. hint("merge") pins the shuffle join so the demo cannot
    // degrade to a broadcast that hides the shape at test scale. The
    // oracle is the PLAIN unsalted join — salting must be invisible in
    // the result.
    "q24_salted_join" -> ((s, dir) => {
      val salts = 8
      val li = Tables.load(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_extendedprice"), col("l_discount"))
        .withColumn("_salt", pmod(phash64(
          concat(col("l_orderkey").cast("string"), lit(":"),
            col("l_linenumber").cast("string"))), lit(salts.toLong)))
      val o = Tables.load(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderpriority"))
        .withColumn("_salt", explode(
          sequence(lit(0L), lit(salts.toLong - 1))))
      li.join(o.hint("merge"),
          li("l_orderkey") === o("o_orderkey") && li("_salt") === o("_salt"))
        .groupBy(col("o_orderpriority"))
        .agg(revenueSum(col("l_extendedprice"), col("l_discount")).as("revenue"),
          count(lit(1)).as("n_items"))
    }),

    // Correlated scalar subqueries (TPC-H Q17's shape): lineitems under
    // 20% of their part's average quantity, for one brand. Written as
    // SQL so Catalyst's decorrelation does the heavy lifting — the two
    // correlated aggregates over l2 rewrite into ONE per-part aggregate
    // joined back on l_partkey (never a per-row re-scan; the naive
    // nested-loop reading is quadratic and unrunnable at 100 TB). The
    // avg comparison is cross-multiplied (5·cnt·qty < sum_qty) so both
    // engines compare exact integers/decimals instead of each other's
    // AVG rounding.
    "q25_scalar_subquery" -> ((s, dir) => {
      Tables.load(s, dir, "lineitem").createOrReplaceTempView("g_lineitem")
      Tables.load(s, dir, "part").createOrReplaceTempView("g_part")
      s.sql("""
        SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0
                 AS avg_yearly,
               COUNT(*) AS n_small
        FROM g_lineitem l JOIN g_part p ON p.p_partkey = l.l_partkey
        WHERE p.p_brand = 'Brand#23'
          AND 5 * (SELECT COUNT(*) FROM g_lineitem l2
                   WHERE l2.l_partkey = l.l_partkey)
                * CAST(l.l_quantity AS DECIMAL(18,2))
              < (SELECT SUM(CAST(l2.l_quantity AS DECIMAL(18,2)))
                 FROM g_lineitem l2 WHERE l2.l_partkey = l.l_partkey)
      """)
    }),

    // Z-order (Morton) clustering — the write-side data-layout operator
    // behind multi-column data skipping: interleaving the bits of
    // (l_partkey, l_suppkey) makes fixed-width z-ranges ("files") tight
    // in BOTH dimensions at once, so a 2-D box predicate prunes most of
    // them from min/max stats alone (a single-column sort is tight in
    // one dimension and useless in the other). The z-value is a pure
    // codegen'd projection and the bucket id a shift — assignment needs
    // NO sort and no shuffle at any scale (fixed-width cuts stand in
    // for repartitionByRange's sampled cuts, which aren't reproducible
    // across engines); the per-bucket stats are one partial aggregate.
    // Output per z-bucket: the min/max skipping stats, whether the
    // box query [64..127]×[4..7] overlaps them, and the true box
    // row count — buckets the stats exclude provably hold zero rows.
    "q26_zorder" -> ((s, dir) => {
      val inBox = col("l_partkey").between(boxPkLo, boxPkHi) &&
        col("l_suppkey").between(boxSkLo, boxSkHi)
      Tables.load(s, dir, "lineitem")
        .select(col("l_partkey"), col("l_suppkey"))
        .withColumn("zbucket",
          shiftright(zorderInterleave(col("l_partkey"), col("l_suppkey")), ZShift))
        .groupBy(col("zbucket"))
        .agg(count(lit(1)).as("n_rows"),
          min(col("l_partkey")).as("min_pk"), max(col("l_partkey")).as("max_pk"),
          min(col("l_suppkey")).as("min_sk"), max(col("l_suppkey")).as("max_sk"),
          sum(when(inBox, 1L).otherwise(0L)).as("n_box"))
        .withColumn("box_overlaps",
          col("max_pk") >= boxPkLo && col("min_pk") <= boxPkHi &&
            col("max_sk") >= boxSkLo && col("min_sk") <= boxSkHi)
    }),

    // Windowed DISTINCT count — Spark's window aggregates reject
    // DISTINCT, so the engine supplies the standard rewrite: dense_rank
    // over the value ordering, then max(dense_rank) over the bare
    // partition (both windows share ONE shuffle + sort on the partition
    // key — no join back, no second exchange). The oracle runs DuckDB's
    // NATIVE `COUNT(DISTINCT …) OVER`, so the rewrite is cross-checked
    // against a real distinct-window implementation, not against itself.
    "q27_window_distinct" -> ((s, dir) => {
      val byVal = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderpriority"))
      val part = Window.partitionBy(col("o_custkey"))
      Tables.load(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderpriority"))
        .withColumn("dr", dense_rank().over(byVal))
        .withColumn("n_priorities", max(col("dr")).over(part).cast("long"))
        .select(col("o_orderkey"), col("o_custkey"), col("n_priorities"))
    }),

    // Two-phase zone-map scan — the read side of q26's write-side
    // layout, i.e. how a lakehouse actually answers a 2-D box query:
    // phase 1 consults the per-bucket min/max INDEX (tiny — bounded by
    // the fixed z-bucket universe, collected exactly like any index
    // lookup) to find buckets the box can overlap; phase 2 scans ONLY
    // those buckets and applies the exact predicate. The output carries
    // the box aggregate plus scanned/total bucket counts — the pruning
    // ratio IS the result a layout engineer reads. Zone-map soundness
    // (no box row lives outside an overlapping bucket, so the two-phase
    // answer ≡ the direct scan) is the q26 golden.
    "q29_zonemap_scan" -> ((s, dir) => {
      val withZ = Tables.load(s, dir, "lineitem")
        .select(col("l_partkey"), col("l_suppkey"), col("l_extendedprice"))
        .withColumn("zbucket",
          shiftright(zorderInterleave(col("l_partkey"), col("l_suppkey")), ZShift))
        .localCheckpoint()
      val zm = withZ.groupBy(col("zbucket"))
        .agg(min(col("l_partkey")).as("min_pk"), max(col("l_partkey")).as("max_pk"),
          min(col("l_suppkey")).as("min_sk"), max(col("l_suppkey")).as("max_sk"))
        .localCheckpoint()
      val nTotal = zm.count()
      val hit = zm.filter(col("max_pk") >= boxPkLo && col("min_pk") <= boxPkHi &&
          col("max_sk") >= boxSkLo && col("min_sk") <= boxSkHi)
        .select(col("zbucket")).collect().map(_.getLong(0)).sorted
      withZ.filter(col("zbucket").isin(hit: _*))
        .filter(col("l_partkey").between(boxPkLo, boxPkHi) &&
          col("l_suppkey").between(boxSkLo, boxSkHi))
        .agg(count(lit(1)).as("n_rows_in_box"),
          moneySum(col("l_extendedprice")).as("box_revenue"))
        .select(col("n_rows_in_box"), col("box_revenue"),
          lit(hit.length.toLong).as("n_buckets_scanned"),
          lit(nTotal).as("n_buckets_total"))
    }),

    // Key-skew diagnostics — the operational pre-query behind every
    // salting decision (q13/q24 are the cure; this is the diagnosis):
    // per-key cardinalities in one map-side-combined aggregate, then the
    // top-5 heavy keys with their share of all rows and the global
    // key/row totals as plan literals. At 100 TB this is the ONLY safe
    // way to look at a join key before shuffling on it — the probe's
    // own shuffle carries |keys| rows, and the head is a TakeOrdered.
    "q28_skew_probe" -> ((s, dir) => {
      val counts = skewCounts(s, dir).localCheckpoint()
      val tot = counts.agg(sum(col("n")), count(lit(1))).head()
      val (nRows, nKeys) = (tot.getLong(0), tot.getLong(1))
      counts.orderBy(col("n").desc, col("user_id")).limit(5)
        .select(col("user_id"), col("n"),
          round(col("n").cast("double") * lit(100.0) / lit(nRows.toDouble), 4)
            .as("share_pct"),
          lit(nKeys).as("n_keys"), lit(nRows).as("total_rows"))
    }),

    // Sketch-based distinct counting — the 100 TB replacement for q7's
    // exact countDistinct: HyperLogLog++ partials merge map-side, so the
    // shuffle carries |groups| fixed-size sketches instead of every
    // distinct key. The sketch is approximate, so the oracle gate is an
    // ERROR BOUND, not the estimate itself: the query emits the exact
    // count plus a boolean attesting the sketch landed within 5% (2.5σ
    // at rsd=0.02); DuckDB's oracle emits the same exact count with the
    // boolean literally true. An HLL drift past the bound flips the
    // boolean and hash-diverges — the estimate is gated without asking
    // two engines' sketches to be bit-identical.
    "q19_approx_distinct" -> ((s, dir) => {
      Tables.load(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          countDistinct(col("l_partkey")).as("n_parts_exact"),
          approx_count_distinct(col("l_partkey"), 0.02).as("_est"))
        .select(col("l_returnflag"), col("n_parts_exact"),
          (abs(col("_est") - col("n_parts_exact")).cast("double") /
            col("n_parts_exact") <= 0.05).as("within_bound"))
    }),

    // The OTHER workhorse sketch: mergeable approximate quantiles
    // (percentile_approx), gated like q19 by an error bound instead of
    // sketch equality — but here the bound is on RANK, the quantity the
    // sketch actually guarantees (±1/accuracy of rank, not of value):
    // the 3-row-per-group sketch output is broadcast back against the
    // fact table and the observed CDF at each reported value must sit
    // within ±1% of its target quantile. Exact per-group quantiles
    // (q11's plan) need a full sort per group; the sketch needs one
    // map-side-mergeable pass — the difference between feasible and not
    // at 100 TB.
    "q20_approx_quantiles" -> ((s, dir) => {
      val li = Tables.load(s, dir, "lineitem")
        .select(col("l_returnflag"), col("l_extendedprice"))
      val sk = li.groupBy(col("l_returnflag"))
        .agg(percentile_approx(col("l_extendedprice"),
          array(lit(0.5), lit(0.9), lit(0.99)), lit(10000)).as("ap"))
      rankGate(li, sk, key = "l_returnflag", value = "l_extendedprice",
        qs = Seq(0.5, 0.9, 0.99), tol = 0.01)
    }),

    // Sequential conversion funnel (view → click within 24 h → purchase
    // within 24 h of the click) as a FORWARD CASCADE: each stage gated-
    // left-joins the next event arm onto the accumulated per-user frame
    // (the 24 h gate lives in the join condition, so non-converting
    // users survive with a null stage time) and re-aggregates to one
    // row per user. Nothing is referenced twice — the naive shape
    // (separate t1/t2/t3 joined at the end) re-derives t1 three times
    // and t2 twice, 6 scans / 7 exchanges; the cascade is 3 scans and
    // 4 exchanges (one per event arm + the single-row summary), every
    // join and re-aggregate running inside the user_id partitioning it
    // inherits (PlanAuditSpec pins this with broadcasts off, the
    // 100 TB shape). Pure µs integer arithmetic; one summary row.
    "q21_funnel" -> ((s, dir) => {
      val dayUs = 86400000000L
      val e = Tables.loadEventsNs(s, dir)
        .select(col("user_id"), col("event_type"), expr("ts DIV 1000").as("ts_us"))
      val f1 = e.filter(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("ts_us")).as("t1"))
      val clicks = e.filter(col("event_type") === "click")
        .select(col("user_id").as("c_uid"), col("ts_us").as("c_ts"))
      val f2 = f1.join(clicks,
          col("user_id") === col("c_uid") &&
            col("c_ts") > col("t1") && col("c_ts") <= col("t1") + dayUs,
          "left_outer")
        .groupBy(col("user_id"))
        .agg(min(col("t1")).as("t1"), min(col("c_ts")).as("t2"))
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("user_id").as("p_uid"), col("ts_us").as("p_ts"))
      f2.join(purchases,
          col("user_id") === col("p_uid") &&
            col("p_ts") > col("t2") && col("p_ts") <= col("t2") + dayUs,
          "left_outer")
        .groupBy(col("user_id"))
        .agg(min(col("t1")).as("t1"), min(col("t2")).as("t2"),
          min(col("p_ts")).as("t3"))
        .agg(count(col("t1")).as("n_view"),
          count(col("t2")).as("n_click_24h"),
          count(col("t3")).as("n_purchase_24h"))
    }),

    // Weekly cohort retention: users grouped by first-active week, the
    // classic retention triangle as (cohort_week, offset, n_users). The
    // distinct (user, week) activity set and the per-user first week
    // share the user_id partitioning; the final small aggregate is the
    // only extra exchange.
    "q22_retention" -> ((s, dir) => {
      val act = Tables.loadEventsNs(s, dir)
        .select(col("user_id"),
          expr("(ts DIV 1000) DIV 604800000000").as("wk")) // integer floor, µs → week
        .distinct()
      val first = act.groupBy(col("user_id")).agg(min(col("wk")).as("cohort_week"))
      act.join(first, Seq("user_id"))
        .groupBy(col("cohort_week"), (col("wk") - col("cohort_week")).as("week_offset"))
        .agg(count(lit(1)).as("n_users"))
    }),

    // Co-located join via bucketing — THE shuffle eliminator for a fact
    // join repeated at 100 TB: both tables are bucketed (and sorted) on
    // the join key, so the SortMergeJoin consumes the buckets directly
    // and the ONLY exchange in the plan is the final small aggregate's
    // (PlanAuditSpec pins that). The bucketed copies stand in for how
    // the tables would be laid out at rest on a cluster.
    "q12_bucketed_join" -> ((s, dir) => {
      val dirTag = dir.replaceAll("[^a-zA-Z0-9]", "_")
      def bucketed(table: String, key: String): String = {
        // dataset-scoped NAME, not just path: a fixed name would keep
        // pointing at the last dir it was built for, silently serving
        // dir B's data to a dir A run that passes the path/_SUCCESS check.
        // The FILES are a shared cross-JVM cache (Work.staged); a fresh
        // JVM re-registers the bucketed external table over them instead
        // of re-bucketing the base table.
        val name = s"g_${table}_b" + dirTag
        val path = graft.Work.staged(s, s"bucketed_$dirTag/$table") { tmp =>
          val tmpName = name + "_stage"
          s.sql(s"DROP TABLE IF EXISTS $tmpName")
          Tables.load(s, dir, table).write
            .bucketBy(8, key).sortBy(key)
            .option("path", tmp).saveAsTable(tmpName)
          // external table: dropping the registration keeps the files
          s.sql(s"DROP TABLE IF EXISTS $tmpName")
        }
        if (!s.catalog.tableExists(name)) {
          val ddl = Tables.load(s, dir, table).schema.toDDL
          s.sql(s"CREATE TABLE $name ($ddl) USING parquet " +
            s"CLUSTERED BY ($key) SORTED BY ($key) INTO 8 BUCKETS " +
            s"LOCATION '$path'")
        }
        name
      }
      val o = s.table(bucketed("orders", "o_orderkey"))
      val l = s.table(bucketed("lineitem", "l_orderkey"))
      o.filter(col("o_orderdate") >= lit("1995-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1996-01-01").cast("timestamp"))
        .join(l, col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(revenueSum(col("l_extendedprice"), col("l_discount")).as("revenue"),
          count(lit(1)).as("n_items"))
    }),

    // Dynamic partition pruning — THE scan-cost lever for a partitioned
    // 100 TB fact table: the fact (lineitem staged partitioned by ship
    // month) joins a month dimension filtered on year, and Catalyst
    // injects the dim's qualifying partition keys as a runtime IN-subquery
    // on the fact's PARTITION column, so only ~12 of ~84 month partitions
    // are read — the scan never touches the other years' files. The plan
    // gate (PlanAuditSpec) asserts `dynamicpruning` reached the fact scan;
    // the oracle pins the joined aggregate. The staged fact is a SHARED
    // cross-JVM cache (Work.staged — atomic-rename staging, so fresh
    // bench/suite JVMs reuse it instead of re-partitioning 84 months).
    "q30_dpp" -> ((s, dir) => {
      val path = graft.Work.staged(s,
        "dpp_" + dir.replaceAll("[^a-zA-Z0-9]", "_") + "/lineitem_bymonth") { tmp =>
        Tables.load(s, dir, "lineitem")
          .withColumn("ship_month", date_format(col("l_shipdate"), "yyyy-MM"))
          .repartition(col("ship_month")) // one writer per month, not 84 files per task
          .write.partitionBy("ship_month").parquet(tmp)
      }
      val fact = s.read.parquet(path)
      val months = fact.select(col("ship_month")).distinct()
        .withColumn("year", substring(col("ship_month"), 1, 4))
      fact.join(months.filter(col("year") === "1995"), Seq("ship_month"))
        .groupBy(col("ship_month"))
        .agg(count(lit(1)).as("n_items"), moneySum(col("l_quantity")).as("sum_qty"))
    }),

    // Runtime-filter join reduction, the algebra made explicit: a Bloom
    // filter built from the SELECTIVE side's join keys (urgent orders)
    // prunes the probe side BEFORE the join — at 100 TB the win is that
    // only might-match fact rows reach the join exchange (Spark's own
    // `runtime.bloomFilter` injects exactly this shape when thresholds
    // warrant; building it relationally keeps the bit array engine-
    // portable and the FP accounting observable). The filter is key-
    // level: distinct probe keys bloom-test once (3 salted positions,
    // all-set = might-contain) and a semi-join carries the verdict back
    // to the fact rows; the small 8192-bit array broadcasts. Sections:
    // the exact join aggregate (correctness unaffected by the lossy
    // pre-filter — Bloom has no false negatives) and the reduction
    // counters (probe rows, bloom-passed rows, truly matching rows —
    // passed − matched = the false-pass cost of the 8 K bits).
    "q31_bloom_join" -> ((s, dir) => {
      val bloomBits = 8192L
      val salts = Seq((40503L, 31161L), (34283L, 51831L), (49842L, 44605L))
      def h(k: Column): Column = pmod(phash64(k.cast("string")), lit(4294967296L))
      def positions(hc: Column): Column = array(salts.map { case (a, b) =>
        pmod(hc * lit(a) + lit(b), lit(bloomBits)) }: _*)
      val o = Tables.load(s, dir, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey"))
      val bitsSet = o.select(explode(positions(h(col("o_orderkey")))).as("pos")).distinct()
      val li = Tables.load(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_returnflag"),
          col("l_extendedprice"), col("l_discount"))
      val passed = li.select(col("l_orderkey")).distinct()
        .select(col("l_orderkey"), explode(positions(h(col("l_orderkey")))).as("pos"))
        .join(broadcast(bitsSet), Seq("pos"))
        .groupBy(col("l_orderkey")).agg(count(lit(1)).as("n_set"))
        .filter(col("n_set") === salts.length)
        .select(col("l_orderkey"))
      val reduced = li.join(passed, Seq("l_orderkey"), "left_semi").localCheckpoint()
      val joined = reduced.join(o, col("l_orderkey") === col("o_orderkey"))
        .localCheckpoint()
      val agg = joined.groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          revenueSum(col("l_extendedprice"), col("l_discount")).as("v"))
        .select(lit("agg").as("section"), col("l_returnflag").as("k"),
          col("n"), col("v"))
      def stat(name: String, df: DataFrame): DataFrame =
        df.agg(count(lit(1)).as("n"))
          .select(lit("stats").as("section"), lit(name).as("k"), col("n"),
            lit(0.0).as("v"))
      agg.unionByName(stat("probe_rows", li))
        .unionByName(stat("passed_bloom", reduced))
        .unionByName(stat("matched", joined))
    }),

    // Interval-overlap sweep — "how many sessions are concurrently open
    // at each moment" — WITHOUT the naive range self-join (quadratic in
    // overlaps): each session contributes ±1 endpoint deltas, deltas
    // collapse per timestamp (tie-order independence), and the running
    // total is a TWO-PHASE distributed prefix sum — per-day-bucket local
    // windows plus a broadcast of cumulated bucket offsets — so no
    // single-partition global sort ever sees the timeline. The sweep
    // input is the session table (already ~|events|/sessions smaller);
    // output: the top-10 most concurrent moments.
    "q32_concurrency" -> ((s, dir) => {
      val gapUs = 1800000000L
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val sess = Tables.loadEventsNs(s, dir)
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
      prefixSum(deltas, col("net_delta"), col("ts"),
          expr("ts DIV 86400000000"), "concurrency")
        .orderBy(col("concurrency").desc, col("ts")).limit(10)
        .select(col("ts"), col("net_delta"), col("concurrency"))
    }),

    // Multi-touch ATTRIBUTION — the marketing-analytics allocation every
    // event warehouse runs: each purchase splits exactly 1,000,000 ppm
    // of credit equally across the user's clicks in the trailing
    // 24-hour window (integer division, remainder to the LAST touch so
    // credits sum exactly; no-touch purchases convert 'direct' at full
    // credit). The user×time pairing is the q15 binned-range-join shape
    // WITH the user in the equi-key (clicks of other users never enter
    // the join), window membership one-sided-filtered on the pair; the
    // per-purchase rank/count windows run over the attribution pairs —
    // bounded by clicks-per-window, never the corpus.
    "q34_attribution" -> ((s, dir) => {
      val winUs = 86400000000L
      val e = Tables.loadEventsNs(s, dir)
        .select(col("event_id"), expr("ts DIV 1000").as("ts"),
          col("user_id"), col("event_type"))
      val p = e.filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_event"), col("user_id"),
          col("ts").as("p_ts"))
      val c = e.filter(col("event_type") === "click")
        .select(col("event_id").as("click_event"), col("user_id"),
          col("ts").as("c_ts"))
      val lp = p.withColumn("_bin", explode(sequence(
        expr(s"(p_ts - ${winUs}L) DIV ${winUs}L"), expr(s"p_ts DIV ${winUs}L"))))
      val rc = c.withColumn("_bin", expr(s"c_ts DIV ${winUs}L"))
      val pairs = lp.join(rc, Seq("user_id", "_bin"))
        .filter(col("c_ts") <= col("p_ts") && col("c_ts") > col("p_ts") - winUs)
        .drop("_bin")
      val wSeq = Window.partitionBy(col("purchase_event"))
        .orderBy(col("c_ts"), col("click_event"))
      val attributed = pairs
        .withColumn("touch_seq", row_number().over(wSeq).cast("long"))
        .withColumn("n_touch", count(lit(1))
          .over(Window.partitionBy(col("purchase_event"))))
        .withColumn("credit_ppm", expr(
          """CASE WHEN touch_seq = n_touch
             THEN 1000000 - (n_touch - 1) * (1000000 DIV n_touch)
             ELSE 1000000 DIV n_touch END"""))
        .select(col("purchase_event"), col("user_id"), col("p_ts"),
          col("click_event"), col("touch_seq"), col("n_touch"),
          col("credit_ppm"))
      val direct = p.join(pairs.select(col("purchase_event")).distinct(),
          Seq("purchase_event"), "left_anti")
        .select(col("purchase_event"), col("user_id"), col("p_ts"),
          lit(null).cast("long").as("click_event"),
          lit(0L).as("touch_seq"), lit(0L).as("n_touch"),
          lit(1000000L).as("credit_ppm"))
      attributed.unionByName(direct)
    }),

    // Time-weighted aggregation over an irregular series — the financial/
    // IoT average where each observation holds until the next one (a
    // plain AVG over irregular samples over-weights bursts): per
    // event_type, Σ value·holding-duration as exact integer
    // cents·µs (bounded: max cents ~5.6e4 × max span ~e12 µs ≪ 2^63),
    // one lead() window on the (type, ts) exchange — no densification,
    // no resampling join. The TWA itself is the consumer's quotient of
    // two exact integers.
    "q33_time_weighted" -> ((s, dir) => {
      val w = Window.partitionBy(col("event_type"))
        .orderBy(col("ts_us"), col("event_id"))
      Tables.loadEventsNs(s, dir)
        .select(col("event_id"), col("event_type"),
          expr("ts DIV 1000").as("ts_us"),
          expr("cast(round(value * 100) as bigint)").as("cents"))
        .withColumn("hold_us", lead(col("ts_us"), 1).over(w) - col("ts_us"))
        .filter(col("hold_us").isNotNull) // the last observation holds 0
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_obs"),
          sum(col("cents") * col("hold_us")).as("weighted_cents_us"),
          sum(col("hold_us")).as("span_us"),
          min(col("ts_us")).as("t_first"), max(col("ts_us")).as("t_last"))
    }),

    // Weighted PAGERANK over the customer↔supplier purchase graph — the
    // iterative link-analysis class (PageRank / importance propagation) a
    // corpus-curation or entity-graph pipeline runs on Spark as K rounds
    // of join + partial-aggregatable groupBy (the Pregel-lite shape; no
    // GraphX, no driver-side adjacency). Edge weight = lineitem count
    // between the pair, both directions; rank is integer ppm with
    // floor division at every step, so the fixpoint prefix is
    // deterministic and order-independent — the oracle unrolls the SAME
    // three rounds as CTEs. Damping 85/100, teleport 150000 ppm.
    "q35_pagerank" -> ((s, dir) => {
      val o = Tables.load(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"))
      val li = Tables.load(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_suppkey"))
      val cs = li.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_custkey").as("cust"), col("l_suppkey").as("supp"))
        .agg(count(lit(1)).as("w"))
      val edges = cs.select(concat(lit("c"), col("cust")).as("src"),
          concat(lit("s"), col("supp")).as("dst"), col("w"))
        .unionByName(cs.select(concat(lit("s"), col("supp")).as("src"),
          concat(lit("c"), col("cust")).as("dst"), col("w")))
      pageRank(edges, iters = 3)
    }),

    // INCREMENTAL CUBE maintenance — the reason a 100 TB warehouse can
    // keep a materialized CUBE current: every cube cell is an additive
    // (count, sum) pair, so absorbing a delta batch is cube(Δ) unioned
    // onto the STANDING cube and re-summed per (grouping_id, keys) — the
    // re-aggregate touches only cube CELLS (|types|·|buckets| rows, ~66
    // here), never the base fact rows. The standing cube is built from
    // the pre-cutoff slice, the delta cube from the post-cutoff slice;
    // the oracle is one full CUBE over base ∪ delta — the gate proves
    // merge ≡ recompute. grouping_id travels through the merge so a
    // rolled-up NULL can never collide with a data NULL.
    "q36_cube_incr" -> ((s, dir) => {
      val cutNs = 1705795200000000000L // 2024-01-21T00:00:00Z
      val e = Tables.loadEventsNs(s, dir)
        .select(col("ts"), col("event_type"),
          (col("user_id") % 10).as("user_bucket"),
          expr("cast(round(value * 100) as bigint)").as("cents"))
      def cubed(df: DataFrame): DataFrame = df
        .cube(col("event_type"), col("user_bucket"))
        .agg(grouping_id().as("gid"), count(lit(1)).as("n"),
          sum(col("cents")).as("sum_cents"))
      cubed(e.filter(col("ts") < cutNs))          // standing view V₀
        .unionByName(cubed(e.filter(col("ts") >= cutNs))) // cube(Δ) only
        .groupBy(col("gid"), col("event_type"), col("user_bucket"))
        .agg(sum(col("n")).as("n"), sum(col("sum_cents")).as("sum_cents"))
    }),

    // Bitmap-index segment intersection — the OLAP accelerator for
    // audience/segment overlap: per (event_type, 63-user word) one LONG
    // holds the presence bitmap (bit_or collapses map-side and is
    // idempotent under duplicate events), so "users who did A and B"
    // is Σ bit_count(a & b) over an equi-join on the word id — set
    // algebra at 63 users per long (bit 63 stays clear: a 1 << 63 is an
    // overflow ERROR in engines that check, and the sign bit buys
    // nothing), never a distinct-user self-join.
    // n_either comes from inclusion-exclusion (n_a + n_b − n_both), so
    // no outer join over the word domain is needed. Bitmaps are
    // mergeable across partitions/corpora like the q37 sketches, but
    // EXACT.
    // Bounded-depth BFS REACHABILITY over the (sparse: l_quantity ≥ 48)
    // customer↔supplier purchase graph — the supply-chain blast-radius
    // question ("everything within 3 hops of these accounts"), and the
    // third iterative-graph shape next to q35's Pregel-lite PageRank and
    // the dedup family's min-label fixpoint: a BFS FRONTIER expansion
    // where each level is one equi-join of the frontier against the edge
    // table plus one anti-join against the visited set (first-seen level
    // is deterministic by construction — BFS visits a node at its
    // minimum distance). The graph stays BIPARTITE end to end: levels
    // alternate node types and traversal is always an equi-join on the
    // edge key — the co-purchase projection (customers sharing a
    // supplier), which goes quadratic in a supplier's degree at corpus
    // scale, is never materialized. Oracle: the same four levels as
    // set-difference CTEs.
    "q42_reachability" -> ((s, dir) => {
      val edges = Tables.load(s, dir, "orders")
        .join(Tables.load(s, dir, "lineitem").filter(col("l_quantity") >= 48),
          col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("c"), col("l_suppkey").as("s"))
        .distinct().localCheckpoint() // one edge scan feeds all four levels
      val c0 = edges.filter(col("c") < 10).select(col("c")).distinct()
        .localCheckpoint()
      val s1 = edges.join(c0, Seq("c")).select(col("s")).distinct()
        .localCheckpoint()
      val c2 = edges.join(s1, Seq("s")).select(col("c")).distinct()
        .join(c0, Seq("c"), "left_anti").localCheckpoint()
      val s3 = edges.join(c2, Seq("c")).select(col("s")).distinct()
        .join(s1, Seq("s"), "left_anti")
      def lvl(df: DataFrame, tpe: String, idCol: String, l: Int): DataFrame =
        df.select(lit(tpe).as("node_type"), col(idCol).as("node_id"),
          lit(l.toLong).as("level"))
      lvl(c0, "customer", "c", 0).unionByName(lvl(s1, "supplier", "s", 1))
        .unionByName(lvl(c2, "customer", "c", 2))
        .unionByName(lvl(s3, "supplier", "s", 3))
    }),

    // Declarative DATA-QUALITY EXPECTATIONS (the Great-Expectations /
    // dbt-tests surface a production pipeline gates loads on): a rule
    // table of uniqueness / not-null / range / referential-integrity
    // checks evaluated as ONE conditional-aggregate scan per table plus
    // one anti-join count per foreign key, reported as (rule, checked,
    // violations, pass). The corpus is deterministically DIRTIED first
    // (nulled FK for o_orderkey % 97, negated price % 103, orphaned
    // lineitems % 101) so the checks MEASURE planted rates instead of
    // vacuously passing on clean synthetic data — the oracle replays the
    // same derivation closed-form, so a check that over- or under-counts
    // hash-diverges. Scale shape: rule evaluation never adds passes —
    // each table's rules share its single scan (struct-array explode off
    // a 1-row aggregate), referential checks are the audited anti-join,
    // and the report is |rules| rows.
    "q41_dq_expectations" -> ((s, dir) => {
      val ord = Tables.load(s, dir, "orders")
        .withColumn("o_custkey", when(col("o_orderkey") % 97 === 0,
          lit(null).cast("long")).otherwise(col("o_custkey")))
        .withColumn("o_totalprice", when(col("o_orderkey") % 103 === 0,
          -col("o_totalprice")).otherwise(col("o_totalprice")))
        .localCheckpoint()
      val li = Tables.load(s, dir, "lineitem")
        .withColumn("l_orderkey",
          when(col("l_orderkey") % 101 === 0 && col("l_linenumber") === 1,
            col("l_orderkey") + lit(1000000007L)).otherwise(col("l_orderkey")))
        .localCheckpoint()
      val cust = Tables.load(s, dir, "customer")
      def rows(agg: DataFrame, rules: Seq[(String, Column, Column)]): DataFrame =
        agg.select(explode(array(rules.map { case (name, checked, viol) =>
            struct(lit(name).as("rule"), checked.as("n_checked"),
              viol.as("n_violations"))
          }: _*)).as("r"))
          .select(col("r.rule"), col("r.n_checked"), col("r.n_violations"))
      val ordRules = rows(
        ord.agg(count(lit(1)).as("n"), countDistinct(col("o_orderkey")).as("nd"),
          sum(col("o_custkey").isNull.cast("long")).as("nulls"),
          sum((col("o_totalprice") <= 0).cast("long")).as("nonpos")),
        Seq(("orders_pk_unique", col("n"), col("n") - col("nd")),
          ("orders_custkey_not_null", col("n"), col("nulls")),
          ("orders_price_positive", col("n"), col("nonpos"))))
      val liRules = rows(
        li.agg(count(lit(1)).as("n"),
          sum((col("l_quantity") < 1 || col("l_quantity") > 50).cast("long"))
            .as("oob")),
        Seq(("lineitem_qty_in_1_50", col("n"), col("oob"))))
      val custRules = rows(
        cust.agg(count(lit(1)).as("n"), countDistinct(col("c_custkey")).as("nd")),
        Seq(("customer_pk_unique", col("n"), col("n") - col("nd"))))
      val liFk = rows(
        li.agg(count(lit(1)).as("n")).crossJoin(
          li.join(ord.select(col("o_orderkey").as("l_orderkey")).distinct(),
            Seq("l_orderkey"), "left_anti")
            .agg(count(lit(1)).as("orphans"))),
        Seq(("lineitem_fk_orders", col("n"), col("orphans"))))
      val ordFk = rows(
        ord.filter(col("o_custkey").isNotNull).agg(count(lit(1)).as("n"))
          .crossJoin(ord.filter(col("o_custkey").isNotNull)
            .join(cust.select(col("c_custkey").as("o_custkey")).distinct(),
              Seq("o_custkey"), "left_anti")
            .agg(count(lit(1)).as("orphans"))),
        Seq(("orders_fk_customer", col("n"), col("orphans"))))
      ordRules.unionByName(liRules).unionByName(custRules)
        .unionByName(liFk).unionByName(ordFk)
        .withColumn("pass",
          when(col("n_violations") === 0, "pass").otherwise("fail"))
    }),

    "q40_bitmap_segments" -> ((s, dir) => {
      val b = Tables.loadEventsNs(s, dir)
        .select(col("event_type"), expr("user_id DIV 63").as("w"),
          expr("shiftleft(1L, cast(user_id % 63 as int))").as("bit"))
        .groupBy(col("event_type"), col("w"))
        .agg(expr("bit_or(bit)").as("bits"))
      val counts = b.groupBy(col("event_type"))
        .agg(sum(expr("bit_count(bits)")).as("n"))
      val a2 = b.select(col("event_type").as("type_a"), col("w"),
        col("bits").as("ba"))
      val b2 = b.select(col("event_type").as("type_b"), col("w").as("w2"),
        col("bits").as("bb"))
      a2.join(b2, col("w") === col("w2") && col("type_a") < col("type_b"))
        .groupBy(col("type_a"), col("type_b"))
        .agg(sum(expr("bit_count(ba & bb)")).as("n_both"))
        .join(counts.select(col("event_type").as("type_a"), col("n").as("n_a")),
          Seq("type_a"))
        .join(counts.select(col("event_type").as("type_b"), col("n").as("n_b")),
          Seq("type_b"))
        .select(col("type_a"), col("type_b"), col("n_a"), col("n_b"),
          col("n_both"),
          (col("n_a") + col("n_b") - col("n_both")).as("n_either"))
    }),

    // Forward-fill gap repair — the time-series staple: a reading whose
    // measurement is missing (here: 'error' events stand in for failed
    // reads) carries the key's LAST good value forward. One
    // last(ignoreNulls) over the per-user ordered frame — linear inside
    // the user partitioning, no self-join, no as-of probe per gap; rows
    // before any good reading stay null and are counted as unfillable.
    "q39_forward_fill" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_us"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.loadEventsNs(s, dir)
        .select(col("user_id"), col("event_id"), expr("ts DIV 1000").as("ts_us"),
          when(col("event_type") =!= "error",
            expr("cast(round(value * 100) as bigint)")).as("cents"))
        .withColumn("filled", last(col("cents"), ignoreNulls = true).over(w))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_rows"),
          sum(col("cents").isNull.cast("long")).as("n_gaps"),
          sum((col("cents").isNull && col("filled").isNotNull).cast("long"))
            .as("n_filled"),
          sum(coalesce(col("filled"), lit(0L))).as("sum_filled_cents"))
    }),

    // Semi-additive roll-up — the balance/inventory measure class: value
    // is additive across USERS but not across TIME, so the roll-up is
    // "sum over users of each user's LAST observation", never a plain
    // SUM. Shape: one struct-argmax per (user, type) — a map-side-
    // mergeable aggregate, no per-user window sort — then a |users×types|-
    // row re-aggregate; both stages collapse before anything shuffles
    // wide. Ties on ts break by event_id through the struct ordering.
    "q38_semi_additive" -> ((s, dir) => {
      val e = Tables.loadEventsNs(s, dir)
        .select(col("user_id"), col("event_type"),
          expr("ts DIV 1000").as("ts_us"), col("event_id"),
          expr("cast(round(value * 100) as bigint)").as("cents"))
      e.groupBy(col("user_id"), col("event_type"))
        .agg(max(struct(col("ts_us"), col("event_id"), col("cents"))).as("last"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_users"),
          sum(col("last.cents")).as("sum_last_cents"))
    }),

    // Conversation packing — the SFT data-prep shape: gap-sessionized
    // event streams become ordered multi-turn training rows (turn
    // sequence, context-window truncation at 16 turns, per-example value
    // budget). Sessionization is q10's two-window pass inside the
    // user_id partitioning; the per-session collect_list is bounded by
    // the session gap (state = one open session per user, never the
    // user's history), and the array_sort runs on that bounded list —
    // the md5-free analogue of text_pack's deterministic packing.
    "pipe_conversation_pack" -> ((s, dir) => {
      val gapUs = 1800000000L // 30 min
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val e = Tables.loadEventsNs(s, dir)
        .select(col("user_id"), col("event_id"), expr("ts DIV 1000").as("ts"),
          col("event_type"), expr("cast(round(value * 100) as bigint)").as("cents"))
        .withColumn("new_sess",
          when(lag(col("ts"), 1).over(w).isNull ||
            col("ts") - lag(col("ts"), 1).over(w) > gapUs, 1).otherwise(0))
        .withColumn("sess_seq", sum(col("new_sess")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      e.groupBy(col("user_id"), col("sess_seq"))
        .agg(count(lit(1)).as("n_turns_total"),
          array_sort(collect_list(struct(col("ts"), col("event_id"),
            col("event_type"), col("cents")))).as("arr"))
        .select(col("user_id"), col("sess_seq").cast("long").as("sess_seq"),
          col("n_turns_total"),
          least(col("n_turns_total"), lit(16L)).as("n_turns_kept"),
          array_join(transform(slice(col("arr"), 1, 16),
            x => x.getField("event_type")), "|").as("turns"),
          aggregate(slice(col("arr"), 1, 16), lit(0L),
            (acc, x) => acc + x.getField("cents")).as("kept_cents"))
    }),

    // Mergeable-sketch set cardinality — the 100 TB distinct-count
    // workflow: each day builds its own HLL sketch ONCE (one map-side-
    // mergeable pass, like q19/q20's sketches), and every downstream
    // consumer answers "distinct users over any day range" by UNIONING
    // sketches — never rescanning the facts. The gate attests the union
    // estimate against the exact month-wide distinct (HLL++ at
    // lgConfigK=12 is well inside 5%), plus the exact per-day counts the
    // sketches were built from; a sketch that lost members or a union
    // that double-collapsed days flips within_bound.
    "q37_sketch_union" -> ((s, dir) => {
      val e = Tables.loadEventsNs(s, dir)
        .select(expr("ts DIV 86400000000000").as("day"), col("user_id"))
      val daily = e.groupBy(col("day"))
        .agg(hll_sketch_agg(col("user_id"), lit(12)).as("sk"),
          countDistinct(col("user_id")).as("n_exact"))
      val merged = daily.agg(
        hll_sketch_estimate(hll_union_agg(col("sk"))).as("_est"),
        sum(col("n_exact")).as("sum_daily_exact"))
      val exact = e.agg(countDistinct(col("user_id")).as("n_users_exact"))
      exact.crossJoin(merged)
        .select(col("n_users_exact"), col("sum_daily_exact"),
          (abs(col("_est") - col("n_users_exact")).cast("double") /
            col("n_users_exact") <= 0.05).as("within_bound"))
    })
  )

  /** Rank-accuracy attestation for a per-key quantile sketch (see
    * `q20_approx_quantiles`): `sketch` carries one row per key with an
    * `ap` array of claimed quantile values aligned with `qs`; the gate
    * broadcasts it back against the fact table and checks the OBSERVED
    * CDF at each claimed value sits within `tol` of its target quantile
    * — the rank guarantee the sketch actually makes. Output per key:
    * (key, n_rows, within_bound). A claimed value at the wrong rank
    * flips `within_bound` (negative-control golden in
    * RelationalJoinSpec).
    */
  def rankGate(fact: DataFrame, sketch: DataFrame, key: String, value: String,
               qs: Seq[Double], tol: Double): DataFrame = {
    val fracs = qs.indices.map(i =>
      (sum(when(col(value) <= col("ap")(i), 1L).otherwise(0L)).cast("double") /
        count(lit(1))).as(s"_f$i"))
    val ok = qs.indices.map(i => abs(col(s"_f$i") - qs(i)) <= tol).reduce(_ && _)
    fact.join(broadcast(sketch), Seq(key))
      .groupBy(col(key))
      .agg(count(lit(1)).as("n_rows"), fracs: _*)
      .select(col(key), col("n_rows"), ok.as("within_bound"))
  }

  /** Skew-safe top-k per key, two-phase (see `q13_salted_topk`): phase 1
    * ranks within (key, salt) and keeps each salt's local top-k — every
    * global top-k row ranks ≤ k inside its own salt bucket, so nothing
    * the final phase needs is lost; phase 2 ranks the ≤ k·salts
    * survivors per key. Ordering (price desc, l_orderkey, l_linenumber)
    * is total, so the result is exactly the one-window plan's. The salt
    * is a deterministic hash of the row key — NOT a random number, which
    * would unpin retries and oracles.
    */
  def saltedTopK(df: DataFrame, keyCol: String, k: Int, salts: Int): DataFrame = {
    val ord = Seq(col("price").desc, col("l_orderkey").asc, col("l_linenumber").asc)
    val w1 = Window.partitionBy(col(keyCol), col("salt")).orderBy(ord: _*)
    val w2 = Window.partitionBy(col(keyCol)).orderBy(ord: _*)
    df.withColumn("salt", pmod(phash64(col("l_orderkey").cast("string")), lit(salts)))
      .withColumn("rn1", row_number().over(w1))
      .filter(col("rn1") <= k)
      .withColumn("rank", row_number().over(w2).cast("long"))
      .filter(col("rank") <= k)
      .select(col(keyCol), col("l_orderkey"), col("l_linenumber"),
        col("price"), col("rank"))
  }

  /** As-of join: for each left row, the single latest right row with
    * `right.ts <= left.ts` on the same `key`, no further back than
    * `tolUs`. Implemented as union+window instead of a join: tag sides,
    * sort each key partition by (ts, side, id) — side 0 = right, so an
    * equal-ts right row sorts BEFORE the left row it may serve — and a
    * running `last(..., ignoreNulls)` carries the latest right payload
    * forward to every left row. One exchange on `key`, per-task work
    * linear in partition size; the tie-break on `id` makes the match
    * deterministic when right rows share a timestamp (largest id wins).
    * Payload columns must exist only on the right side; matches older
    * than `tolUs` are nulled, left rows are never dropped (left-outer
    * as-of, pandas `merge_asof` semantics).
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String, ts: String,
               id: String, payload: Seq[String], tolUs: Long): DataFrame = {
    val u = left.withColumn("_side", lit(1))
      .unionByName(right.withColumn("_side", lit(0)), allowMissingColumns = true)
    val w = Window.partitionBy(col(key))
      .orderBy(col(ts), col("_side"), col(id))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = payload.foldLeft(
      u.withColumn("_asof_ts",
        last(when(col("_side") === 0, col(ts)), ignoreNulls = true).over(w))) {
      (d, p) => d.withColumn(p,
        last(when(col("_side") === 0, col(p)), ignoreNulls = true).over(w))
    }
    val ok = col(ts) - col("_asof_ts") <= tolUs // null-safe: no match => null => filtered by when()
    val gated = payload.foldLeft(
      carried.withColumn("asof_gap_us", when(ok, col(ts) - col("_asof_ts")))) {
      (d, p) => d.withColumn(p, when(ok, col(p)))
    }
    gated.filter(col("_side") === 1).drop("_side", "_asof_ts")
  }

  /** Keyless interval join, |left.ts - right.ts| <= radiusUs, as a binned
    * equi-join (see `q15_range_join`). Bin width = radius, so every
    * qualifying right row lives in one of the probe's 2-3 candidate bins;
    * the right side is never exploded, so no post-join dedup is needed.
    * Returns the joined pairs (all left + right columns); callers
    * aggregate. `DIV` truncation = floor for the non-negative epoch
    * timestamps this operates on.
    */
  def binnedRangeJoin(left: DataFrame, right: DataFrame,
                      leftTs: String, rightTs: String, radiusUs: Long): DataFrame = {
    val l = left.withColumn("_bin", explode(sequence(
      expr(s"($leftTs - ${radiusUs}L) DIV ${radiusUs}L"),
      expr(s"($leftTs + ${radiusUs}L) DIV ${radiusUs}L"))))
    val r = right.withColumn("_bin", expr(s"$rightTs DIV ${radiusUs}L"))
    l.join(r, l("_bin") === r("_bin") &&
        abs(col(rightTs) - col(leftTs)) <= radiusUs)
      .drop("_bin")
  }

  /** The z-order layout's shared constants: bucket shift and the golden
    * 2-D box — ONE definition feeds both Spark builders (q26 write side,
    * q29 read side) and both oracles, so the write/read pairing cannot
    * drift apart.
    */
  private val ZShift = 12
  private val (boxPkLo, boxPkHi) = (64, 127)
  private val (boxSkLo, boxSkHi) = (4, 7)

  /** DuckDB mirror of [[zorderInterleave]] (parenthesized sum). */
  /** TWO-PHASE distributed prefix sum — the shared packer primitive
    * (`q32_concurrency`'s shape, factored): an inclusive running sum of
    * `value` in global `order` order WITHOUT a single-partition window
    * over the rows. Phase 1 runs local windows per `bucket` (any
    * monotone coarsening of `order` — a day, an ingest-shard prefix, an
    * id range); phase 2 cumulates the per-bucket totals (a window over
    * |buckets| rows, never the data) and broadcasts each bucket's
    * exclusive offset back onto the local sums. At 100 TB the only
    * global structure is the bucket-total table.
    *
    * `order` must be unique per row within a bucket (or `value` constant
    * across ties) for the row-level sums to be well-defined.
    */
  def prefixSum(df: DataFrame, value: Column, order: Column, bucket: Column,
      out: String = "prefix_sum"): DataFrame = {
    val b = df.withColumn("_ps_bkt", bucket)
    val local = b.withColumn(out, sum(value).over(
      Window.partitionBy(col("_ps_bkt")).orderBy(order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val offs = b.groupBy(col("_ps_bkt")).agg(sum(value).as("_ps_total"))
      .withColumn("_ps_off", coalesce(sum(col("_ps_total")).over(
        Window.orderBy(col("_ps_bkt"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("_ps_bkt"), col("_ps_off"))
    local.join(broadcast(offs), Seq("_ps_bkt"))
      .withColumn(out, col(out) + col("_ps_off"))
      .drop("_ps_bkt", "_ps_off")
  }

  /** Fixed-iteration weighted PageRank in integer ppm — K rounds of the
    * Pregel-lite Spark shape: join(rank ⋈ edges on src) then
    * groupBy(dst) sum, both hash-partitioned on the SAME key family so
    * AQE reuses the exchange layout; the edge table (with its out-weight
    * attached once) is lineage-cut a single time and re-joined each
    * round, and each round's rank table is lineage-cut so the plan never
    * nests K joins deep. Contributions floor-divide (`rank·w DIV out_w`)
    * and the damped update floor-divides again, so every intermediate is
    * an exact int64 (bounded by 85 · |nodes| · 10⁶ ≪ 2⁶³) and the
    * result is bit-stable across partitionings — no floating-point
    * drift, no convergence epsilon: K is part of the operator contract.
    *
    * Input contract: `edges(src, dst, w)` where every node occurs as a
    * `src` at least once (symmetric/undirected constructions guarantee
    * this; a directed graph with sinks should pre-union reverse edges or
    * accept sink-mass loss exactly as classic PageRank does).
    */
  def pageRank(edgesIn: DataFrame, iters: Int = 3, dampNum: Long = 85,
      dampDen: Long = 100): DataFrame = {
    val teleport = 1000000L - dampNum * 1000000L / dampDen
    val edges = edgesIn.localCheckpoint()
    val outW = edges.groupBy(col("src")).agg(sum(col("w")).as("out_w"))
    val withOut = edges.join(outW, Seq("src")).localCheckpoint()
    var ranks = outW.select(col("src").as("node"))
      .withColumn("rank_ppm", lit(1000000L)).localCheckpoint()
    for (_ <- 1 to iters) {
      val contrib = withOut
        .join(ranks.withColumnRenamed("node", "src"), Seq("src"))
        .select(col("dst").as("node"),
          expr("(rank_ppm * w) DIV out_w").as("contrib"))
      ranks = contrib.groupBy(col("node"))
        .agg(expr(s"$teleport + ($dampNum * sum(contrib)) DIV $dampDen")
          .as("rank_ppm"))
        .localCheckpoint()
    }
    ranks
  }

  private def zorderSql: String =
    (0 until 32).map(i =>
      s"(((l_partkey >> $i) & 1) << ${2 * i}) + (((l_suppkey >> $i) & 1) << ${2 * i + 1})")
      .mkString("(", " + ", ")")

  /** The skew probe's per-key aggregation BEFORE its lineage cut —
    * exposed so PlanAuditSpec can audit the scan's column pruning (the
    * query's own plan starts at the localCheckpoint and hides the scan).
    */
  private[graft] def skewCounts(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "events")
      .groupBy(col("user_id")).agg(count(lit(1)).as("n"))

  /** Morton-code bit interleave of two non-negative keys (32 bits each,
    * filling the 64-bit z-value — x's bits land on even z positions, y's
    * on odd): the pure-projection core of `q26_zorder`, expressed as
    * disjoint-bit shift-adds so it stays inside whole-stage codegen.
    * 32 bits covers int-range keys (l_partkey reaches 2^31 only past
    * SF ~10,000); a narrower interleave would silently alias distant
    * keys into the same z-positions and widen bucket min/max stats,
    * defeating the skipping this layout exists for.
    */
  private[graft] def zorderInterleave(x: Column, y: Column): Column =
    (0 until 32).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)

  def oracles: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
         COUNT(*) AS count_order
         FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01'
         GROUP BY l_returnflag, l_linestatus""",
    "q2_join_agg" ->
      """SELECT r_name, n_name,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
         COUNT(*) AS n_items
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY r_name, n_name""",
    "q3_topk" ->
      """SELECT l_orderkey,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
         FROM lineitem GROUP BY l_orderkey
         ORDER BY revenue DESC, l_orderkey LIMIT 10""",
    "q4_window" ->
      """SELECT o_custkey, o_orderkey, order_rank, running_spend FROM (
           SELECT o_custkey, o_orderkey,
             ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS order_rank,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend
           FROM orders) WHERE order_rank <= 3""",
    "q5_semi_anti" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
         WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
           AND c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')""",
    "q6_filter" ->
      """SELECT
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
         COUNT(*) AS n_rows
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
           AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""",
    "q7_distinct" ->
      """SELECT l_returnflag,
         COUNT(DISTINCT l_partkey) AS n_parts,
         COUNT(DISTINCT l_suppkey) AS n_supps,
         COUNT(*) AS n_rows
         FROM lineitem GROUP BY l_returnflag""",
    "q8_rollup" ->
      """SELECT l_returnflag, l_linestatus,
         CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT) AS gid,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
         COUNT(*) AS n_rows
         FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""",
    "q9_setops" ->
      """WITH y96 AS (SELECT o_custkey FROM orders
             WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'),
           y97 AS (SELECT o_custkey FROM orders
             WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'),
           tagged AS (
             SELECT 'both' AS kind, o_custkey FROM (SELECT o_custkey FROM y96 INTERSECT SELECT o_custkey FROM y97)
             UNION ALL
             SELECT 'only_1996', o_custkey FROM (SELECT o_custkey FROM y96 EXCEPT SELECT o_custkey FROM y97))
         SELECT kind, COUNT(*) AS n_custs FROM tagged GROUP BY kind""",

    "q10_sessionize" ->
      """WITH e AS (SELECT user_id, event_id, epoch_ns(ts)//1000 AS ts FROM events),
           m AS (SELECT *,
               CASE WHEN lag(ts) OVER w IS NULL OR ts - lag(ts) OVER w > 1800000000
                    THEN 1 ELSE 0 END AS new_sess
             FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
           s AS (SELECT *,
               SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS UNBOUNDED PRECEDING) AS sess_seq
             FROM m)
         SELECT user_id, CAST(sess_seq AS BIGINT) AS sess_seq,
           MIN(ts) AS ts_start, MAX(ts) AS ts_end, COUNT(*) AS n_events
         FROM s GROUP BY 1, 2""",

    "q11_quantiles" ->
      """WITH r AS (SELECT l_returnflag, l_quantity,
             ROW_NUMBER() OVER (PARTITION BY l_returnflag ORDER BY l_quantity) AS rn,
             COUNT(*) OVER (PARTITION BY l_returnflag) AS n
           FROM lineitem)
         SELECT l_returnflag,
           MAX(CASE WHEN rn = CAST(ceil(n * 0.5) AS BIGINT) THEN l_quantity END) AS p50,
           MAX(CASE WHEN rn = CAST(ceil(n * 0.9) AS BIGINT) THEN l_quantity END) AS p90,
           MAX(CASE WHEN rn = CAST(ceil(n * 0.99) AS BIGINT) THEN l_quantity END) AS p99
         FROM r GROUP BY 1""",

    // The oracle for the salted plan is the PLAIN one-window top-k: the
    // two-phase rewrite must be result-identical, so the oracle IS the
    // unsalted query — any divergence in the rewrite fails the hash gate.
    "q13_salted_topk" ->
      """SELECT l_returnflag, l_orderkey, l_linenumber, price, rank
         FROM (SELECT l_returnflag, l_orderkey, l_linenumber,
             CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS DOUBLE) AS price,
             ROW_NUMBER() OVER (PARTITION BY l_returnflag
               ORDER BY CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS DOUBLE) DESC,
                        l_orderkey, l_linenumber) AS rank
           FROM lineitem)
         WHERE rank <= 3""",

    // Mirrors the union+window rewrite 1:1 (same sort key, same running
    // LAST_VALUE IGNORE NULLS) so the tie-break and tolerance semantics
    // are pinned, not just the row multiset.
    "q14_asof_join" ->
      """WITH e AS (SELECT user_id, event_id, epoch_ns(ts)//1000 AS ts,
             CASE WHEN event_type='click' THEN 0 ELSE 1 END AS side
           FROM events WHERE event_type IN ('click','purchase')),
         w AS (SELECT *,
             LAST_VALUE(CASE WHEN side=0 THEN ts END IGNORE NULLS) OVER ww AS click_ts,
             LAST_VALUE(CASE WHEN side=0 THEN event_id END IGNORE NULLS) OVER ww AS cid
           FROM e WINDOW ww AS (PARTITION BY user_id ORDER BY ts, side, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
         SELECT user_id, event_id, ts,
           CASE WHEN ts - click_ts <= 3600000000 THEN cid END AS click_id,
           CASE WHEN ts - click_ts <= 3600000000 THEN ts - click_ts END AS asof_gap_us
         FROM w WHERE side = 1""",

    // The oracle is the PLAIN inequality join — DuckDB's IEJoin handles
    // it at sf scale — so the binned rewrite must reproduce the exact
    // pair set of the declarative range predicate.
    "q15_range_join" ->
      """SELECT e1.event_id AS err_id, epoch_ns(e1.ts)//1000 AS err_ts,
           COUNT(*) AS n_nearby,
           CAST(SUM(CAST(e2.value AS DECIMAL(18,2))) AS DOUBLE) AS v_sum,
           MIN(ABS(epoch_ns(e2.ts)//1000 - epoch_ns(e1.ts)//1000)) AS min_gap_us
         FROM events e1 JOIN events e2
           ON e1.event_type = 'error' AND e2.event_type = 'purchase'
          AND ABS(epoch_ns(e2.ts)//1000 - epoch_ns(e1.ts)//1000) <= 120000000
         GROUP BY 1, 2""",

    "q16_rolling" ->
      """SELECT user_id, event_id, epoch_ns(ts)//1000 AS ts,
           COUNT(*) OVER w AS n_1h,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS v_1h
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ns(ts)//1000
           RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)""",

    "q17_pivot" ->
      """SELECT l_returnflag,
           CAST(SUM(CASE WHEN l_linestatus = 'F'
             THEN CAST(l_extendedprice AS DECIMAL(18,2)) END) AS DOUBLE) AS F,
           CAST(SUM(CASE WHEN l_linestatus = 'O'
             THEN CAST(l_extendedprice AS DECIMAL(18,2)) END) AS DOUBLE) AS O
         FROM lineitem GROUP BY 1""",

    "q18_cube" ->
      """SELECT l_returnflag, l_linestatus,
         CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT) AS gid,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
         COUNT(*) AS n_rows
         FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)""",

    "q23_grouping_sets" ->
      """SELECT n_name, o_orderpriority,
         CAST(GROUPING(n_name) * 2 + GROUPING(o_orderpriority) AS BIGINT) AS gid,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
         COUNT(*) AS n_orders
         FROM orders JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         GROUP BY GROUPING SETS ((n_name, o_orderpriority), (n_name), ())""",

    // The plain unsalted join: salting must not change the result.
    "q24_salted_join" ->
      """SELECT o_orderpriority,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
         COUNT(*) AS n_items
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         GROUP BY o_orderpriority""",

    "q25_scalar_subquery" ->
      """SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0
                  AS avg_yearly,
                COUNT(*) AS n_small
         FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
         WHERE p.p_brand = 'Brand#23'
           AND 5 * (SELECT COUNT(*) FROM lineitem l2
                    WHERE l2.l_partkey = l.l_partkey)
                 * CAST(l.l_quantity AS DECIMAL(18,2))
               < (SELECT SUM(CAST(l2.l_quantity AS DECIMAL(18,2)))
                  FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)""",

    "q26_zorder" ->
      s"""WITH z AS (SELECT l_partkey, l_suppkey, $zorderSql AS zv FROM lineitem)
          SELECT zv >> $ZShift AS zbucket, COUNT(*) AS n_rows,
            MIN(l_partkey) AS min_pk, MAX(l_partkey) AS max_pk,
            MIN(l_suppkey) AS min_sk, MAX(l_suppkey) AS max_sk,
            CAST(SUM(CASE WHEN l_partkey BETWEEN $boxPkLo AND $boxPkHi
                           AND l_suppkey BETWEEN $boxSkLo AND $boxSkHi
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_box,
            (MAX(l_partkey) >= $boxPkLo AND MIN(l_partkey) <= $boxPkHi
             AND MAX(l_suppkey) >= $boxSkLo AND MIN(l_suppkey) <= $boxSkHi) AS box_overlaps
          FROM z GROUP BY 1""",

    "q27_window_distinct" ->
      """SELECT o_orderkey, o_custkey,
           COUNT(DISTINCT o_orderpriority)
             OVER (PARTITION BY o_custkey) AS n_priorities
         FROM orders""",

    "q29_zonemap_scan" ->
      s"""WITH z AS (SELECT l_partkey, l_suppkey, l_extendedprice,
              $zorderSql >> $ZShift AS zbucket FROM lineitem),
          zm AS (SELECT zbucket,
              MIN(l_partkey) AS min_pk, MAX(l_partkey) AS max_pk,
              MIN(l_suppkey) AS min_sk, MAX(l_suppkey) AS max_sk
            FROM z GROUP BY 1),
          hit AS (SELECT zbucket FROM zm
            WHERE max_pk >= $boxPkLo AND min_pk <= $boxPkHi
              AND max_sk >= $boxSkLo AND min_sk <= $boxSkHi)
          SELECT COUNT(*) AS n_rows_in_box,
            CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
              AS box_revenue,
            (SELECT COUNT(*) FROM hit) AS n_buckets_scanned,
            (SELECT COUNT(*) FROM zm) AS n_buckets_total
          FROM z JOIN hit USING (zbucket)
          WHERE l_partkey BETWEEN $boxPkLo AND $boxPkHi
            AND l_suppkey BETWEEN $boxSkLo AND $boxSkHi""",

    "q28_skew_probe" ->
      """WITH counts AS (SELECT user_id, COUNT(*) AS n FROM events GROUP BY 1),
          tot AS (SELECT CAST(SUM(n) AS BIGINT) AS total_rows,
                         COUNT(*) AS n_keys FROM counts)
         SELECT user_id, n,
           ROUND(CAST(n AS DOUBLE) * 100.0 / CAST(total_rows AS DOUBLE), 4)
             AS share_pct,
           n_keys, total_rows
         FROM counts, tot ORDER BY n DESC, user_id LIMIT 5""",

    "q19_approx_distinct" ->
      """SELECT l_returnflag,
         COUNT(DISTINCT l_partkey) AS n_parts_exact,
         TRUE AS within_bound
         FROM lineitem GROUP BY l_returnflag""",

    "q20_approx_quantiles" ->
      """SELECT l_returnflag, COUNT(*) AS n_rows, TRUE AS within_bound
         FROM lineitem GROUP BY l_returnflag""",

    "q21_funnel" ->
      """WITH e AS (SELECT user_id, event_type, epoch_ns(ts)//1000 AS ts_us FROM events),
          t1 AS (SELECT user_id, MIN(ts_us) AS t1 FROM e
                 WHERE event_type = 'view' GROUP BY 1),
          t2 AS (SELECT e.user_id, MIN(e.ts_us) AS t2 FROM e JOIN t1 USING (user_id)
                 WHERE e.event_type = 'click'
                   AND e.ts_us > t1.t1 AND e.ts_us <= t1.t1 + 86400000000
                 GROUP BY 1),
          t3 AS (SELECT e.user_id, MIN(e.ts_us) AS t3 FROM e JOIN t2 USING (user_id)
                 WHERE e.event_type = 'purchase'
                   AND e.ts_us > t2.t2 AND e.ts_us <= t2.t2 + 86400000000
                 GROUP BY 1)
          SELECT COUNT(t1.t1) AS n_view, COUNT(t2.t2) AS n_click_24h,
            COUNT(t3.t3) AS n_purchase_24h
          FROM t1 LEFT JOIN t2 USING (user_id) LEFT JOIN t3 USING (user_id)""",

    "q22_retention" ->
      """WITH act AS (
            SELECT DISTINCT user_id, epoch_ns(ts)//1000 // 604800000000 AS wk
            FROM events),
          first AS (SELECT user_id, MIN(wk) AS cohort_week FROM act GROUP BY 1)
          SELECT cohort_week, wk - cohort_week AS week_offset, COUNT(*) AS n_users
          FROM act JOIN first USING (user_id)
          GROUP BY 1, 2""",

    "q12_bucketed_join" ->
      """SELECT o_orderpriority,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
         COUNT(*) AS n_items
         FROM orders JOIN lineitem ON o_orderkey = l_orderkey
         WHERE o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1996-01-01'
         GROUP BY 1""",
    "q30_dpp" ->
      """SELECT strftime(l_shipdate, '%Y-%m') AS ship_month,
         COUNT(*) AS n_items,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
         FROM lineitem
         WHERE strftime(l_shipdate, '%Y') = '1995'
         GROUP BY 1""",
    "q31_bloom_join" ->
      s"""WITH o AS (SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT'),
         ho AS (SELECT o_orderkey,
                  ${phash64Sql("CAST(o_orderkey AS VARCHAR)")} % 4294967296 AS h FROM o),
         bits AS (SELECT DISTINCT pos FROM (
           SELECT (h * 40503 + 31161) % 8192 AS pos FROM ho
           UNION ALL SELECT (h * 34283 + 51831) % 8192 FROM ho
           UNION ALL SELECT (h * 49842 + 44605) % 8192 FROM ho)),
         li AS (SELECT l_orderkey, l_returnflag, l_extendedprice, l_discount
                FROM lineitem),
         hk AS (SELECT l_orderkey,
                  ${phash64Sql("CAST(l_orderkey AS VARCHAR)")} % 4294967296 AS h
                FROM (SELECT DISTINCT l_orderkey FROM li)),
         kp AS (
           SELECT l_orderkey, (h * 40503 + 31161) % 8192 AS pos FROM hk
           UNION ALL SELECT l_orderkey, (h * 34283 + 51831) % 8192 FROM hk
           UNION ALL SELECT l_orderkey, (h * 49842 + 44605) % 8192 FROM hk),
         passed AS (
           SELECT l_orderkey FROM kp JOIN bits USING (pos)
           GROUP BY 1 HAVING COUNT(*) = 3),
         reduced AS (SELECT li.* FROM li JOIN passed USING (l_orderkey)),
         joined AS (SELECT reduced.* FROM reduced JOIN o ON l_orderkey = o_orderkey)
         SELECT 'agg' AS section, l_returnflag AS k, COUNT(*) AS n,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
             * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS v
         FROM joined GROUP BY 2
         UNION ALL SELECT 'stats', 'probe_rows', COUNT(*), 0.0 FROM li
         UNION ALL SELECT 'stats', 'passed_bloom', COUNT(*), 0.0 FROM reduced
         UNION ALL SELECT 'stats', 'matched', COUNT(*), 0.0 FROM joined""",

    "q32_concurrency" ->
      """WITH e AS (SELECT user_id, event_id, epoch_ns(ts)//1000 AS ts FROM events),
         m AS (SELECT *,
             CASE WHEN lag(ts) OVER w IS NULL OR ts - lag(ts) OVER w > 1800000000
                  THEN 1 ELSE 0 END AS new_sess
           FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         sq AS (SELECT *,
             SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS UNBOUNDED PRECEDING) AS sess_seq
           FROM m),
         sess AS (SELECT user_id, sess_seq, MIN(ts) AS ts_start, MAX(ts) AS ts_end
           FROM sq GROUP BY 1, 2),
         d0 AS (SELECT ts_start AS ts, 1 AS d FROM sess
           UNION ALL SELECT ts_end + 1, -1 FROM sess),
         d1 AS (SELECT ts, CAST(SUM(d) AS BIGINT) AS net_delta FROM d0 GROUP BY 1),
         c AS (SELECT ts, net_delta,
             CAST(SUM(net_delta) OVER (ORDER BY ts ROWS UNBOUNDED PRECEDING)
               AS BIGINT) AS concurrency
           FROM d1)
         SELECT ts, net_delta, concurrency FROM c
         ORDER BY concurrency DESC, ts LIMIT 10""",

    "q34_attribution" ->
      """WITH e AS (SELECT event_id, epoch_ns(ts)//1000 AS ts, user_id,
             event_type FROM events),
         p AS (SELECT event_id AS purchase_event, user_id, ts AS p_ts
               FROM e WHERE event_type = 'purchase'),
         c AS (SELECT event_id AS click_event, user_id, ts AS c_ts
               FROM e WHERE event_type = 'click'),
         pairs AS (
           SELECT p.purchase_event, p.user_id, p.p_ts, c.click_event, c.c_ts
           FROM p JOIN c USING (user_id)
           WHERE c_ts <= p_ts AND c_ts > p_ts - 86400000000),
         a AS (
           SELECT purchase_event, user_id, p_ts, click_event,
             ROW_NUMBER() OVER (PARTITION BY purchase_event
               ORDER BY c_ts, click_event) AS touch_seq,
             COUNT(*) OVER (PARTITION BY purchase_event) AS n_touch
           FROM pairs)
         SELECT purchase_event, user_id, p_ts, click_event,
           CAST(touch_seq AS BIGINT) AS touch_seq,
           CAST(n_touch AS BIGINT) AS n_touch,
           CAST(CASE WHEN touch_seq = n_touch
             THEN 1000000 - (n_touch - 1) * (1000000 // n_touch)
             ELSE 1000000 // n_touch END AS BIGINT) AS credit_ppm
         FROM a
         UNION ALL
         SELECT purchase_event, user_id, p_ts, CAST(NULL AS BIGINT),
           CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(1000000 AS BIGINT)
         FROM p WHERE purchase_event NOT IN (SELECT purchase_event FROM pairs)""",

    "q33_time_weighted" ->
      """WITH e AS (SELECT event_id, event_type, epoch_ns(ts)//1000 AS ts_us,
             CAST(round(value * 100) AS BIGINT) AS cents FROM events),
         h AS (SELECT *,
             lead(ts_us) OVER (PARTITION BY event_type
               ORDER BY ts_us, event_id) - ts_us AS hold_us
           FROM e)
         SELECT event_type, COUNT(*) AS n_obs,
           CAST(SUM(cents * hold_us) AS BIGINT) AS weighted_cents_us,
           CAST(SUM(hold_us) AS BIGINT) AS span_us,
           MIN(ts_us) AS t_first, MAX(ts_us) AS t_last
         FROM h WHERE hold_us IS NOT NULL GROUP BY 1""",

    "q35_pagerank" ->
      """WITH cs AS (
           SELECT o_custkey AS cust, l_suppkey AS supp, COUNT(*) AS w
           FROM lineitem JOIN orders ON l_orderkey = o_orderkey
           GROUP BY 1, 2),
         edges AS (
           SELECT 'c' || CAST(cust AS VARCHAR) AS src,
             's' || CAST(supp AS VARCHAR) AS dst, w FROM cs
           UNION ALL
           SELECT 's' || CAST(supp AS VARCHAR),
             'c' || CAST(cust AS VARCHAR), w FROM cs),
         outw AS (SELECT src, SUM(w) AS out_w FROM edges GROUP BY 1),
         e2 AS (SELECT e.src, e.dst, e.w, o.out_w
           FROM edges e JOIN outw o USING (src)),
         r0 AS (SELECT src AS node, CAST(1000000 AS BIGINT) AS rank_ppm
           FROM outw),
         r1 AS (SELECT e2.dst AS node,
             150000 + (85 * SUM((r0.rank_ppm * e2.w) // e2.out_w)) // 100
               AS rank_ppm
           FROM e2 JOIN r0 ON r0.node = e2.src GROUP BY 1),
         r2 AS (SELECT e2.dst AS node,
             150000 + (85 * SUM((r1.rank_ppm * e2.w) // e2.out_w)) // 100
               AS rank_ppm
           FROM e2 JOIN r1 ON r1.node = e2.src GROUP BY 1),
         r3 AS (SELECT e2.dst AS node,
             150000 + (85 * SUM((r2.rank_ppm * e2.w) // e2.out_w)) // 100
               AS rank_ppm
           FROM e2 JOIN r2 ON r2.node = e2.src GROUP BY 1)
         SELECT node, CAST(rank_ppm AS BIGINT) AS rank_ppm FROM r3""",

    // The oracle recomputes the cube over base ∪ delta in one shot — the
    // incremental merge must equal the full recompute cell for cell.
    "q36_cube_incr" ->
      """SELECT CAST(GROUPING(event_type) * 2 + GROUPING(user_bucket) AS BIGINT) AS gid,
           event_type, user_bucket,
           COUNT(*) AS n, CAST(SUM(cents) AS BIGINT) AS sum_cents
         FROM (SELECT event_type, user_id % 10 AS user_bucket,
                 CAST(round(value * 100) AS BIGINT) AS cents FROM events)
         GROUP BY CUBE(event_type, user_bucket)""",

    "q42_reachability" ->
      """WITH edges AS (
           SELECT DISTINCT o_custkey AS c, l_suppkey AS s
           FROM orders JOIN lineitem ON o_orderkey = l_orderkey
           WHERE l_quantity >= 48),
         c0 AS (SELECT DISTINCT c FROM edges WHERE c < 10),
         s1 AS (SELECT DISTINCT s FROM edges JOIN c0 USING (c)),
         c2 AS (SELECT DISTINCT c FROM edges JOIN s1 USING (s)
                WHERE c NOT IN (SELECT c FROM c0)),
         s3 AS (SELECT DISTINCT s FROM edges JOIN c2 USING (c)
                WHERE s NOT IN (SELECT s FROM s1))
         SELECT 'customer' AS node_type, c AS node_id, CAST(0 AS BIGINT) AS level FROM c0
         UNION ALL SELECT 'supplier', s, 1 FROM s1
         UNION ALL SELECT 'customer', c, 2 FROM c2
         UNION ALL SELECT 'supplier', s, 3 FROM s3""",

    // Same planted derivations, closed-form counts.
    "q41_dq_expectations" ->
      """WITH ord AS (
           SELECT o_orderkey,
             CASE WHEN o_orderkey % 97 = 0 THEN NULL ELSE o_custkey END AS o_custkey,
             CASE WHEN o_orderkey % 103 = 0 THEN -o_totalprice
                  ELSE o_totalprice END AS o_totalprice
           FROM orders),
         li AS (
           SELECT CASE WHEN l_orderkey % 101 = 0 AND l_linenumber = 1
                       THEN l_orderkey + 1000000007 ELSE l_orderkey END AS l_orderkey,
             l_quantity
           FROM lineitem),
         rep AS (
           SELECT 'orders_pk_unique' AS rule, COUNT(*) AS n_checked,
             COUNT(*) - COUNT(DISTINCT o_orderkey) AS n_violations FROM ord
           UNION ALL
           SELECT 'orders_custkey_not_null', COUNT(*),
             CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           FROM ord
           UNION ALL
           SELECT 'orders_price_positive', COUNT(*),
             CAST(SUM(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS BIGINT)
           FROM ord
           UNION ALL
           SELECT 'lineitem_qty_in_1_50', COUNT(*),
             CAST(SUM(CASE WHEN l_quantity < 1 OR l_quantity > 50 THEN 1 ELSE 0 END)
               AS BIGINT)
           FROM li
           UNION ALL
           SELECT 'customer_pk_unique', COUNT(*),
             COUNT(*) - COUNT(DISTINCT c_custkey) FROM customer
           UNION ALL
           SELECT 'lineitem_fk_orders', (SELECT COUNT(*) FROM li),
             (SELECT COUNT(*) FROM li
              WHERE l_orderkey NOT IN (SELECT o_orderkey FROM ord))
           UNION ALL
           SELECT 'orders_fk_customer',
             (SELECT COUNT(*) FROM ord WHERE o_custkey IS NOT NULL),
             (SELECT COUNT(*) FROM ord WHERE o_custkey IS NOT NULL
              AND o_custkey NOT IN (SELECT c_custkey FROM customer)))
         SELECT rule, n_checked, n_violations,
           CASE WHEN n_violations = 0 THEN 'pass' ELSE 'fail' END AS pass
         FROM rep""",

    "q40_bitmap_segments" ->
      """WITH b AS (
           SELECT event_type, user_id // 63 AS w,
             bit_or(CAST(1 AS BIGINT) << CAST(user_id % 63 AS INT)) AS bits
           FROM events GROUP BY 1, 2),
         counts AS (
           SELECT event_type, CAST(SUM(bit_count(bits)) AS BIGINT) AS n
           FROM b GROUP BY 1),
         pairs AS (
           SELECT a.event_type AS type_a, b2.event_type AS type_b,
             CAST(SUM(bit_count(a.bits & b2.bits)) AS BIGINT) AS n_both
           FROM b a JOIN b b2
             ON a.w = b2.w AND a.event_type < b2.event_type
           GROUP BY 1, 2)
         SELECT type_a, type_b, ca.n AS n_a, cb.n AS n_b, n_both,
           ca.n + cb.n - n_both AS n_either
         FROM pairs
         JOIN counts ca ON ca.event_type = type_a
         JOIN counts cb ON cb.event_type = type_b""",

    "q39_forward_fill" ->
      """WITH e AS (
           SELECT user_id, event_id, epoch_ns(ts)//1000 AS ts_us,
             CASE WHEN event_type <> 'error'
                  THEN CAST(round(value * 100) AS BIGINT) END AS cents
           FROM events),
         f AS (
           SELECT *, last_value(cents IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts_us, event_id
               ROWS UNBOUNDED PRECEDING) AS filled
           FROM e)
         SELECT user_id, COUNT(*) AS n_rows,
           CAST(SUM(CASE WHEN cents IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_gaps,
           CAST(SUM(CASE WHEN cents IS NULL AND filled IS NOT NULL
             THEN 1 ELSE 0 END) AS BIGINT) AS n_filled,
           CAST(SUM(COALESCE(filled, 0)) AS BIGINT) AS sum_filled_cents
         FROM f GROUP BY 1""",

    "q38_semi_additive" ->
      """WITH last AS (
           SELECT user_id, event_type,
             MAX(struct_pack(ts_us := epoch_ns(ts)//1000, event_id := event_id,
               cents := CAST(round(value * 100) AS BIGINT))) AS l
           FROM events GROUP BY 1, 2)
         SELECT event_type, COUNT(*) AS n_users,
           CAST(SUM(l.cents) AS BIGINT) AS sum_last_cents
         FROM last GROUP BY 1""",

    "pipe_conversation_pack" ->
      """WITH e AS (SELECT user_id, event_id, epoch_ns(ts)//1000 AS ts, event_type,
             CAST(round(value * 100) AS BIGINT) AS cents FROM events),
           m AS (SELECT *,
               CASE WHEN lag(ts) OVER w IS NULL OR ts - lag(ts) OVER w > 1800000000
                    THEN 1 ELSE 0 END AS new_sess
             FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
           s AS (SELECT *,
               SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS UNBOUNDED PRECEDING) AS sess_seq
             FROM m),
           r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, sess_seq
                 ORDER BY ts, event_id) AS rn
             FROM s)
         SELECT user_id, CAST(sess_seq AS BIGINT) AS sess_seq,
           COUNT(*) AS n_turns_total,
           CAST(LEAST(COUNT(*), 16) AS BIGINT) AS n_turns_kept,
           string_agg(CASE WHEN rn <= 16 THEN event_type END, '|' ORDER BY rn) AS turns,
           CAST(SUM(CASE WHEN rn <= 16 THEN cents ELSE 0 END) AS BIGINT) AS kept_cents
         FROM r GROUP BY 1, 2""",

    "q37_sketch_union" ->
      """WITH e AS (
           SELECT epoch_ns(ts) // 86400000000000 AS day, user_id FROM events)
         SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users_exact,
           CAST((SELECT SUM(cnt) FROM (
             SELECT COUNT(DISTINCT user_id) AS cnt FROM e GROUP BY day)) AS BIGINT)
             AS sum_daily_exact,
           TRUE AS within_bound
         FROM e"""
  )
}
