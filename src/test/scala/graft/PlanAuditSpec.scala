package graft

import org.apache.spark.sql.execution.ExplainMode
import org.scalatest.funsuite.AnyFunSuite

/** Automated plan audit over EVERY `SparkEntry.queries` entry at sf0.001
  * (the `tools/ExplainCheck` dev loop promoted to an assertion suite).
  *
  * What a plan must not contain to survive a 100 TB cluster:
  *  - `CartesianProduct` — an unkeyed all-pairs join is quadratic I/O; any
  *    intentional small-side cross join must arrive as a broadcast.
  *  - `BroadcastNestedLoopJoin` outside the whitelisted queries whose
  *    semantics genuinely are "compare everything against a broadcast
  *    small side" (brute-force kNN, threshold pairs, LSH probe padding).
  *  - an Exchange blow-up: shuffles are the scale currency; the cap is
  *    sized from the audited maximum (a window + join + agg pipeline) with
  *    small headroom so a regression that doubles shuffles fails loudly.
  *
  * Harness queries (socket/file/stream e2e) execute their pipeline during
  * DataFrame construction and return a read-back of materialized results —
  * for those the walked plan is the read-back (their inner plans are
  * asserted by their dedicated specs); they are still walked so a future
  * refactor that turns one into a live cartesian plan is caught.
  */
class PlanAuditSpec extends AnyFunSuite {
  lazy val spark = SparkTest.spark
  private val dir = "/root/testdata/sf0.001"

  /** Queries whose construction runs a real-time harness (streaming TTL
    * sleeps, loopback sockets) — several seconds each regardless of scale
    * factor. Their result plans are read-backs; dedicated specs cover the
    * inner dataflow (StreamingSpec / SinkSpec / CatalogSocketSpec).
    */
  private val slowHarness = Set(
    "cdc_txn_ttl", // sleeps past a real 2 s processing-time TTL
    "sink_socket_roundtrip", // TCP+RPC loopback servers
    "sink_receiver_e2e", // two full streaming queries
    "sink_receiver_resume", // stop + resume receiver streaming queries
    "cdc_stream_e2e", // full streaming query with stateful txn assembly
    "cdc_resume_restart", // two sequential streaming queries (stop + resume)
    "cdc_tail_live", // live tail-source queries (ProcessingTime, stop + resume)
    "cdc_supervisor_restart", // crashed + supervised-restart streaming queries
    "cdc_full_incr_handoff", // snapshot apply + full streaming query
    "cdc_metrics", // streaming query + listener-fed metrics table
    "cdc_soak_live", // continuous-trigger soak: live TTL sleep + 4 polled phases
    "sink_receiver_live", // continuous-trigger receiver soak: 4 polled phases
    "cdc_sharded_fanout", // three concurrent live shard queries + crash/resume
    "cdc_token_resume", // two full streaming queries over the token cursor
    "cdc_tail_admission", // 16-batch admission-bounded streaming drain
    "pipe_live_corpus" // full maintenance pipeline: 3 triggers + crash/resume (LiveCorpusSpec covers the maintainer)
  )

  /** Broadcast nested-loop joins that ARE the operator's semantics: a
    * broadcast tiny side compared against every row — no equi-key exists.
    * (Verified against each plan: every other join in the suite is a
    * BroadcastHashJoin or SortMergeJoin.)
    */
  private val bnljAllowed = Set(
    "sim_knn_brute", // broadcast query set × corpus (baseline brute kNN)
    "sim_dim_prune", // broadcast probe set × corpus, full + pruned arms
    "sim_ivf_assign", "sim_ivf_search", // broadcast k-means centroid table
    "sim_ivf_adaptive", // same probe crossJoin vs the derived-count centroid table
    "sim_decontam", // same centroid broadcast (ivfRange probe assignment)
    "sim_filtered_search", // same centroid broadcast, lists pre-filtered
    "sim_ivfpq", // broadcast centroid table (coarse probe) + broadcast ADC LUT
    "sim_ivf_recall", // composes sim_knn_brute + sim_ivf_search (both above)
    "sim_ivf_incremental", // composes brute + two ivf arms (same broadcasts)
    "sim_ivf_split", // broadcast child-centroid table (hot-list reassign)
    "cdc_vector_sync", // broadcast standing-centroid table (CDC index sync)
    "sim_recall_curve", // same composition, 10-row heads + a 10-row spine
    "sim_kmeans_quality", // broadcast k-means centroid table (assignment pass)
    "sim_ivfpq_recall", // composes sim_knn_brute + sim_ivfpq (both broadcast)
    "sim_ivf_adaptive_recall", // sim_ivf_recall at the derived geometry (same broadcasts)
    "sim_ivfpq_adaptive_recall", // sim_ivfpq_recall at the derived geometry (same broadcasts)
    "pipe_ann", // broadcast trained centroid table (train-once assign + ivf arms)
    "dedup_semantic", // broadcast k-means centroid table as the blocking key
    "dedup_lsh_recall", // broadcast probe set × corpus (eval ground truth)
    "pipe_enrich", // broadcast k-means centroid table (cluster assignment arm)
    "snap_orphan_compound", // broadcast chunk bounds, BSON-order range semi-join
    "snap_range_pieces", // broadcast piece bounds × table rows
    "snap_sharded_fullsync", // same piece-bounds broadcast, one per shard arm
    "cdc_qos_reload", // broadcast sentinel control table, as-of range join on ticks
    "q41_dq_expectations", // two 1-ROW aggregate frames (total, orphan count) combined per FK rule — no key exists, both sides single-row by construction
    "dedup_minhash_adaptive", // broadcast probe set × corpus (eval ground truth, same as dedup_lsh_recall)
    "q37_sketch_union" // 1-row exact agg × 1-row merged-sketch agg (both global aggregates)
  )

  /** Shuffle-count ceiling. The audited maximum today is 8 (multi-stage
    * window + join + agg pipelines); 12 leaves refactor headroom while
    * still failing a plan whose shuffle count doubles.
    */
  private val maxExchanges = 12

  /** Queries whose ONE plan intentionally unions an N-way fan-out grid:
    * the per-arm dataflow is what runs at scale (and stays within the
    * normal cap); the union of all arms in a single proof plan
    * multiplies the count by the arm count.
    */
  private val maxExchangesOverride = Map(
    "snap_sharded_fullsync" -> 24, // 3 shard arms x (chunks + pieces + orphans)
    // seven independent cap sites x (keyed groupBy + single-row collapse);
    // each arm alone is 2-3 exchanges over tables the operators already
    // build (the edit/embed arms add one distinct-key collapse each, r17
    // task 1) — the union is the proof plan, not a scale dataflow
    "dedup_cap_audit" -> 20,
    // kmeans train/assign feeding thresholdPairs' three-tier guard: the
    // replica collapse adds a keys-aggregate + membership + expansion
    // joins, all over thin (distinct-vector / key-id) tables — each
    // exchange carries keys, never re-shuffles the corpus twice
    "dedup_semantic" -> 22
  )

  for (name <- SparkEntry.queries.keys.toSeq.sorted if !slowHarness(name)) {
    test(s"plan audit: $name") {
      val df = SparkEntry.queries(name)(spark, dir)
      val plan = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
      assert(!plan.contains("CartesianProduct"),
        s"$name plans a CartesianProduct:\n$plan")
      if (!bnljAllowed(name)) {
        assert(!plan.contains("BroadcastNestedLoopJoin"),
          s"$name plans an unexpected BroadcastNestedLoopJoin:\n$plan")
      }
      val cap = maxExchangesOverride.getOrElse(name, maxExchanges)
      val exchanges = "(?m)^\\(\\d+\\) Exchange".r.findAllIn(plan).size
      assert(exchanges <= cap,
        s"$name plans $exchanges exchanges (cap $cap):\n$plan")
    }
  }

  test("plan audit: q30_dpp prunes fact partitions at runtime") {
    // the whole point of the query: the month-dim filter must reach the
    // partitioned fact scan as a dynamic partition-pruning subquery, so
    // a 100 TB fact pays for ~12 month partitions, not all of them
    val plan = SparkEntry.queries("q30_dpp")(spark, dir)
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"q30_dpp lost dynamic partition pruning on the fact scan:\n$plan")
  }

  test("plan audit: packer prefix sums never single-partition the corpus rows") {
    // the two-phase prefixSum contract: the ONLY single-partition
    // exchange allowed in a packer plan is the one cumulating the
    // |buckets|-row bucket-total table (an aggregate sits beneath it);
    // a single-partition exchange over raw rows is the global-sort
    // scale-killer the primitive exists to avoid
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    for (name <- Seq("mm_interleave", "q32_concurrency", "text_pack",
        "pipe_curriculum", "pipe_epoch_shuffle", "pipe_token_budget")) {
      val plan = SparkEntry.queries(name)(spark, dir).queryExecution.sparkPlan
      val bad = plan.collect {
        case e: ShuffleExchangeExec if e.outputPartitioning.numPartitions == 1 &&
            e.child.collect { case a: BaseAggregateExec => a }.isEmpty => e
      }
      assert(bad.isEmpty,
        s"$name single-partitions unaggregated rows into a window:\n$plan")
    }
  }

  test("plan audit: q6_filter pushes its scan predicates into parquet") {
    val plan = SparkEntry.queries("q6_filter")(spark, dir)
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    val pushed = plan.linesIterator.filter(_.contains("PushedFilters")).mkString
    assert(pushed.contains("l_discount") && pushed.contains("l_quantity"),
      s"q6_filter scan lost its pushdown:\n$plan")
  }

  test("plan audit: text_split_assign prunes the text column from the scan") {
    // the split is a pure function of doc_id — reading the (wide) text
    // column would dominate I/O at corpus scale for no reason
    val plan = SparkEntry.queries("text_split_assign")(spark, dir)
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    val readSchema = plan.linesIterator.filter(_.contains("ReadSchema")).mkString
    assert(!readSchema.contains("text"),
      s"text_split_assign reads the unused text column:\n$plan")
  }

  test("plan audit: sim_sq8 prunes the label column from the scan") {
    val plan = SparkEntry.queries("sim_sq8")(spark, dir)
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    val readSchema = plan.linesIterator.filter(_.contains("ReadSchema")).mkString
    assert(!readSchema.contains("label"),
      s"sim_sq8 reads the unused label column:\n$plan")
  }

  test("plan audit: q26/q28 scans prune to the referenced columns") {
    // the z-order projection touches 2 of lineitem's 16 columns; the
    // skew probe touches 1 of events' 6 — at 100 TB these diagnostics
    // must not pay for the fact table's width
    val p26 = SparkEntry.queries("q26_zorder")(spark, dir)
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    val rs26 = p26.linesIterator.filter(_.contains("ReadSchema")).mkString
    assert(!rs26.contains("l_extendedprice") && !rs26.contains("l_shipdate"),
      s"q26_zorder widens the lineitem scan:\n$p26")
    // the query's own plan starts at a localCheckpoint (no scan to read);
    // audit the pre-cut aggregation, where the parquet scan lives
    val p28 = graft.operators.Relational.skewCounts(spark, dir)
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    val rs28 = p28.linesIterator.filter(_.contains("ReadSchema")).mkString
    assert(rs28.nonEmpty && rs28.contains("user_id"),
      s"q28 audit lost the scan:\n$p28")
    assert(!rs28.contains("props") && !rs28.contains("event_type"),
      s"q28_skew_probe widens the events scan:\n$p28")
  }

  test("plan audit: q10/q11 scans prune to the referenced columns") {
    // sessionize touches 3 of events' 6 columns; quantiles 2 of
    // lineitem's 16 — at 100 TB the scan width IS the query cost
    val p10 = SparkEntry.queries("q10_sessionize")(spark, dir)
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    val rs10 = p10.linesIterator.filter(_.contains("ReadSchema")).mkString
    assert(!rs10.contains("props") && !rs10.contains("event_type"),
      s"q10_sessionize widens the events scan:\n$p10")
    val p11 = SparkEntry.queries("q11_quantiles")(spark, dir)
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    val rs11 = p11.linesIterator.filter(_.contains("ReadSchema")).mkString
    assert(!rs11.contains("l_extendedprice") && !rs11.contains("l_comment"),
      s"q11_quantiles widens the lineitem scan:\n$p11")
  }

  test("plan audit: q12_bucketed_join joins without a shuffle (bucket co-location)") {
    // at sf0.001 the filtered orders side broadcasts (correctly); force
    // the non-broadcast path to audit what matters at 100 TB — both
    // sides too big to broadcast, the bucketed layout feeding the
    // sort-merge join with NO exchange on either input
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val plan = SparkEntry.queries("q12_bucketed_join")(spark, dir)
        .queryExecution.explainString(ExplainMode.fromString("formatted"))
      assert(plan.contains("SortMergeJoin"), s"q12 lost its sort-merge join:\n$plan")
      assert("Bucketed: true".r.findAllIn(plan).size == 2,
        s"q12 scans are not bucketed:\n$plan")
      // the only exchange allowed is the final priority aggregate's
      val exchanges = "(?m)^\\(\\d+\\) Exchange".r.findAllIn(plan).size
      assert(exchanges <= 1, s"q12 shuffles a bucketed join ($exchanges exchanges):\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
  }

  test("plan audit: q21_funnel shuffles once per stage arm, never per stage") {
    // With broadcasts off (the 100 TB shape — every arm too big to
    // broadcast): three event-type arms each exchange once on user_id;
    // every stage's gate join and re-aggregate then run INSIDE that
    // partitioning (SMJ on aligned sides adds sorts, not exchanges), and
    // the only extra exchange is the final single-row summary's.
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val plan = SparkEntry.queries("q21_funnel")(spark, dir)
        .queryExecution.explainString(ExplainMode.fromString("formatted"))
      val exchanges = "(?m)^\\(\\d+\\) Exchange".r.findAllIn(plan).size
      assert(exchanges <= 4,
        s"q21_funnel re-shuffles a stage ($exchanges exchanges, expected ≤4):\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
  }

  test("plan audit: text_bm25 scans the corpus once (stats, tf, and df share the base)") {
    val plan = SparkEntry.queries("text_bm25")(spark, dir)
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    // the checkpointed base is the only corpus pass — the final plan must
    // not re-read parquet for the df (or any other) branch
    val scans = plan.linesIterator.count(_.contains("Scan parquet"))
    assert(scans == 0, s"text_bm25 re-scans the corpus ($scans parquet scans):\n$plan")
  }

  test("plan audit: events scans prune to the referenced columns") {
    // The canonical projection reads 5 of the table's 6 columns; a query
    // that only needs (op, ns) must not widen the scan back to full rows.
    val plan = SparkEntry.queries("cdc_filter_chain")(spark, dir)
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    val readSchema = plan.linesIterator.filter(_.contains("ReadSchema")).mkString
    assert(!readSchema.contains("props"),
      s"cdc_filter_chain reads the unused props column:\n$plan")
  }
}
