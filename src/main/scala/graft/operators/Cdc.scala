package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.apply.{Combiner, Replay}
import graft.filters.OplogFilters
import graft.functions.Portable.phash64Sql
import graft.model.{ChangeEvent, Oplog}
import graft.partition.Hashers
import graft.transform.{EventNormalizer, Transforms}

/** CDC operator queries (SURVEY.md §2.3-2.6/§2.8) over the `events` table
  * projected into canonical oplog form, each with an exact DuckDB oracle.
  *
  * Shared configuration for the verified pipeline:
  * gids allowed = {""} (drop foreign-gid records),
  * ns whitelist = app.users_*, blacklist = app.users_3, 8 workers,
  * `users_1` routed by document key (X3 whitelist), others by namespace.
  */
object Cdc {

  private val gids = Seq("")
  private val white = Seq("^app\\.users_[0-9]+$")
  private val black = Seq("^app\\.users_3$")
  private val nWorkers = 8
  private val idColls = Seq("users_1")

  private def oplog(s: SparkSession, dir: String): DataFrame =
    Oplog.fromEvents(s, dir)

  private def filtered(s: SparkSession, dir: String): DataFrame =
    oplog(s, dir).filter(OplogFilters.chain(gids, white, black))

  private def routed(s: SparkSession, dir: String): DataFrame =
    Hashers.repartitionOrdered(
      filtered(s, dir), Hashers.workerWhitelist(idColls, nWorkers), nWorkers)

  /** Deterministic dynamic-document convention for the schema-drift pair
    * (mirrored 1:1 in the oracles): every effective write carries `_id`
    * and `k`; `cents` appears only when event_id % 3 == 0 and `src` only
    * when event_id % 7 == 0 ('web'/'app' by (event_id DIV 7) % 2) — the
    * field-set growth a schemaless source exhibits as the producing app
    * evolves (reference §1.3: documents are dynamic BSON; MongoDB never
    * declares a schema). Bodies are real JSON — to_json drops the absent
    * (null) fields — so downstream operators read schemas the way a
    * warehouse ingesting BSON does: schema-on-read.
    */
  private[operators] def withBody(df: DataFrame): DataFrame =
    df.withColumn("body", to_json(struct(
      col("doc_key").as("_id"),
      expr("CAST(get_json_object(props, '$.k') AS BIGINT)").as("k"),
      when(col("event_id") % 3 === 0,
        expr("CAST(round(value * 100) AS BIGINT)")).as("cents"),
      when(col("event_id") % 7 === 0,
        when(expr("event_id DIV 7") % 2 === 0, "web").otherwise("app"))
        .as("src"))))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // P1/P2: raw change records → canonical oplog rows.
    "cdc_normalize" -> ((s, dir) =>
      oplog(s, dir).select("event_id", "ts_packed", "op", "ns", "doc_key", "g")),

    // P2/S2: change-stream event → oplog, the full 8-way operationType
    // dispatch (ConvertEvent2Oplog) over the canonical event schema.
    "cdc_event_normalize" -> ((s, dir) =>
      EventNormalizer.normalize(ChangeEvent.fromEvents(s, dir))
        .select("event_id", "ts_packed", "op", "ns", "o", "o2")),

    // S2 at the connector boundary: the corpus reshaped into the official
    // Spark MongoDB connector's change-event schema (struct ns/to,
    // documentKey/fullDocument/updateDescription), then through the FULL
    // deployment wiring — projectConnectorEvents → 8-way dispatch →
    // toOplogFeed — so the oracle gates the exact projection a live
    // change stream flows through (doc_key recovery from the routed op
    // body included).
    "cdc_connector_feed" -> ((s, dir) => {
      val cev = ChangeEvent.fromEvents(s, dir)
      val raw = cev.select(col("event_id").as("seq"),
        col("ts_packed").as("clusterTime"),
        col("operation_type").as("operationType"),
        struct(col("db").as("db"), col("coll").as("coll")).as("ns"),
        struct(col("to_db").as("db"), col("to_coll").as("coll")).as("to"),
        col("document_key").as("documentKey"),
        col("full_document").as("fullDocument"),
        struct(col("updated_fields").as("updatedFields"),
          col("removed_fields").as("removedFields")).as("updateDescription"))
      graft.streaming.MongoChangeSource.toOplogFeed(
        EventNormalizer.normalize(
          graft.streaming.MongoChangeSource.projectConnectorEvents(raw)))
        .select("event_id", "ts_packed", "op", "ns", "doc_key", "props")
    }),

    // P2's fullDocument=updateLookup mode (`changestram_event.go:176-185`):
    // an update with a valid post-image replays as {"$set": fullDocument}
    // instead of the updateDescription diff.
    "cdc_event_fulldoc" -> ((s, dir) =>
      EventNormalizer.normalize(ChangeEvent.fromEvents(s, dir), fullDocMode = true)
        .filter(col("op") === "u")
        .select("event_id", "ts_packed", "ns", "o", "o2")),

    // F1+F2+F3+F5+F7 keep-chain, summarized per (op, ns).
    "cdc_filter_chain" -> ((s, dir) =>
      filtered(s, dir).groupBy(col("op"), col("ns")).agg(count(lit(1)).as("n"))),

    // P3: ordered namespace rewrite rules (exact + db-prefix match).
    "cdc_ns_transform" -> ((s, dir) =>
      oplog(s, dir)
        .withColumn("ns_new",
          Transforms.nsTransform(Seq("app.users_0" -> "app.u0", "app" -> "appx")))
        .groupBy(col("ns"), col("ns_new")).agg(count(lit(1)).as("n"))),

    // P4: db → N target dbs fanout via broadcast mapping join.
    "cdc_db_fanout" -> ((s, dir) =>
      Transforms.dbFanout(oplog(s, dir), Seq("app" -> "app_a", "app" -> "app_b"))
        .groupBy(col("ns")).agg(count(lit(1)).as("n"))),

    // W1-W4 as idempotent MERGE: last-effective-write-wins materialization.
    "cdc_apply" -> ((s, dir) => Replay.materialize(filtered(s, dir))),

    // SCD Type-2 history build — what a warehouse FED BY this engine does
    // with the change stream: every effective write opens a version valid
    // [ts, next-change ts); a delete closes the prior version (via the
    // lead) and opens none. ONE window over the (ns, doc_key) exchange —
    // version seq, validity interval, and currency flag all ride the same
    // sort, so the whole history materializes in a single shuffle.
    "cdc_scd2" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("ns"), col("doc_key"))
        .orderBy(col("ts_packed"), col("event_id"))
      filtered(s, dir).filter(col("op").isin("i", "u", "d"))
        .withColumn("version", row_number().over(w).cast("long"))
        .withColumn("valid_to", lead(col("ts_packed"), 1).over(w))
        .filter(col("op") =!= "d")
        .select(col("ns"), col("doc_key"), col("version"),
          col("ts_packed").as("valid_from"), col("valid_to"), col("value"),
          col("valid_to").isNull.as("is_current"))
    }),

    // SCHEMA REGISTRY — the longitudinal schema-history a warehouse
    // ingesting a schemaless source must maintain (Debezium's schema
    // topic analogue; MongoDB itself never declares one — reference
    // §1.3, documents are dynamic BSON). Complements cdc_schema_drift's
    // two-sided deploy diff: this is the full versioned inventory that
    // cdc_schema_evolution's wide materialization reads its DDL from.
    // Bodies are real JSON with per-row field sets (see
    // [[withBody]]); the registry reads them back schema-on-read
    // (json_object_keys) and reports, per (ns, field): first/last sighting,
    // doc count, corpus coverage, and the evolution version = dense rank
    // of first appearance within the namespace. Shape at scale: one
    // groupBy exchange over (ns, field); the version window runs over the
    // AGGREGATED registry (|ns|×|fields| rows — schema-sized, not
    // corpus-sized), and the per-ns totals broadcast.
    "cdc_schema_registry" -> ((s, dir) => {
      val eff = withBody(filtered(s, dir).filter(col("op").isin("i", "u")))
      val reg = eff
        .select(col("ns"), col("ts_packed"),
          explode(json_object_keys(col("body"))).as("field"))
        .groupBy(col("ns"), col("field"))
        .agg(min(col("ts_packed")).as("first_seen"),
          max(col("ts_packed")).as("last_seen"),
          count(lit(1)).as("n_docs"))
      val tot = eff.groupBy(col("ns")).agg(count(lit(1)).as("_n"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("ns")).orderBy(col("first_seen"), col("field"))
      reg.join(broadcast(tot), Seq("ns"))
        .withColumn("coverage_ppm", expr("n_docs * 1000000 DIV _n"))
        .withColumn("schema_ver", dense_rank().over(w).cast("long"))
        .drop("_n")
    }),

    // SCHEMA EVOLUTION apply — materialize the current state WIDE, under
    // the union schema the drift registry discovered: last effective
    // write per (ns, doc_key) (cdc_apply's argmax), then every dynamic
    // field becomes a column, NULL where the winning document predates
    // the field's introduction. The column list is data-driven — a
    // bounded driver-side collect of the field inventory (schema-sized,
    // like a connector reading its schema registry; NOT corpus-sized),
    // ordered by first global appearance so the evolved DDL is
    // deterministic. Values stay strings: schema-on-read widens, it does
    // not guess types.
    "cdc_schema_evolution" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("ns"), col("doc_key"))
        .orderBy(col("ts_packed").desc, col("event_id").desc)
      val eff = withBody(filtered(s, dir).filter(col("op").isin("i", "u", "d")))
      val win = eff
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1 && col("op") =!= "d")
      val inventory = eff.filter(col("op").isin("i", "u"))
        .select(explode(json_object_keys(col("body"))).as("field"),
          col("ts_packed"))
        .groupBy(col("field")).agg(min(col("ts_packed")).as("fs"))
        .filter(col("field") =!= "_id")
        .collect().map(r => (r.getLong(1), r.getString(0))).sorted.map(_._2)
      val wide = inventory.map(f =>
        get_json_object(col("body"), s"$$.$f").as(f))
      win.select(Seq(col("ns"), col("doc_key"),
        col("ts_packed").as("last_ts")) ++ wide: _*)
    }),

    // Point LOOKUP against the bucketed state table — "what is document
    // X's current state" WITHOUT scanning the state (the read-path
    // payoff of the `state/bucket=<b>/` layout the writer maintains):
    // the probe keys hash to their buckets driver-side (|probe| rows),
    // the scan partition-prunes to ONLY those bucket directories, and a
    // broadcast semi-join picks the keys out of them. At 100 TB this
    // reads |probe buckets|/nBuckets of the table; the spec additionally
    // proves the pruning physically (inputFiles confined to the probe
    // buckets' directories). Built on a REAL applyBatch-written state.
    "cdc_point_lookup" -> ((s, dir) => {
      val work = graft.Work.dir(s"point_lookup_q")
      graft.streaming.IncrSync.deletePath(s, work)
      val eff = filtered(s, dir).filter(col("op").isin("i", "u", "d"))
      graft.streaming.IncrSync.applyBatch(eff, work, 0L, nBuckets = 16)
      pointLookup(s, work, Seq(
        ("app.users_0", "4"), ("app.users_0", "8"),
        ("app.users_1", "17"), ("app.users_2", "99999")), nBuckets = 16)
    }),

    // The query the SCD2 history EXISTS for — point-in-time dimension
    // lookup: each fact (the view events, noops that never mutate state)
    // resolves the dimension version in force AT its timestamp,
    // including "no live version" gaps after deletes. Spark-first as-of
    // shape (same as q14): dims and facts union into ONE stream per key,
    // a single window carries the last dim struct forward
    // (last(ignoreNulls) — delete rows ARE dim rows carrying
    // alive=false, so a fact after a delete correctly sees no live
    // version instead of resurrecting the prior one), facts project out.
    // One shuffle on the document key; no pairwise fact×version join.
    "cdc_scd2_lookup" -> ((s, dir) => {
      val raw = oplog(s, dir)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("doc_key")).orderBy(col("ts_packed"), col("event_id"))
      val dimStructT = "struct<version:bigint,value:double,alive:boolean>"
      val dims = raw.filter(OplogFilters.chain(gids, white, black))
        .filter(col("op").isin("i", "u", "d") && col("ns") === "app.users_0")
        .withColumn("version", row_number().over(w).cast("long"))
        .select(col("doc_key"), col("ts_packed"), lit(0).as("kind"),
          col("event_id"),
          struct(col("version"), col("value"),
            (col("op") =!= "d").as("alive")).cast(dimStructT).as("dim"))
      val facts = raw.filter(col("op") === "n" && col("ns") === "app.users_0")
        .select(col("doc_key"), col("ts_packed"), lit(1).as("kind"),
          col("event_id"), expr(s"cast(null as $dimStructT)").as("dim"))
      val wAll = org.apache.spark.sql.expressions.Window
        .partitionBy(col("doc_key"))
        .orderBy(col("ts_packed"), col("kind"), col("event_id"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      dims.unionByName(facts)
        .withColumn("d", last(col("dim"), ignoreNulls = true).over(wAll))
        .filter(col("kind") === 1)
        .select(col("event_id").as("fact_event"), col("doc_key"),
          col("ts_packed"),
          when(col("d.alive"), col("d.version")).as("asof_version"),
          when(col("d.alive"), col("d.value")).as("asof_value"))
    }),

    // Point-in-time state reconstruction ("the database as of LSN T"):
    // the replay fold truncated at a pinned mid-stream timestamp — the
    // query the checkpoint/replay architecture exists to answer. The pin
    // is the midpoint of the packed-LSN range (a deterministic two-long
    // driver read, same sanctioned shape as BM25's corpus stats); the
    // fold itself is cdc_apply's one-exchange materialization over the
    // truncated feed — time travel costs nothing beyond the scan filter.
    "cdc_time_travel" -> ((s, dir) => {
      val eff = filtered(s, dir).filter(col("op").isin("i", "u", "d"))
      val b = eff.agg(min(col("ts_packed")), max(col("ts_packed"))).head()
      val t = b.getLong(0) + (b.getLong(1) - b.getLong(0)) / 2
      Replay.materialize(eff.filter(col("ts_packed") <= t))
    }),

    // Referential-integrity audit across replicated namespaces — the
    // eventual-consistency check a CDC target needs: children applied
    // before their parents (different namespaces replicate through
    // independent per-key orderings, so mid-stream the target is only
    // PER-DOCUMENT consistent) show up as dangling references. The audit
    // materializes the state at a mid-stream LSN and at the final LSN
    // (the same truncated fold as cdc_time_travel) and counts users_1
    // children whose parent key (child − 1, the corpus' FK convention)
    // is absent from users_0 — one equi-join per snapshot on the derived
    // parent key, counters only.
    "cdc_fk_consistency" -> ((s, dir) => {
      val eff = filtered(s, dir).filter(col("op").isin("i", "u", "d"))
        .localCheckpoint()
      val b = eff.agg(min(col("ts_packed")), max(col("ts_packed"))).head()
      val t = b.getLong(0) + (b.getLong(1) - b.getLong(0)) / 2
      def audit(st: DataFrame, tag: String): DataFrame = {
        val parents = st.filter(col("ns") === "app.users_0")
          .select(col("doc_key").cast("long").as("pk"))
        val children = st.filter(col("ns") === "app.users_1")
          .select(col("doc_key").cast("long").as("ck"))
        children.join(parents, col("ck") - 1 === col("pk"), "left_outer")
          .agg(count(lit(1)).as("n_children"),
            coalesce(sum(col("pk").isNull.cast("long")), lit(0L))
              .as("n_dangling"))
          .select(lit(tag).as("lsn_tag"), col("n_children"), col("n_dangling"))
      }
      audit(Replay.materialize(eff.filter(col("ts_packed") <= t)), "mid")
        .unionByName(audit(Replay.materialize(eff), "final"))
    }),

    // K1's core contract as a GATED artifact (the reference relies on
    // idempotence for at-least-once delivery, `README.md:55`): a feed
    // where EVERY record is re-delivered (the at-least-once worst case —
    // the whole batch duplicated verbatim) must materialize the
    // identical state. The query folds the doubled feed and diffs it
    // against the single fold; the oracle pins every ns to all-equal
    // with zero mismatch/only rows, so a path where re-delivery
    // double-applies (a SUM-flavored fold, a non-idempotent counter)
    // hash-diverges.
    "cdc_idempotent_replay" -> ((s, dir) => {
      val eff = filtered(s, dir).filter(col("op").isin("i", "u", "d"))
        .localCheckpoint()
      val once = Replay.materialize(eff)
      val twice = Replay.materialize(eff.unionByName(eff))
      Replay.diffStates(once, twice)
    }),

    // Dual-active (active-active) replica merge — the deployment the
    // reference's gid machinery exists for (P10: each site tags its own
    // writes; the other site's replayer drops foreign gids to break the
    // loop): two sites see overlapping slices of the write stream
    // (event_id % 3 splits: A = {0,2}, B = {1,2} — %3==2 lands on BOTH),
    // each folds its own per-key state WITH tombstones, and the merge is
    // a second argmax over the two states' last entries. Keeping
    // tombstones through the merge is the load-bearing subtlety: merging
    // delete-free states would resurrect a key one site deleted from
    // the other site's stale upsert. The gate proves merged ≡ the
    // direct fold of the union, next to per-ns counts of genuinely
    // CONFLICTING keys (both sites wrote, different last events).
    "cdc_active_active_merge" -> ((s, dir) => {
      val eff = filtered(s, dir).filter(col("op").isin("i", "u", "d"))
        .localCheckpoint()
      // per-site last entry per key, tombstones and the ts kept (the
      // merge must rank by the SAME (ts, event_id) order the direct
      // fold uses — ranking by event id alone could disagree on keys
      // whose delivery ids are not ts-monotone)
      def site(pred: org.apache.spark.sql.Column) =
        eff.filter(pred).groupBy(col("ns"), col("doc_key"))
          .agg(max(struct(col("ts_packed"), col("event_id"), col("op"),
            col("value"))).as("m"))
      val a = site(col("event_id") % 3 =!= 1)
      val b = site(col("event_id") % 3 =!= 0)
      val survivors = mergeSiteStates(a, b)
      val direct = Replay.materialize(eff)
      val conflicts = a
        .select(col("ns"), col("doc_key"), col("m.event_id").as("a_event"))
        .join(b.select(col("ns"), col("doc_key"),
          col("m.event_id").as("b_event")), Seq("ns", "doc_key"))
        .filter(col("a_event") =!= col("b_event"))
        .groupBy(col("ns")).agg(count(lit(1)).as("n_conflicts"))
      Replay.diffStates(direct, survivors)
        .join(conflicts, Seq("ns"), "left_outer")
        .select(col("ns"), col("n_equal"), col("n_mismatch"),
          col("n_src_only"), col("n_dst_only"),
          coalesce(col("n_conflicts"), lit(0L)).as("n_conflicts"))
    }),

    // The active-active LOOP closed end-to-end — the topology the gid
    // machinery exists for (`oplog_filter.go:30-55` gid filter,
    // `syncer.go:618-633` gid scrub): site A and site B EACH tail the
    // other. A local write lands in its site's oplog with g=''; the
    // outbound syncer keeps only g='' (local) entries, SCRUBS the gid,
    // and applies them to the peer — where the replicated write re-enters
    // the peer's oplog tagged with the channel gid. The peer's own
    // outbound pass then sees those foreign-gid entries and the gid
    // filter drops every one: round 2 delivers ZERO ops in both
    // directions — the echo is dead, not damped. Both site states are
    // built through the REAL applyBatch (local batch, then the inbound
    // replicated batch) and must equal the direct union fold exactly.
    // Proof sections: `state` = site A's final state (≡ the fold);
    // `conv` = diffStates of BOTH sites vs the fold (all-zero
    // mismatch/missing); `loop` = per-direction, per-round delivered
    // counts (r1 = each site's local volume, r2 = 0).
    "cdc_active_active_loop" -> ((s, dir) => {
      val work = graft.Work.dir(s"aa_loop_q")
      graft.streaming.IncrSync.deletePath(s, work)
      val eff = filtered(s, dir).filter(col("op").isin("i", "u", "d"))
        .localCheckpoint()
      // disjoint site-local key spaces: even keys write at A, odd at B
      val localA = eff.filter(expr("cast(doc_key as bigint) % 2 = 0"))
      val localB = eff.filter(expr("cast(doc_key as bigint) % 2 = 1"))

      // one outbound syncer pass over NEW site-oplog entries: gid filter
      // (keep local g='' only), then the scrub — exactly the reference's
      // filter-then-clear order
      def outbound(newEntries: DataFrame): (DataFrame, Long) = {
        val kept = newEntries.filter(OplogFilters.gidAllowed(Seq("")))
          .localCheckpoint()
        (Transforms.gidScrub(kept), kept.count())
      }

      // round 1: each site ships its local segment to the peer
      val (a2b1, nA2B1) = outbound(localA)
      val (b2a1, nB2A1) = outbound(localB)
      // the peers apply through the real pipeline: local batch 0, then
      // the inbound replicated batch 1
      graft.streaming.IncrSync.applyBatch(localA, s"$work/a", 0L, nBuckets = 16)
      graft.streaming.IncrSync.applyBatch(b2a1, s"$work/a", 1L, nBuckets = 16)
      graft.streaming.IncrSync.applyBatch(localB, s"$work/b", 0L, nBuckets = 16)
      graft.streaming.IncrSync.applyBatch(a2b1, s"$work/b", 1L, nBuckets = 16)
      // the replicated writes re-enter each peer's oplog under the
      // channel gid — the segment round 2 tails
      val oplogA2 = b2a1.withColumn("g", lit("shake_b"))
      val oplogB2 = a2b1.withColumn("g", lit("shake_a"))
      // round 2: the only new entries are foreign-gid — zero must pass
      val (_, nA2B2) = outbound(oplogA2)
      val (_, nB2A2) = outbound(oplogB2)

      val direct = Replay.materialize(eff)
      val stateA = graft.streaming.IncrSync.readOrEmpty(s, s"$work/a/state")
      val stateB = graft.streaming.IncrSync.readOrEmpty(s, s"$work/b/state")
      def convRow(name: String, st: DataFrame) =
        Replay.diffStates(direct, st)
          .agg(coalesce(sum(col("n_equal")), lit(0L)).as("x"),
            coalesce(sum(col("n_mismatch") + col("n_src_only") +
              col("n_dst_only")), lit(0L)).as("y"))
          .select(lit("conv").as("section"), lit(name).as("a"), lit("").as("b"),
            col("x"), col("y"), lit(0.0).as("v"))
      def loopRow(dirn: String, round: String, n: Long) =
        s.range(1).select(lit("loop").as("section"), lit(dirn).as("a"),
          lit(round).as("b"), lit(n).as("x"), lit(0L).as("y"), lit(0.0).as("v"))
      val state = stateA.select(lit("state").as("section"), col("ns").as("a"),
        col("doc_key").as("b"), col("last_event_id").as("x"), lit(0L).as("y"),
        col("last_value").as("v"))
      state
        .unionByName(convRow("site_a", stateA))
        .unionByName(convRow("site_b", stateB))
        .unionByName(loopRow("a2b", "r1", nA2B1))
        .unionByName(loopRow("a2b", "r2", nA2B2))
        .unionByName(loopRow("b2a", "r1", nB2A1))
        .unionByName(loopRow("b2a", "r2", nB2A2))
    }),

    // Incremental backup export — the "changes since LSN T" batch a
    // downstream consumer pulls instead of re-reading the full state
    // (the delta face of cdc_time_travel's point-in-time fold): the
    // effective last op per key WITHIN the (t1, t2] window, tombstones
    // included — a key deleted in the window exports op='d' so the
    // consumer can retract; a key untouched in the window exports
    // nothing. Same one-exchange argmax fold as cdc_apply, just
    // ts-range-scoped — at 100 TB the export reads only the window's
    // feed slice (partition-pruned on the LSN layout), never the state.
    "cdc_delta_export" -> ((s, dir) => {
      val eff = filtered(s, dir).filter(col("op").isin("i", "u", "d"))
      val b = eff.agg(min(col("ts_packed")), max(col("ts_packed"))).head()
      val span = b.getLong(1) - b.getLong(0)
      val (t1, t2) = (b.getLong(0) + span / 2, b.getLong(0) + 3 * span / 4)
      Replay.lastPerKey(
          eff.filter(col("ts_packed") > t1 && col("ts_packed") <= t2))
        .select(col("ns"), col("doc_key"), col("op"),
          col("last_value"), col("last_event_id"), col("n_ops"))
    }),

    // P10 gid scrub: every record's gid blanks; n_foreign proves the scrub
    // actually hit the foreign-gid rows (not a vacuous pass-through).
    // Post-sync verification (scripts/comparison.py analogue): diff the
    // true state fold against a target folded from a feed with
    // deterministic delivery defects (every 101st event lost) — the
    // summary pins exactly which namespaces drifted and how.
    "cdc_compare" -> ((s, dir) => {
      val eff = filtered(s, dir).filter(col("op").isin("i", "u", "d"))
      val src = graft.apply.Replay.materialize(eff)
      val dst = graft.apply.Replay.materialize(
        eff.filter(col("event_id") % 101 =!= 0))
      graft.apply.Replay.diffStates(src, dst)
    }),

    // The checker-to-repair loop CLOSED (the workflow comparison.py only
    // begins — find drift, then fix it): a defective target (cdc_compare's
    // lossy feed, harshened: every 13th event lost PLUS every 5th delete
    // lost, so all three repair classes — insert, update, AND the
    // lost-delete leftover — occur at every scale factor) is diffed, the diff classified
    // into an executable repair batch (src_only→insert, mismatch→update,
    // dst_only→delete, each carrying the source truth), the batch APPLIED
    // with the idempotent merge, and the result re-verified. Output: per-
    // ns repair-op counts next to the post-repair diff — the oracle pins
    // n_mismatch/n_src_only/n_dst_only to 0 and n_equal to the full doc
    // count, so a repair that misses or corrupts a class hash-diverges.
    "cdc_repair" -> ((s, dir) => {
      val eff = filtered(s, dir).filter(col("op").isin("i", "u", "d"))
      val src = Replay.materialize(eff)
      val dst = Replay.materialize(eff.filter(
        col("event_id") % 13 =!= 0 &&
          !(col("op") === "d" && col("event_id") % 5 === 0)))
      // reused by the count summary AND the apply — pin it once
      val plan = Replay.repairPlan(src, dst).localCheckpoint()
      val post = Replay.diffStates(src, Replay.applyRepairs(dst, plan))
      val counts = plan.groupBy(col("ns")).agg(
        sum((col("action") === "i").cast("long")).as("n_repair_insert"),
        sum((col("action") === "u").cast("long")).as("n_repair_update"),
        sum((col("action") === "d").cast("long")).as("n_repair_delete"))
      post.join(counts, Seq("ns"), "full_outer")
        .select(col("ns"),
          coalesce(col("n_repair_insert"), lit(0L)).as("n_repair_insert"),
          coalesce(col("n_repair_update"), lit(0L)).as("n_repair_update"),
          coalesce(col("n_repair_delete"), lit(0L)).as("n_repair_delete"),
          coalesce(col("n_equal"), lit(0L)).as("n_equal"),
          coalesce(col("n_mismatch"), lit(0L)).as("n_mismatch"),
          coalesce(col("n_src_only"), lit(0L)).as("n_src_only"),
          coalesce(col("n_dst_only"), lit(0L)).as("n_dst_only"))
    }),

    // The checker's count-only fast path (comparison_3x.py's default
    // mode): per-namespace count equality on the same defective feed —
    // the cheap first-pass check a user runs before paying for the
    // row-level diff. Note it CAN mask compensating defects (a lost
    // insert + a lost delete in one ns), exactly as the reference's
    // count mode does — cdc_compare is the authoritative check.
    "cdc_compare_counts" -> ((s, dir) => {
      val eff = filtered(s, dir).filter(col("op").isin("i", "u", "d"))
      val src = graft.apply.Replay.materialize(eff)
      val dst = graft.apply.Replay.materialize(
        eff.filter(col("event_id") % 101 =!= 0))
      graft.apply.Replay.diffCounts(src, dst)
    }),

    // The checker's "sample" mode, scale-correct: a deterministic hash
    // sample of the KEY space (1 in 10) on both sides — the reference
    // samples random documents and point-reads the target; a hash sample
    // keeps the one-join shape and is reproducible across runs/engines.
    "cdc_compare_sample" -> ((s, dir) => {
      import graft.functions.Portable.phash64
      val eff = filtered(s, dir).filter(col("op").isin("i", "u", "d"))
      val keep = pmod(phash64(concat(col("ns"), lit("/"), col("doc_key"))), lit(10)) === 0
      val src = graft.apply.Replay.materialize(eff).filter(keep)
      val dst = graft.apply.Replay.materialize(
        eff.filter(col("event_id") % 101 =!= 0)).filter(keep)
      graft.apply.Replay.diffStates(src, dst)
    }),

    "cdc_gid_scrub" -> ((s, dir) =>
      Transforms.gidScrub(oplog(s, dir).withColumn("g_pre", col("g")))
        .groupBy(col("g"))
        .agg(count(lit(1)).as("n"),
          sum((col("g_pre") === "ext").cast("long")).as("n_foreign"))),

    // ObjectId timestamp/field extraction (`tools/mongo_id.go:21-60`): a
    // 24-hex ObjectId is [4B epoch-seconds | 5B machine+pid | 3B counter];
    // decoding the leading seconds is how operators turn a document id
    // into a resume position. Synthesize each event's ObjectId from its
    // own fields (time = ts seconds, machine = user hash, counter =
    // event_id mod 2^24), then decode it back with the portable hex
    // arithmetic — a field misalignment or radix slip hash-diverges.
    // Pure projection, codegen'd end to end.
    "cdc_objectid_decode" -> ((s, dir) => {
      val e = graft.Tables.loadEventsNs(s, dir)
      val oid = concat(
        lpad(lower(hex(expr("ts DIV 1000000000"))), 8, "0"),
        lpad(lower(hex(pmod(col("user_id"), lit(1099511627776L)))), 10, "0"),
        lpad(lower(hex(pmod(col("event_id"), lit(16777216L)))), 6, "0"))
      e.select(col("event_id"), oid.as("oid"))
        .select(col("event_id"), col("oid"),
          conv(substring(col("oid"), 1, 8), 16, 10).cast("long").as("oid_ts_sec"),
          conv(substring(col("oid"), 9, 10), 16, 10).cast("long").as("oid_machine"),
          conv(substring(col("oid"), 19, 6), 16, 10).cast("long").as("oid_counter"))
    }),

    // Schema-DRIFT detection over the change stream — the ops report that
    // catches an application deploy changing its document shape (the
    // follow-on to snap_schema_infer's point-in-time inventory): the
    // sampled doc stream is split at its ts midpoint and each (ns, field)
    // is classified added / removed / type_changed / stable from presence
    // counts and the distinct regex-classified value types on each side.
    // The synthesized doc stream models the deploy: `cents` flips number →
    // string at the midpoint, `legacy` exists only before, `v2` only
    // after. Scale shape: one sampled scan, the kv explode collapses
    // map-side per (ns, field, type, half); the report is
    // |namespaces×fields| rows — no second pass, no driver loop.
    "cdc_schema_drift" -> ((s, dir) => {
      val e = graft.Tables.loadEventsNs(s, dir).filter(col("event_id") % 10 === 0)
        .localCheckpoint()
      val b = e.agg(min(col("ts")), max(col("ts"))).head()
      val tmid = b.getLong(0) + (b.getLong(1) - b.getLong(0)) / 2
      val uid = col("user_id").cast("string")
      val cents = round(col("value") * 100).cast("long").cast("string")
      val ns = concat(
        when(col("user_id") % 50 === 0, "local").otherwise("app"),
        lit(".users_"), (col("user_id") % 4).cast("string"))
      val after = col("ts") > tmid
      val doc = concat(lit("{\"_id\":"), uid,
        when(!after, concat(lit(",\"cents\":"), cents))
          .otherwise(concat(lit(",\"cents\":\""), cents, lit("\""))),
        when(!after, lit(",\"legacy\":1")).otherwise(lit("")),
        when(after, concat(lit(",\"v2\":\"u"), uid, lit("\""))).otherwise(lit("")),
        lit("}"))
      val pat = "\"(\\w+)\":(.)"
      val kv = e.select(ns.as("ns"), after.as("after"), doc.as("doc"))
        .select(col("ns"), col("after"),
          explode(arrays_zip(
            regexp_extract_all(col("doc"), lit(pat), lit(1)),
            regexp_extract_all(col("doc"), lit(pat), lit(2)))).as("p"))
        .select(col("ns"), col("after"), col("p.0").as("field"),
          when(col("p.1").rlike("[0-9-]"), "number")
            .when(col("p.1") === "\"", "string")
            .when(col("p.1") === "[", "array")
            .when(col("p.1") === "{", "object")
            .otherwise("other").as("ftype"))
      kv.groupBy(col("ns"), col("field"))
        .agg(
          sum(when(!col("after"), 1L).otherwise(0L)).as("n_before"),
          sum(when(col("after"), 1L).otherwise(0L)).as("n_after"),
          array_join(sort_array(collect_set(when(!col("after"), col("ftype")))), ",")
            .as("types_before"),
          array_join(sort_array(collect_set(when(col("after"), col("ftype")))), ",")
            .as("types_after"))
        .withColumn("status",
          when(col("n_before") === 0, "added")
            .when(col("n_after") === 0, "removed")
            .when(col("types_before") =!= col("types_after"), "type_changed")
            .otherwise("stable"))
    }),

    // X1-X3: routing distribution (worker → volume, distinct namespaces).
    "cdc_route_stats" -> ((s, dir) =>
      filtered(s, dir)
        .withColumn("worker", Hashers.workerWhitelist(idColls, nWorkers))
        .groupBy(col("worker"))
        .agg(count(lit(1)).as("n"), countDistinct(col("ns")).as("n_ns"))),

    // G4/G6: per-worker checkpoint watermarks (min acked / newest ts).
    "cdc_checkpoint" -> ((s, dir) => Replay.checkpointByWorker(routed(s, dir))),

    // DISASTER-RECOVERY rebootstrap drill — seed a brand-new replica
    // from the MATERIALIZED state, not from the source (the move that
    // rescues a deployment whose checkpoint fell off the capped oplog —
    // cdc_oplog_sizing prices exactly that hazard — without re-reading
    // the primary): every current document becomes one bootstrap insert
    // carrying its provenance (last_event_id), the insert stream
    // replays through the SAME apply path (Replay.materialize — no
    // bespoke bootstrap writer to trust), and diffStates proves the
    // re-seeded target ≡ the original state document-for-document. The
    // oracle pins the all-equal verdict, so any divergence in the
    // round-trip (apply, provenance, or diff) fails the gate. Output:
    // the per-ns checker counters a real failover drill signs off on.
    "cdc_rebootstrap" -> ((s, dir) => {
      val state = Replay.materialize(filtered(s, dir))
      val bootstrap = state.select(
        col("last_event_id").as("event_id"), lit(0L).as("ts_packed"),
        lit("i").as("op"), col("ns"), col("doc_key"),
        col("last_value").as("value"))
      Replay.diffStates(state, Replay.materialize(bootstrap))
    }),

    // Oplog WINDOW SIZING — the capacity-planning report behind the
    // deployment's most consequential knob (reference operations: a
    // checkpoint that falls off the capped oplog forces a full resync —
    // `collector/checkpoint.go` guards exactly this). Per worker, from
    // observable corpus quantities only: op rate, approximate record
    // volume (payload + envelope bytes), and the projected oplog bytes
    // needed to tolerate a one-hour apply stall. Integer-exact
    // throughout (rates scaled to per-1000 s; bytes×3.6e9 stays well
    // under 2^63). One groupBy exchange; the report is |workers| rows.
    "cdc_oplog_sizing" -> ((s, dir) =>
      filtered(s, dir)
        .withColumn("worker", Hashers.workerWhitelist(idColls, nWorkers))
        .withColumn("rec_bytes",
          expr("length(props) + length(ns) + length(doc_key) + 26"))
        .groupBy(col("worker"))
        .agg(count(lit(1)).as("n_ops"),
          (max(col("ts_us")) - min(col("ts_us"))).as("span_us"),
          sum(col("rec_bytes").cast("long")).as("approx_bytes"))
        .withColumn("ops_per_ksec", expr("n_ops * 1000000000 DIV span_us"))
        .withColumn("bytes_per_ksec",
          expr("approx_bytes * 1000000000 DIV span_us"))
        .withColumn("window_mb_1h",
          expr("(approx_bytes * 3600000000 DIV span_us) DIV 1048576"))),

    // Journal GAP audit — after an incident, WHICH LSN ranges were lost
    // (the question the delivery journal exists to answer; pairs with
    // cdc_compare's state diff by localizing loss in the stream, not
    // the state). Expected = the filtered feed; delivered = expected
    // minus a deterministic loss set (event_id % 211 == 0 — the
    // fixture's incident). Lost rows collapse to contiguous runs per
    // worker via islands detection (delivery-order rank − loss-order
    // rank is constant within a run). The delivery rank is NOT a
    // per-worker window (8 fat partitions would sort the whole history
    // at scale) — it is the distributed prefix sum over (worker,
    // ts-second) buckets, rebased per worker by subtracting the
    // worker's first global position; only the LOSS set (incident-
    // sized, not history-sized) rides a per-worker window after that.
    "cdc_journal_gaps" -> ((s, dir) => {
      val ranked = Relational.prefixSum(
        filtered(s, dir)
          .withColumn("worker", Hashers.workerWhitelist(idColls, nWorkers))
          .select(col("worker"), col("ts_packed"), col("event_id")),
        lit(1L), struct(col("worker"), col("ts_packed"), col("event_id")),
        struct(col("worker"), expr("ts_packed DIV 4294967296")), out = "gpos")
      val base = ranked.groupBy(col("worker"))
        .agg(min(col("gpos")).as("_first"))
      val wl = org.apache.spark.sql.expressions.Window
        .partitionBy(col("worker")).orderBy(col("pos"))
      ranked.join(broadcast(base), Seq("worker"))
        .withColumn("pos", col("gpos") - col("_first") + 1L)
        .filter(col("event_id") % 211 === 0)
        .withColumn("island", col("pos") - row_number().over(wl))
        .groupBy(col("worker"), col("island"))
        .agg(min(col("event_id")).as("from_event"),
          max(col("event_id")).as("to_event"),
          count(lit(1)).as("n_missing"))
        .drop("island")
    }),

    // G2/G3: run-length (ns,op) flush groups in per-worker oplog order.
    "cdc_combine_groups" -> ((s, dir) =>
      Combiner.flushGroups(
        filtered(s, dir).withColumn("worker", Hashers.workerWhitelist(idColls, nWorkers)))),

    // P7+W3: full update-spec replay — per-key ordered fold applying
    // replace/$set+$inc/delete specs through the JSON document algebra.
    "cdc_update_apply" -> ((s, dir) => Replay.applyOps(filtered(s, dir))),

    // W3 extended vocabulary: $mul/$min/$max/$rename/$addToSet/$pop and
    // positional $[] replay through the document algebra; the oracle folds
    // the same op sequence with a DuckDB list_reduce lambda.
    "cdc_update_ops2" -> ((s, dir) => Replay.applyOps2(filtered(s, dir))),

    // W3 array surface: $push/$pull sequential replay through the same
    // document algebra (v2 array semantics, oplog.go:281-392). The oracle
    // is the closed form: an element survives iff no matching pull lands
    // after its push, the array resets at the last insert/delete.
    "cdc_update_arrays" -> ((s, dir) => Replay.applyArrayOps(filtered(s, dir))),

    // Scale-safe incremental apply (W1-W4 + T8 over bucketed state): K
    // sequential ts-ordered micro-batches through IncrSync.applyBatch —
    // each rewrites only the state buckets it touches — must converge to
    // the one-shot global materialization the oracle computes. The ntile
    // batching below is a TEST HARNESS (drives the operator with a
    // deterministic batch split); production batches come from the
    // streaming trigger.
    "cdc_incr_state" -> ((s, dir) => {
      import graft.streaming.IncrSync
      val work = graft.Work.dir(s"incr_state_q")
      IncrSync.deletePath(s, work)
      val ops = filtered(s, dir).filter(col("op").isin("i", "u", "d"))
      ops.persist()
      // Time-ordered quarter-batches via exact ts percentiles (ts_packed is
      // unique, so the cuts are clean) — convergence of the merge requires
      // batches in time order, not any particular split. A global ntile
      // window would single-thread-sort the corpus for the same effect.
      val cuts = ops.agg(
        expr("percentile(ts_packed, 0.25)").cast("long"),
        expr("percentile(ts_packed, 0.50)").cast("long"),
        expr("percentile(ts_packed, 0.75)").cast("long")).head()
      // Empty input → null percentiles → one empty batch, not an NPE.
      val bounds =
        if (cuts.isNullAt(0)) Seq(Long.MinValue, Long.MaxValue)
        else Seq(Long.MinValue, cuts.getLong(0), cuts.getLong(1),
          cuts.getLong(2), Long.MaxValue)
      // 16 buckets at test scale (a state-table layout parameter — the
      // mechanics are bucket-count-independent; production sizes it to
      // keep bucket size under executor memory).
      bounds.sliding(2).zipWithIndex.foreach { case (Seq(lo, hi), k) =>
        IncrSync.applyBatch(
          ops.filter(col("ts_packed") > lo && col("ts_packed") <= hi),
          work, k.toLong, nBuckets = 16)
      }
      ops.unpersist()
      IncrSync.readOrEmpty(s, s"$work/state")
        .select("ns", "doc_key", "last_value", "last_event_id")
    }),

    // Incremental AGGREGATE-view maintenance (the streaming materialized
    // view): per-ns COUNT and SUM kept current from change-feed deltas,
    // never recomputed. An aggregate cannot be maintained from the feed
    // alone — an update's contribution is (new − old) and a delete's is
    // (−old), and the old value only lives in the keyed state table — so
    // each batch's last-effective-write set LEFT-joins the pre-batch
    // state once: present key → update delta, absent → insert delta,
    // delete-of-present → retraction. All value math is DECIMAL(18,2),
    // so per-key contributions telescope exactly across batches and the
    // maintained sum is bit-equal to the oracle's full recompute. Shape
    // at 100 TB: per batch, one |batch-keys| join against the state
    // buckets plus a |ns|-row delta aggregate — the view costs O(batch),
    // not O(state), which is the entire point of maintenance.
    // Incremental maintenance of a JOIN view — the companion to
    // cdc_incr_agg's aggregate maintenance; together they cover the two
    // materialized-view shapes a warehouse keeps over a CDC feed. The
    // view is users_0 ⋈ users_1 on the derived household key (user DIV 4
    // — each namespace owns one member per household, so the per-ns key
    // universes, disjoint by construction, still join). Per batch:
    // per-side deltas fold map-side (lastPerKey), states merge by
    // anti+union, and ONLY touched households re-join —
    // V₁ = V₀⟨untouched⟩ ∪ (A₁ ⋈ B₁)⟨touched⟩ — with the touched set
    // broadcast (a batch is small next to the state at 100 TB) and the
    // carried view never rebuilt. The oracle is the full-fold join, so
    // a maintenance path that loses, duplicates, or staled a household
    // hash-diverges.
    "cdc_incr_join_view" -> ((s, dir) => {
      val ops = filtered(s, dir).filter(col("op").isin("i", "u", "d"))
      ops.persist()
      val cuts = ops.agg(
        expr("percentile(ts_packed, 0.25)").cast("long"),
        expr("percentile(ts_packed, 0.50)").cast("long"),
        expr("percentile(ts_packed, 0.75)").cast("long")).head()
      val bounds =
        if (cuts.isNullAt(0)) Seq(Long.MinValue, Long.MaxValue)
        else Seq(Long.MinValue, cuts.getLong(0), cuts.getLong(1),
          cuts.getLong(2), Long.MaxValue)
      val out = incrementalJoinView(ops, "app.users_0", "app.users_1", bounds)
      ops.unpersist()
      out
    }),

    "cdc_incr_agg" -> ((s, dir) => {
      val work = graft.Work.dir(s"incr_agg_q")
      val ops = filtered(s, dir).filter(col("op").isin("i", "u", "d"))
      ops.persist()
      val cuts = ops.agg(
        expr("percentile(ts_packed, 0.25)").cast("long"),
        expr("percentile(ts_packed, 0.50)").cast("long"),
        expr("percentile(ts_packed, 0.75)").cast("long")).head()
      val bounds =
        if (cuts.isNullAt(0)) Seq(Long.MinValue, Long.MaxValue)
        else Seq(Long.MinValue, cuts.getLong(0), cuts.getLong(1),
          cuts.getLong(2), Long.MaxValue)
      val out = incrementalAgg(ops, work, bounds)
      ops.unpersist()
      out
    }),

    // T1-T3: the real transaction assembler. Synthesizes applyOps chains
    // from the corpus — inner ops grouped 2-per-entry in ts order, earlier
    // entries marked partialTxn, last entry the unprepared commit; txns
    // with (lsid+txnNumber) % 7 == 0 get all-partial entries plus an
    // abortTransaction marker (purged, emitting nothing). Entries flow
    // through the T2 classifier (kind DERIVED from the body) and the
    // chain fold with the T3 ts patch.
    "cdc_txn_assemble" -> ((s, dir) => {
      import graft.streaming.TxnAssembler
      val wOps = org.apache.spark.sql.expressions.Window
        .partitionBy(col("lsid"), col("txn_number"))
        .orderBy(col("ts_packed"), col("event_id"))
      val eff = filtered(s, dir).filter(col("op").isin("i", "u", "d"))
        .withColumn("lsid", col("doc_key"))
        .withColumn("txn_number", expr("ts_us DIV 3600000000"))
        .withColumn("rn", row_number().over(wOps) - 1)
        .withColumn("payload", concat(lit("{\"event_id\":"), col("event_id").cast("string"),
          lit(",\"op\":\""), col("op"), lit("\"}")))
        .withColumn("entry_seq", expr("rn DIV 2"))
      val entries0 = eff.groupBy(col("lsid"), col("txn_number"), col("entry_seq"))
        .agg(
          max(col("ts_packed")).as("ts_packed"),
          concat_ws(",", transform(
            array_sort(collect_list(struct(col("rn"), col("payload")))),
            x => x.getField("payload"))).as("ops_json"))
      val wTxn = org.apache.spark.sql.expressions.Window
        .partitionBy(col("lsid"), col("txn_number"))
      val entries1 = entries0
        .withColumn("max_seq", max(col("entry_seq")).over(wTxn))
        .withColumn("aborted",
          pmod(col("lsid").cast("bigint") + col("txn_number"), lit(7)) === 0)
        .withColumn("o",
          when(col("entry_seq") < col("max_seq") || col("aborted"),
            concat(lit("{\"applyOps\":["), col("ops_json"), lit("],\"partialTxn\":true}")))
            .otherwise(concat(lit("{\"applyOps\":["), col("ops_json"), lit("]}"))))
        .withColumn("op", lit("c"))
        .withColumn("seq", col("entry_seq"))
      val abortEntries = entries1
        .filter(col("aborted") && col("entry_seq") === col("max_seq"))
        .select(col("lsid"), col("txn_number"), (col("max_seq") + 1).as("seq"),
          lit("c").as("op"), lit("{\"abortTransaction\":1}").as("o"), col("ts_packed"))
      val all = entries1.select("lsid", "txn_number", "seq", "op", "o", "ts_packed")
        .unionByName(abortEntries)
      TxnAssembler.assembleBatch(TxnAssembler.classifyEntries(all))
        .select(col("lsid"), col("txnNumber").as("txn_number"),
          col("idx"), col("op"), col("ts"))
    }),

    // T1 TTL purge (`oplog/txn_buffer.go:63-301` orphan cleanup): the REAL
    // streaming assembler under ProcessingTimeTimeout, driven through three
    // micro-batches. Txns with (lsid + txnNumber) % 5 == 0 are "orphans":
    // their commit is withheld until after the TTL, so the buffered partial
    // state must time out and be purged — the late commit then emits ONLY
    // its own entry's ops (the purged partials are gone by design). All
    // other txns ship partials + commit together and emit fully. The
    // MemoryStream feed is driver-side by definition (it is the harness,
    // like the reference's test fixtures); the assembler runs distributed.
    "cdc_txn_ttl" -> ((s, dir) => {
      import graft.streaming.TxnAssembler
      import graft.streaming.TxnAssembler.TxnEntry
      import s.implicits._
      val wOps = org.apache.spark.sql.expressions.Window
        .partitionBy(col("lsid"), col("txn_number"))
        .orderBy(col("ts_packed"), col("event_id"))
      val wTxn = org.apache.spark.sql.expressions.Window
        .partitionBy(col("lsid"), col("txn_number"))
      val eff = filtered(s, dir).filter(col("op").isin("i", "u", "d"))
        .withColumn("lsid", col("doc_key"))
        .withColumn("txn_number", expr("ts_us DIV 3600000000"))
        .withColumn("rn", row_number().over(wOps) - 1)
        .withColumn("payload", concat(lit("{\"event_id\":"), col("event_id").cast("string"),
          lit(",\"op\":\""), col("op"), lit("\"}")))
        .withColumn("entry_seq", expr("rn DIV 2"))
      val entries = eff.groupBy(col("lsid"), col("txn_number"), col("entry_seq"))
        .agg(max(col("ts_packed")).as("ts"),
          transform(array_sort(collect_list(struct(col("rn"), col("payload")))),
            x => x.getField("payload")).as("ops"))
        .withColumn("kind",
          when(col("entry_seq") < max(col("entry_seq")).over(wTxn), "partial")
            .otherwise("commit"))
        .withColumn("orphan",
          pmod(col("lsid").cast("bigint") + col("txn_number"), lit(5)) === 0)
        .select(col("lsid"), col("txn_number"), col("entry_seq"), col("kind"),
          col("ops"), col("ts"), col("orphan"))
        .as[(String, Long, Long, String, Seq[String], Long, Boolean)]
        .collect()
      def toEntry(t: (String, Long, Long, String, Seq[String], Long, Boolean)) =
        TxnEntry(t._1, t._2, t._3, t._4, t._5, t._6)
      val (orphanCommits, immediate) =
        entries.partition(t => t._7 && t._4 == "commit")

      // Expected emissions, known in closed form: healthy txns release
      // every op; purged orphans release only their commit entry's ops.
      val nImmediate = immediate.filterNot(_._7).map(_._5.size.toLong).sum
      val nFinal = nImmediate + orphanCommits.map(_._5.size.toLong).sum

      // `processAllAvailable` CANNOT drive this stream: with a processing-
      // time timeout the state operator demands a batch every trigger
      // (`shouldRunAnotherBatch` == true), so `noNewData` is never set and
      // the call blocks forever. The no-data batches are exactly what
      // expires the orphan state — so poll the sink for the closed-form
      // count instead, the way Spark's own suites use a manual clock.
      def awaitRows(n: Long): Unit = {
        val deadline = System.currentTimeMillis() + 120000L
        while (s.table("cdc_txn_ttl_out").count() < n &&
          System.currentTimeMillis() < deadline) Thread.sleep(100)
      }

      val ttlMs = 2000L
      implicit val sqlCtx = s.sqlContext
      s.catalog.dropTempView("cdc_txn_ttl_out")
      val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[TxnEntry]
      // state partitions scoped at birth (r19): the 250 ms trigger fires
      // a no-data batch per tick to advance the TTL clock, and every
      // batch commits every state partition — HarnessProfile measured
      // 188 s cumulative commit over 11 batches at the session's 32
      // partitions for assembler state of a few hundred rows
      val q = graft.streaming.IncrSync.scopedStart(s) {
        TxnAssembler.assemble(input.toDS(), ttlMs = ttlMs)
          .writeStream.format("memory").queryName("cdc_txn_ttl_out")
          .outputMode("append")
          .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime("250 milliseconds"))
          .start()
      }
      try {
        // Batch 1: every partial + the non-orphan commits. Healthy txns
        // emit fully and clear state; orphan partials register the TTL.
        input.addData(immediate.map(toEntry).toSeq)
        awaitRows(nImmediate)
        // Past the deadline (registered at batch 1's timestamp, at or
        // before this sleep's start): the no-data batches fire the timeout
        // pass and purge every orphan buffer, emitting nothing.
        Thread.sleep(ttlMs + 1200)
        // Sentinel tick: "~tick~" is no corpus doc_key, so it collides with
        // nothing; observing its emission PROVES a post-deadline batch ran
        // its timeout pass — the purge is then a certainty, not a race
        // against the trigger clock on a loaded box.
        input.addData(TxnEntry("~tick~", 0L, 0L, "commit", Seq("tick"), 0L))
        awaitRows(nImmediate + 1)
        // The withheld commits — state is gone, so each emits only its own
        // ops (the ts patch within the entry still applies). Were the purge
        // broken, the buffered partials would leak out here and the row
        // count/hash would diverge from the oracle.
        input.addData(orphanCommits.map(toEntry).toSeq)
        awaitRows(nFinal + 1)
      } finally q.stop()
      s.table("cdc_txn_ttl_out")
        .filter(col("lsid") =!= "~tick~")
        .select(col("lsid"), col("txnNumber").as("txn_number"),
          col("idx"), col("op"), col("ts"))
        .localCheckpoint()
    }),

    // G5: top-3 namespaces per op type (`executor/executor.go:417-471`),
    // deterministic tie-break by ns.
    "cdc_top3_ns" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("op")).orderBy(col("n").desc, col("ns"))
      filtered(s, dir).groupBy(col("op"), col("ns")).agg(count(lit(1)).as("n"))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
    }),

    // P5: recursive DBRef rewrite under ns rules. Docs synthesized with a
    // nested {$ref,$id[,$db]} (the $db branch alternates to exercise both
    // the override and the enclosing-db default + append path).
    "cdc_dbref_transform" -> ((s, dir) => {
      val rules = Seq("app.users_0" -> "app.u0", "app" -> "appx")
      val fn = udf((doc: String, db: String) => Transforms.dbRefTransform(doc, db, rules))
      filtered(s, dir)
        .withColumn("doc", concat(
          lit("{\"order\":{\"$ref\":\"users_"), pmod(col("doc_key").cast("bigint"), lit(4)),
          lit("\",\"$id\":"), col("event_id"),
          when(col("event_id") % 2 === 0, lit(",\"$db\":\"app\""))
            .otherwise(lit("")),
          lit("}}")))
        .withColumn("out", fn(col("doc"), col("db")))
        .select(col("event_id"),
          get_json_object(col("out"), "$.order.$ref").as("ref_new"),
          get_json_object(col("out"), "$.order.$db").as("db_new"))
    }),

    // P8 GatherApplyOps (`oplog/oplog.go:231-272`): pack each namespace's
    // ops, in oplog order, into one applyOps command body (digested — the
    // body itself is unbounded).
    "cdc_gather_applyops" -> ((s, dir) =>
      filtered(s, dir).filter(col("op").isin("i", "u", "d"))
        .withColumn("frag", concat(
          lit("{\"op\":\""), col("op"), lit("\",\"ts\":"),
          col("ts_packed").cast("string"), lit("}")))
        .groupBy(col("ns"))
        .agg(count(lit(1)).as("n_ops"),
          md5(concat(lit("{\"applyOps\":["),
            concat_ws(",", transform(
              array_sort(collect_list(struct(col("ts_packed"), col("event_id"), col("frag")))),
              x => x.getField("frag"))),
            lit("]}")).cast("binary")).as("cmd_md5"))),

    // W12 collision segments: level scheduling — the k-th op on a
    // unique-key value runs in segment k, so no segment holds two ops on
    // one key (verified by n_ops == n_keys in every output row).
    "cdc_collision_segments" -> ((s, dir) => {
      import graft.apply.Collision
      val eff = filtered(s, dir).filter(col("op").isin("i", "u", "d"))
        .withColumn("worker", Hashers.workerWhitelist(idColls, nWorkers))
      Collision.segments(eff,
          pmod(expr("cast(get_json_object(props, '$.k') as bigint)"), lit(13)))
        .groupBy(col("worker"), col("segment"))
        .agg(count(lit(1)).as("n_ops"), countDistinct(col("uk")).as("n_keys"),
          max(col("ts_packed")).as("max_ts"))
    }),

    // Grouping metrics per (lsid, txnNumber) bucket — per-txn op counts and
    // ts bounds (the aggregate view next to the real assembler above).
    "cdc_txn_group" -> ((s, dir) =>
      filtered(s, dir)
        .withColumn("lsid", col("doc_key"))
        .withColumn("txn_number", expr("ts_us DIV 3600000000"))
        .groupBy(col("lsid"), col("txn_number"))
        .agg(count(lit(1)).as("n_ops"),
          min(col("ts_packed")).as("first_ts"),
          max(col("ts_packed")).as("last_ts")))
  )

  /** Keep-chain WHERE fragment — mirrors [[OplogFilters.chain]]. */
  private val chainSql: String = Oplog.oracleChainSql

  /** X3 routing expression — mirrors [[Hashers.workerWhitelist]]. */
  private val workerSql: String =
    s"""CASE WHEN op = 'c' THEN 0
        WHEN coll IN ('users_1') THEN ${phash64Sql("doc_key")} % 8
        ELSE ${phash64Sql("ns")} % 8 END"""

  /** Incremental aggregate-view maintenance over time-sliced batches (the
    * engine core of `cdc_incr_agg`; edge cases golden-pinned in CdcSpec).
    * Resets `work`, folds each (lo, hi] ts slice of `ops` through the
    * bucketed state table, and accumulates per-ns (Δcount, Δsum) deltas —
    * insert-of-absent +1/+v, update-of-present 0/(new−old), upsert-of-
    * absent +1/+v, delete-of-present −1/−old, delete-of-absent no-op. All
    * value math is DECIMAL(18,2) so contributions telescope exactly.
    */
  def incrementalAgg(ops: DataFrame, work: String, bounds: Seq[Long],
      nBuckets: Int = 16): DataFrame = {
    import graft.streaming.IncrSync
    val s = ops.sparkSession
    IncrSync.deletePath(s, work)
    val d2 = "decimal(18,2)"
    val deltas = bounds.sliding(2).zipWithIndex.map { case (Seq(lo, hi), k) =>
      val batch = ops.filter(col("ts_packed") > lo && col("ts_packed") <= hi)
      val bLast = graft.apply.Replay.lastPerKey(batch)
      val state = IncrSync.readOrEmpty(s, s"$work/state")
        .select(col("ns"), col("doc_key"),
          col("last_value").cast(d2).as("_old"), lit(1).as("_present"))
      // localCheckpoint (eager): the delta must be pinned BEFORE
      // applyBatch rewrites the state buckets it was computed from.
      val delta = bLast.join(state, Seq("ns", "doc_key"), "left_outer")
        .select(col("ns"),
          when(col("op") === "d",
              when(col("_present") === 1, lit(-1L)).otherwise(lit(0L)))
            .otherwise(
              when(col("_present") === 1, lit(0L)).otherwise(lit(1L)))
            .as("dn"),
          when(col("op") === "d",
              -coalesce(col("_old"), lit(0).cast(d2)))
            .otherwise(col("last_value").cast(d2) -
              coalesce(col("_old"), lit(0).cast(d2)))
            .as("dv"))
        .groupBy(col("ns"))
        .agg(sum(col("dn")).as("dn"), sum(col("dv")).as("dv"))
        .localCheckpoint()
      IncrSync.applyBatch(batch, work, k.toLong, nBuckets = nBuckets)
      delta
    }.toSeq
    deltas.reduce(_ unionByName _)
      .groupBy(col("ns"))
      .agg(sum(col("dn")).as("n_rows"),
        sum(col("dv")).cast("double").as("v_sum"))
      .filter(col("n_rows") > 0)
  }

  /** Bucket-pruned point lookup against an `applyBatch`-written state
    * table (`cdc_point_lookup`'s engine; the physical pruning is proven
    * in CdcSpec via inputFiles). Probe buckets resolve driver-side from
    * the |probe|-row key list; the scan filter on the partition column
    * prunes to those directories before any file is opened.
    */
  def pointLookup(s: SparkSession, targetDir: String,
      keys: Seq[(String, String)],
      nBuckets: Int = graft.streaming.IncrSync.StateBuckets): DataFrame = {
    import s.implicits._
    val probe = keys.toDF("ns", "doc_key")
      .withColumn("bucket", graft.streaming.IncrSync.bucketOf(nBuckets))
    val buckets = probe.select("bucket").distinct().collect()
      .map(_.getInt(0)).toSeq
    // Merged read pruned to the probe buckets BEFORE the LSM fold: both
    // the base and any pending delta scan prune on the bucket partition
    // directories (a key's bucket is a pure function of (ns, doc_key)).
    graft.streaming.IncrSync.readStatePruned(s, s"$targetDir/state", buckets)
      .join(broadcast(probe.select("ns", "doc_key")),
        Seq("ns", "doc_key"), "left_semi")
      .select(col("ns"), col("doc_key"), col("last_value"),
        col("last_event_id"))
  }

  /** Tombstone-preserving LWW merge of two sites' last-entry states
    * (`cdc_active_active_merge`'s engine; golden-pinned in CdcSpec).
    * Each input carries per-key `m = struct(ts_packed, event_id, op,
    * value)` argmax rows WITH tombstones; the merge is a second argmax
    * over the union, and only then do deletes drop — merging delete-free
    * states instead would resurrect a key one site deleted from the
    * other site's stale upsert.
    */
  def mergeSiteStates(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b)
      .groupBy(col("ns"), col("doc_key"))
      .agg(max(col("m")).as("m"))
      .select(col("ns"), col("doc_key"), col("m.op").as("op"),
        col("m.value").as("last_value"),
        col("m.event_id").as("last_event_id"))
      .filter(col("op") =!= "d").drop("op")

  /** Incremental JOIN-view maintenance over time-sliced batches (the
    * engine core of `cdc_incr_join_view`): V = state(nsA) ⋈ state(nsB)
    * on household = key DIV 4, maintained as
    * V₁ = V₀⟨untouched households⟩ ∪ (A₁ ⋈ B₁)⟨touched households⟩.
    * Per batch the work is O(|Δ| + |V₀ ∩ touched|): per-side deltas are
    * lastPerKey argmax folds, the state merge is one anti-join + union,
    * the patch join is semi-scoped to the broadcast touched set, and the
    * carried view/states are pinned per round (localCheckpoint — constant
    * plan depth across batches, the same discipline as the component
    * fixpoint loop).
    */
  def incrementalJoinView(ops: DataFrame, nsA: String, nsB: String,
      bounds: Seq[Long]): DataFrame = {
    val hhCol = expr("cast(doc_key as bigint) DIV 4")

    def deltaFor(batch: DataFrame, ns: String): DataFrame =
      Replay.lastPerKey(batch.filter(col("ns") === ns))
        .select(col("doc_key"), col("op"), col("last_value"),
          col("last_event_id"))
        .withColumn("household", hhCol)

    def mergeState(state: DataFrame, delta: DataFrame): DataFrame =
      state.join(delta.select(col("doc_key")), Seq("doc_key"), "left_anti")
        .unionByName(delta.filter(col("op") =!= "d").drop("op"))

    def joined(a: DataFrame, b: DataFrame): DataFrame =
      a.select(col("household"), col("doc_key").as("a_key"),
          col("last_value").as("a_value"), col("last_event_id").as("a_event"))
        .join(b.select(col("household"), col("doc_key").as("b_key"),
          col("last_value").as("b_value"), col("last_event_id").as("b_event")),
          Seq("household"))

    val emptyState = deltaFor(ops.filter(lit(false)), nsA).drop("op")
    var stateA = emptyState.localCheckpoint()
    var stateB = emptyState.localCheckpoint()
    var view = joined(stateA, stateB).localCheckpoint()

    bounds.sliding(2).foreach { case Seq(lo, hi) =>
      val batch = ops.filter(col("ts_packed") > lo && col("ts_packed") <= hi)
      val dA = deltaFor(batch, nsA).localCheckpoint()
      val dB = deltaFor(batch, nsB).localCheckpoint()
      val newA = mergeState(stateA, dA).localCheckpoint()
      val newB = mergeState(stateB, dB).localCheckpoint()
      val touched = dA.select(col("household"))
        .unionByName(dB.select(col("household"))).distinct()
      val patch = joined(
        newA.join(broadcast(touched), Seq("household"), "left_semi"),
        newB.join(broadcast(touched), Seq("household"), "left_semi"))
      view = view.join(broadcast(touched), Seq("household"), "left_anti")
        .unionByName(patch).localCheckpoint()
      stateA = newA
      stateB = newB
    }
    view
  }

  private def withOplog(body: String): String = Oplog.withOracleCte(body)

  /** DuckDB mirror of [[EventNormalizer.unsetJson]]. */
  private val unsetJsonSql: String =
    """'{' || array_to_string(list_transform(removed_fields, f -> '"' || f || '":1'), ',') || '}'"""

  def oracles: Map[String, String] = Map(
    "cdc_normalize" -> withOplog(
      "SELECT event_id, ts_packed, op, ns, doc_key, g FROM oplog"),

    "cdc_event_normalize" ->
      s"""WITH cev AS (${ChangeEvent.oracleCte})
          SELECT event_id, ts_packed,
            CASE operation_type WHEN 'insert' THEN 'i' WHEN 'delete' THEN 'd'
              WHEN 'replace' THEN 'u' WHEN 'update' THEN 'u'
              WHEN 'drop' THEN 'c' WHEN 'rename' THEN 'c'
              WHEN 'dropDatabase' THEN 'c' ELSE 'x' END AS op,
            CASE WHEN operation_type IN ('drop','rename','dropDatabase')
              THEN db || '.$$cmd' ELSE db || '.' || coll END AS ns,
            CASE operation_type
              WHEN 'insert' THEN full_document
              WHEN 'delete' THEN document_key
              WHEN 'replace' THEN '{"$$set":' || full_document || '}'
              WHEN 'update' THEN (CASE
                WHEN updated_fields <> '{}' AND len(removed_fields) > 0
                  THEN '{"$$set":' || updated_fields
                    || ',"$$unset":' || $unsetJsonSql || '}'
                WHEN updated_fields <> '{}' THEN '{"$$set":' || updated_fields || '}'
                WHEN len(removed_fields) > 0 THEN '{"$$unset":' || $unsetJsonSql || '}'
                ELSE '{}' END)
              WHEN 'drop' THEN '{"drop":"' || coll || '"}'
              WHEN 'rename' THEN '{"renameCollection":"' || db || '.' || coll
                || '","to":"' || to_db || '.' || to_coll || '"}'
              WHEN 'dropDatabase' THEN '{"dropDatabase":1}'
              ELSE '{}' END AS o,
            CASE WHEN operation_type IN ('replace','update') THEN document_key
              ELSE '{}' END AS o2
          FROM cev""",

    "cdc_connector_feed" ->
      s"""WITH cev AS (${ChangeEvent.oracleCte})
          SELECT event_id, ts_packed,
            CASE operation_type WHEN 'insert' THEN 'i' WHEN 'delete' THEN 'd'
              WHEN 'replace' THEN 'u' WHEN 'update' THEN 'u'
              WHEN 'drop' THEN 'c' WHEN 'rename' THEN 'c'
              WHEN 'dropDatabase' THEN 'c' ELSE 'x' END AS op,
            CASE WHEN operation_type IN ('drop','rename','dropDatabase')
              THEN db || '.$$cmd' ELSE db || '.' || coll END AS ns,
            CASE WHEN operation_type IN ('insert','delete','replace','update')
              THEN json_extract_string(document_key, '$$._id') ELSE '' END AS doc_key,
            CASE operation_type
              WHEN 'insert' THEN full_document
              WHEN 'delete' THEN document_key
              WHEN 'replace' THEN '{"$$set":' || full_document || '}'
              WHEN 'update' THEN (CASE
                WHEN updated_fields <> '{}' AND len(removed_fields) > 0
                  THEN '{"$$set":' || updated_fields
                    || ',"$$unset":' || $unsetJsonSql || '}'
                WHEN updated_fields <> '{}' THEN '{"$$set":' || updated_fields || '}'
                WHEN len(removed_fields) > 0 THEN '{"$$unset":' || $unsetJsonSql || '}'
                ELSE '{}' END)
              WHEN 'drop' THEN '{"drop":"' || coll || '"}'
              WHEN 'rename' THEN '{"renameCollection":"' || db || '.' || coll
                || '","to":"' || to_db || '.' || to_coll || '"}'
              WHEN 'dropDatabase' THEN '{"dropDatabase":1}'
              ELSE '{}' END AS props
          FROM cev""",

    "cdc_event_fulldoc" ->
      s"""WITH cev AS (${ChangeEvent.oracleCte})
          SELECT event_id, ts_packed, db || '.' || coll AS ns,
            CASE WHEN operation_type = 'replace' OR full_document <> '{}'
              THEN '{"$$set":' || full_document || '}'
              ELSE '{}' END AS o,
            document_key AS o2
          FROM cev WHERE operation_type IN ('replace', 'update')""",

    "cdc_filter_chain" -> withOplog(
      s"SELECT op, ns, COUNT(*) AS n FROM oplog WHERE $chainSql GROUP BY op, ns"),

    "cdc_schema_drift" ->
      """WITH e AS (
           SELECT user_id, event_id, value, epoch_ns(ts) AS ts FROM events
           WHERE event_id % 10 = 0),
         tt AS (SELECT tmin + (tmax - tmin) // 2 AS tmid
                FROM (SELECT MIN(ts) AS tmin, MAX(ts) AS tmax FROM e)),
         docs AS (
           SELECT (CASE WHEN user_id % 50 = 0 THEN 'local' ELSE 'app' END)
               || '.users_' || CAST(user_id % 4 AS VARCHAR) AS ns,
             ts > tmid AS after,
             '{"_id":' || CAST(user_id AS VARCHAR)
               || CASE WHEN ts > tmid
                    THEN ',"cents":"' || CAST(CAST(round(value * 100) AS BIGINT) AS VARCHAR) || '"'
                    ELSE ',"cents":' || CAST(CAST(round(value * 100) AS BIGINT) AS VARCHAR) END
               || CASE WHEN ts > tmid THEN '' ELSE ',"legacy":1' END
               || CASE WHEN ts > tmid
                    THEN ',"v2":"u' || CAST(user_id AS VARCHAR) || '"' ELSE '' END
               || '}' AS doc
           FROM e, tt),
         kv AS (
           SELECT ns, after, field,
             CASE WHEN regexp_matches(c, '[0-9-]') THEN 'number'
                  WHEN c = '"' THEN 'string'
                  WHEN c = '[' THEN 'array'
                  WHEN c = '{' THEN 'object'
                  ELSE 'other' END AS ftype
           FROM (SELECT ns, after,
                   unnest(regexp_extract_all(doc, '"(\w+)":(.)', 1)) AS field,
                   unnest(regexp_extract_all(doc, '"(\w+)":(.)', 2)) AS c
                 FROM docs)),
         agg1 AS (
           SELECT ns, field,
             CAST(SUM(CASE WHEN after THEN 0 ELSE 1 END) AS BIGINT) AS n_before,
             CAST(SUM(CASE WHEN after THEN 1 ELSE 0 END) AS BIGINT) AS n_after
           FROM kv GROUP BY 1, 2),
         t0 AS (SELECT DISTINCT ns, field, after, ftype FROM kv),
         tb AS (SELECT ns, field, string_agg(ftype, ',' ORDER BY ftype) AS types_before
                FROM t0 WHERE NOT after GROUP BY 1, 2),
         ta AS (SELECT ns, field, string_agg(ftype, ',' ORDER BY ftype) AS types_after
                FROM t0 WHERE after GROUP BY 1, 2)
         SELECT a.ns, a.field, n_before, n_after,
           COALESCE(types_before, '') AS types_before,
           COALESCE(types_after, '') AS types_after,
           CASE WHEN n_before = 0 THEN 'added'
                WHEN n_after = 0 THEN 'removed'
                WHEN COALESCE(types_before, '') <> COALESCE(types_after, '')
                  THEN 'type_changed'
                ELSE 'stable' END AS status
         FROM agg1 a
         LEFT JOIN tb USING (ns, field)
         LEFT JOIN ta USING (ns, field)""",

    "cdc_ns_transform" -> withOplog(
      """SELECT ns,
         CASE WHEN ns = 'app.users_0' THEN 'app.u0'
              WHEN ns LIKE 'app.users_0.%' THEN 'app.u0' || substr(ns, 12)
              WHEN ns = 'app' THEN 'appx'
              WHEN ns LIKE 'app.%' THEN 'appx' || substr(ns, 4)
              ELSE ns END AS ns_new,
         COUNT(*) AS n FROM oplog GROUP BY 1, 2"""),

    "cdc_db_fanout" -> withOplog(
      """SELECT COALESCE(m.db_dst, o.db) || '.' || o.coll AS ns, COUNT(*) AS n
         FROM oplog o LEFT JOIN (VALUES ('app','app_a'), ('app','app_b')) m(db_src, db_dst)
           ON o.db = m.db_src
         GROUP BY 1"""),

    "cdc_apply" -> withOplog(
      s"""SELECT ns, doc_key, value AS last_value, event_id AS last_event_id, n_ops
          FROM (
            SELECT ns, doc_key, value, event_id, op,
              ROW_NUMBER() OVER (PARTITION BY ns, doc_key ORDER BY ts_packed DESC, event_id DESC) AS rn,
              COUNT(*) OVER (PARTITION BY ns, doc_key) AS n_ops
            FROM oplog WHERE $chainSql AND op IN ('i','u','d'))
          WHERE rn = 1 AND op <> 'd'"""),

    "cdc_schema_registry" -> withOplog(
      s""", eff AS (
            SELECT ns, ts_packed, event_id FROM oplog
            WHERE $chainSql AND op IN ('i','u')),
          fields AS (
            SELECT ns, ts_packed, '_id' AS field FROM eff
            UNION ALL SELECT ns, ts_packed, 'k' FROM eff
            UNION ALL SELECT ns, ts_packed, 'cents' FROM eff WHERE event_id % 3 = 0
            UNION ALL SELECT ns, ts_packed, 'src' FROM eff WHERE event_id % 7 = 0),
          reg AS (
            SELECT ns, field, MIN(ts_packed) AS first_seen,
              MAX(ts_packed) AS last_seen, COUNT(*) AS n_docs
            FROM fields GROUP BY 1, 2),
          tot AS (SELECT ns, COUNT(*) AS n FROM eff GROUP BY 1)
          SELECT r.ns, field, first_seen, last_seen, n_docs,
            n_docs * 1000000 // n AS coverage_ppm,
            CAST(DENSE_RANK() OVER (PARTITION BY r.ns
              ORDER BY first_seen, field) AS BIGINT) AS schema_ver
          FROM reg r JOIN tot t ON r.ns = t.ns"""),

    "cdc_schema_evolution" -> withOplog(
      s"""SELECT ns, doc_key, ts_packed AS last_ts,
            CAST(CAST(json_extract_string(props, '$$.k') AS BIGINT) AS VARCHAR) AS k,
            CASE WHEN event_id % 3 = 0
              THEN CAST(CAST(round(value * 100) AS BIGINT) AS VARCHAR) END AS cents,
            CASE WHEN event_id % 7 = 0
              THEN (CASE WHEN (event_id // 7) % 2 = 0 THEN 'web' ELSE 'app' END)
              END AS src
          FROM (
            SELECT ns, doc_key, ts_packed, event_id, value, props, op,
              ROW_NUMBER() OVER (PARTITION BY ns, doc_key
                ORDER BY ts_packed DESC, event_id DESC) AS rn
            FROM oplog WHERE $chainSql AND op IN ('i','u','d'))
          WHERE rn = 1 AND op <> 'd'"""),

    "cdc_scd2" -> withOplog(
      s"""SELECT ns, doc_key, version, valid_from, valid_to, value,
            valid_to IS NULL AS is_current
          FROM (
            SELECT ns, doc_key, op, value,
              ROW_NUMBER() OVER w AS version,
              ts_packed AS valid_from,
              LEAD(ts_packed) OVER w AS valid_to
            FROM oplog WHERE $chainSql AND op IN ('i','u','d')
            WINDOW w AS (PARTITION BY ns, doc_key ORDER BY ts_packed, event_id))
          WHERE op <> 'd'"""),

    "cdc_fk_consistency" -> withOplog(
      s""", eff AS (
            SELECT event_id, ts_packed, op, ns, doc_key, value
            FROM oplog WHERE $chainSql AND op IN ('i','u','d')),
          pin AS (
            SELECT MIN(ts_packed) + (MAX(ts_packed) - MIN(ts_packed)) // 2 AS t
            FROM eff),
          stmid AS (
            SELECT ns, doc_key FROM (
              SELECT ns, doc_key, op,
                ROW_NUMBER() OVER (PARTITION BY ns, doc_key
                  ORDER BY ts_packed DESC, event_id DESC) AS rn
              FROM eff WHERE ts_packed <= (SELECT t FROM pin))
            WHERE rn = 1 AND op <> 'd'),
          stfin AS (
            SELECT ns, doc_key FROM (
              SELECT ns, doc_key, op,
                ROW_NUMBER() OVER (PARTITION BY ns, doc_key
                  ORDER BY ts_packed DESC, event_id DESC) AS rn
              FROM eff)
            WHERE rn = 1 AND op <> 'd')
          SELECT 'mid' AS lsn_tag, COUNT(*) AS n_children,
            CAST(COALESCE(SUM(CASE WHEN p.pk IS NULL THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_dangling
          FROM (SELECT CAST(doc_key AS BIGINT) AS ck FROM stmid
                WHERE ns = 'app.users_1') c
          LEFT JOIN (SELECT CAST(doc_key AS BIGINT) AS pk FROM stmid
                WHERE ns = 'app.users_0') p ON c.ck - 1 = p.pk
          UNION ALL
          SELECT 'final', COUNT(*),
            CAST(COALESCE(SUM(CASE WHEN p.pk IS NULL THEN 1 ELSE 0 END), 0) AS BIGINT)
          FROM (SELECT CAST(doc_key AS BIGINT) AS ck FROM stfin
                WHERE ns = 'app.users_1') c
          LEFT JOIN (SELECT CAST(doc_key AS BIGINT) AS pk FROM stfin
                WHERE ns = 'app.users_0') p ON c.ck - 1 = p.pk"""),

    "cdc_time_travel" -> withOplog(
      s""", eff AS (
            SELECT event_id, ts_packed, op, ns, doc_key, value
            FROM oplog WHERE $chainSql AND op IN ('i','u','d')),
          pin AS (
            SELECT MIN(ts_packed) + (MAX(ts_packed) - MIN(ts_packed)) // 2 AS t
            FROM eff)
          SELECT ns, doc_key, value AS last_value, event_id AS last_event_id, n_ops
          FROM (
            SELECT ns, doc_key, value, event_id, op,
              ROW_NUMBER() OVER (PARTITION BY ns, doc_key
                ORDER BY ts_packed DESC, event_id DESC) AS rn,
              COUNT(*) OVER (PARTITION BY ns, doc_key) AS n_ops
            FROM eff WHERE ts_packed <= (SELECT t FROM pin))
          WHERE rn = 1 AND op <> 'd'"""),

    "cdc_gid_scrub" -> withOplog(
      """SELECT '' AS g, COUNT(*) AS n,
         CAST(SUM(CASE WHEN g = 'ext' THEN 1 ELSE 0 END) AS BIGINT) AS n_foreign
         FROM oplog"""),

    "cdc_objectid_decode" ->
      """WITH oids AS (
           SELECT event_id,
             lpad(lower(hex(epoch_ns(ts) // 1000000000)), 8, '0')
               || lpad(lower(hex(user_id % 1099511627776)), 10, '0')
               || lpad(lower(hex(event_id % 16777216)), 6, '0') AS oid
           FROM events)
         SELECT event_id, oid,
           CAST(('0x' || substr(oid, 1, 8)) AS BIGINT) AS oid_ts_sec,
           CAST(('0x' || substr(oid, 9, 10)) AS BIGINT) AS oid_machine,
           CAST(('0x' || substr(oid, 19, 6)) AS BIGINT) AS oid_counter
         FROM oids""",

    "cdc_compare_counts" -> withOplog(
      s""", eff AS (
            SELECT event_id, ts_packed, op, ns, doc_key, value
            FROM oplog WHERE $chainSql AND op IN ('i','u','d')),
          src AS (
            SELECT ns, COUNT(*) AS n FROM (
              SELECT ns, op,
                ROW_NUMBER() OVER (PARTITION BY ns, doc_key
                  ORDER BY ts_packed DESC, event_id DESC) AS rn
              FROM eff) WHERE rn = 1 AND op <> 'd' GROUP BY ns),
          dst AS (
            SELECT ns, COUNT(*) AS n FROM (
              SELECT ns, op,
                ROW_NUMBER() OVER (PARTITION BY ns, doc_key
                  ORDER BY ts_packed DESC, event_id DESC) AS rn
              FROM eff WHERE event_id % 101 <> 0) WHERE rn = 1 AND op <> 'd'
              GROUP BY ns)
          SELECT COALESCE(s.ns, d.ns) AS ns,
            CAST(COALESCE(s.n, 0) AS BIGINT) AS n_src,
            CAST(COALESCE(d.n, 0) AS BIGINT) AS n_dst,
            CAST(CASE WHEN COALESCE(s.n, 0) = COALESCE(d.n, 0) THEN 1 ELSE 0 END
              AS BIGINT) AS equal
          FROM src s FULL OUTER JOIN dst d ON s.ns = d.ns"""),

    "cdc_compare" -> withOplog(
      s""", eff AS (
            SELECT event_id, ts_packed, op, ns, doc_key, value
            FROM oplog WHERE $chainSql AND op IN ('i','u','d')),
          src AS (
            SELECT ns, doc_key, value AS v, event_id AS e FROM (
              SELECT ns, doc_key, value, event_id, op,
                ROW_NUMBER() OVER (PARTITION BY ns, doc_key
                  ORDER BY ts_packed DESC, event_id DESC) AS rn
              FROM eff) WHERE rn = 1 AND op <> 'd'),
          dst AS (
            SELECT ns, doc_key, value AS v, event_id AS e FROM (
              SELECT ns, doc_key, value, event_id, op,
                ROW_NUMBER() OVER (PARTITION BY ns, doc_key
                  ORDER BY ts_packed DESC, event_id DESC) AS rn
              FROM eff WHERE event_id % 101 <> 0) WHERE rn = 1 AND op <> 'd'),
          f AS (
            SELECT COALESCE(s.ns, d.ns) AS ns,
              CASE WHEN s.e IS NULL THEN 'dst_only'
                   WHEN d.e IS NULL THEN 'src_only'
                   WHEN s.v = d.v AND s.e = d.e THEN 'equal'
                   ELSE 'mismatch' END AS status
            FROM src s FULL OUTER JOIN dst d
              ON s.ns = d.ns AND s.doc_key = d.doc_key)
          SELECT ns,
            CAST(SUM(CASE WHEN status = 'equal' THEN 1 ELSE 0 END) AS BIGINT) AS n_equal,
            CAST(SUM(CASE WHEN status = 'mismatch' THEN 1 ELSE 0 END) AS BIGINT) AS n_mismatch,
            CAST(SUM(CASE WHEN status = 'src_only' THEN 1 ELSE 0 END) AS BIGINT) AS n_src_only,
            CAST(SUM(CASE WHEN status = 'dst_only' THEN 1 ELSE 0 END) AS BIGINT) AS n_dst_only
          FROM f GROUP BY ns"""),

    "cdc_repair" -> withOplog(
      s""", eff AS (
            SELECT event_id, ts_packed, op, ns, doc_key, value
            FROM oplog WHERE $chainSql AND op IN ('i','u','d')),
          src AS (
            SELECT ns, doc_key, value AS v, event_id AS e FROM (
              SELECT ns, doc_key, value, event_id, op,
                ROW_NUMBER() OVER (PARTITION BY ns, doc_key
                  ORDER BY ts_packed DESC, event_id DESC) AS rn
              FROM eff) WHERE rn = 1 AND op <> 'd'),
          dst AS (
            SELECT ns, doc_key, value AS v, event_id AS e FROM (
              SELECT ns, doc_key, value, event_id, op,
                ROW_NUMBER() OVER (PARTITION BY ns, doc_key
                  ORDER BY ts_packed DESC, event_id DESC) AS rn
              FROM eff WHERE event_id % 13 <> 0
                AND NOT (op = 'd' AND event_id % 5 = 0))
              WHERE rn = 1 AND op <> 'd'),
          plan AS (
            SELECT COALESCE(s.ns, d.ns) AS ns,
              COALESCE(s.doc_key, d.doc_key) AS doc_key,
              CASE WHEN s.e IS NULL THEN 'd'
                   WHEN d.e IS NULL THEN 'i'
                   ELSE 'u' END AS action,
              s.v AS last_value, s.e AS last_event_id
            FROM src s FULL OUTER JOIN dst d
              ON s.ns = d.ns AND s.doc_key = d.doc_key
            WHERE s.e IS NULL OR d.e IS NULL
              OR NOT (s.v = d.v AND s.e = d.e)),
          repaired AS (
            SELECT ns, doc_key, v, e FROM dst
            WHERE NOT EXISTS (SELECT 1 FROM plan p
              WHERE p.ns = dst.ns AND p.doc_key = dst.doc_key)
            UNION ALL
            SELECT ns, doc_key, last_value AS v, last_event_id AS e
            FROM plan WHERE action <> 'd'),
          post AS (
            SELECT COALESCE(s.ns, r.ns) AS ns,
              CASE WHEN s.e IS NULL THEN 'dst_only'
                   WHEN r.e IS NULL THEN 'src_only'
                   WHEN s.v = r.v AND s.e = r.e THEN 'equal'
                   ELSE 'mismatch' END AS status
            FROM src s FULL OUTER JOIN repaired r
              ON s.ns = r.ns AND s.doc_key = r.doc_key),
          postagg AS (
            SELECT ns,
              CAST(SUM(CASE WHEN status = 'equal' THEN 1 ELSE 0 END) AS BIGINT) AS n_equal,
              CAST(SUM(CASE WHEN status = 'mismatch' THEN 1 ELSE 0 END) AS BIGINT) AS n_mismatch,
              CAST(SUM(CASE WHEN status = 'src_only' THEN 1 ELSE 0 END) AS BIGINT) AS n_src_only,
              CAST(SUM(CASE WHEN status = 'dst_only' THEN 1 ELSE 0 END) AS BIGINT) AS n_dst_only
            FROM post GROUP BY ns),
          counts AS (
            SELECT ns,
              CAST(SUM(CASE WHEN action = 'i' THEN 1 ELSE 0 END) AS BIGINT) AS n_repair_insert,
              CAST(SUM(CASE WHEN action = 'u' THEN 1 ELSE 0 END) AS BIGINT) AS n_repair_update,
              CAST(SUM(CASE WHEN action = 'd' THEN 1 ELSE 0 END) AS BIGINT) AS n_repair_delete
            FROM plan GROUP BY ns)
          SELECT COALESCE(p.ns, c.ns) AS ns,
            COALESCE(c.n_repair_insert, 0) AS n_repair_insert,
            COALESCE(c.n_repair_update, 0) AS n_repair_update,
            COALESCE(c.n_repair_delete, 0) AS n_repair_delete,
            COALESCE(p.n_equal, 0) AS n_equal,
            COALESCE(p.n_mismatch, 0) AS n_mismatch,
            COALESCE(p.n_src_only, 0) AS n_src_only,
            COALESCE(p.n_dst_only, 0) AS n_dst_only
          FROM postagg p FULL OUTER JOIN counts c ON p.ns = c.ns"""),

    "cdc_compare_sample" -> withOplog(
      s""", eff AS (
            SELECT event_id, ts_packed, op, ns, doc_key, value
            FROM oplog WHERE $chainSql AND op IN ('i','u','d')),
          src AS (
            SELECT ns, doc_key, value AS v, event_id AS e FROM (
              SELECT ns, doc_key, value, event_id, op,
                ROW_NUMBER() OVER (PARTITION BY ns, doc_key
                  ORDER BY ts_packed DESC, event_id DESC) AS rn
              FROM eff) WHERE rn = 1 AND op <> 'd'
              AND ${phash64Sql("ns || '/' || doc_key")} % 10 = 0),
          dst AS (
            SELECT ns, doc_key, value AS v, event_id AS e FROM (
              SELECT ns, doc_key, value, event_id, op,
                ROW_NUMBER() OVER (PARTITION BY ns, doc_key
                  ORDER BY ts_packed DESC, event_id DESC) AS rn
              FROM eff WHERE event_id % 101 <> 0) WHERE rn = 1 AND op <> 'd'
              AND ${phash64Sql("ns || '/' || doc_key")} % 10 = 0),
          f AS (
            SELECT COALESCE(s.ns, d.ns) AS ns,
              CASE WHEN s.e IS NULL THEN 'dst_only'
                   WHEN d.e IS NULL THEN 'src_only'
                   WHEN s.v = d.v AND s.e = d.e THEN 'equal'
                   ELSE 'mismatch' END AS status
            FROM src s FULL OUTER JOIN dst d
              ON s.ns = d.ns AND s.doc_key = d.doc_key)
          SELECT ns,
            CAST(SUM(CASE WHEN status = 'equal' THEN 1 ELSE 0 END) AS BIGINT) AS n_equal,
            CAST(SUM(CASE WHEN status = 'mismatch' THEN 1 ELSE 0 END) AS BIGINT) AS n_mismatch,
            CAST(SUM(CASE WHEN status = 'src_only' THEN 1 ELSE 0 END) AS BIGINT) AS n_src_only,
            CAST(SUM(CASE WHEN status = 'dst_only' THEN 1 ELSE 0 END) AS BIGINT) AS n_dst_only
          FROM f GROUP BY ns"""),

    "cdc_route_stats" -> withOplog(
      s"""SELECT $workerSql AS worker, COUNT(*) AS n, COUNT(DISTINCT ns) AS n_ns
          FROM oplog WHERE $chainSql GROUP BY 1"""),

    "cdc_checkpoint" -> withOplog(
      s"""SELECT $workerSql AS worker,
          MIN(ts_packed) AS lsn_ack_min, MAX(ts_packed) AS lsn_newest, COUNT(*) AS n_logs
          FROM oplog WHERE $chainSql GROUP BY 1"""),

    "cdc_rebootstrap" -> withOplog(
      s"""SELECT ns, COUNT(*) AS n_equal,
            CAST(0 AS BIGINT) AS n_mismatch,
            CAST(0 AS BIGINT) AS n_src_only,
            CAST(0 AS BIGINT) AS n_dst_only
          FROM (
            SELECT ns, doc_key FROM (
              SELECT ns, doc_key, op,
                ROW_NUMBER() OVER (PARTITION BY ns, doc_key
                  ORDER BY ts_packed DESC, event_id DESC) AS rn
              FROM oplog WHERE $chainSql AND op IN ('i','u','d'))
            WHERE rn = 1 AND op <> 'd')
          GROUP BY ns"""),

    "cdc_oplog_sizing" -> withOplog(
      s"""SELECT worker, n_ops, span_us, approx_bytes,
            CAST(n_ops * 1000000000 // span_us AS BIGINT) AS ops_per_ksec,
            CAST(approx_bytes * 1000000000 // span_us AS BIGINT) AS bytes_per_ksec,
            CAST((approx_bytes * 3600000000 // span_us) // 1048576 AS BIGINT) AS window_mb_1h
          FROM (
            SELECT $workerSql AS worker, COUNT(*) AS n_ops,
              MAX(ts_us) - MIN(ts_us) AS span_us,
              CAST(SUM(length(props) + length(ns) + length(doc_key) + 26) AS BIGINT) AS approx_bytes
            FROM oplog WHERE $chainSql GROUP BY 1)"""),

    "cdc_journal_gaps" -> withOplog(
      s""", e AS (
            SELECT event_id, ts_packed, $workerSql AS worker
            FROM oplog WHERE $chainSql),
          p AS (
            SELECT worker, event_id,
              ROW_NUMBER() OVER (PARTITION BY worker
                ORDER BY ts_packed, event_id) AS pos
            FROM e),
          l AS (
            SELECT worker, event_id, pos,
              pos - ROW_NUMBER() OVER (PARTITION BY worker ORDER BY pos) AS island
            FROM p WHERE event_id % 211 = 0)
          SELECT worker, MIN(event_id) AS from_event, MAX(event_id) AS to_event,
            CAST(COUNT(*) AS BIGINT) AS n_missing
          FROM l GROUP BY worker, island"""),

    "cdc_combine_groups" -> withOplog(
      s""", eff AS (SELECT *, $workerSql AS worker FROM oplog WHERE $chainSql),
          seq AS (
            SELECT *, CASE WHEN lag(ns) OVER w = ns AND lag(op) OVER w = op THEN 0 ELSE 1 END AS changed
            FROM eff WINDOW w AS (PARTITION BY worker ORDER BY ts_packed, event_id)),
          isl AS (
            SELECT *, SUM(changed) OVER (PARTITION BY worker ORDER BY ts_packed, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
            FROM seq),
          runs AS (
            SELECT worker, island, ns, op, COUNT(*) AS run_len,
              SUM(octet_length(encode(props))) AS run_bytes
            FROM isl GROUP BY 1, 2, 3, 4)
          SELECT ns, op, COUNT(*) AS n_runs,
            CAST(SUM(GREATEST(CEIL(run_len / 1000.0),
              CEIL(run_bytes / 12582912.0))) AS BIGINT) AS n_flush_groups,
            CAST(SUM(run_len) AS BIGINT) AS n_rows, MAX(run_len) AS max_run
          FROM runs GROUP BY ns, op"""),

    "cdc_update_apply" -> withOplog(
      s""", eff AS (
            SELECT doc_key, op, ts_packed,
              CAST(round(value * 100) AS BIGINT) AS cents,
              CAST(json_extract_string(props, '$$.k') AS BIGINT) AS k
            FROM oplog WHERE $chainSql AND op IN ('i','u','d')),
          agg AS (
            SELECT doc_key,
              arg_max(op, ts_packed) AS last_op,
              arg_max(k, ts_packed) FILTER (WHERE op IN ('i','u')) AS k_final,
              max(ts_packed) FILTER (WHERE op IN ('i','d')) AS bts
            FROM eff GROUP BY 1)
          SELECT a.doc_key, a.k_final,
            CAST(COALESCE((SELECT e.cents FROM eff e
                      WHERE e.doc_key = a.doc_key AND e.ts_packed = a.bts AND e.op = 'i'), 0)
            + COALESCE((SELECT SUM(e.cents) FROM eff e
                        WHERE e.doc_key = a.doc_key AND e.op = 'u'
                          AND (a.bts IS NULL OR e.ts_packed > a.bts)), 0) AS BIGINT) AS v_cents
          FROM agg a WHERE a.last_op <> 'd'"""),

    // NOTE: the per-key fold is a RECURSIVE CTE, not list_reduce — DuckDB
    // 1.0's list_reduce corrupts struct+list accumulators when evaluated
    // over multiple groups (verified: single-group runs fold correctly,
    // the full table bleeds state across keys).
    "cdc_update_ops2" -> withOplog(
      s""", eff AS (
            SELECT doc_key, op, ts_packed, event_id AS e,
              CAST(round(value * 100) AS BIGINT) AS c,
              CAST(json_extract_string(props, '$$.k') AS BIGINT) AS k
            FROM oplog WHERE $chainSql AND op IN ('i','u','d')),
          eff2 AS (
            SELECT doc_key, op, e, c, k,
              ROW_NUMBER() OVER (PARTITION BY doc_key ORDER BY ts_packed, e) AS rn
            FROM eff)
          SELECT doc_key, v AS v_final, m AS m_final, m2 AS m2_final,
            CASE WHEN arr IS NULL THEN NULL
              -- array_to_string([]) is NULL in DuckDB 1.0, hence COALESCE
              ELSE '[' || COALESCE(array_to_string(arr, ','), '') || ']' END AS arr_json
          FROM (
            WITH RECURSIVE fold AS (
              SELECT doc_key, 0 AS rn, false AS present,
                CAST(NULL AS BIGINT) AS v, CAST(NULL AS BIGINT) AS m,
                CAST(NULL AS BIGINT) AS m2, CAST(NULL AS BIGINT[]) AS arr
              FROM (SELECT DISTINCT doc_key FROM eff2)
              UNION ALL
              SELECT x.doc_key, x.rn,
                x.op <> 'd' AS present,
                CASE WHEN x.op = 'i' THEN x.c WHEN x.op = 'd' THEN NULL
                  ELSE CASE x.e % 13
                    WHEN 0 THEN COALESCE(f.v, 0) * -1
                    WHEN 1 THEN CASE WHEN f.v IS NULL OR x.c < f.v THEN x.c ELSE f.v END
                    WHEN 2 THEN CASE WHEN f.v IS NULL OR x.c > f.v THEN x.c ELSE f.v END
                    WHEN 7 THEN CASE WHEN NOT f.present THEN x.c * 2 ELSE f.v END
                    WHEN 9 THEN xor(COALESCE(f.v, 0), x.k)
                    ELSE f.v END END AS v,
                CASE WHEN x.op = 'i' THEN x.k WHEN x.op = 'd' THEN NULL
                  WHEN x.e % 13 = 3 THEN NULL
                  WHEN x.e % 13 = 7 THEN x.k ELSE f.m END AS m,
                CASE WHEN x.op IN ('i','d') THEN NULL
                  WHEN x.e % 13 = 3 AND f.m IS NOT NULL THEN f.m ELSE f.m2 END AS m2,
                CASE WHEN x.op = 'i' THEN [x.k % 5, (x.k + 1) % 5]
                  WHEN x.op = 'd' THEN NULL
                  ELSE CASE x.e % 13
                    WHEN 4 THEN CASE WHEN f.arr IS NULL THEN [x.k % 5]
                      WHEN list_contains(f.arr, x.k % 5) THEN f.arr
                      ELSE list_append(f.arr, x.k % 5) END
                    WHEN 5 THEN CASE WHEN f.arr IS NULL OR len(f.arr) = 0 THEN f.arr
                      ELSE f.arr[1:len(f.arr) - 1] END
                    WHEN 6 THEN CASE WHEN f.arr IS NULL THEN f.arr
                      ELSE list_transform(f.arr, y -> y * -1) END
                    WHEN 7 THEN CASE WHEN NOT f.present THEN [x.k % 5] ELSE f.arr END
                    WHEN 8 THEN CASE WHEN f.arr IS NULL THEN f.arr
                      ELSE list_transform(f.arr, y -> CASE WHEN y < 3 THEN y + 10 ELSE y END) END
                    WHEN 10 THEN list_slice(
                      list_prepend(x.k % 5, COALESCE(f.arr, [])), 1, 3)
                    WHEN 11 THEN list_slice(
                      list_sort(list_concat(COALESCE(f.arr, []),
                        [x.k % 5, (x.k + 2) % 7]), 'DESC'),
                      greatest(1, len(COALESCE(f.arr, [])) - 1), len(COALESCE(f.arr, [])) + 2)
                    WHEN 12 THEN CASE WHEN f.arr IS NULL THEN f.arr
                      ELSE list_filter(f.arr,
                        y -> y <> x.k % 5 AND y <> (x.k + 3) % 5) END
                    ELSE f.arr END END AS arr
              FROM fold f JOIN eff2 x ON x.doc_key = f.doc_key AND x.rn = f.rn + 1)
            SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_key ORDER BY rn DESC) AS rk
            FROM fold) t
          WHERE t.rk = 1 AND t.present"""),

    "cdc_update_arrays" -> withOplog(
      s""", eff AS (
            SELECT doc_key, op, ts_packed, event_id,
              CAST(json_extract_string(props, '$$.k') AS BIGINT) AS k,
              CAST(round(value * 100) AS BIGINT) % 97 AS push_v,
              CAST(round(value * 100) AS BIGINT) % 7 AS pull_v,
              (event_id % 2 = 0) AS is_push
            FROM oplog WHERE $chainSql AND op IN ('i','u','d')),
          resets AS (
            SELECT doc_key, max(ts_packed) AS t_reset,
              arg_max(op, ts_packed) AS reset_op, arg_max(k, ts_packed) AS reset_k
            FROM eff WHERE op IN ('i','d') GROUP BY 1),
          live AS (
            SELECT DISTINCT e.doc_key
            FROM eff e LEFT JOIN resets r ON e.doc_key = r.doc_key
            WHERE (r.reset_op = 'i')
               OR (e.op = 'u' AND (r.t_reset IS NULL OR e.ts_packed > r.t_reset))),
          elements AS (
            SELECT e.doc_key, e.ts_packed AS tx, e.push_v AS v
            FROM eff e LEFT JOIN resets r ON e.doc_key = r.doc_key
            WHERE e.op = 'u' AND e.is_push
              AND (r.t_reset IS NULL OR e.ts_packed > r.t_reset)
            UNION ALL
            SELECT doc_key, t_reset AS tx, reset_k AS v
            FROM resets WHERE reset_op = 'i'),
          survivors AS (
            SELECT el.* FROM elements el
            WHERE NOT EXISTS (
              SELECT 1 FROM eff p
              WHERE p.doc_key = el.doc_key AND p.op = 'u' AND NOT p.is_push
                AND p.ts_packed > el.tx AND p.pull_v = el.v))
          SELECT l.doc_key,
            '[' || COALESCE(string_agg(CAST(s.v AS VARCHAR), ',' ORDER BY s.tx), '') || ']' AS tags_json,
            COUNT(s.v) AS n_tags
          FROM live l LEFT JOIN survivors s ON l.doc_key = s.doc_key
          GROUP BY 1"""),

    "cdc_incr_state" -> withOplog(
      s"""SELECT ns, doc_key, value AS last_value, event_id AS last_event_id
          FROM (
            SELECT ns, doc_key, value, event_id, op,
              ROW_NUMBER() OVER (PARTITION BY ns, doc_key ORDER BY ts_packed DESC, event_id DESC) AS rn
            FROM oplog WHERE $chainSql AND op IN ('i','u','d'))
          WHERE rn = 1 AND op <> 'd'"""),

    // Full recompute from the final state — the maintained view must be
    // indistinguishable from it (count and decimal-exact sum per ns).
    "cdc_point_lookup" -> withOplog(
      s"""SELECT ns, doc_key, value AS last_value, event_id AS last_event_id
          FROM (
            SELECT ns, doc_key, value, event_id, op,
              ROW_NUMBER() OVER (PARTITION BY ns, doc_key
                ORDER BY ts_packed DESC, event_id DESC) AS rn
            FROM oplog WHERE $chainSql AND op IN ('i','u','d'))
          WHERE rn = 1 AND op <> 'd'
            AND (ns, doc_key) IN (('app.users_0', '4'), ('app.users_0', '8'),
              ('app.users_1', '17'), ('app.users_2', '99999'))"""),

    "cdc_scd2_lookup" -> withOplog(
      s""", dims AS (
            SELECT doc_key, ts_packed, 0 AS kind, event_id,
              ROW_NUMBER() OVER (PARTITION BY doc_key
                ORDER BY ts_packed, event_id) AS version,
              value, op <> 'd' AS alive
            FROM oplog WHERE $chainSql AND op IN ('i','u','d')
              AND ns = 'app.users_0'),
          facts AS (
            SELECT doc_key, ts_packed, 1 AS kind, event_id
            FROM oplog WHERE op = 'n' AND ns = 'app.users_0'),
          u AS (
            SELECT doc_key, ts_packed, kind, event_id,
              version, value, alive FROM dims
            UNION ALL
            SELECT doc_key, ts_packed, kind, event_id,
              NULL, NULL, NULL FROM facts),
          j AS (
            SELECT *,
              LAST_VALUE(version IGNORE NULLS) OVER w AS v_ver,
              LAST_VALUE(value IGNORE NULLS) OVER w AS v_val,
              LAST_VALUE(alive IGNORE NULLS) OVER w AS v_alive
            FROM u WINDOW w AS (PARTITION BY doc_key
              ORDER BY ts_packed, kind, event_id ROWS UNBOUNDED PRECEDING))
          SELECT event_id AS fact_event, doc_key, ts_packed,
            CAST(CASE WHEN v_alive THEN v_ver END AS BIGINT) AS asof_version,
            CASE WHEN v_alive THEN v_val END AS asof_value
          FROM j WHERE kind = 1"""),

    // Both sites converge on the union fold; round-2 deliveries are zero
    // in both directions (the gid filter killed the echo).
    "cdc_active_active_loop" -> withOplog(
      s""", eff AS (
            SELECT event_id, ts_packed, op, ns, doc_key, value
            FROM oplog WHERE $chainSql AND op IN ('i','u','d')),
          state AS (
            SELECT ns, doc_key, value, event_id FROM (
              SELECT ns, doc_key, value, event_id, op,
                ROW_NUMBER() OVER (PARTITION BY ns, doc_key
                  ORDER BY ts_packed DESC, event_id DESC) AS rn
              FROM eff) WHERE rn = 1 AND op <> 'd')
          SELECT 'state' AS section, ns AS a, doc_key AS b, event_id AS x,
            CAST(0 AS BIGINT) AS y, value AS v FROM state
          UNION ALL
          SELECT 'conv', 'site_a', '', (SELECT COUNT(*) FROM state),
            CAST(0 AS BIGINT), 0.0
          UNION ALL
          SELECT 'conv', 'site_b', '', (SELECT COUNT(*) FROM state),
            CAST(0 AS BIGINT), 0.0
          UNION ALL
          SELECT 'loop', 'a2b', 'r1',
            (SELECT COUNT(*) FROM eff WHERE CAST(doc_key AS BIGINT) % 2 = 0),
            CAST(0 AS BIGINT), 0.0
          UNION ALL
          SELECT 'loop', 'a2b', 'r2', CAST(0 AS BIGINT), CAST(0 AS BIGINT), 0.0
          UNION ALL
          SELECT 'loop', 'b2a', 'r1',
            (SELECT COUNT(*) FROM eff WHERE CAST(doc_key AS BIGINT) % 2 = 1),
            CAST(0 AS BIGINT), 0.0
          UNION ALL
          SELECT 'loop', 'b2a', 'r2', CAST(0 AS BIGINT), CAST(0 AS BIGINT), 0.0"""),

    "cdc_active_active_merge" -> withOplog(
      s""", eff AS (
            SELECT event_id, ts_packed, op, ns, doc_key, value
            FROM oplog WHERE $chainSql AND op IN ('i','u','d')),
          sa AS (
            SELECT ns, doc_key, ts_packed, event_id, op, value FROM (
              SELECT *, ROW_NUMBER() OVER (PARTITION BY ns, doc_key
                ORDER BY ts_packed DESC, event_id DESC) AS rn
              FROM eff WHERE event_id % 3 <> 1) WHERE rn = 1),
          sb AS (
            SELECT ns, doc_key, ts_packed, event_id, op, value FROM (
              SELECT *, ROW_NUMBER() OVER (PARTITION BY ns, doc_key
                ORDER BY ts_packed DESC, event_id DESC) AS rn
              FROM eff WHERE event_id % 3 <> 0) WHERE rn = 1),
          merged AS (
            SELECT ns, doc_key, value AS v, event_id AS e FROM (
              SELECT u.*, ROW_NUMBER() OVER (PARTITION BY ns, doc_key
                ORDER BY ts_packed DESC, event_id DESC) AS rn
              FROM (SELECT * FROM sa UNION ALL SELECT * FROM sb) u)
            WHERE rn = 1 AND op <> 'd'),
          direct AS (
            SELECT ns, doc_key, value AS v, event_id AS e FROM (
              SELECT ns, doc_key, value, event_id, op,
                ROW_NUMBER() OVER (PARTITION BY ns, doc_key
                  ORDER BY ts_packed DESC, event_id DESC) AS rn
              FROM eff) WHERE rn = 1 AND op <> 'd'),
          f AS (
            SELECT COALESCE(d.ns, m.ns) AS ns,
              CASE WHEN d.e IS NULL THEN 'dst_only'
                   WHEN m.e IS NULL THEN 'src_only'
                   WHEN d.v = m.v AND d.e = m.e THEN 'equal'
                   ELSE 'mismatch' END AS status
            FROM direct d FULL OUTER JOIN merged m
              ON d.ns = m.ns AND d.doc_key = m.doc_key),
          diff AS (
            SELECT ns,
              CAST(SUM(CASE WHEN status = 'equal' THEN 1 ELSE 0 END) AS BIGINT) AS n_equal,
              CAST(SUM(CASE WHEN status = 'mismatch' THEN 1 ELSE 0 END) AS BIGINT) AS n_mismatch,
              CAST(SUM(CASE WHEN status = 'src_only' THEN 1 ELSE 0 END) AS BIGINT) AS n_src_only,
              CAST(SUM(CASE WHEN status = 'dst_only' THEN 1 ELSE 0 END) AS BIGINT) AS n_dst_only
            FROM f GROUP BY ns),
          conf AS (
            SELECT sa.ns, COUNT(*) AS n_conflicts
            FROM sa JOIN sb ON sa.ns = sb.ns AND sa.doc_key = sb.doc_key
            WHERE sa.event_id <> sb.event_id GROUP BY sa.ns)
          SELECT d.ns, d.n_equal, d.n_mismatch, d.n_src_only, d.n_dst_only,
            COALESCE(c.n_conflicts, 0) AS n_conflicts
          FROM diff d LEFT JOIN conf c ON d.ns = c.ns"""),

    "cdc_idempotent_replay" -> withOplog(
      s"""SELECT ns, COUNT(*) AS n_equal,
            CAST(0 AS BIGINT) AS n_mismatch,
            CAST(0 AS BIGINT) AS n_src_only,
            CAST(0 AS BIGINT) AS n_dst_only
          FROM (
            SELECT ns, op,
              ROW_NUMBER() OVER (PARTITION BY ns, doc_key
                ORDER BY ts_packed DESC, event_id DESC) AS rn
            FROM oplog WHERE $chainSql AND op IN ('i','u','d'))
          WHERE rn = 1 AND op <> 'd'
          GROUP BY ns"""),

    "cdc_delta_export" -> withOplog(
      s""", eff AS (
            SELECT event_id, ts_packed, op, ns, doc_key, value
            FROM oplog WHERE $chainSql AND op IN ('i','u','d')),
          tt AS (
            SELECT tmin + (tmax - tmin) // 2 AS t1,
                   tmin + (3 * (tmax - tmin)) // 4 AS t2
            FROM (SELECT MIN(ts_packed) AS tmin, MAX(ts_packed) AS tmax
                  FROM eff))
          SELECT ns, doc_key, op, value AS last_value,
            event_id AS last_event_id, n_ops
          FROM (
            SELECT ns, doc_key, op, value, event_id,
              ROW_NUMBER() OVER (PARTITION BY ns, doc_key
                ORDER BY ts_packed DESC, event_id DESC) AS rn,
              COUNT(*) OVER (PARTITION BY ns, doc_key) AS n_ops
            FROM eff, tt WHERE ts_packed > t1 AND ts_packed <= t2)
          WHERE rn = 1"""),

    "cdc_incr_join_view" -> withOplog(
      s""", sA AS (
            SELECT doc_key, value, event_id FROM (
              SELECT doc_key, value, event_id, op,
                ROW_NUMBER() OVER (PARTITION BY doc_key
                  ORDER BY ts_packed DESC, event_id DESC) AS rn
              FROM oplog WHERE $chainSql AND op IN ('i','u','d')
                AND ns = 'app.users_0')
            WHERE rn = 1 AND op <> 'd'),
          sB AS (
            SELECT doc_key, value, event_id FROM (
              SELECT doc_key, value, event_id, op,
                ROW_NUMBER() OVER (PARTITION BY doc_key
                  ORDER BY ts_packed DESC, event_id DESC) AS rn
              FROM oplog WHERE $chainSql AND op IN ('i','u','d')
                AND ns = 'app.users_1')
            WHERE rn = 1 AND op <> 'd')
          SELECT CAST(a.doc_key AS BIGINT) // 4 AS household,
            a.doc_key AS a_key, a.value AS a_value, a.event_id AS a_event,
            b.doc_key AS b_key, b.value AS b_value, b.event_id AS b_event
          FROM sA a JOIN sB b
            ON CAST(a.doc_key AS BIGINT) // 4 = CAST(b.doc_key AS BIGINT) // 4"""),

    "cdc_incr_agg" -> withOplog(
      s"""SELECT ns, COUNT(*) AS n_rows,
            CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS v_sum
          FROM (
            SELECT ns, value, op,
              ROW_NUMBER() OVER (PARTITION BY ns, doc_key ORDER BY ts_packed DESC, event_id DESC) AS rn
            FROM oplog WHERE $chainSql AND op IN ('i','u','d'))
          WHERE rn = 1 AND op <> 'd'
          GROUP BY ns"""),

    "cdc_txn_assemble" -> withOplog(
      s""", eff AS (
            SELECT doc_key AS lsid, ts_us // 3600000000 AS txn_number, event_id, op, ts_packed,
              ROW_NUMBER() OVER (PARTITION BY doc_key, ts_us // 3600000000
                ORDER BY ts_packed, event_id) - 1 AS rn,
              COUNT(*) OVER (PARTITION BY doc_key, ts_us // 3600000000) AS n,
              MAX(ts_packed) OVER (PARTITION BY doc_key, ts_us // 3600000000) AS commit_ts
            FROM oplog WHERE $chainSql AND op IN ('i','u','d'))
          SELECT lsid, txn_number, CAST(rn AS INT) AS idx,
            '{"event_id":' || CAST(event_id AS VARCHAR) || ',"op":"' || op || '"}' AS op,
            CASE WHEN rn = n - 1 THEN commit_ts ELSE commit_ts - 1 END AS ts
          FROM eff
          WHERE (CAST(lsid AS BIGINT) + txn_number) % 7 <> 0"""),

    // Orphans ((lsid+txn) % 5 == 0) lose their buffered partials to the
    // TTL purge: only the commit entry's own ops survive, re-indexed from
    // 0 within the entry (entries pack 2 ops, so the last entry holds the
    // rows with rn DIV 2 == (n-1) DIV 2). The ts patch is unchanged: the
    // chain's last op keeps commit_ts, every other emitted op gets
    // commit_ts - 1.
    "cdc_txn_ttl" -> withOplog(
      s""", eff AS (
            SELECT doc_key AS lsid, ts_us // 3600000000 AS txn_number, event_id, op, ts_packed,
              ROW_NUMBER() OVER (PARTITION BY doc_key, ts_us // 3600000000
                ORDER BY ts_packed, event_id) - 1 AS rn,
              COUNT(*) OVER (PARTITION BY doc_key, ts_us // 3600000000) AS n,
              MAX(ts_packed) OVER (PARTITION BY doc_key, ts_us // 3600000000) AS commit_ts
            FROM oplog WHERE $chainSql AND op IN ('i','u','d')),
          flagged AS (
            SELECT *, (CAST(lsid AS BIGINT) + txn_number) % 5 = 0 AS orphan FROM eff)
          SELECT lsid, txn_number,
            CAST(CASE WHEN orphan THEN rn - 2 * ((n - 1) // 2) ELSE rn END AS INT) AS idx,
            '{"event_id":' || CAST(event_id AS VARCHAR) || ',"op":"' || op || '"}' AS op,
            CASE WHEN rn = n - 1 THEN commit_ts ELSE commit_ts - 1 END AS ts
          FROM flagged
          WHERE NOT orphan OR rn // 2 = (n - 1) // 2"""),

    "cdc_txn_group" -> withOplog(
      s"""SELECT doc_key AS lsid, ts_us // 3600000000 AS txn_number,
          COUNT(*) AS n_ops, MIN(ts_packed) AS first_ts, MAX(ts_packed) AS last_ts
          FROM oplog WHERE $chainSql GROUP BY 1, 2"""),

    "cdc_top3_ns" -> withOplog(
      s""", counts AS (
            SELECT op, ns, COUNT(*) AS n FROM oplog WHERE $chainSql GROUP BY 1, 2)
          SELECT op, ns, n, CAST(rank AS INT) AS rank FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY op ORDER BY n DESC, ns) AS rank
            FROM counts)
          WHERE rank <= 3"""),

    "cdc_dbref_transform" -> withOplog(
      s"""SELECT event_id,
            CASE WHEN CAST(doc_key AS BIGINT) % 4 = 0 THEN 'u0'
                 ELSE 'users_' || CAST(CAST(doc_key AS BIGINT) % 4 AS VARCHAR) END AS ref_new,
            CASE WHEN CAST(doc_key AS BIGINT) % 4 = 0 THEN 'app' ELSE 'appx' END AS db_new
          FROM oplog WHERE $chainSql"""),

    "cdc_gather_applyops" -> withOplog(
      s""", eff AS (
            SELECT ns, op, ts_packed, event_id,
              '{"op":"' || op || '","ts":' || CAST(ts_packed AS VARCHAR) || '}' AS frag
            FROM oplog WHERE $chainSql AND op IN ('i','u','d'))
          SELECT ns, COUNT(*) AS n_ops,
            md5('{"applyOps":[' || string_agg(frag, ',' ORDER BY ts_packed, event_id) || ']}') AS cmd_md5
          FROM eff GROUP BY 1"""),

    "cdc_collision_segments" -> withOplog(
      s""", eff AS (
            SELECT *, $workerSql AS worker,
              CAST(json_extract_string(props, '$$.k') AS BIGINT) % 13 AS uk
            FROM oplog WHERE $chainSql AND op IN ('i','u','d')),
          seg AS (
            SELECT *, CASE WHEN uk IS NULL THEN 0 ELSE
              ROW_NUMBER() OVER (PARTITION BY worker, uk
                ORDER BY ts_packed, event_id) - 1 END AS segment
            FROM eff)
          SELECT worker, CAST(segment AS INT) AS segment, COUNT(*) AS n_ops,
            COUNT(DISTINCT uk) AS n_keys, MAX(ts_packed) AS max_ts
          FROM seg GROUP BY 1, 2""")
  )
}
