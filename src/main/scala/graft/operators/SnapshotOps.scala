package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.filters.OrphanFilter
import graft.sources.Snapshot

/** Full-sync (snapshot) operator queries (SURVEY.md §2.1 S3/S4, §2.4 F8,
  * §3.2 entry point B) over `lineitem` as the source collection.
  */
object SnapshotOps {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // S3/S4: splitVector-style planning — 8 key-range pieces, per-piece
    // row counts and bounds (what each parallel range reader would copy).
    "snap_range_pieces" -> ((s, dir) =>
      Snapshot.pieceAssign(Tables.load(s, dir, "lineitem"), "l_orderkey", 8)
        .groupBy(col("piece"))
        .agg(count(lit(1)).as("n_rows"),
          min(col("l_orderkey")).as("key_min"),
          max(col("l_orderkey")).as("key_max"))),

    // Raw-dump INGEST round-trip — the format corpora and Mongo exports
    // actually arrive in is JSONL, and the trap is JSON-IN-JSON: the
    // props column is itself a JSON string, so the export must escape
    // its quotes/braces and the ingest must restore them byte-exact.
    // Export through the real JSON writer, re-ingest with an EXPLICIT
    // schema (schema-on-read, never inference — at 100 TB one corrupt
    // line would silently flip a column type corpus-wide), return the
    // re-ingested rows; the oracle is the original projection, so any
    // escaping or type-mangling defect hash-diverges.
    "snap_jsonl_roundtrip" -> ((s, dir) => {
      val work = graft.Work.dir(s"jsonl_q")
      graft.streaming.IncrSync.deletePath(s, work)
      Tables.load(s, dir, "events")
        .select(to_json(struct(col("event_id"), col("event_type"),
          col("props"))).as("value"))
        .write.text(s"$work/dump")
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("event_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("event_type",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("props",
          org.apache.spark.sql.types.StringType)))
      s.read.schema(schema).json(s"$work/dump")
    }),

    // CSV ingest round-trip — the other raw-dump format corpora arrive
    // in, and the one with the sharpest escaping hazard: the props
    // payload is JSON, so every row embeds quotes inside a quoted CSV
    // field (RFC 4180 doubling via escape = quote — Spark's DEFAULT
    // escape is backslash, which a standards-compliant consumer would
    // misread). Schema-on-read like the JSONL twin; the oracle is the
    // original projection, so a quoting defect hash-diverges.
    "snap_csv_roundtrip" -> ((s, dir) => {
      val work = graft.Work.dir(s"csv_q")
      graft.streaming.IncrSync.deletePath(s, work)
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("event_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("event_type",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("props",
          org.apache.spark.sql.types.StringType)))
      Tables.load(s, dir, "events")
        .select(col("event_id"), col("event_type"), col("props"))
        .write.mode("overwrite").option("header", "true")
        .option("quoteAll", "true").option("escape", "\"")
        .csv(s"$work/dump")
      s.read.option("header", "true").option("escape", "\"")
        .schema(schema).csv(s"$work/dump")
    }),

    // ORC ingest round-trip — warehouse interop with the other columnar
    // format (Spark ships the ORC reader/writer in core). Same contract
    // as the parquet path: types and values survive bit-exact.
    "snap_orc_roundtrip" -> ((s, dir) => {
      val work = graft.Work.dir(s"orc_q")
      graft.streaming.IncrSync.deletePath(s, work)
      Tables.loadEventsNs(s, dir)
        .select(col("event_id"), col("event_type"),
          expr("cast(round(value * 100) as bigint)").as("cents"),
          expr("ts DIV 1000").as("ts_us"))
        .write.mode("overwrite").orc(s"$work/dump")
      s.read.orc(s"$work/dump")
    }),

    // S6: catalog scan — discover collections from storage (Hadoop FS
    // walk), apply ns filters, surface collStats row counts. The oracle
    // pins the expected counts: a discovery regression shows as a row
    // mismatch.
    "snap_catalog" -> ((s, dir) =>
      graft.sources.Catalog.collStats(s, dir, "tpch",
        white = Seq("^tpch\\..*$"), black = Seq("^tpch\\.embeddings$"))),

    // The schema sampler (`tools/mongodb-schema.py`): infer each
    // namespace's field inventory — name, JSON value type, presence
    // fraction — from a DETERMINISTIC sample of its documents (the tool
    // samples too; full scans are the one thing a schema probe must not
    // do). Documents are synthesized with genuinely varying shape
    // (optional number/array/string fields keyed off event_id) so the
    // sampler's presence fractions do real work. One regex pass extracts
    // (key, first-value-char) pairs — the char classifies the JSON type
    // without parsing — then a per-ns aggregate; the per-ns totals
    // broadcast back. Everything is codegen'd projection + two small
    // aggregates; nothing touches unsampled rows.
    "snap_schema_infer" -> ((s, dir) => {
      val e = Tables.loadEventsNs(s, dir).filter(col("event_id") % 10 === 0)
      val uid = col("user_id").cast("string")
      val cents = round(col("value") * 100).cast("long").cast("string")
      val ns = concat(
        when(col("user_id") % 50 === 0, "local").otherwise("app"),
        lit(".users_"), (col("user_id") % 4).cast("string"))
      val doc = concat(lit("{\"_id\":"), uid, lit(",\"cents\":"), cents,
        when(col("event_id") % 5 =!= 0,
          concat(lit(",\"k\":"), get_json_object(col("props"), "$.k")))
          .otherwise(lit("")),
        when(col("event_id") % 3 === 0, lit(",\"tags\":[\"a\",\"b\"]"))
          .otherwise(lit("")),
        when(col("event_id") % 4 === 0, concat(lit(",\"note\":\"u"), uid, lit("\"")))
          .otherwise(lit("")),
        lit("}"))
      val docs = e.select(ns.as("ns"), doc.as("doc")).localCheckpoint()
      val tot = docs.groupBy(col("ns")).agg(count(lit(1)).as("n_sampled"))
      val pat = "\"(\\w+)\":(.)"
      val kv = docs.select(col("ns"),
          explode(arrays_zip(
            regexp_extract_all(col("doc"), lit(pat), lit(1)),
            regexp_extract_all(col("doc"), lit(pat), lit(2)))).as("p"))
        .select(col("ns"), col("p.0").as("field"), col("p.1").as("c"))
      kv.withColumn("ftype",
          when(col("c").rlike("[0-9-]"), "number")
            .when(col("c") === "\"", "string")
            .when(col("c") === "[", "array")
            .when(col("c") === "{", "object")
            .otherwise("other"))
        .groupBy(col("ns"), col("field"), col("ftype"))
        .agg(count(lit(1)).as("n_present"))
        .join(broadcast(tot), Seq("ns"))
        .withColumn("frac", round(col("n_present").cast("double") /
          col("n_sampled").cast("double"), 4))
    }),

    // F8: orphan filter on a ranged shard — keep only rows in chunks owned
    // by this replica set (chunk = 1000 keys, 3 shards, we own shard 0).
    "snap_orphan_filter" -> ((s, dir) => {
      val li = Tables.load(s, dir, "lineitem")
      val chunks = OrphanFilter.uniformChunks(li, "l_orderkey", 1000L, 3, 0)
      OrphanFilter.keepOwned(li, "l_orderkey", chunks, 1000L)
        .groupBy(col("chunk_id"))
        .agg(count(lit(1)).as("n_rows"))
    }),

    // The sharded FULL-SYNC fan-out composed end-to-end (the snapshot
    // sibling of cdc_sharded_fanout): each of 3 shards holds its OWNED
    // chunks plus migration leftovers (a deterministic slice of its
    // neighbor's keys — the orphans `doc_reader` must not copy), the F8
    // orphan filter drops the leftovers, and the S3 splitVector planning
    // carves each shard's surviving rows into 4 key-range pieces — the
    // (shard, piece) grid a parallel full sync actually executes, one
    // range reader per cell. Proof rows: every (shard, piece) count +
    // bounds in closed form; per-shard orphan-dropped counts; and the
    // union total ≡ the table count — every row synced EXACTLY once
    // (an orphan leak double-copies, an over-eager filter drops data;
    // both hash-diverge).
    "snap_sharded_fullsync" -> ((s, dir) => {
      val li = Tables.load(s, dir, "lineitem")
      val nShards = 3
      val step = 1000L
      val parts = (0 until nShards).map { sh =>
        val next = (sh + 1) % nShards
        val owned = li.filter(
          expr(s"(l_orderkey DIV $step) % $nShards = $sh"))
        val leftover = li.filter(
          expr(s"(l_orderkey DIV $step) % $nShards = $next AND l_orderkey % 13 = 0"))
        val chunks = OrphanFilter.uniformChunks(li, "l_orderkey", step, nShards, sh)
        val synced = OrphanFilter.keepOwned(owned.unionByName(leftover),
          "l_orderkey", chunks, step).drop("chunk_id")
        val pieces = Snapshot.pieceAssign(synced, "l_orderkey", 4)
          .groupBy(col("piece"))
          .agg(count(lit(1)).as("n_rows"),
            min(col("l_orderkey")).as("key_min"),
            max(col("l_orderkey")).as("key_max"))
          .select(lit("piece").as("section"), lit(sh.toLong).as("shard"),
            col("piece").cast("long").as("piece"), col("n_rows"),
            col("key_min"), col("key_max"))
        val orphans = leftover.agg(count(lit(1)).as("n"))
          .select(lit("orphans").as("section"), lit(sh.toLong).as("shard"),
            lit(-1L).as("piece"), col("n").as("n_rows"),
            lit(0L).as("key_min"), lit(0L).as("key_max"))
        (synced, pieces.unionByName(orphans))
      }
      val total = parts.map(_._1).reduce(_ unionByName _)
        .agg(count(lit(1)).as("n"))
        .crossJoin(li.agg(count(lit(1)).as("t")))
        .select(lit("total").as("section"), lit(-1L).as("shard"),
          lit(-1L).as("piece"), col("n").as("n_rows"),
          col("t").as("key_min"), lit(0L).as("key_max"))
      parts.map(_._2).reduce(_ unionByName _).unionByName(total)
    }),

    // W9 index sync: persist listIndexes-style specs (background scrubbed,
    // reference doc_syncer.go:206-287) and read them back as the target's
    // catalog metadata.
    "snap_index_sync" -> ((s, dir) => {
      import graft.streaming.{FullSync, IncrSync}
      val work = graft.Work.dir(s"index_sync_q")
      IncrSync.deletePath(s, work)
      FullSync.writeIndexSpecs(s, work, "users_1", Seq(
        """{"v":2,"key":{"_id":1},"name":"_id_"}""",
        """{"v":2,"key":{"email":1},"name":"email_1","unique":true,"background":true}""",
        """{"v":2,"key":{"ts":-1,"kind":1},"name":"ts_-1_kind_1","background":true}"""))
      FullSync.readIndexSpecs(s, work, "users_1")
    }),

    // W10 + X4: auto shard-key selection against each collection's index
    // catalog (a non-_id unique index forces by-namespace routing), with
    // the chosen spec persisted per collection (shardCollection analogue).
    "snap_shard_spec" -> ((s, dir) => {
      import graft.partition.Hashers
      import graft.streaming.{FullSync, IncrSync}
      import s.implicits._
      val work = graft.Work.dir(s"shard_spec_q")
      IncrSync.deletePath(s, work)
      val colls = Seq("users_0", "users_1", "users_2", "users_3")
      colls.foreach { c =>
        val catalog = (Seq(("_id_", false)) ++
          (if (c == "users_1") Seq(("email_1", true)) else Nil))
          .toDF("name", "unique")
        FullSync.writeShardSpec(s, work, c, Hashers.autoShardKey(catalog), 8)
      }
      colls.map(c => s.read.parquet(s"$work/full/${c}_spec")).reduce(_ unionByName _)
    }),

    // W11 drop-dest + full resync (`doc_syncer.go:64-99`): the target
    // starts with a stale previous copy whose partitions the resync will
    // NOT rewrite (piece=99 — under dynamic partition overwrite only the
    // drop removes it). After dropDest + copyTable the target must hold
    // exactly the source rows: any stale residue shows as an extra piece.
    "snap_drop_dest" -> ((s, dir) => {
      import graft.streaming.{FullSync, IncrSync}
      val work = graft.Work.dir(s"drop_dest_q")
      IncrSync.deletePath(s, work)
      Tables.load(s, dir, "orders").limit(100)
        .withColumn("piece", lit(99L))
        .write.partitionBy("piece").parquet(s"$work/full/orders")
      FullSync.dropDest(s, work, "orders")
      FullSync.copyTable(s, dir, "orders", "o_orderkey", work, nPieces = 8)
      s.read.parquet(s"$work/full/orders")
        .groupBy(col("piece").cast("bigint").as("piece"))
        .agg(count(lit(1)).as("n_rows"),
          min(col("o_orderkey")).as("key_min"),
          max(col("o_orderkey")).as("key_max"))
    }),

    // X4 auto shard-key selection, full decision matrix
    // (`coordinator/replication.go:166-183`): `shard_key = auto` resolves
    // to by-id routing unless the collection carries a non-`_id` unique
    // index (parallel by-id apply could violate the constraint).
    "snap_auto_shard_key" -> ((s, dir) => {
      import graft.partition.Hashers
      import s.implicits._
      val cases = Seq(
        // (case, index catalog rows as (name, unique))
        ("id_only", Seq(("_id_", true))),
        ("secondary_nonunique", Seq(("_id_", true), ("ts_1", false))),
        ("secondary_unique", Seq(("_id_", true), ("email_1", true))),
        ("mixed", Seq(("_id_", true), ("ts_1", false), ("email_1", true))),
        ("no_indexes", Seq.empty[(String, Boolean)]))
      cases.map { case (name, idx) =>
        val catalog = idx.toDF("name", "unique")
        (name, Hashers.autoShardKey(catalog))
      }.toDF("idx_case", "shard_key")
    }),

    // F8 complete surface: compound (string, number) shard key against an
    // explicit chunk map with MinKey/MaxKey bounds, membership by BSON
    // type-ordered lexicographic tuple comparison (orphan_filter.go's
    // per-keyInd Mins/Maxs walk). The oracle is the closed form of the
    // owned ranges.
    "snap_orphan_compound" -> ((s, dir) => {
      import OrphanFilter._
      val li = Tables.load(s, dir, "lineitem")
      val chunks = chunkTable(s, Seq(
        (Seq(encMinKey, encMinKey), Seq(encString(lit("A")), encNumber(lit(2000L))), true),
        (Seq(encString(lit("A")), encNumber(lit(2000L))),
          Seq(encString(lit("N")), encNumber(lit(1000L))), false),
        (Seq(encString(lit("N")), encNumber(lit(1000L))),
          Seq(encString(lit("R")), encNumber(lit(500L))), true),
        (Seq(encString(lit("R")), encNumber(lit(500L))), Seq(encMaxKey, encMaxKey), false)))
      val key = keyTuple(encString(col("l_returnflag")), encNumber(col("l_orderkey")))
      keepOwnedRanged(li, key, chunks)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n_rows"),
          min(col("l_orderkey")).as("key_min"),
          max(col("l_orderkey")).as("key_max"))
    })
  )

  def oracles: Map[String, String] = Map(
    "snap_jsonl_roundtrip" ->
      "SELECT event_id, event_type, props FROM events",

    "snap_csv_roundtrip" ->
      "SELECT event_id, event_type, props FROM events",

    "snap_orc_roundtrip" ->
      """SELECT event_id, event_type,
           CAST(round(value * 100) AS BIGINT) AS cents,
           epoch_ns(ts)//1000 AS ts_us
         FROM events""",

    "snap_range_pieces" ->
      """WITH b AS (SELECT min(l_orderkey) AS lo, max(l_orderkey) AS hi FROM lineitem)
         SELECT ((l_orderkey - lo) * 8) // (hi - lo + 1) AS piece,
           COUNT(*) AS n_rows, MIN(l_orderkey) AS key_min, MAX(l_orderkey) AS key_max
         FROM lineitem, b GROUP BY 1""",

    "snap_orphan_filter" ->
      """SELECT l_orderkey // 1000 AS chunk_id, COUNT(*) AS n_rows
         FROM lineitem WHERE (l_orderkey // 1000) % 3 = 0 GROUP BY 1""",

    "snap_sharded_fullsync" ->
      """WITH sh AS (
           SELECT l_orderkey, (l_orderkey // 1000) % 3 AS shard FROM lineitem),
         b AS (
           SELECT shard, MIN(l_orderkey) AS lo, MAX(l_orderkey) AS hi
           FROM sh GROUP BY 1),
         p AS (
           SELECT sh.shard, ((l_orderkey - lo) * 4) // (hi - lo + 1) AS piece,
             l_orderkey
           FROM sh JOIN b USING (shard))
         SELECT 'piece' AS section, shard, piece, COUNT(*) AS n_rows,
           MIN(l_orderkey) AS key_min, MAX(l_orderkey) AS key_max
         FROM p GROUP BY shard, piece
         UNION ALL
         SELECT 'orphans', x.shard, CAST(-1 AS BIGINT),
           (SELECT COUNT(*) FROM sh o
            WHERE o.shard = (x.shard + 1) % 3 AND o.l_orderkey % 13 = 0),
           CAST(0 AS BIGINT), CAST(0 AS BIGINT)
         FROM (SELECT CAST(unnest([0, 1, 2]) AS BIGINT) AS shard) x
         UNION ALL
         SELECT 'total', CAST(-1 AS BIGINT), CAST(-1 AS BIGINT),
           (SELECT COUNT(*) FROM lineitem), (SELECT COUNT(*) FROM lineitem),
           CAST(0 AS BIGINT)""",

    "snap_schema_infer" ->
      """WITH docs AS (
           SELECT (CASE WHEN user_id % 50 = 0 THEN 'local' ELSE 'app' END)
               || '.users_' || CAST(user_id % 4 AS VARCHAR) AS ns,
             '{"_id":' || CAST(user_id AS VARCHAR)
               || ',"cents":' || CAST(CAST(round(value * 100) AS BIGINT) AS VARCHAR)
               || CASE WHEN event_id % 5 <> 0
                    THEN ',"k":' || json_extract_string(props, '$.k') ELSE '' END
               || CASE WHEN event_id % 3 = 0
                    THEN ',"tags":["a","b"]' ELSE '' END
               || CASE WHEN event_id % 4 = 0
                    THEN ',"note":"u' || CAST(user_id AS VARCHAR) || '"' ELSE '' END
               || '}' AS doc
           FROM events WHERE event_id % 10 = 0),
         tot AS (SELECT ns, COUNT(*) AS n_sampled FROM docs GROUP BY 1),
         kv AS (SELECT ns,
             unnest(regexp_extract_all(doc, '"(\w+)":(.)', 1)) AS field,
             unnest(regexp_extract_all(doc, '"(\w+)":(.)', 2)) AS c
           FROM docs),
         typed AS (SELECT ns, field,
             CASE WHEN regexp_matches(c, '[0-9-]') THEN 'number'
                  WHEN c = '"' THEN 'string'
                  WHEN c = '[' THEN 'array'
                  WHEN c = '{' THEN 'object'
                  ELSE 'other' END AS ftype
           FROM kv)
         SELECT ns, field, ftype, COUNT(*) AS n_present, n_sampled,
           ROUND(CAST(COUNT(*) AS DOUBLE) / CAST(n_sampled AS DOUBLE), 4) AS frac
         FROM typed JOIN tot USING (ns)
         GROUP BY ns, field, ftype, n_sampled""",

    "snap_index_sync" ->
      """SELECT * FROM (VALUES
           ('users_1', '_id_', '{"v":2,"key":{"_id":1},"name":"_id_"}'),
           ('users_1', 'email_1', '{"v":2,"key":{"email":1},"name":"email_1","unique":true}'),
           ('users_1', 'ts_-1_kind_1', '{"v":2,"key":{"ts":-1,"kind":1},"name":"ts_-1_kind_1"}')
         ) t("table", index_name, index_json)""",

    "snap_shard_spec" ->
      """SELECT * FROM (VALUES
           ('users_0', 'id', 8), ('users_1', 'collection', 8),
           ('users_2', 'id', 8), ('users_3', 'id', 8)
         ) t("table", shard_key, n_pieces)""",

    "snap_drop_dest" ->
      """WITH b AS (SELECT min(o_orderkey) AS lo, max(o_orderkey) AS hi FROM orders)
         SELECT ((o_orderkey - lo) * 8) // (hi - lo + 1) AS piece,
           COUNT(*) AS n_rows, MIN(o_orderkey) AS key_min, MAX(o_orderkey) AS key_max
         FROM orders, b GROUP BY 1""",

    "snap_auto_shard_key" ->
      """SELECT * FROM (VALUES
           ('id_only', 'id'), ('secondary_nonunique', 'id'),
           ('secondary_unique', 'collection'), ('mixed', 'collection'),
           ('no_indexes', 'id')
         ) t(idx_case, shard_key)""",

    // Closed form of the two owned chunk ranges:
    //   [(MinKey,MinKey), ('A',2000))  → flag 'A' with key < 2000
    //   [('N',1000), ('R',500))        → 'N' with key >= 1000, 'R' with key < 500
    "snap_orphan_compound" ->
      """SELECT l_returnflag, COUNT(*) AS n_rows,
           MIN(l_orderkey) AS key_min, MAX(l_orderkey) AS key_max
         FROM lineitem
         WHERE (l_returnflag = 'A' AND l_orderkey < 2000)
            OR (l_returnflag = 'N' AND l_orderkey >= 1000)
            OR (l_returnflag = 'R' AND l_orderkey < 500)
         GROUP BY 1""",

    "snap_catalog" ->
      """SELECT 'tpch.customer' AS ns, COUNT(*) AS n_rows FROM customer
         UNION ALL SELECT 'tpch.documents', COUNT(*) FROM documents
         UNION ALL SELECT 'tpch.events', COUNT(*) FROM events
         UNION ALL SELECT 'tpch.lineitem', COUNT(*) FROM lineitem
         UNION ALL SELECT 'tpch.nation', COUNT(*) FROM nation
         UNION ALL SELECT 'tpch.orders', COUNT(*) FROM orders
         UNION ALL SELECT 'tpch.part', COUNT(*) FROM part
         UNION ALL SELECT 'tpch.region', COUNT(*) FROM region
         UNION ALL SELECT 'tpch.supplier', COUNT(*) FROM supplier"""
  )
}
