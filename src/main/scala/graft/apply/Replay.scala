package graft.apply

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.json4s.{JInt, JLong, JObject, JValue}

import graft.transform.UpdateSpec

/** Idempotent CDC apply (SURVEY.md §2.8, W1-W4 as MERGE semantics).
  *
  * The reference replays each oplog entry against the target with
  * per-key ordering and at-least-once delivery, relying on idempotence
  * (`README.md:55`). In Spark the whole batch collapses into one
  * deterministic "last effective write wins" materialization:
  *
  *   - upserts (op i/u) set the row state,
  *   - deletes (op d) remove it,
  *   - replaying the same batch twice yields the same table (idempotent).
  *
  * Implemented with a single window (shuffle on the document key, sort
  * within partitions only) — per-key total order without a global sort,
  * which is exactly the property that scales to 100 TB: state size is
  * |keys|, shuffle is one exchange, and AQE handles skewed keys.
  */
object Replay {

  /** Last effective op per key (deletes included, carrying `op`) — yields
    * both the upsert delta (`op != 'd'`) and the touched-key set, so
    * callers don't re-shuffle the batch for either.
    *
    * Shape: an argmax aggregation (`max` over a (ts, event_id, …) struct;
    * the key prefix is unique, so the tail never decides), NOT a window —
    * partial aggregation collapses each key map-side before the exchange,
    * where a window would shuffle and sort every row. At 100 TB this is
    * the difference between moving |keys| rows and moving the batch.
    */
  def lastPerKey(oplog: DataFrame): DataFrame =
    oplog.filter(col("op").isin("i", "u", "d"))
      .groupBy(col("ns"), col("doc_key"))
      .agg(
        max(struct(col("ts_packed"), col("event_id"), col("op"), col("value"))).as("m"),
        count(lit(1)).as("n_ops"))
      .select(col("ns"), col("doc_key"), col("m.op").as("op"),
        col("m.value").as("last_value"), col("m.event_id").as("last_event_id"),
        col("n_ops"))

  /** Materialize final per-document state from an effective-op stream. */
  def materialize(oplog: DataFrame): DataFrame =
    lastPerKey(oplog).filter(col("op") =!= "d").drop("op")

  /** Source ↔ target verification: the distributed analogue of the
    * reference's post-sync checker (`scripts/comparison.py` — per-
    * collection record counts plus per-document data comparison). Both
    * sides are per-document state tables `(ns, doc_key, last_value,
    * last_event_id, …)`; the diff is ONE full-outer sort-merge join on
    * the document key, classified per row and collapsed to per-namespace
    * counters — at 100 TB this moves each state exactly once, where the
    * reference's cursor walk re-reads the target per sampled document.
    * `n_src_only`/`n_dst_only` are the count mismatches, `n_mismatch`
    * the data mismatches, `n_equal` the verified documents.
    */
  def diffStates(src: DataFrame, dst: DataFrame): DataFrame = {
    val s = src.select(col("ns"), col("doc_key"),
      col("last_value").as("v_src"), col("last_event_id").as("e_src"))
    val d = dst.select(col("ns"), col("doc_key"),
      col("last_value").as("v_dst"), col("last_event_id").as("e_dst"))
    s.join(d, Seq("ns", "doc_key"), "full_outer")
      .withColumn("status",
        // presence rides the (never-null) event id, not the value column
        when(col("e_src").isNull, "dst_only")
          .when(col("e_dst").isNull, "src_only")
          .when(col("v_src") === col("v_dst") && col("e_src") === col("e_dst"), "equal")
          .otherwise("mismatch"))
      .groupBy(col("ns"))
      .agg(
        sum((col("status") === "equal").cast("long")).as("n_equal"),
        sum((col("status") === "mismatch").cast("long")).as("n_mismatch"),
        sum((col("status") === "src_only").cast("long")).as("n_src_only"),
        sum((col("status") === "dst_only").cast("long")).as("n_dst_only"))
  }

  /** Post-sync REPAIR planning — the step after [[diffStates]] reports
    * drift. The reference ships the checker (`scripts/comparison.py`) and
    * leaves the fix to the operator; at warehouse scale the fix is itself
    * a batch: the SAME one full-outer key join as the diff, classified
    * into executable ops — a src-only document becomes an insert ('i'), a
    * value/lsn mismatch an overwrite-update ('u'), a dst-only leftover
    * (e.g. a lost delete) a delete ('d') — each row carrying the source
    * truth so the repair batch is self-contained. One exchange total;
    * the plan IS the diff pass, never a second scan of either state.
    */
  def repairPlan(src: DataFrame, dst: DataFrame): DataFrame = {
    val s = src.select(col("ns"), col("doc_key"),
      col("last_value").as("v_src"), col("last_event_id").as("e_src"))
    val d = dst.select(col("ns"), col("doc_key"),
      col("last_value").as("v_dst"), col("last_event_id").as("e_dst"))
    s.join(d, Seq("ns", "doc_key"), "full_outer")
      .withColumn("action",
        when(col("e_src").isNull, "d")
          .when(col("e_dst").isNull, "i")
          .when(col("v_src") === col("v_dst") && col("e_src") === col("e_dst"),
            lit(null))
          .otherwise("u"))
      .filter(col("action").isNotNull)
      .select(col("ns"), col("doc_key"), col("action"),
        col("v_src").as("last_value"), col("e_src").as("last_event_id"))
  }

  /** Execute a [[repairPlan]] against the target state: one left-anti
    * join clears every touched key, one union re-inserts the source truth
    * for the non-delete actions — the same idempotent last-write-wins
    * MERGE the direct writer uses, restated over repair ops. Applying the
    * same plan twice is a no-op (the repaired keys then compare equal).
    */
  def applyRepairs(dst: DataFrame, plan: DataFrame): DataFrame =
    dst.select(col("ns"), col("doc_key"), col("last_value"), col("last_event_id"))
      .join(plan.select(col("ns"), col("doc_key")), Seq("ns", "doc_key"), "left_anti")
      .unionByName(plan.filter(col("action") =!= "d")
        .select(col("ns"), col("doc_key"), col("last_value"), col("last_event_id")))

  /** The checker's count-only fast path (`scripts/comparison_3x.py:
    * 120-126`: per-collection `estimated_document_count` equality, no
    * document reads): per-namespace row counts from both sides, one
    * full-outer join on ns — each state moves once and only its ns
    * column crosses the wire, so at 100 TB this is a metadata-weight
    * pass where [[diffStates]] is a data-weight one.
    */
  def diffCounts(src: DataFrame, dst: DataFrame): DataFrame = {
    val sc = src.groupBy(col("ns")).agg(count(lit(1)).as("n_src"))
    val dc = dst.groupBy(col("ns")).agg(count(lit(1)).as("n_dst"))
    sc.join(dc, Seq("ns"), "full_outer")
      .select(col("ns"),
        coalesce(col("n_src"), lit(0L)).as("n_src"),
        coalesce(col("n_dst"), lit(0L)).as("n_dst"),
        (coalesce(col("n_src"), lit(0L)) === coalesce(col("n_dst"), lit(0L)))
          .cast("long").as("equal"))
  }

  /** Lazily fold a key-sorted row iterator: one live document of state,
    * one emitted row per key as the key closes — O(1 doc) memory, never a
    * partition-sized output buffer.
    */
  def foldSorted[R, O](rows: Iterator[R], keyOf: R => String,
      step: (Option[JObject], R) => Option[JObject],
      render: (String, JObject) => O): Iterator[O] = new Iterator[O] {
    private var curKey: String = null
    private var state: Option[JObject] = None
    private var out: Option[O] = None
    private def close(): Option[O] = {
      val o = state.map(render(curKey, _))
      state = None
      o
    }
    private def advance(): Unit = {
      while (out.isEmpty && rows.hasNext) {
        val r = rows.next()
        val k = keyOf(r)
        if (k != curKey) {
          out = close()
          curKey = k
        }
        state = step(state, r)
      }
      if (out.isEmpty && !rows.hasNext) out = close()
    }
    override def hasNext: Boolean = { if (out.isEmpty) advance(); out.nonEmpty }
    override def next(): O = {
      if (!hasNext) throw new NoSuchElementException
      val o = out.get; out = None; o
    }
  }

  /** Full update-spec replay (W1-W4 with document mutation, not just
    * last-write-wins): per-key ordered fold applying MongoDB-style specs
    * via [[UpdateSpec]].
    *
    * Op semantics over the corpus (mirrored in the DuckDB oracle):
    *   i → replace document with {k: props.k, v: cents}
    *   u → {$set:{k: props.k}, $inc:{v: cents}}  (upsert when absent)
    *   d → delete
    * where cents = round(value·100) — integer so per-key accumulation is
    * order-exact.
    *
    * Physical shape = the reference's executor (`executor/executor.go`):
    * one shuffle on the key, secondary sort by ts, then a single-pass
    * state machine over contiguous key runs in each partition. Scales:
    * state is one document at a time, never a per-key collect.
    */
  def applyOps(oplog: DataFrame): DataFrame = {
    val spark = oplog.sparkSession
    import spark.implicits._
    val eff = oplog.filter(col("op").isin("i", "u", "d"))
      .select(col("doc_key"), col("op"), col("ts_packed"), col("props"),
        expr("cast(round(value * 100) as bigint)").as("cents"))
    val sorted = eff.repartition(col("doc_key"))
      .sortWithinPartitions(col("doc_key"), col("ts_packed"))
      .as[(String, String, Long, String, Long)]
    sorted.mapPartitions { it =>
      def asLong(v: JValue): Long = v match {
        case JInt(i) => i.toLong
        case JLong(l) => l
        case _ => 0L
      }
      // Contiguous-key state machine: one live document at a time, rows
      // emitted lazily as each key closes.
      foldSorted[(String, String, Long, String, Long), (String, Long, Long)](
        it, _._1,
        { case (state, (_, op, _, props, cents)) =>
          val k = asLong(UpdateSpec.parse(props) \ "k")
          op match {
            case "i" => Some(JObject(List("k" -> JLong(k), "v" -> JLong(cents))))
            case "u" =>
              val doc = state.getOrElse(JObject(Nil))
              Some(UpdateSpec.applySpec(doc, JObject(List(
                "$set" -> JObject(List("k" -> JLong(k))),
                "$inc" -> JObject(List("v" -> JLong(cents)))))))
            case _ => None
          }
        },
        (key, doc) => (key, asLong(doc \ "k"), asLong(doc \ "v")))
    }.toDF("doc_key", "k_final", "v_cents")
  }

  /** Array update-spec replay (W3's array surface: $push/$pull through the
    * document algebra — reference `executor/db_writer_bulk.go:118-232` with
    * the v2 array semantics of `oplog/oplog.go:281-392`).
    *
    * Op semantics over the corpus (mirrored closed-form in the oracle):
    *   i               → replace document with {tags: [props.k]}
    *   u, even event_id → {$push: {tags: {$each: [cents % 97]}}}  (upserts)
    *   u, odd event_id  → {$pull: {tags: cents % 7}}              (upserts)
    *   d               → delete
    * Same physical shape as [[applyOps]]: one shuffle on the key, secondary
    * sort, contiguous-key fold holding one document of state.
    */
  def applyArrayOps(oplog: DataFrame): DataFrame = {
    val spark = oplog.sparkSession
    import spark.implicits._
    val eff = oplog.filter(col("op").isin("i", "u", "d"))
      .select(col("doc_key"), col("op"), col("ts_packed"), col("event_id"),
        expr("cast(get_json_object(props, '$.k') as bigint)").as("k"),
        expr("cast(round(value * 100) as bigint)").as("cents"))
    val sorted = eff.repartition(col("doc_key"))
      .sortWithinPartitions(col("doc_key"), col("ts_packed"))
      .as[(String, String, Long, Long, Long, Long)]
    sorted.mapPartitions { it =>
      foldSorted[(String, String, Long, Long, Long, Long), (String, String, Long)](
        it, _._1,
        { case (state, (_, op, _, eventId, k, cents)) =>
          op match {
            case "i" =>
              Some(JObject(List("tags" -> org.json4s.JArray(List(JLong(k))))))
            case "u" =>
              val doc = state.getOrElse(JObject(Nil))
              val spec =
                if (eventId % 2 == 0)
                  JObject(List("$push" -> JObject(List("tags" ->
                    JObject(List("$each" -> org.json4s.JArray(List(JLong(cents % 97)))))))))
                else
                  JObject(List("$pull" -> JObject(List("tags" -> JLong(cents % 7)))))
              Some(UpdateSpec.applySpec(doc, spec))
            case _ => None
          }
        },
        (key, doc) => {
          val tags = (doc \ "tags") match {
            case org.json4s.JArray(items) => items
            case _ => Nil
          }
          (key, UpdateSpec.render2Json(org.json4s.JArray(tags)), tags.size.toLong)
        })
    }.toDF("doc_key", "tags_json", "n_tags")
  }

  /** Extended update-spec replay (W3's wider vocabulary: $mul, $min, $max,
    * $rename, $addToSet, $pop and positional `$[]` paths — operators the
    * reference ships to the MongoDB server verbatim
    * (`executor/db_writer_bulk.go:118-232`); a self-contained engine
    * implements them in [[UpdateSpec.applySpec]]).
    *
    * Op semantics over the corpus (mirrored in the DuckDB oracle as a
    * recursive-CTE fold):
    *   i → replace document with {v: cents, m: k, arr: [k%5, (k+1)%5]}
    *   d → delete
    *   u → by event_id % 12 (applied as an upsert; isInsert = doc absent):
    *     0: {$mul:{v:-1}}            (sign flip — bounded, exercises $mul)
    *     1: {$min:{v:cents}}         2: {$max:{v:cents}}
    *     3: {$rename:{m:"m2"}}       (no-op when m is absent)
    *     4: {$addToSet:{arr:k%5}}    (creates the array when absent)
    *     5: {$pop:{arr:1}}           (drop last; no-op when absent)
    *     6: {$mul:{"arr.$[]":-1}}    (positional fan-out over all elements)
    *     7: {$set:{m:k}, $setOnInsert:{v:cents*2, arr:[k%5]}}
    *        ($setOnInsert contributes ONLY on the upsert-insert path)
    *     8: {$inc:{"arr.$[lo]":10}} arrayFilters [{lo:{$lt:3}}]
    *        (filtered positional — only elements < 3 incremented)
    *     9: {$bit:{v:{xor:k}}}       (int64 bitwise; missing v starts at 0)
    *    10: {$push:{arr:{$each:[k%5], $position:0, $slice:3}}}
    *        (prepend, then keep the first 3)
    *    11: {$push:{arr:{$each:[k%5,(k+2)%7], $sort:-1, $slice:-4}}}
    *        (append 2, sort descending, keep the last 4)
    * Same physical shape as [[applyOps]]: one shuffle on the key,
    * secondary sort, contiguous-key fold holding one document of state.
    */
  def applyOps2(oplog: DataFrame): DataFrame = {
    import org.json4s.{JArray, JString}
    val spark = oplog.sparkSession
    import spark.implicits._
    val eff = oplog.filter(col("op").isin("i", "u", "d"))
      .select(col("doc_key"), col("op"), col("ts_packed"), col("event_id"),
        expr("cast(round(value * 100) as bigint)").as("cents"),
        expr("cast(get_json_object(props, '$.k') as bigint)").as("k"))
    val sorted = eff.repartition(col("doc_key"))
      .sortWithinPartitions(col("doc_key"), col("ts_packed"))
      .as[(String, String, Long, Long, Long, Long)]
    sorted.mapPartitions { it =>
      def optLong(v: JValue): Option[Long] = v match {
        case JInt(i) => Some(i.toLong)
        case JLong(l) => Some(l)
        case _ => None
      }
      val loFilter = UpdateSpec.parseArrayFilters("""[{"lo":{"$lt":3}}]""")
      foldSorted[(String, String, Long, Long, Long, Long),
          (String, Option[Long], Option[Long], Option[Long], Option[String])](
        it, _._1,
        { case (state, (_, op, _, eventId, cents, k)) =>
          op match {
            case "i" => Some(JObject(List(
              "v" -> JLong(cents), "m" -> JLong(k),
              "arr" -> JArray(List(JLong(k % 5), JLong((k + 1) % 5))))))
            case "u" =>
              val doc = state.getOrElse(JObject(Nil))
              val spec = (eventId % 13) match {
                case 0 => JObject(List("$mul" -> JObject(List("v" -> JInt(-1)))))
                case 1 => JObject(List("$min" -> JObject(List("v" -> JLong(cents)))))
                case 2 => JObject(List("$max" -> JObject(List("v" -> JLong(cents)))))
                case 3 => JObject(List("$rename" -> JObject(List("m" -> JString("m2")))))
                case 4 => JObject(List("$addToSet" -> JObject(List("arr" -> JLong(k % 5)))))
                case 5 => JObject(List("$pop" -> JObject(List("arr" -> JInt(1)))))
                case 6 => JObject(List("$mul" -> JObject(List("arr.$[]" -> JInt(-1)))))
                case 7 => JObject(List(
                  "$set" -> JObject(List("m" -> JLong(k))),
                  "$setOnInsert" -> JObject(List(
                    "v" -> JLong(cents * 2),
                    "arr" -> JArray(List(JLong(k % 5)))))))
                case 8 => JObject(List("$inc" -> JObject(List("arr.$[lo]" -> JInt(10)))))
                case 9 => JObject(List("$bit" -> JObject(List("v" ->
                  JObject(List("xor" -> JLong(k)))))))
                case 10 => JObject(List("$push" -> JObject(List("arr" -> JObject(List(
                  "$each" -> JArray(List(JLong(k % 5))),
                  "$position" -> JInt(0), "$slice" -> JInt(3)))))))
                case 11 => JObject(List("$push" -> JObject(List("arr" -> JObject(List(
                  "$each" -> JArray(List(JLong(k % 5), JLong((k + 2) % 7))),
                  "$sort" -> JInt(-1), "$slice" -> JInt(-4)))))))
                case _ => JObject(List("$pullAll" -> JObject(List("arr" ->
                  JArray(List(JLong(k % 5), JLong((k + 3) % 5)))))))
              }
              Some(UpdateSpec.applySpec(doc, spec, loFilter, isInsert = state.isEmpty))
            case _ => None
          }
        },
        (key, doc) => (key,
          optLong(doc \ "v"), optLong(doc \ "m"), optLong(doc \ "m2"),
          (doc \ "arr") match {
            case a: JArray => Some(UpdateSpec.render2Json(a))
            case _ => None
          }))
    }.toDF("doc_key", "v_final", "m_final", "m2_final", "arr_json")
  }

  /** G4/G6 checkpoint aggregation (`collector/checkpoint.go:149-199`,
    * `common/db_opertion.go:127-232`): the checkpoint is the minimum acked
    * ts across workers; also surfaces each worker's newest ts and volume.
    */
  def checkpointByWorker(oplogWithWorker: DataFrame): DataFrame =
    oplogWithWorker.groupBy(col("worker"))
      .agg(
        min(col("ts_packed")).as("lsn_ack_min"),
        max(col("ts_packed")).as("lsn_newest"),
        count(lit(1)).as("n_logs"))
}
