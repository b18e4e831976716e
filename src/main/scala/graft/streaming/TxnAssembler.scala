package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.{ArrayType, StringType}

/** Stateful transaction assembly (SURVEY.md §2.7 T1-T3; reference
  * `oplog/txn_buffer.go:63-301`, `oplog/txn_meta.go`).
  *
  * MongoDB multi-entry transactions arrive as a chain of `applyOps`
  * oplog entries keyed by (lsid, txnNumber): zero or more `partialTxn`
  * entries, terminated by a commit (final applyOps) or an
  * `abortTransaction`. The assembler buffers partial entries per key,
  * emits every inner op (in entry order) on commit, and purges on abort.
  *
  * Spark-native shape: `flatMapGroupsWithState` keyed by the txn id —
  * the one genuinely stateful streaming operator in the engine. State per
  * key is the buffered inner-op list; emission patches child timestamps
  * the way the reference does (children get ts-1, the last child keeps
  * the commit entry's ts — `txn_buffer.go:314-357`) so checkpoint math
  * stays correct. Orphaned partial chains (a member that never sees its
  * commit/abort — e.g. a truncated oplog window) are purged by a
  * processing-time TTL instead of leaking state forever; the reference
  * achieves the same via its barrier flush.
  */
object TxnAssembler {

  /** One transaction-chain entry (an applyOps oplog or abort marker). */
  case class TxnEntry(
      lsid: String, txnNumber: Long, seq: Long,
      kind: String, // "partial" | "commit" | "abort"
      ops: Seq[String], // inner op payloads (opaque JSON)
      ts: Long)

  /** An inner op released by a committed transaction. */
  case class InnerOp(lsid: String, txnNumber: Long, idx: Int, op: String, ts: Long)

  case class TxnKey(lsid: String, txnNumber: Long)
  case class Buffer(entries: List[TxnEntry])

  /** State TTL for orphaned partial transactions. */
  val DefaultTxnTtlMs: Long = 3600 * 1000L

  // --- T2: classification (oplog/txn_meta.go:35-134) -----------------------

  /** Derive [[TxnEntry]] rows from canonical oplog rows. A transaction
    * entry is an `op == "c"` record with lsid + txnNumber whose body
    * carries one of applyOps / commitTransaction / abortTransaction
    * (`NewTxnMeta`); the lifecycle kind is DERIVED from the body:
    *
    *   - abortTransaction            → abort
    *   - commitTransaction, or an applyOps without partialTxn/prepare
    *     (an unprepared final entry) → commit     (`TxnMeta.IsCommit`)
    *   - applyOps with partialTxn    → partial    (`TxnMeta.IsData`)
    *
    * Input columns: lsid, txn_number, seq, op, o (JSON), ts_packed.
    * Inner ops ride out of the applyOps array as raw JSON strings
    * (from_json to array<string> keeps each element's text).
    */
  def classifyEntries(df: DataFrame): Dataset[TxnEntry] = {
    val spark = df.sparkSession
    import spark.implicits._
    val o = col("o")
    val hasApply = get_json_object(o, "$.applyOps").isNotNull
    val hasCommit = get_json_object(o, "$.commitTransaction").isNotNull
    val hasAbort = get_json_object(o, "$.abortTransaction").isNotNull
    val hasPartial = get_json_object(o, "$.partialTxn").isNotNull
    val hasPrepare = get_json_object(o, "$.prepare").isNotNull
    val isTxn = col("op") === "c" && col("lsid").isNotNull && col("txn_number").isNotNull
    val isReal = hasApply || hasCommit || hasAbort
    val kind = when(hasAbort, "abort")
      .when(hasCommit || (!hasPrepare && !hasPartial), "commit")
      .otherwise("partial")
    df.filter(isTxn && isReal)
      .select(col("lsid"), col("txn_number").as("txnNumber"), col("seq"),
        kind.as("kind"),
        coalesce(from_json(get_json_object(o, "$.applyOps"), ArrayType(StringType)),
          array()).as("ops"),
        col("ts_packed").as("ts"))
      .as[TxnEntry]
  }

  // --- T1: assembly --------------------------------------------------------

  /** @param ttlMs processing-time TTL for orphaned partial chains; 0
    *   disables the timeout (state then lives until commit/abort). With a
    *   TTL the stream runs continuous no-data batches to expire state —
    *   the right trade on a production tail, unsuitable under
    *   `processAllAvailable`-style test drivers.
    */
  def assemble(entries: Dataset[TxnEntry], ttlMs: Long = DefaultTxnTtlMs): Dataset[InnerOp] = {
    val spark = entries.sparkSession
    import spark.implicits._
    val conf = if (ttlMs > 0) GroupStateTimeout.ProcessingTimeTimeout
               else GroupStateTimeout.NoTimeout
    entries
      .groupByKey(e => TxnKey(e.lsid, e.txnNumber))
      .flatMapGroupsWithState(OutputMode.Append, conf)(
        (key: TxnKey, values: Iterator[TxnEntry], state: GroupState[Buffer]) =>
          assembleGroup(key, values, state, ttlMs))
  }

  /** Batch-mode assembly: each group's full chain is present, so the fold
    * runs without external state. One shuffle on the txn key — the batch
    * analogue used by the oracle-verified `cdc_txn_assemble` query.
    */
  def assembleBatch(entries: Dataset[TxnEntry]): Dataset[InnerOp] = {
    val spark = entries.sparkSession
    import spark.implicits._
    entries
      .groupByKey(e => TxnKey(e.lsid, e.txnNumber))
      .flatMapGroups { (key: TxnKey, values: Iterator[TxnEntry]) =>
        foldEntries(key, values.toSeq.sortBy(_.seq), Nil)._2.iterator
      }
  }

  /** Streaming group logic. */
  def assembleGroup(key: TxnKey, values: Iterator[TxnEntry],
      state: GroupState[Buffer], ttlMs: Long = DefaultTxnTtlMs): Iterator[InnerOp] = {
    if (state.hasTimedOut) {
      // Orphaned partial chain: purge (reference: barrier flush).
      state.remove()
      return Iterator.empty
    }
    val buf0 = if (state.exists) state.get.entries else List.empty[TxnEntry]
    val (buf, out) = foldEntries(key, values.toSeq.sortBy(_.seq), buf0)
    if (buf.nonEmpty) {
      state.update(Buffer(buf))
      if (ttlMs > 0) state.setTimeoutDuration(ttlMs)
    } else if (state.exists) {
      state.remove()
    }
    out.iterator
  }

  /** Pure chain fold: returns (remaining buffer, emitted inner ops). */
  def foldEntries(key: TxnKey, entries: Seq[TxnEntry],
      initial: List[TxnEntry]): (List[TxnEntry], Seq[InnerOp]) = {
    var buf = initial
    val result = scala.collection.mutable.ListBuffer.empty[InnerOp]
    entries.foreach { e =>
      e.kind match {
        case "partial" => buf = buf :+ e
        case "abort" => buf = Nil
        case "commit" =>
          val all = (buf :+ e).flatMap(_.ops)
          val commitTs = e.ts
          result ++= all.zipWithIndex.map { case (op, i) =>
            // T3 ts patch: children ts-1, last child keeps the commit ts.
            val ts = if (i == all.size - 1) commitTs else commitTs - 1
            InnerOp(key.lsid, key.txnNumber, i, op, ts)
          }
          buf = Nil
      }
    }
    (buf, result.toSeq)
  }
}
