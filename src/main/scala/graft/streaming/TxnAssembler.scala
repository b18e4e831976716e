package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

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
  * stays correct.
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

  def assemble(entries: Dataset[TxnEntry]): Dataset[InnerOp] = {
    val spark = entries.sparkSession
    import spark.implicits._
    entries
      .groupByKey(e => TxnKey(e.lsid, e.txnNumber))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(assembleGroup)
  }

  /** Pure group logic (also unit-testable without a stream). */
  def assembleGroup(key: TxnKey, values: Iterator[TxnEntry],
      state: GroupState[Buffer]): Iterator[InnerOp] = {
    var buf = if (state.exists) state.get.entries else List.empty[TxnEntry]
    val result = scala.collection.mutable.ListBuffer.empty[InnerOp]
    values.toSeq.sortBy(_.seq).foreach { e =>
      e.kind match {
        case "partial" => buf = buf :+ e
        case "abort" =>
          buf = Nil
          state.remove()
        case "commit" =>
          val all = (buf :+ e).flatMap(_.ops)
          val commitTs = e.ts
          result ++= all.zipWithIndex.map { case (op, i) =>
            // T3 ts patch: children ts-1, last child keeps the commit ts.
            val ts = if (i == all.size - 1) commitTs else commitTs - 1
            InnerOp(key.lsid, key.txnNumber, i, op, ts)
          }
          buf = Nil
          state.remove()
      }
    }
    if (buf.nonEmpty) state.update(Buffer(buf))
    result.iterator
  }
}
