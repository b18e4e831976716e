package graft.apply

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** G2 LogsGroupCombiner (`executor/combiner.go:21-82`): run-length group
  * consecutive records with the same (ns, op) — in worker order — into
  * bulk-write flush groups, capped at `maxGroupDocs` docs AND
  * `maxGroupBytes` payload bytes per group (`executor/executor.go:30-32`:
  * 1000 docs / 12 MB).
  *
  * Spark-first formulation: gaps-and-islands over a per-worker window.
  * `island = running count of (ns,op) change points`; a run of L docs and
  * B payload bytes flushes in max(ceil(L/docCap), ceil(B/byteCap)) groups
  * — the capacity lower bound on the group count (balanced splitting
  * achieves it whenever no single doc exceeds byteCap/2; the reference's
  * greedy chunker can exceed the bound for jumbo docs, so read this as a
  * sizing metric, not a byte-exact replay of greedy boundaries). Pure
  * plan — no mapPartitions, fully codegen'd.
  */
object Combiner {

  def flushGroups(oplogWithWorker: DataFrame, maxGroupDocs: Int = 1000,
      maxGroupBytes: Long = 12L * 1024 * 1024): DataFrame = {
    val seq = Window.partitionBy(col("worker"))
      .orderBy(col("ts_packed"), col("event_id"))
    val changed = when(
      lag(col("ns"), 1).over(seq) === col("ns") &&
      lag(col("op"), 1).over(seq) === col("op"), 0).otherwise(1)
    oplogWithWorker
      .withColumn("island",
        sum(changed).over(seq.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("worker"), col("island"), col("ns"), col("op"))
      .agg(count(lit(1)).as("run_len"),
        // RawSize annotation (P1): the payload's wire size.
        sum(octet_length(col("props"))).as("run_bytes"))
      .groupBy(col("ns"), col("op"))
      .agg(
        count(lit(1)).as("n_runs"),
        sum(greatest(
          ceil(col("run_len") / lit(maxGroupDocs)),
          ceil(col("run_bytes") / lit(maxGroupBytes)))).as("n_flush_groups"),
        sum(col("run_len")).as("n_rows"),
        max(col("run_len")).as("max_run"))
  }
}
