package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.{Cdc, ControlOps, DdlOps, LiveCorpus, MmOps, Relational, SinkOps, SnapshotOps, StreamOps, TextOps, VectorOps}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps one entry per implemented operator (SURVEY.md §2 plus the
  * LLM-pipeline additions) to a DataFrame builder over a scale-factor dir;
  * `oracleSql` holds the DuckDB-equivalent SQL for the hash-compare gate.
  */
object SparkEntry {
  private def modules: Seq[(Map[String, (SparkSession, String) => DataFrame], Map[String, String])] =
    Seq(
      (Relational.queries, Relational.oracles),
      (Cdc.queries, Cdc.oracles),
      (DdlOps.queries, DdlOps.oracles),
      (TextOps.queries, TextOps.oracles),
      (VectorOps.queries, VectorOps.oracles),
      (SnapshotOps.queries, SnapshotOps.oracles),
      (SinkOps.queries, SinkOps.oracles),
      (MmOps.queries, MmOps.oracles),
      (ControlOps.queries, ControlOps.oracles),
      (StreamOps.queries, StreamOps.oracles),
      (LiveCorpus.queries, LiveCorpus.oracles)
    )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The full CDC slice: normalize → filter chain → route → idempotent apply.
    */
  def entry(spark: SparkSession): DataFrame =
    queries("cdc_apply")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.map(_._1).reduce(_ ++ _)

  def oracleSql: Map[String, String] =
    modules.map(_._2).reduce(_ ++ _)
}
