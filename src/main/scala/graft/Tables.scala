package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Table access for the driver-generated parquet corpus (TESTDATA.md).
  *
  * All readers go through here so scan-level concerns (schema pruning,
  * pushdown-friendly layout) live in one place. At cluster scale the same
  * entry point would resolve catalog tables / bucketed layouts instead of
  * raw parquet paths.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, table: String): DataFrame =
    spark.read.parquet(s"$sfDir/$table.parquet")

  /** The `events` table with `ts` normalized to NANOSECOND epoch BIGINT —
    * the engine's canonical clock grain (every downstream site computes
    * `ts DIV 1000` = µs / `ts DIV 1e9` = sec with exact integer math).
    *
    * The driver's corpus has carried two physical layouts for this column:
    * parquet TIMESTAMP(NANOS), which Spark 4 can only read as a long, and
    * naive TIMESTAMP(MICROS), which it reads as TIMESTAMP_NTZ. Dispatch on
    * the decoded type so both layouts land on the same contract. For the
    * NTZ layout the wall-clock is interpreted in UTC (session zone pinned
    * here), matching the DuckDB oracle's `epoch_ns(ts)` which treats naive
    * timestamps as UTC — the two engines must agree on the epoch value,
    * not just the rendering.
    */
  def loadEventsNs(spark: SparkSession, sfDir: String): DataFrame = {
    // TIMESTAMP(NANOS) layout: readable only as long (no-op for µs files).
    // This conf is a read-capability switch with a single workable value —
    // without it Spark cannot decode the nanos layout at all — not a
    // behavioral knob, so setting it here is safe for sessions built
    // outside this library (the driver's smoke-check session included).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeTsNs(spark, load(spark, sfDir, "events"))
  }

  /** Rewrite a (batch or streaming) events frame's `ts` to ns epoch BIGINT
    * when the scan decoded it as a timestamp; identity when it is already
    * a long. Shared by [[loadEventsNs]] and the streaming S1 source.
    */
  def normalizeTsNs(spark: SparkSession, df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case LongType => df // already ns epoch
      case _ =>
        // The NTZ→LTZ cast resolves the naive wall-clock in the session
        // zone, and the analyzer stamps that zone into the Cast at build
        // time (Dataset ops are eagerly analyzed; ResolveTimeZone runs
        // then). Pin UTC only for the duration of this build — matching
        // the DuckDB oracle's epoch_ns(ts), which treats naive timestamps
        // as UTC — and restore the caller's zone so unrelated queries in
        // the same session are untouched.
        val zoneKey = "spark.sql.session.timeZone"
        val prev = spark.conf.get(zoneKey)
        try {
          spark.conf.set(zoneKey, "UTC")
          df.withColumn("ts",
            unix_micros(col("ts").cast(TimestampType)) * lit(1000L))
        } finally spark.conf.set(zoneKey, prev)
    }

  /** Dimension tables small enough to broadcast at any realistic scale
    * factor (region/nation are fixed-cardinality; supplier/customer grow
    * with SF but stay tiny relative to the fact tables).
    */
  val broadcastable: Set[String] = Set("region", "nation", "supplier")
}
