package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.transform.EventNormalizer

/** Deployment-side S2 connector: MongoDB change streams through the
  * official Spark MongoDB connector, projected onto the canonical
  * [[graft.model.ChangeEvent]] columns and normalized to the oplog feed
  * [[IncrSync.startOplogFrom]] consumes (reference
  * `collector/reader/event_reader.go:109-185`,
  * `common/change_stream.go:28-161`).
  *
  * No MongoDB exists in the sandbox, so `format("mongodb")` is deployment
  * code; the column projections ([[projectConnectorEvents]],
  * [[toOplogFeed]]) are pure and unit-tested against an injected
  * connector-shaped DataFrame, and everything downstream (the 8-way
  * dispatch, filter chain, apply) is the oracle-gated production path.
  *
  * Resume contract (see [[ChangeSource]]): the connector checkpoints the
  * change-stream resume token inside Spark's offset log and reopens with
  * `startAfter(token)` — the token is opaque and never reinterpreted.
  */
object MongoChangeSource {

  /** Official-connector change-stream rows → canonical event columns.
    * Expected input (the connector's change-event schema with
    * `change.stream.publish.full.document.only = false`; document parts
    * as JSON strings): `seq` (delivery sequence, monotone in resume-token
    * order — the caller's offset), `clusterTime` (packed BSON timestamp),
    * `operationType`, `ns{db,coll}`, `to{db,coll}` (rename target),
    * `documentKey`, `fullDocument`,
    * `updateDescription{updatedFields, removedFields}`.
    */
  def projectConnectorEvents(raw: DataFrame): DataFrame = raw.select(
    col("seq").cast("long").as("event_id"),
    // BSON timestamps are second-granular: seconds ride the high word
    (shiftrightunsigned(col("clusterTime"), 32) * 1000000L).as("ts_us"),
    col("clusterTime").cast("long").as("ts_packed"),
    col("operationType").as("operation_type"),
    col("ns.db").as("db"), col("ns.coll").as("coll"),
    coalesce(col("to.db"), col("ns.db")).as("to_db"),
    coalesce(col("to.coll"), col("ns.coll")).as("to_coll"),
    col("fullDocument").as("full_document"),
    col("documentKey").as("document_key"),
    coalesce(col("updateDescription.updatedFields"), lit("{}")).as("updated_fields"),
    coalesce(col("updateDescription.removedFields"),
      array().cast("array<string>")).as("removed_fields"))

  /** Normalized events → the raw-oplog feed columns of
    * [[IncrSync.oplogSchema]]. The document key is recovered from the op
    * body the normalizer routed it into (o2 for update/replace, o for
    * delete, the full document for insert); change streams carry no gid /
    * fromMigrate (those are raw-oplog fields), and session-transaction
    * events arrive already committed, so the txn columns stay null.
    * Change streams also carry no numeric `value` column (that is a
    * corpus-feed convenience, not a wire field), so it is hardwired to
    * 0.0 here and the state table's `last_value` is always 0 on the
    * connector path — the document payload rides `props` instead.
    */
  def toOplogFeed(normalized: DataFrame): DataFrame = {
    val nullS = lit(null).cast("string")
    val keySrc = when(col("op") === "u", col("o2"))
      .when(col("op") === "d", col("o"))
      .otherwise(col("o"))
    normalized.select(
      col("event_id"), col("ts_packed"), col("op"), col("ns"),
      coalesce(get_json_object(keySrc, "$._id"), lit("")).as("doc_key"),
      lit(0.0).as("value"),
      col("o").as("props"),
      lit("").as("g"), lit(false).as("from_migrate"),
      nullS.as("lsid"), lit(null).cast("long").as("txn_number"),
      when(col("op") === "c", col("o")).otherwise(nullS).as("o"))
  }

  /** The live S2 [[ChangeSource]] (deployment code — needs a MongoDB and
    * the connector jar). Invalidate events dead-letter via
    * [[EventNormalizer.normalize]]'s `op = "x"` rows being dropped by the
    * downstream filter chain; route them to an errors table with
    * [[EventNormalizer]]'s dead-letter helper if quarantine is wanted.
    */
  final case class MongoEventSource(uri: String, db: String, coll: String)
      extends ChangeSource {
    def load(spark: SparkSession): DataFrame =
      toOplogFeed(EventNormalizer.normalize(projectConnectorEvents(
        spark.readStream.format("mongodb")
          .option("spark.mongodb.connection.uri", uri)
          .option("spark.mongodb.database", db)
          .option("spark.mongodb.collection", coll)
          .option("spark.mongodb.change.stream.publish.full.document.only", "false")
          .load())))
  }
}
