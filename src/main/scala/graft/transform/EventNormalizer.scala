package graft.transform

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** P2: change-stream event → canonical oplog normalizer (SURVEY.md §1.2;
  * reference `oplog/changestram_event.go:77-452` `ConvertEvent2Oplog`).
  *
  * The 8-way operationType dispatch, as one codegen'd projection — no
  * UDFs, no shuffle; the operator is embarrassingly parallel and fuses
  * into whatever scan precedes it:
  *
  *   insert       → op i, ns db.coll,  o = fullDocument
  *   delete       → op d, ns db.coll,  o = documentKey
  *   replace      → op u, ns db.coll,  o = {$set: fullDocument},  o2 = documentKey
  *   update       → op u, ns db.coll,  o2 = documentKey,
  *                  o = {$set: updatedFields?, $unset: {f:1…}?} from the
  *                  updateDescription diff ({} when both empty), or
  *                  {$set: fullDocument} in fullDocument=updateLookup mode
  *                  (changestram_event.go:282-302)
  *   drop         → op c, ns db.$cmd,  o = {drop: coll}
  *   rename       → op c, ns db.$cmd,  o = {renameCollection: "db.coll", to: "db2.coll2"}
  *   dropDatabase → op c, ns db.$cmd,  o = {dropDatabase: 1}
  *   invalidate / unknown → op x — the reference errors out
  *   (changestram_event.go:432-439); batch callers assert none survive
  *   via [[assertNoInvalid]], streaming callers route them to a dead-letter
  *   side output.
  */
object EventNormalizer {

  /** `{"f1":1,"f2":1}` JSON from a removed-fields array (the reference's
    * removedFieldsMap, changestram_event.go:292-300).
    */
  def unsetJson(removed: Column): Column =
    concat(lit("{"),
      concat_ws(",", transform(removed, f => concat(lit("\""), f, lit("\":1")))),
      lit("}"))

  /** Normalize a change-stream event DataFrame ([[graft.model.ChangeEvent]]
    * schema) into canonical oplog rows (event_id, ts_us, ts_packed, op, db,
    * coll, ns, o, o2).
    *
    * @param fullDocMode updates carry the post-image (`fullDocument:
    *   updateLookup`): o = {$set: fullDocument} instead of the diff spec.
    */
  def normalize(events: DataFrame, fullDocMode: Boolean = false): DataFrame = {
    val opType = col("operation_type")
    val dbColl = concat(col("db"), lit("."), col("coll"))
    val cmdNs = concat(col("db"), lit(".$cmd"))

    val hasSet = col("updated_fields").isNotNull && col("updated_fields") =!= "{}"
    val hasUnset = col("removed_fields").isNotNull && size(col("removed_fields")) > 0
    val diffSpec =
      when(hasSet && hasUnset,
        concat(lit("{\"$set\":"), col("updated_fields"),
          lit(",\"$unset\":"), unsetJson(col("removed_fields")), lit("}")))
        .when(hasSet, concat(lit("{\"$set\":"), col("updated_fields"), lit("}")))
        .when(hasUnset, concat(lit("{\"$unset\":"), unsetJson(col("removed_fields")), lit("}")))
        .otherwise(lit("{}"))
    val fullDocValid = col("full_document").isNotNull && col("full_document") =!= "{}"
    val updateO =
      if (fullDocMode)
        when(fullDocValid, concat(lit("{\"$set\":"), col("full_document"), lit("}")))
          .otherwise(diffSpec)
      else diffSpec

    val op =
      when(opType === "insert", "i")
        .when(opType === "delete", "d")
        .when(opType.isin("replace", "update"), "u")
        .when(opType.isin("drop", "rename", "dropDatabase"), "c")
        .otherwise("x")

    val ns =
      when(opType.isin("drop", "rename", "dropDatabase"), cmdNs)
        .otherwise(dbColl)

    val o =
      when(opType === "insert", col("full_document"))
        .when(opType === "delete", col("document_key"))
        .when(opType === "replace",
          concat(lit("{\"$set\":"), col("full_document"), lit("}")))
        .when(opType === "update", updateO)
        .when(opType === "drop", concat(lit("{\"drop\":\""), col("coll"), lit("\"}")))
        .when(opType === "rename",
          concat(lit("{\"renameCollection\":\""), dbColl,
            lit("\",\"to\":\""), col("to_db"), lit("."), col("to_coll"), lit("\"}")))
        .when(opType === "dropDatabase", lit("{\"dropDatabase\":1}"))
        .otherwise(lit("{}"))

    val o2 =
      when(opType.isin("replace", "update"), col("document_key"))
        .otherwise(lit("{}"))

    events.select(
      col("event_id"), col("ts_us"), col("ts_packed"),
      op.as("op"), col("db"), col("coll"), ns.as("ns"),
      coalesce(o, lit("{}")).as("o"), coalesce(o2, lit("{}")).as("o2"))
  }

  /** Fail the job if any invalidate/unknown event reached this point —
    * the batch analogue of the reference's hard error.
    */
  def assertNoInvalid(normalized: DataFrame): DataFrame =
    normalized.withColumn("op",
      when(col("op") === "x",
        raise_error(concat(lit("invalidate event, handle manually: event_id="),
          col("event_id").cast("string"))))
        .otherwise(col("op")))

  /** Streaming dead-letter route: record invalidate/unknown rows
    * (`op == "x"`) in an errors table and return only the valid rows —
    * called inside `foreachBatch`, where a raise_error would kill the
    * query instead of quarantining the poison event
    * (changestram_event.go:432-439 errors; a long-running stream must
    * keep flowing). The errors table carries the full normalized row so
    * the manual-handling path loses nothing.
    *
    * @param batchId the micro-batch id: the errors table is keyed per
    *   batch and overwrites, so a replayed batch (at-least-once delivery)
    *   re-records rather than duplicates its poison rows. REQUIRED — a
    *   defaulted id would make every batch overwrite the same directory,
    *   silently losing earlier batches' dead letters.
    */
  def routeInvalid(normalized: DataFrame, errorsDir: String,
      batchId: Long): DataFrame = {
    import org.apache.spark.sql.SaveMode
    // One snapshot for all three consumers (emptiness probe, errors
    // write, returned valid rows): without it a non-deterministic input
    // could drop a poison row from the output yet never record it — the
    // exact loss the dead-letter route exists to prevent.
    val snap = normalized.localCheckpoint()
    val invalid = snap.filter(col("op") === "x")
    // Empty-guard so a clean batch never creates (or touches) the errors
    // table.
    if (!invalid.isEmpty) {
      invalid.write.mode(SaveMode.Overwrite).parquet(s"$errorsDir/batch=$batchId")
    }
    snap.filter(col("op") =!= "x")
  }
}
