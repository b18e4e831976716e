package graft.transform

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DDL-aware command classification, namespace extraction, and namespace
  * transform (SURVEY.md §2.4 F4/F5-DDL and §2.3 P6).
  *
  * Reference semantics:
  *  - command table: `oplog/cmd_oplog.go:14-63` — the command name is the
  *    FIRST key of the command document;
  *  - filter-side ns extraction: `collector/filter/oplog_filter.go:98-291`
  *    (NamespaceFilter.Filter) — a `create`/`drop`/… op is filtered by the
  *    namespace it operates ON, not by the literal `db.$cmd`;
  *  - transform-side rewrite: `executor/executor.go:279-373`
  *    (transformPartialLog) — ns rules rewrite both the `ns` column and
  *    the command body fields that embed namespaces.
  *
  * Everything is Column expressions over the JSON `o` document — fixed
  * command vocabulary means per-command `get_json_object` branches, fully
  * codegen'd, no UDFs. `applyOps` recursion is deliberately absent: in
  * this engine transactions are exploded FIRST (T1/T3, the txn assembler),
  * so inner ops flow through these operators as ordinary rows — the Spark
  * shape of the reference's recursive walk.
  */
object DdlNs {

  /** Commands whose first value is the bare collection name. */
  val collCmds: Seq[String] = Seq(
    "create", "createIndexes", "commitIndexBuild", "collMod", "drop",
    "deleteIndex", "deleteIndexes", "dropIndex", "dropIndexes",
    "convertToCapped", "emptycapped")

  /** needFilter=true rows of the command table (F4 drops these). */
  val needFilterCmds: Seq[String] = Seq("startIndexBuild", "abortIndexBuild")

  /** runOnAdmin=true rows (`cmd_oplog.go:24`) — surfaced for the apply path. */
  val runOnAdminCmds: Seq[String] = Seq("renameCollection")

  /** concernSyncData=true rows: transaction containers, never ns-filtered. */
  val syncDataCmds: Seq[String] = Seq("applyOps")

  val knownCmds: Seq[String] =
    collCmds ++ needFilterCmds ++ syncDataCmds ++ Seq("dropDatabase", "renameCollection")

  /** ExtraCommandName (`cmd_oplog.go:33-42`): the first key of the JSON
    * command document (ordered BSON ⇒ our JSON strings preserve order).
    */
  def cmdName(o: Column): Column =
    regexp_extract(o, "^\\s*\\{\\s*\"([^\"]+)\"", 1)

  /** The command's argument — the FIRST string value of the command
    * document (every command whose ns we extract carries it there:
    * coll-commands hold the bare collection, renameCollection the full
    * source ns). One regexp instead of a per-command `get_json_object`
    * branch chain — the difference between a 64 KB codegen blowup and a
    * single generated match per row.
    */
  def cmdArg(o: Column): Column =
    regexp_extract(o, "^\\s*\\{\\s*\"[^\"]+\"\\s*:\\s*\"([^\"]*)\"", 1)

  /** F4 command filter (`oplog_filter.go:60-67`): drop
    * startIndexBuild/abortIndexBuild (4.4 two-phase index builds — only
    * commitIndexBuild replays).
    */
  def commandKeep(op: Column = col("op"), o: Column = col("o")): Column =
    !(op === "c" && cmdName(o).isin(needFilterCmds: _*))

  /** The namespace a record actually operates ON (F5's DDL extraction):
    *  - DML on `*.system.indexes` → the `ns` field inside the index doc;
    *  - coll-command → db + "." + o[cmd];
    *  - renameCollection → the source ns in o.renameCollection;
    *  - anything else (DML, dropDatabase, applyOps, unknown) → literal ns.
    */
  def effectiveNs(op: Column = col("op"), ns: Column = col("ns"),
      o: Column = col("o")): Column = {
    val db = substring_index(ns, ".", 1)
    val cmd = cmdName(o)
    val arg = cmdArg(o)
    when(op === "c",
      when(cmd.isin(collCmds: _*), concat(db, lit("."), arg))
        .when(cmd === "renameCollection", arg)
        .otherwise(ns))
      .when(ns.endsWith("system.indexes"), get_json_object(o, "$.ns"))
      .otherwise(ns)
  }

  /** F5 FilterNs with the white-db `$cmd` override
    * (`doc_filter.go:83-103`): a `db.$cmd` namespace whose db appears in
    * the whitelist passes unconditionally (transactions / dropDatabase on
    * a replicated db).
    */
  def nsKeepOn(nsCol: Column, white: Seq[String], black: Seq[String],
      whiteDbs: Seq[String]): Column = {
    val w = if (white.isEmpty) lit(true) else white.map(nsCol.rlike(_)).reduce(_ || _)
    val b = if (black.isEmpty) lit(false) else black.map(nsCol.rlike(_)).reduce(_ || _)
    val cmdPass =
      if (whiteDbs.isEmpty) lit(false)
      else nsCol.endsWith(".$cmd") && substring_index(nsCol, ".", 1).isin(whiteDbs: _*)
    cmdPass || (w && !b)
  }

  /** The full DDL-aware keep predicate: F4 ∧ (ns filter on the EFFECTIVE
    * namespace), with the reference's special cases — applyOps always
    * kept, unknown commands kept (warn-and-pass, `oplog_filter.go:171-175`).
    */
  def ddlAwareKeep(white: Seq[String], black: Seq[String],
      whiteDbs: Seq[String] = Seq.empty): Column = {
    val cmd = cmdName(col("o"))
    val nsKeep = nsKeepOn(effectiveNs(), white, black, whiteDbs)
    commandKeep() && (
      when(col("op") === "c",
        cmd.isin(syncDataCmds: _*) || !cmd.isin(knownCmds: _*) || nsKeep)
        .otherwise(nsKeep))
  }

  /** P6 transformPartialLog: apply ns rules to both the `ns` column and
    * the namespaces embedded in the command body. Returns the input with
    * `ns` rewritten and `o` patched; unknown commands are dropped
    * (`executor.go:293-296` returns nil).
    */
  def transformCommand(df: DataFrame, rules: Seq[(String, String)]): DataFrame = {
    def t(c: Column): Column = Transforms.nsTransform(rules, c)
    val o = col("o")
    val cmd = cmdName(o)
    val db = substring_index(col("ns"), ".", 1)
    // Rewrite one "key":"value" JSON string field in place.
    def patch(json: Column, key: String, newVal: Column): Column =
      regexp_replace(json, lit("\"" + key + "\":\"[^\"]*\""),
        concat(lit("\"" + key + "\":\""), newVal, lit("\"")))

    val sysIdx = col("ns").endsWith("system.indexes")
    val dmlNs = t(col("ns"))
    val dmlO = when(sysIdx, patch(o, "ns", t(get_json_object(o, "$.ns")))).otherwise(o)

    // coll-commands: new ns = rules(db.coll); body gets the new bare coll.
    // The command's coll is its first string value (cmdArg) and the body
    // patch targets the command key dynamically — one regexp each instead
    // of a per-command branch chain (codegen stays under the JIT limits).
    val collNewNs = t(concat(db, lit("."), DdlNs.cmdArg(o)))
    val collNewColl = regexp_replace(collNewNs, "^[^.]*\\.", "")
    val collO = regexp_replace(o,
      concat(lit("\""), cmd, lit("\":\"[^\"]*\"")),
      concat(lit("\""), cmd, lit("\":\""), collNewColl, lit("\"")))
    // create also carries idIndex.ns (`executor.go:299-307`); our JSON keeps
    // it as the only other "ns" field in the body, so a key-targeted patch
    // applies cleanly after the coll patch.
    val collO2 = when(cmd === "create" && get_json_object(o, "$.idIndex").isNotNull,
      patch(collO, "ns", collNewNs)).otherwise(collO)

    val renFrom = t(get_json_object(o, "$.renameCollection"))
    val renTo = t(get_json_object(o, "$.to"))
    val renO = patch(patch(o, "renameCollection", renFrom), "to", renTo)

    val newNs =
      when(col("op") =!= "c", dmlNs)
        .when(cmd.isin(collCmds: _*), collNewNs)
        .when(cmd === "renameCollection", renFrom)
        .otherwise(t(col("ns")))
    val newO =
      when(col("op") =!= "c", dmlO)
        .when(cmd.isin(collCmds: _*), collO2)
        .when(cmd === "renameCollection", renO)
        .otherwise(o)

    // Single withColumns: both expressions resolve against the INPUT ns/o
    // (sequential withColumn would compute the body patch against the
    // already-rewritten ns column).
    df.filter(col("op") =!= "c" || cmd.isin(knownCmds: _*))
      .withColumns(Map("ns" -> newNs, "o" -> newO))
  }
}
