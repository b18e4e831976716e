package graft.filters

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Per-record CDC predicates (SURVEY.md §2.4, F1-F7).
  *
  * The reference composes these in a short-circuit drop-if-any-true chain
  * (`collector/filter/oplog_filter.go:18-28`); here each is a Catalyst
  * `Column` predicate expressed in keep form, so the composed filter is a
  * single conjunction Catalyst can reorder, fuse, and push into the scan.
  */
object OplogFilters {

  /** F1 NoopFilter (`oplog_filter.go:74-79`): drop `op == "n"`. */
  val notNoop: Column = col("op") =!= "n"

  /** F2 GidFilter (`oplog_filter.go:30-55`): keep only records whose gid is
    * in the allowed set; an empty set passes everything.
    */
  def gidAllowed(allowed: Seq[String]): Column =
    if (allowed.isEmpty) lit(true) else col("g").isin(allowed: _*)

  /** System namespaces excluded from replication (`doc_filter.go:12-81`). */
  val systemDbs: Seq[String] =
    Seq("admin", "local", "config", "mongoshake", "mongoshake_conflict")

  /** F3 AutologousFilter: drop system-db records, with the `admin.$cmd`
    * whitelist override used for transaction entries.
    */
  val notAutologous: Column =
    !col("db").isin(systemDbs: _*) || col("ns") === "admin.$cmd"

  /** F3 with `filter.pass.special.db` (`doc_filter.go:30-40` InitNs): the
    * configured special databases are REMOVED from the ignore set — their
    * records replicate like user namespaces. The reference mutates a
    * global map at sanitize time; here the pass-list parameterizes the
    * predicate ([[graft.streaming.GraftConfig.passSpecialDb]] feeds it).
    */
  def notAutologousWithPass(passSpecialDb: Seq[String]): Column = {
    val ignored = systemDbs.filterNot(passSpecialDb.contains)
    if (ignored.isEmpty) lit(true)
    else !col("db").isin(ignored: _*) || col("ns") === "admin.$cmd"
  }

  /** F5 NamespaceFilter (`oplog_filter.go:98-291`): user white/black regex
    * lists; whitelist empty ⇒ pass-all, blacklist wins over whitelist.
    */
  def nsFilter(white: Seq[String], black: Seq[String]): Column = {
    val w = if (white.isEmpty) lit(true)
            else white.map(col("ns").rlike(_)).reduce(_ || _)
    val b = if (black.isEmpty) lit(false)
            else black.map(col("ns").rlike(_)).reduce(_ || _)
    w && !b
  }

  /** F7 MigrateFilter (`oplog_filter.go:89-94`): chunk-migration internal
    * ops must not appear (the reference crashes; we surface a query error).
    */
  val notMigrate: Column = !col("from_migrate")

  /** The standard incremental-sync keep-chain: F1 ∧ F2 ∧ F3 ∧ F5 ∧ F7. */
  def chain(gids: Seq[String], white: Seq[String], black: Seq[String]): Column =
    notNoop && gidAllowed(gids) && notAutologous && nsFilter(white, black) && notMigrate
}
