package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Restart/resume mode selection and the operational batch envelope
  * (SURVEY.md §3.1 + §2.4 F10 / §2.7 T6/T7/T11; reference
  * `collector/coordinator/utils.go:23-192`, `collector/batcher.go:200-267`).
  */
object Coordinator {

  /** Per-replica oplog window (G6 output: oldest/newest ts, packed). */
  final case class ReplicaWindow(name: String, oldest: Long, newest: Long)

  /** A stored checkpoint; `ts <= 1` is treated as absent upstream.
    * `diskQueueEnabled` mirrors `ckpt.OplogDiskQueue != ""` — a spooled
    * oplog segment lets incr resume below the window floor.
    */
  final case class Checkpoint(ts: Long, diskQueueEnabled: Boolean = false)

  sealed trait SyncDecision
  /** Tail from each replica's start ts (checkpoint or configured start). */
  final case class RunIncr(startTs: Map[String, Long]) extends SyncDecision
  /** Full sync first; incr then starts at the smallest newest ts. */
  final case class RunFull(smallestNewTs: Long) extends SyncDecision
  /** Requested mode cannot run safely (reference crashes here). */
  final case class Illegal(reason: String) extends SyncDecision

  /** `selectSyncMode` (`coordinator/utils.go:144-192` with the window
    * comparison of `compareCheckpointAndDbTs` at `utils.go:23-115`):
    *
    * A replica can resume incrementally iff its checkpoint is still inside
    * the oplog window (`oldest < ckpt.ts`, or a disk queue bridges the
    * gap). With no checkpoint, the configured start position is used
    * unless it already fell out of the window. If any replica cannot
    * resume: requested "all" degrades to a full sync; requested "incr"
    * (or a non-direct tunnel, which cannot replay a snapshot) is illegal.
    */
  def selectSyncMode(
      requested: String,
      windows: Seq[ReplicaWindow],
      checkpoints: Map[String, Checkpoint],
      confStartPositionSec: Long = 0L,
      tunnelDirect: Boolean = true): SyncDecision = {
    require(requested == "all" || requested == "incr", s"unknown sync mode: $requested")
    val syncModeAll = requested == "all"
    val confTs = confStartPositionSec << 32
    val smallestNew = if (windows.isEmpty) 0L else windows.map(_.newest).min

    var startTs = Map.empty[String, Long]
    var canIncr = true
    windows.foreach { w =>
      checkpoints.get(w.name).filter(_.ts > 1) match {
        case None =>
          if (syncModeAll || (confTs > (1L << 32) && w.oldest >= confTs)) canIncr = false
          else startTs += w.name -> confTs
        case Some(ckpt) =>
          if (w.oldest >= ckpt.ts && !ckpt.diskQueueEnabled) canIncr = false
          else startTs += w.name -> ckpt.ts
      }
    }

    if (canIncr) RunIncr(startTs)
    else if (requested == "incr") Illegal("start time illegal, can't run incr sync")
    else if (!tunnelDirect) Illegal("non-direct tunnel cannot replay a snapshot")
    else RunFull(smallestNew)
  }

  /** Mask the password in a connection URL for logs/metrics surfaces
    * (`common/common.go:151-182` BlockMongoUrlPassword): characters
    * between the credential colon (the first ':' past a scheme's "://")
    * and the '@' are replaced. URLs without credentials pass through
    * unchanged. Deliberately STRICTER than the reference on one edge: a
    * password containing an unencoded '@' (mongodb://u:p@ss@host) masks
    * to the LAST '@' before the path, where the reference's first-'@'
    * scan would leak the password's tail into logs — this is a
    * credential-scrub surface, so the safer cut wins over parity.
    */
  def blockUrlPassword(url: String, replace: String = "***"): String = {
    var colon = url.indexOf(':')
    if (colon == -1 || colon == url.length - 1) return url
    if (url.charAt(colon + 1) == '/') {
      colon = url.indexOf(':', colon + 1)
      if (colon == -1) return url
    }
    // the credential block ends at the last '@' before the path OR the
    // query string — a path-less URL with '@' in the query
    // (mongodb://u:p@host:27017?x=a@b) must not mask through the host
    val pathStart = url.indexOf('/', colon + 1)
    val queryStart = url.indexOf('?', colon + 1)
    val end = Seq(pathStart, queryStart).filter(_ != -1)
      .minOption.getOrElse(url.length)
    val at = url.lastIndexOf('@', end - 1)
    if (at == -1 || at == url.length - 1 || at <= colon) return url
    url.substring(0, colon + 1) + replace + url.substring(at)
  }

  /** Version gate (`common/db_opertion.go:67-103` GetAndCompareVersion):
    * true iff `version`'s (major, minor) is at or above `threshold`'s —
    * the reference gates change-stream/txn features on it. Unparseable or
    * too-short versions gate CLOSED (false), like the reference's error
    * returns.
    */
  def versionAtLeast(version: String, threshold: String): Boolean = {
    val v = version.split("\\.")
    val t = threshold.split("\\.")
    if (v.length < 2 || t.length < 2) return false
    try {
      var i = 0
      while (i < 2) {
        val (ve, te) = (v(i).toInt, t(i).toInt)
        if (ve > te) return true
        if (ve < te) return false
        i += 1
      }
      true
    } catch { case _: NumberFormatException => false }
  }

  /** T6 target-delay holdback (`batcher.go:240-262`): a record is delivered
    * only once it is at least `delaySec` old (with the reference's 3 s NTP
    * slack); records at or below `fullSyncFinishPosition` never wait. The
    * remainder stays for a later trigger — here surfaced as a `held`
    * routing column so one pass splits the batch.
    */
  def delayHoldback(batch: DataFrame, delaySec: Long, nowSec: Long,
      fullSyncFinishPosition: Long = 0L): DataFrame = {
    val tsSec = shiftrightunsigned(col("ts_packed"), 32)
    batch.withColumn("held",
      col("ts_packed") > fullSyncFinishPosition &&
      tsSec > lit(nowSec - delaySec + 3))
  }

  /** F10/T11 exit-point truncation (`batcher.go:218-236`): on graceful
    * shutdown the batch is cut at the exit timestamp; everything after it
    * is dropped and the query stops after this trigger.
    */
  def exitTruncate(batch: DataFrame, exitPoint: Long): DataFrame =
    batch.filter(col("ts_packed") <= exitPoint)

  /** T7 QoS (`common/speed.go:11-94`): the token-bucket refills `tps`
    * tokens per second; in Spark the equivalent backpressure knob is
    * records-per-trigger. Exposed as the option map for `readStream`.
    */
  def qosOptions(tps: Long, triggerSec: Long): Map[String, String] =
    Map("maxOffsetsPerTrigger" -> (tps * triggerSec).toString)

  /** Token-bucket admission sequence (deterministic reference semantics
    * for the unit test): given per-second arrivals, how many are admitted
    * each second with limit `tps` and burst capacity one refill.
    */
  def tokenBucketAdmit(tps: Long, arrivals: Seq[Long]): Seq[Long] = {
    var tokens = tps
    arrivals.map { n =>
      val admit = math.min(n, tokens)
      tokens = math.min(tps, tokens - admit + tps)
      admit
    }
  }

  /** T7 admission as a DataFrame plan: the reference's bucket refills
    * fully every tick (`speed.go:55-60` resets the window), so tokens at
    * every tick start equal the budget and admission is memoryless —
    * admitted = min(arrivals, budget) per tick, the closed form of
    * [[tokenBucketAdmit]] (locked equivalent by a property test). One
    * aggregation, no sequential state — the whole point at scale.
    */
  def qosAdmission(batch: DataFrame, tickSec: Long, budget: Long): DataFrame =
    batch.groupBy(expr(s"(ts_packed >> 32) DIV $tickSec").as("tick"))
      .agg(count(lit(1)).as("n_arrived"))
      .withColumn("n_admitted", least(col("n_arrived"), lit(budget)))
      .withColumn("n_deferred", col("n_arrived") - col("n_admitted"))

  /** T7 + sentinel dynamic resize (`common/sentinel.go:20-37`): the
    * reference watches a control document and resizes the speed limit at
    * runtime, no restart. Spark-native shape: the budget is a CONTROL
    * TABLE `(from_tick, budget)` instead of a constant — a sentinel
    * update is a new row, and the budget active at tick t is the row with
    * the greatest `from_tick <= t` (as-of semantics).
    *
    * Scale shape: the control table is tiny and broadcast; the as-of
    * lookup is a broadcast range join collapsed by a partial-aggregatable
    * max-struct argmax over the (already aggregated) per-tick rows —
    * |ticks| × |updates| intermediate, never |records| × anything.
    * Ticks before the first control row fall back to `defaultBudget`
    * (the statically configured limit the sentinel later overrides).
    *
    * Contract: `from_tick` should be unique — the reference sentinel
    * holds ONE current value, so a same-tick update REPLACES the control
    * row (caller-side upsert), it does not append a second. If duplicates
    * do appear, the argmax resolves them deterministically toward the
    * LARGER budget (max over (from_tick, budget) structs) — never
    * nondeterministically.
    */
  def qosAdmissionDynamic(batch: DataFrame, tickSec: Long, limits: DataFrame,
      defaultBudget: Long): DataFrame = {
    val ticks = batch.groupBy(expr(s"(ts_packed >> 32) DIV $tickSec").as("tick"))
      .agg(count(lit(1)).as("n_arrived"))
    val lim = broadcast(limits.select(col("from_tick"), col("budget")))
    ticks.join(lim, col("from_tick") <= col("tick"), "left")
      .groupBy(col("tick"), col("n_arrived"))
      .agg(max(struct(col("from_tick"), col("budget"))).as("m"))
      .select(col("tick"), col("n_arrived"),
        coalesce(col("m.budget"), lit(defaultBudget)).as("budget"))
      .withColumn("n_admitted", least(col("n_arrived"), col("budget")))
      .withColumn("n_deferred", col("n_arrived") - col("n_admitted"))
  }
}
