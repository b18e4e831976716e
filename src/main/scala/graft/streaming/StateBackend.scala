package graft.streaming

import org.apache.spark.sql.SparkSession

/** Pluggable streaming state-store backend (VERDICT r19 task 5).
  *
  * The stateful-streaming families' residual io-pressure floor is
  * per-commit fsync amplification of the default HDFS-backed state store
  * (measured 2.0–2.7× contended/clean across the 21 stream_* + stateful
  * CDC gates — PROFILE_r18/r19). RocksDB with CHANGELOG checkpointing is
  * the known lever: per-commit durability becomes an O(delta) changelog
  * append instead of a per-partition snapshot rewrite, exactly the LSM
  * argument the parquet target's delta layout makes on the sink side.
  *
  * OFF by default — the flag exists so the backend can be A/B'd and
  * gated without forking the engine: `SPARK_GRAFT_STATE_BACKEND=rocksdb`
  * flips every stateful query in the session (Bench, Verify, and any
  * harness) onto RocksDB + changelog checkpointing. Promotion to default
  * requires the full oracle gate green under the flag AND an
  * equal-or-better clean bench (round rules: config wins must be
  * measured, not assumed).
  */
object StateBackend {

  val RocksDbConfs: Seq[(String, String)] = Seq(
    "spark.sql.streaming.stateStore.providerClass" ->
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    // Changelog checkpointing: commit uploads the delta, not the full
    // snapshot — the fsync-amplification cut this backend is for.
    "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled" ->
      "true")

  /** Confs for the env-selected backend: empty (engine default) unless
    * SPARK_GRAFT_STATE_BACKEND=rocksdb.
    */
  def envConfs: Seq[(String, String)] =
    if (sys.env.get("SPARK_GRAFT_STATE_BACKEND").contains("rocksdb")) RocksDbConfs
    else Nil

  /** Apply the env-selected backend to a live session (providerClass is
    * read from the session conf at each query start, so a runtime set
    * covers every stream the session subsequently starts).
    */
  def applyFromEnv(spark: SparkSession): Unit =
    envConfs.foreach { case (k, v) => spark.conf.set(k, v) }
}
