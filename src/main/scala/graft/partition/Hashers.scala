package graft.partition

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Portable.phash64
import graft.plans.JavaStringHash

/** Worker routing: hash partitioning with per-key total order
  * (SURVEY.md §2.5, X1-X3).
  *
  * The reference's parallelism contract is "records with the same key are
  * applied in oplog order"; keys are the namespace or the document `_id`.
  * Here routing is a pure Column expression, and the order contract is
  * enforced by `repartitionOrdered` (`repartition(key)` +
  * `sortWithinPartitions(ts)`) — the Spark-native equivalent of hashing
  * into per-worker FIFO queues.
  *
  * The engine-internal hash is [[phash64]] (deterministic and portable to
  * the DuckDB oracle). [[JavaStringHash]] is available where wire-level
  * parity with JVM consumers matters (reference `oplog/hasher.go:141-152`).
  */
object Hashers {

  /** X1 TableHasher (`oplog/hasher.go:25-43`): route by namespace; DDL
    * (`op == "c"`) always routes to worker 0 for barrier execution.
    */
  def workerByNs(n: Int): Column =
    when(col("op") === "c", 0).otherwise(pmod(phash64(col("ns")), lit(n.toLong)))

  /** X2 PrimaryKeyHasher (`oplog/hasher.go:47-74`): route by document key. */
  def workerById(n: Int): Column =
    when(col("op") === "c", 0).otherwise(pmod(phash64(col("doc_key")), lit(n.toLong)))

  /** X3 WhiteListObjectIdHasher (`oplog/hasher.go:78-110`): listed
    * collections hash by `_id` (safe only without unique indexes), the
    * rest by namespace.
    */
  def workerWhitelist(idCollections: Seq[String], n: Int): Column =
    when(col("op") === "c", 0)
      .when(col("coll").isin(idCollections: _*), pmod(phash64(col("doc_key")), lit(n.toLong)))
      .otherwise(pmod(phash64(col("ns")), lit(n.toLong)))

  /** Wire-parity variant of X1: Java `String.hashCode` % n, non-negative
    * (matches the reference's Kafka partition routing).
    */
  def workerByNsJavaHash(n: Int): Column =
    pmod(JavaStringHash(col("ns")), lit(n))

  /** X4 auto shard-key selection (`coordinator/replication.go:166-183`):
    * with `shard_key = auto`, scan the source's index catalog — any
    * non-`_id` unique index forces by-namespace routing (parallel by-id
    * apply could violate the unique constraint), else route by `_id`.
    */
  def autoShardKey(indexCatalog: DataFrame): String = {
    val hasUnique = !indexCatalog
      .filter(col("unique") && col("name") =!= "_id_")
      .isEmpty
    if (hasUnique) "collection" else "id"
  }

  /** Skew-salted equi-join: hot keys on the big side get a random-ish salt
    * in [0, salts); the small side is replicated `salts`× so every salted
    * partition finds its match. Use when one key carries a disproportionate
    * share of a 100 TB exchange and AQE's skew split isn't available (e.g.
    * the join feeds a window). The salt is derived from stable columns —
    * deterministic, replay-safe.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      saltSource: Column, salts: Int): DataFrame = {
    // null salt source → salt 0, not a null salt that would silently drop
    // the row from the equi-join.
    val salted = big.withColumn("_salt",
      pmod(coalesce(phash64(saltSource), lit(0L)), lit(salts.toLong)))
    val replicated = small.withColumn("_salt",
      explode(sequence(lit(0L), lit(salts.toLong - 1))))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }

  /** The per-key order contract: one shuffle on the routing key, then an
    * in-partition sort by oplog time. Downstream per-partition iteration
    * sees each key's records in total order — no global sort needed.
    */
  def repartitionOrdered(df: DataFrame, worker: Column, n: Int): DataFrame =
    df.withColumn("worker", worker)
      .repartition(n, col("worker"))
      .sortWithinPartitions(col("worker"), col("ts_packed"), col("event_id"))
}
