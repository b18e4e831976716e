package graft.filters

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** F8 OrphanFilter (SURVEY.md §2.4; reference
  * `collector/filter/orphan_filter.go:26-135`): during full sync from a
  * sharded source, drop documents whose shard key falls outside every
  * chunk range owned by the replica set being read (orphans left behind
  * by chunk migration).
  *
  * Spark shape: the chunk map (`config.chunks`) is tiny — broadcast it and
  * equi-join on a derived chunk id (uniform chunks) or range-join via a
  * bucketized chunk index. Hashed shard types hash the key first with
  * [[graft.plans.MongoComputeHash]] for wire parity with MongoDB's
  * `convert(x, 'hashed')`.
  */
object OrphanFilter {

  /** Uniform-width chunk table derived from the data's key domain:
    * chunk_id = key div step, ownership round-robins across shards
    * (the synthetic chunk map used by the verified query).
    */
  def uniformChunks(df: DataFrame, keyName: String, step: Long,
      numShards: Int, ownedShard: Int): DataFrame =
    df.select(expr(s"$keyName DIV $step").as("chunk_id")).distinct()
      .withColumn("chunk_min", col("chunk_id") * step)
      .withColumn("chunk_max", (col("chunk_id") + 1) * step)
      .withColumn("owned", col("chunk_id") % numShards === ownedShard)

  /** Keep only rows landing in an owned chunk. Broadcast equi-join on the
    * derived chunk id; the range predicate re-checks membership (the
    * general contract when chunks are not uniform).
    */
  def keepOwned(df: DataFrame, keyName: String, chunks: DataFrame, step: Long): DataFrame =
    df.withColumn("chunk_id", expr(s"$keyName DIV $step"))
      .join(broadcast(chunks.filter(col("owned"))), Seq("chunk_id"))
      .filter(col(keyName) >= col("chunk_min") && col(keyName) < col("chunk_max"))
      .drop("chunk_min", "chunk_max", "owned")

  /** Hashed shard type (`orphan_filter.go:84-91`): ownership is decided on
    * `ComputeHash(key)` — wire parity via [[graft.plans.MongoComputeHash]].
    * String keys hash the UTF-8 bytes with the BSON string layout; int64
    * keys the number layout. Pure per-row predicate — no join at all when
    * hashed chunks are the `% nShards` partition MongoDB pre-splits.
    */
  def keepOwnedHashed(df: DataFrame, key: org.apache.spark.sql.Column,
      isString: Boolean, nShards: Int, ownedShard: Int): DataFrame = {
    val h = if (isString) graft.plans.MongoComputeHash.ofString(key)
            else graft.plans.MongoComputeHash(key)
    df.filter(pmod(h, lit(nShards.toLong)) === ownedShard)
  }
}
