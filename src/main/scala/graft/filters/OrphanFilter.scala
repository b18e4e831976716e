package graft.filters

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  // --- compound keys + BSON type-ordered range comparison -------------------

  /** BSON type-bracket ranks (`orphan_filter.go:18-23`, mirroring
    * mongo/bson/bsontypes.h): MinKey < numbers < strings < ObjectId <
    * MaxKey.
    */
  val RankMinKey = 0
  val RankNumber = 10
  val RankString = 15
  val RankOid = 35
  val RankMaxKey = 100

  private def enc(rank: Column, num: Column, str: Column): Column =
    struct(rank.as("rank"), num.as("num"), str.as("str"))

  /** Order-preserving encoding of one shard-key value: a (rank, num, str)
    * struct whose NATIVE Spark struct comparison reproduces the
    * reference's chunkLt/chunkGt/chunkEqual (`orphan_filter.go:150-245`):
    * cross-type by BSON bracket rank, numbers by float64 value, strings
    * and ObjectIds lexicographic, MinKey/MaxKey equal among themselves
    * (their num/str components are zeroed). Codegen'd end to end — the
    * whole comparison is ordinary struct `<`/`>=`.
    *
    * Numeric encoding maps the int64 MinValue/MaxValue sentinels to
    * MinKey/MaxKey, as the reference's getBsonType does.
    */
  def encNumber(c: Column): Column = enc(
    when(c === Long.MinValue, lit(RankMinKey))
      .when(c === Long.MaxValue, lit(RankMaxKey))
      .otherwise(lit(RankNumber)),
    when(c === Long.MinValue || c === Long.MaxValue, lit(0.0))
      .otherwise(c.cast("double")),
    lit(""))

  def encString(c: Column): Column = enc(lit(RankString), lit(0.0), c)

  /** ObjectId (24-char hex): the reference compares oids by their hex
    * string (`getBsonType` returns `rx.Hex()`), so the encoding carries
    * the hex form in the string slot under the oid rank.
    */
  def encOid(c: Column): Column = enc(lit(RankOid), lit(0.0), lower(c))

  def encMinKey: Column = enc(lit(RankMinKey), lit(0.0), lit(""))
  def encMaxKey: Column = enc(lit(RankMaxKey), lit(0.0), lit(""))

  /** Compound shard-key tuple: nested struct over the encoded components,
    * compared lexicographically key-by-key — exactly the reference's
    * per-keyInd walk (`orphan_filter.go:49-88`): `tuple >= mins` is the
    * Mins loop (key < min → next chunk, key > min → in, equal → next
    * key), `tuple < maxs` the exclusive Maxs loop (all-equal → next
    * chunk).
    */
  def keyTuple(parts: Column*): Column =
    struct(parts.zipWithIndex.map { case (c, i) => c.as(s"k$i") }: _*)

  /** Chunk table from literal bound specs: one row per chunk with
    * encoded `mins`/`maxs` tuples and an `owned` flag. Bounds are
    * plan-time constants (the chunk map is catalog metadata, tiny by
    * construction).
    */
  def chunkTable(spark: SparkSession,
      chunks: Seq[(Seq[org.apache.spark.sql.Column], Seq[org.apache.spark.sql.Column], Boolean)]): DataFrame =
    chunks.map { case (mins, maxs, owned) =>
      spark.range(1).select(
        keyTuple(mins: _*).as("mins"), keyTuple(maxs: _*).as("maxs"),
        lit(owned).as("owned"))
    }.reduce(_ unionByName _)

  /** Keep rows whose key tuple lies in ANY owned chunk range
    * (`[mins, maxs)`): a broadcast left-semi theta-join — the chunk map
    * rides to every executor, the corpus is scanned once, nothing
    * shuffles.
    */
  def keepOwnedRanged(df: DataFrame, key: org.apache.spark.sql.Column,
      chunks: DataFrame): DataFrame = {
    val owned = chunks.filter(col("owned")).select(col("mins"), col("maxs"))
    df.join(broadcast(owned), key >= col("mins") && key < col("maxs"), "left_semi")
  }
}
