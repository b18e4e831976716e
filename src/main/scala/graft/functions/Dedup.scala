package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Portable.phash64
import graft.functions.Text.shingles

/** Document deduplication at scale: exact, MinHash+LSH, SimHash, and
  * n-gram-Jaccard near-dup detection.
  *
  * Design point (100 TB): never materialize all-pairs. Every near-dup
  * operator reduces to (1) a per-document signature computed in a single
  * codegen'd projection, (2) a candidate-generation equi-join on a
  * blocking key (LSH band / shared shingle / SimHash byte-band) — an
  * ordinary hash-shuffle join Catalyst can plan — and (3) exact
  * verification only on candidates. Signature params are fixed constants
  * so results are deterministic and oracle-checkable.
  */
object Dedup {

  /** Exact dedup: canonical hash of the raw text; keep the smallest id
    * per group (hash-groupBy — one shuffle on the digest).
    */
  def exact(docs: DataFrame, id: Column, text: Column): DataFrame =
    docs.groupBy(md5(text).as("content_hash"))
      .agg(min(id).as("keep_id"), count(lit(1)).as("n_copies"))

  // --- MinHash -----------------------------------------------------------

  /** Universal-hash permutation family over 32-bit shingle hashes:
    * h_j(s) = (a_j · (phash64(s) mod 2^32) + b_j) mod p, p prime > 2^32.
    * Products stay < 2^38 — no overflow in either engine.
    */
  val MinhashPrime = 4294967311L
  def perm(j: Int): (Long, Long) = (2L * j + 1, 101L * j + 17)
  def minhashCol(shingleArr: Column, j: Int): Column = {
    val (a, b) = perm(j)
    array_min(transform(shingleArr,
      s => (lit(a) * (phash64(s) % lit(4294967296L)) + lit(b)) % lit(MinhashPrime)))
  }

  /** Per-document MinHash signature: `numPerms` minhash columns `mh_j`
    * plus the distinct shingle set `s` for verification.
    */
  def minhashSignatures(docs: DataFrame, id: Column, text: Column,
      shingleN: Int = 3, numPerms: Int = 16): DataFrame = {
    val base = docs.select(id.as("doc_id"), shingles(text, shingleN).as("s"))
    (0 until numPerms).foldLeft(base) { (df, j) =>
      df.withColumn(s"mh_$j", minhashCol(col("s"), j))
    }
  }

  /** MinHash-LSH near-dup pairs: band signatures → candidate equi-join →
    * exact Jaccard verification at `threshold`. bands×rowsPerBand must
    * equal the signature width; with (4,4), a 0.9-Jaccard pair is caught
    * with P ≈ 1-(1-0.9^4)^4 ≈ 0.96 while random pairs are ~never joined.
    */
  def minhashLsh(docs: DataFrame, id: Column, text: Column,
      shingleN: Int = 3, bands: Int = 4, rowsPerBand: Int = 4,
      threshold: Double = 0.5): DataFrame = {
    val sig = minhashSignatures(docs, id, text, shingleN, bands * rowsPerBand)
    val bandStructs = array((0 until bands).map { b =>
      struct(lit(b).as("band"),
        concat_ws("_", (0 until rowsPerBand).map(r => col(s"mh_${b * rowsPerBand + r}")): _*).as("sig"))
    }: _*)
    val banded = sig.select(col("doc_id"), col("s"), explode(bandStructs).as("bs"))
      .select(col("doc_id"), col("s"), col("bs.band").as("band"), col("bs.sig").as("sig"))
    val a = banded.select(col("band"), col("sig"), col("doc_id").as("doc_a"), col("s").as("sa"))
    val b = banded.select(col("band"), col("sig"), col("doc_id").as("doc_b"), col("s").as("sb"))
    val cand = a.join(b, Seq("band", "sig"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b", "sa", "sb").distinct()
    verifyJaccard(cand, threshold)
  }

  /** Exact Jaccard on candidate pairs carrying their shingle sets. */
  private def verifyJaccard(cand: DataFrame, threshold: Double): DataFrame = {
    val inter = size(array_intersect(col("sa"), col("sb"))).cast("double")
    val uni = (size(col("sa")) + size(col("sb"))).cast("double") - inter
    cand.withColumn("jaccard", inter / uni)
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  // --- n-gram Jaccard via inverted index ----------------------------------

  /** Near-dup pairs by exact n-gram Jaccard, candidates from an inverted
    * shingle index (pairs sharing ≥1 shingle). With n=4 over a realistic
    * vocabulary, random collisions are rare, so the candidate set stays
    * near-linear in corpus size.
    */
  def ngramJaccard(docs: DataFrame, id: Column, text: Column,
      shingleN: Int = 4, threshold: Double = 0.5): DataFrame = {
    val sh = docs.select(id.as("doc_id"), shingles(text, shingleN).as("s"))
    val ex = sh.select(col("doc_id"), col("s"), explode(col("s")).as("shingle"))
    val inter = ex.select(col("doc_id").as("doc_a"), size(col("s")).as("na"), col("shingle"))
      .join(ex.select(col("doc_id").as("doc_b"), size(col("s")).as("nb"), col("shingle")), Seq("shingle"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"), col("na"), col("nb"))
      .agg(count(lit(1)).as("n_inter"))
    inter
      .withColumn("jaccard",
        col("n_inter").cast("double") / (col("na") + col("nb") - col("n_inter")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  // --- SimHash -------------------------------------------------------------

  /** 32-bit SimHash signature (doc_id, simhash:long): bit i of the
    * signature is the sign of Σ_shingles (2·bit_i(h32(s)) - 1). Computed
    * by exploding (shingle × bit position) into a flat two-level
    * groupBy-sum — fully partial-aggregatable, no driver loops.
    */
  def simhashSig(docs: DataFrame, id: Column, text: Column, shingleN: Int = 3): DataFrame = {
    val sh = docs.select(id.as("doc_id"), explode(shingles(text, shingleN)).as("shingle"))
      .withColumn("h32", phash64(col("shingle")) % lit(4294967296L))
    sh.select(col("doc_id"), col("h32"), explode(sequence(lit(0), lit(31))).as("bit"))
      .withColumn("sign", when(expr("shiftright(h32, bit) % 2") === 1, 1).otherwise(-1))
      .groupBy(col("doc_id"), col("bit"))
      .agg(sum(col("sign")).as("v"))
      .groupBy(col("doc_id"))
      .agg(expr("sum(if(v > 0, shiftleft(cast(1 as bigint), bit), cast(0 as bigint)))").as("simhash"))
  }

  /** SimHash near-dup pairs: byte-band blocking (pairs agreeing on any of
    * the 4 signature bytes are candidates), verified by Hamming distance.
    */
  def simhashPairs(docs: DataFrame, id: Column, text: Column,
      shingleN: Int = 3, maxHamming: Int = 4): DataFrame = {
    val sig = simhashSig(docs, id, text, shingleN)
    val banded = sig.select(col("doc_id"), col("simhash"),
        explode(sequence(lit(0), lit(3))).as("band"))
      .withColumn("byte", expr("shiftright(simhash, band * 8) % 256"))
    val a = banded.select(col("band"), col("byte"),
      col("doc_id").as("doc_a"), col("simhash").as("ha"))
    val b = banded.select(col("band"), col("byte"),
      col("doc_id").as("doc_b"), col("simhash").as("hb"))
    a.join(b, Seq("band", "byte"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        bit_count(col("ha").bitwiseXOR(col("hb"))).cast("long").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }
}
