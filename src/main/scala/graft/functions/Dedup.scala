package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

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

  /** Shared quadratic-blowup cap defaults — ONE definition each, consumed
    * by the operators, their dropped-mass audits, and (interpolated) the
    * oracle SQL, so cap and accounting cannot drift (the same
    * single-source rule as TextOps' Edit* geometry).
    */
  val MaxBandBucket = 500
  val MaxDf = 1000

  /** Exact dedup: canonical hash of the raw text; keep the smallest id
    * per group (hash-groupBy — one shuffle on the digest).
    */
  def exact(docs: DataFrame, id: Column, text: Column): DataFrame =
    docs.groupBy(md5(text).as("content_hash"))
      .agg(min(id).as("keep_id"), count(lit(1)).as("n_copies"))

  /** A kept (first-seen) document for one content digest. */
  case class DigestDoc(digest: String, doc_id: Long)

  /** Streaming incremental exact dedup: the continuous-ingest analogue of
    * [[exact]]. New documents arrive as a stream; the FIRST delivery of a
    * content digest emits its smallest doc_id of that micro-batch, every
    * later delivery of the same digest — same batch or any later one — is
    * suppressed by per-digest state (`flatMapGroupsWithState`, no
    * timeout: a dedup ledger never expires).
    *
    * Scale shape: state is one boolean per DISTINCT digest, hash-
    * partitioned by Spark's state store across executors — the standard
    * "have I seen this content hash" ledger a streaming ingest pipeline
    * keeps, queryable/restartable via the checkpoint. Input column
    * contract: `digest` (string), `doc_id` (long).
    */
  def streamingFirstPerDigest(stream: DataFrame): Dataset[DigestDoc] = {
    val spark = stream.sparkSession
    import spark.implicits._
    stream.select(col("digest"), col("doc_id")).as[DigestDoc]
      .groupByKey(_.digest)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (digest: String, rows: Iterator[DigestDoc], state: GroupState[Boolean]) =>
          if (state.exists) Iterator.empty
          else {
            state.update(true)
            Iterator(DigestDoc(digest, rows.map(_.doc_id).min))
          })
  }

  /** One LSH band-bucket hit for an arriving document: the earliest
    * already-seen document in that bucket.
    */
  case class NearDupCand(doc_id: Long, cand: Long)
  /** One exploded LSH band row (public: Catalyst's generated encoder
    * cannot deserialize into a private class).
    */
  case class BandRow(doc_id: Long, band: Int, sig: String)

  /** Streaming NEAR-dup marking at ingest — the continuous analogue of
    * [[minhashLshIncremental]]: each arriving document's LSH bands probe a
    * STANDING band index held in stream state, emitting (doc, earliest
    * bucket-mate) candidate hits; the batch path's band self-join never
    * runs. State per (band, bucket-signature) is ONE long — the minimum
    * doc_id ever seen in that bucket — so a boilerplate bucket that would
    * hold 10^6 documents costs the state store 8 bytes, and no bucket cap
    * is needed at all (the batch op's `maxBandBucket` guard exists
    * precisely because it must materialize bucket MEMBERSHIP for its
    * self-join; a min-ledger doesn't).
    *
    * Contract: documents arrive in ascending doc_id order (the ingest
    * sequence number); within a micro-batch each bucket group is folded in
    * id order, so `cand` is exactly the least earlier document sharing
    * that bucket. min(cand) over a doc's hits = the least earlier document
    * sharing ANY band — closed-form in SQL, which is what the oracle
    * replays. Verification (exact Jaccard on the candidate pair) joins the
    * signature store downstream, as the incremental batch path does.
    * Input column contract: `doc_id` (long), `text` (string).
    */
  def streamingNearDupCandidates(stream: DataFrame, shingleN: Int = 3,
      bands: Int = 4, rowsPerBand: Int = 4): Dataset[NearDupCand] = {
    val spark = stream.sparkSession
    import spark.implicits._
    val sig = minhashSignatures(stream, col("doc_id"), col("text"),
      shingleN, bands * rowsPerBand)
    bandTable(sig, bands, rowsPerBand).as[BandRow]
      .groupByKey(r => (r.band, r.sig))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (_: (Int, String), rows: Iterator[BandRow], state: GroupState[Long]) => {
          val out = scala.collection.mutable.ListBuffer.empty[NearDupCand]
          var m = if (state.exists) state.get else Long.MaxValue
          for (id <- rows.map(_.doc_id).toSeq.sorted) {
            if (m < id) out += NearDupCand(id, m)
            m = math.min(m, id)
          }
          state.update(m)
          out.iterator
        })
  }

  // --- MinHash -----------------------------------------------------------

  /** SELF-TUNED (bands, rowsPerBand) from the corpus count — the
    * [[graft.functions.Similarity.adaptivePlanes]] move for the lexical
    * family. Two constraints, both integer-exact:
    *
    *  1. Rows per band bound the sub-threshold candidate mass: a pair at
    *     exactly the verify threshold t = 1/2 collides in one band with
    *     probability t^r, so expected at-threshold hits per document stay
    *     ≤ `targetOccupancy` when t^r ≤ occ/n — i.e. the smallest r with
    *     2^r · occ ≥ n (floored at `baseRows`). Each corpus doubling adds
    *     one row per band, splitting every near-miss bucket in half — the
    *     fixed-(4,4) config's bucket caps become the fallback for
    *     degenerate exact-dup mass, not the primary defense.
    *  2. Bands restore recall at the must-catch threshold t_hi = 4/5:
    *     1−(1−t_hi^r)^b ≥ 95% needs b ≥ ln(20)/t_hi^r ≈ 3·(5/4)^r,
    *     computed as ⌈3·5^r / 4^r⌉ in pure int64 (exact while r ≤ 22,
    *     i.e. corpora up to occ·2^22 docs per the r-rule — `maxRows` caps
    *     there and is the documented re-shard point).
    *
    * The third constraint is the one the 30× measurement added
    * (SCALE_r14.md): the signature pass is O(n · b·r) — every permutation
    * is an affine sweep over every document's shingle set — so b·r is a
    * COST BUDGET, not a free recall knob. Unbounded, the formula resolves
    * 280 permutations at a 30× corpus and the whole operator grows 11×
    * where fixed-(4,4) grows 1.15×: unlike `adaptivePlanes` (whose 2^p
    * bucket space genuinely coarsens as the corpus outgrows it, and whose
    * extra planes cost one add each), minhash band space never coarsens —
    * random collisions are ~0 at ANY r, and exact-duplicate buckets are
    * r-invariant. `maxPerms` (default 128) caps b·r: rows shrink from the
    * occupancy-derived value until the budget holds. Past the cap the
    * bucket caps + the streaming min-ledger stay the primary defense for
    * degenerate buckets, which the signature-space argument says they
    * must be regardless.
    *
    * sf0.01 (500 docs) resolves to r=5, b=10 (50 perms); a 10× corpus to
    * r=7, b=15 (105 — the occupancy formula's r=9, b=23 = 207 trims to
    * the budget); the 0.8-Jaccard catch rate stays ≥ 95% at every r this
    * can emit (`dedup_minhash_adaptive` gates derivation + recall
    * end-to-end).
    */
  def adaptiveBanding(n: Long, targetOccupancy: Long = 16, baseRows: Int = 4,
      maxRows: Int = 22, maxPerms: Int = 128): (Int, Int) = {
    var r = baseRows
    while (r < maxRows && (1L << r) * targetOccupancy < n) r += 1
    def bandsFor(r: Int): Int = {
      var p5 = 1L; var p4 = 1L
      (1 to r).foreach { _ => p5 *= 5L; p4 *= 4L }
      ((3L * p5 + p4 - 1L) / p4).toInt
    }
    while (r > baseRows && bandsFor(r) * r > maxPerms) r -= 1
    (bandsFor(r), r)
  }

  /** Universal-hash permutation family over 32-bit shingle hashes:
    * h_j(s) = (a_j · (phash64(s) mod 2^32) + b_j) mod p, p prime > 2^32.
    * Products stay < 2^38 — no overflow in either engine.
    */
  val MinhashPrime = 4294967311L
  def perm(j: Int): (Long, Long) = (2L * j + 1, 101L * j + 17)

  /** Per-document MinHash signature: `numPerms` minhash columns `mh_j`
    * plus the distinct 32-bit-hashed shingle set `s` for verification.
    *
    * The md5-based shingle hash is computed ONCE per shingle; each
    * permutation is then a cheap affine map + array_min over the cached
    * hash array — 1 digest pass instead of `numPerms` (the hash dominates:
    * 16 md5 sweeps over a 100 TB shingle stream vs 1). The document is
    * represented by its hashed shingle set from here on — verification
    * Jaccard intersects long arrays, never re-materializing strings.
    */
  def minhashSignatures(docs: DataFrame, id: Column, text: Column,
      shingleN: Int = 3, numPerms: Int = 16): DataFrame = {
    // All numPerms minima in ONE fused pass over the shingle array (the
    // native MinhashSig expression) instead of numPerms separate
    // transform+array_min sweeps; bit-identical values (PropertySpec law
    // pins it against [[minhashSignaturesLegacy]]). CollapseProject keeps
    // the array evaluated once — it refuses to inline a non-cheap alias
    // referenced numPerms times.
    val base = docs.select(id.as("doc_id"),
      array_distinct(transform(shingles(text, shingleN),
        s => phash64(s) % lit(4294967296L))).as("s"))
      .withColumn("_mh", graft.plans.MinhashSig(col("s"), numPerms))
    (0 until numPerms).foldLeft(base) { (df, j) =>
      df.withColumn(s"mh_$j", element_at(col("_mh"), j + 1))
    }.drop("_mh")
  }

  /** The original per-permutation composition — law-test reference. */
  private[graft] def minhashSignaturesLegacy(docs: DataFrame, id: Column,
      text: Column, shingleN: Int = 3, numPerms: Int = 16): DataFrame = {
    val base = docs.select(id.as("doc_id"),
      array_distinct(transform(shingles(text, shingleN),
        s => phash64(s) % lit(4294967296L))).as("s"))
    (0 until numPerms).foldLeft(base) { (df, j) =>
      val (a, b) = perm(j)
      df.withColumn(s"mh_$j",
        array_min(transform(col("s"), h => (lit(a) * h + lit(b)) % lit(MinhashPrime))))
    }
  }

  /** MinHash-LSH near-dup pairs: band signatures → candidate equi-join →
    * exact Jaccard verification at `threshold`. bands×rowsPerBand must
    * equal the signature width; with (4,4), a 0.9-Jaccard pair is caught
    * with P ≈ 1-(1-0.9^4)^4 ≈ 0.96 while random pairs are ~never joined.
    *
    * Scale shape: the banded self-join carries ONLY (band, sig, doc_id) —
    * never the shingle arrays — so the big exchange moves thin rows; the
    * distinct id-pairs then re-join the signature table twice to attach
    * shingle sets for verification (rows = |candidates| + 2·|docs|, not
    * |candidates|·|avg shingles|·bands). Band buckets larger than
    * `maxBandBucket` (boilerplate text at corpus scale) are dropped from
    * candidate generation — a quadratic-blowup guard; genuine near-dup
    * pairs in such buckets still surface through their other bands.
    */
  def minhashLsh(docs: DataFrame, id: Column, text: Column,
      shingleN: Int = 3, bands: Int = 4, rowsPerBand: Int = 4,
      threshold: Double = 0.5, maxBandBucket: Int = MaxBandBucket): DataFrame = {
    // One lineage cut: the signature table feeds banding AND both
    // verification joins (same 3×-recompute trap as ngramJaccard).
    val sig = minhashSignatures(docs, id, text, shingleN, bands * rowsPerBand)
      .localCheckpoint()
    val bounded = boundedBands(sig, bands, rowsPerBand, maxBandBucket)
    val a = bounded.select(col("band"), col("sig"), col("doc_id").as("doc_a"))
    val b = bounded.select(col("band"), col("sig"), col("doc_id").as("doc_b"))
    val pairs = a.join(b, Seq("band", "sig"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct()
    verifyPairs(pairs, sig, threshold)
  }

  /** Flat (doc_id, band, sig) band table — a stateless projection +
    * explode, so it runs identically on batch and STREAMING inputs
    * (the streaming near-dup ledger keys its state on these rows).
    */
  def bandTable(sig: DataFrame, bands: Int, rowsPerBand: Int): DataFrame = {
    val bandStructs = array((0 until bands).map { b =>
      struct(lit(b).as("band"),
        concat_ws("_", (0 until rowsPerBand).map(r => col(s"mh_${b * rowsPerBand + r}")): _*).as("sig"))
    }: _*)
    sig.select(col("doc_id"), explode(bandStructs).as("bs"))
      .select(col("doc_id"), col("bs.band").as("band"), col("bs.sig").as("sig"))
  }

  /** Band table with the quadratic-blowup bucket cap (shared by the batch
    * self-join and the incremental probe).
    */
  private def boundedBands(sig: DataFrame, bands: Int, rowsPerBand: Int,
      maxBandBucket: Int): DataFrame =
    bandTable(sig, bands, rowsPerBand)
      .withColumn("bkt_n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("band"), col("sig"))))
      .filter(col("bkt_n") <= maxBandBucket)

  /** No-silent-caps accounting (BASELINE.md's rule: `log()` what was
    * dropped): collapse a keyed row table to ONE audit row — how many
    * key-groups exceed `cap` and how many member rows those groups hold
    * (the mass the cap removes from candidate generation). On a corpus
    * where the cap does not bind this reads (site, cap, 0, 0); where it
    * binds, the report stops silently claiming completeness. One
    * hash-groupBy over the same keys the capped operator already groups
    * on — partial-aggregatable, no new shuffle class at scale.
    */
  def capAuditRow(rows: DataFrame, keys: Seq[Column], cap: Long,
      site: String): DataFrame =
    rows.groupBy(keys: _*).agg(count(lit(1)).as("n"))
      .filter(col("n") > cap)
      .agg(count(lit(1)).as("nb"), coalesce(sum(col("n")), lit(0L)).as("nr"))
      .select(lit(site).as("site"), lit(cap).as("cap"),
        col("nb").as("n_buckets_capped"), col("nr").as("n_rows_dropped"))

  /** [[capAuditRow]] over [[minhashLsh]]'s band buckets — the mass its
    * `maxBandBucket` guard drops.
    */
  def minhashBandAudit(docs: DataFrame, id: Column, text: Column,
      shingleN: Int = 3, bands: Int = 4, rowsPerBand: Int = 4,
      maxBandBucket: Int = MaxBandBucket): DataFrame =
    capAuditRow(
      bandTable(minhashSignatures(docs, id, text, shingleN, bands * rowsPerBand),
        bands, rowsPerBand),
      Seq(col("band"), col("sig")), maxBandBucket, "minhash_band")

  /** [[capAuditRow]] over [[simhashPairs]]' band buckets. */
  def simhashBandAudit(docs: DataFrame, id: Column, text: Column,
      shingleN: Int = 3, maxBandBucket: Int = MaxBandBucket): DataFrame =
    capAuditRow(simhashBanded(simhashSig(docs, id, text, shingleN)),
      Seq(col("band"), col("bkt")), maxBandBucket, "simhash_band")

  /** [[capAuditRow]] over the inverted shingle index's document
    * frequencies — the shingles [[ngramJaccard]]/[[containmentPairs]]'
    * `maxDf` cutoff drops (mass = their total posting rows).
    */
  def shingleDfAudit(docs: DataFrame, id: Column, text: Column,
      shingleN: Int = 4, maxDf: Int = MaxDf): DataFrame =
    capAuditRow(
      hashedShingleSets(docs, id, text, shingleN)
        .select(col("doc_id"), explode(col("s")).as("shingle")),
      Seq(col("shingle")), maxDf, "shingle_df")

  /** Attach both shingle sets to id-pairs and verify exact Jaccard. */
  private def verifyPairs(pairs: DataFrame, sig: DataFrame,
      threshold: Double): DataFrame = {
    val sets = sig.select(col("doc_id"), col("s"))
    val cand = pairs
      .join(sets.select(col("doc_id").as("doc_a"), col("s").as("sa")), Seq("doc_a"))
      .join(sets.select(col("doc_id").as("doc_b"), col("s").as("sb")), Seq("doc_b"))
    verifyJaccard(cand, threshold)
  }

  /** INCREMENTAL MinHash-LSH: the pairs a NEW batch creates against a
    * standing index, without re-pairing the base corpus. The band table
    * over all docs is the index (in production it is persisted and the
    * increment's bands are appended); only the increment's bands PROBE
    * it — so the exchange is |incr bands| ⋈ index, never the index
    * self-join, and known base-base pairs are structurally excluded.
    * Probe hits normalize to (least, greatest) id order before the same
    * exact-Jaccard verification as the batch path.
    */
  def minhashLshIncremental(docs: DataFrame, id: Column, text: Column,
      incrPred: Column, shingleN: Int = 3, bands: Int = 4,
      rowsPerBand: Int = 4, threshold: Double = 0.5,
      maxBandBucket: Int = MaxBandBucket): DataFrame = {
    val sig = minhashSignatures(docs, id, text, shingleN, bands * rowsPerBand)
      .localCheckpoint()
    // minhashSignatures keeps only (doc_id, s, mh_*): attach the flag
    val flags = docs.select(id.as("doc_id"), incrPred.as("_incr"))
    val bounded = boundedBands(sig, bands, rowsPerBand, maxBandBucket)
      .join(flags, Seq("doc_id"))
    val index = bounded.select(col("band"), col("sig"), col("doc_id").as("doc_i"))
    val probe = bounded.filter(col("_incr"))
      .select(col("band"), col("sig"), col("doc_id").as("doc_p"))
    val pairs = index.join(probe, Seq("band", "sig"))
      .filter(col("doc_i") =!= col("doc_p"))
      .select(least(col("doc_i"), col("doc_p")).as("doc_a"),
        greatest(col("doc_i"), col("doc_p")).as("doc_b"))
      .distinct()
    verifyPairs(pairs, sig, threshold)
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
    * shingle index (pairs sharing ≥1 indexed shingle).
    *
    * Scale shape: shingles with document frequency above `maxDf` are
    * dropped from the index BEFORE the self-join — one common shingle
    * shared by 1M docs would otherwise yield ~10¹² candidate pairs. The
    * index join carries only (shingle, doc_id); candidate id-pairs are
    * deduped and then verified exactly with one re-join attaching the full
    * shingle sets (a pair sharing only ultra-common shingles is not a
    * near-dup candidate — the standard inverted-index pruning rule).
    */
  def ngramJaccard(docs: DataFrame, id: Column, text: Column,
      shingleN: Int = 4, threshold: Double = 0.5, maxDf: Int = MaxDf): DataFrame =
    verifyJaccard(shingleCandidates(docs, id, text, shingleN, maxDf), threshold)

  /** Inverted-index candidate pairs with their full shingle sets (the
    * shared front half of [[ngramJaccard]] and [[containmentPairs]]):
    * hash shingles to 60-bit longs once (lineage-cut — the set feeds the
    * index and both verification joins), df-cutoff via a count window
    * over the shingle partitioning (both self-join inputs are the
    * identical subplan → one hash-partition(shingle) exchange, reused),
    * pair generation on that exchange, then the per-side set joins.
    */
  /** Distinct 60-bit-hashed shingle set per document — the shared
    * representation of the inverted-index family and its df audit.
    * Hashing up front means the index exchange and the verification
    * arrays carry fixed-width longs, not n-gram strings (~8 bytes vs
    * ~30+ per shingle at corpus scale).
    */
  private def hashedShingleSets(docs: DataFrame, id: Column, text: Column,
      shingleN: Int): DataFrame =
    docs.select(id.as("doc_id"),
      array_distinct(transform(shingles(text, shingleN), s => phash64(s))).as("s"))

  private def shingleCandidates(docs: DataFrame, id: Column, text: Column,
      shingleN: Int, maxDf: Int): DataFrame = {
    val sh = hashedShingleSets(docs, id, text, shingleN).localCheckpoint()
    val ex = sh.select(col("doc_id"), explode(col("s")).as("shingle"))
    val rare = ex.withColumn("df", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("shingle"))))
      .filter(col("df") <= maxDf)
      .select(col("doc_id"), col("shingle"))
    val pairs = rare.select(col("doc_id").as("doc_a"), col("shingle"))
      .join(rare.select(col("doc_id").as("doc_b"), col("shingle")), Seq("shingle"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct()
    pairs
      .join(sh.select(col("doc_id").as("doc_a"), col("s").as("sa")), Seq("doc_a"))
      .join(sh.select(col("doc_id").as("doc_b"), col("s").as("sb")), Seq("doc_b"))
  }

  /** Directional containment dedup: keep a candidate pair when the
    * SMALLER shingle set is ≥ `thrNum/thrDen` contained in the other —
    * `|A∩B| / min(|A|,|B|)` ≥ 4/5 by default. Catches near-SUPERSET
    * duplication (a quote, a wrapped article, boilerplate-plus-body)
    * that resemblance misses: the larger document dilutes the union, so
    * Jaccard stays low while containment is ~1 — the `jaccard_low` flag
    * marks exactly those pairs (J < 1/2), the set a Jaccard-only dedup
    * pass would NOT have found. Same inverted-index scale shape as
    * [[ngramJaccard]]; all verdicts integer-exact (cross-multiplied,
    * no division anywhere).
    */
  def containmentPairs(docs: DataFrame, id: Column, text: Column,
      shingleN: Int = 4, thrNum: Int = 4, thrDen: Int = 5,
      maxDf: Int = MaxDf): DataFrame =
    shingleCandidates(docs, id, text, shingleN, maxDf)
      .withColumn("n_a", size(col("sa")).cast("long"))
      .withColumn("n_b", size(col("sb")).cast("long"))
      .withColumn("n_inter", size(array_intersect(col("sa"), col("sb"))).cast("long"))
      .filter(col("n_inter") * thrDen >= least(col("n_a"), col("n_b")) * thrNum)
      .withColumn("jaccard_low",
        col("n_inter") * 3 < col("n_a") + col("n_b")) // J < 1/2 ⟺ 3·i < a+b
      .select(col("doc_a"), col("doc_b"), col("n_a"), col("n_b"),
        col("n_inter"), col("jaccard_low"))

  /** COMPLETE threshold-Jaccard self-join via prefix filtering (the
    * AllPairs/PPJoin principle — Bayardo et al., WWW'07; Xiao et al.,
    * WWW'08): every pair with J ≥ thrNum/thrDen is found, with a
    * provably-sufficient candidate set far smaller than a full inverted
    * index. This is the EXACT counterpart to [[minhashLsh]] (probabilistic
    * recall) and to [[ngramJaccard]]'s df-cutoff (which can miss a pair
    * whose only shared shingles are common): prefix filtering misses
    * nothing and needs no recall tuning.
    *
    * Principle: order every document's shingles by ONE global total order
    * (ascending document frequency, ties by hash — rarest first). For
    * J(A,B) ≥ t, the overlap i satisfies i ≥ ⌈t·|A|⌉ (from i ≥
    * t(|A|+|B|)/(1+t) and |B| ≥ i), so indexing only each document's
    * first |A| − ⌈t·|A|⌉ + 1 shingles guarantees any qualifying pair
    * still collides on ≥1 indexed shingle (prefix-filtering lemma). At
    * t = 1/2 the index holds ~half of each document's shingles — and the
    * CORPUS-HOTTEST shingles sort last, so boilerplate n-grams that blow
    * up a plain inverted index are structurally excluded from prefixes
    * unless a document consists of almost nothing else.
    *
    * Scale shape: one groupBy(shingle) for global df (partial-agg), one
    * per-document window (partitioned by doc_id — never global) to rank
    * shingles, the prefix-index equi-join on `shingle`, a size filter
    * (t·|A| ≤ |B| ≤ |A|/t cross-multiplied) BEFORE pair-dedup, then the
    * usual verify re-join. All verdicts integer-exact.
    */
  def prefixFilterJaccard(docs: DataFrame, id: Column, text: Column,
      shingleN: Int = 4, thrNum: Int = 1, thrDen: Int = 2): DataFrame = {
    val sh = docs.select(id.as("doc_id"),
      array_distinct(transform(shingles(text, shingleN), s => phash64(s))).as("s"))
      .localCheckpoint()
    val ex = sh.select(col("doc_id"), explode(col("s")).as("shingle"))
    val df = ex.groupBy(col("shingle")).agg(count(lit(1)).as("df"))
    // Rank each document's shingles under the single global (df, shingle)
    // order; keep rank ≤ n − ⌈n·t⌉ + 1. Per-doc window: shuffles by
    // doc_id, sorts ≤ |doc shingles| rows per key — never a global sort.
    val ranked = ex.join(df, Seq("shingle"))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id"))
          .orderBy(col("df"), col("shingle"))))
    val sized = sh.select(col("doc_id"), size(col("s")).cast("long").as("n"))
    val pref = ranked.join(sized, Seq("doc_id"))
      .filter(col("rk") <=
        col("n") - expr(s"(n * $thrNum + ${thrDen - 1}) DIV $thrDen") + 1)
      .select(col("doc_id"), col("shingle"), col("n"))
    // Candidate pairs share an indexed prefix shingle AND pass the size
    // filter (J ≥ t forces t·max(|A|,|B|) ≤ min(|A|,|B|)) — applied on
    // the join output BEFORE the distinct, so ineligible-size pairs never
    // reach the pair exchange.
    val cand = pref.select(col("doc_id").as("doc_a"), col("shingle"),
        col("n").as("n_a"))
      .join(pref.select(col("doc_id").as("doc_b"), col("shingle"),
        col("n").as("n_b")), Seq("shingle"))
      .filter(col("doc_a") < col("doc_b") &&
        col("n_a") * thrNum <= col("n_b") * thrDen &&
        col("n_b") * thrNum <= col("n_a") * thrDen)
      .select("doc_a", "doc_b").distinct()
    cand
      .join(sh.select(col("doc_id").as("doc_a"), col("s").as("sa")), Seq("doc_a"))
      .join(sh.select(col("doc_id").as("doc_b"), col("s").as("sb")), Seq("doc_b"))
      .withColumn("n_a", size(col("sa")).cast("long"))
      .withColumn("n_b", size(col("sb")).cast("long"))
      .withColumn("n_inter",
        size(array_intersect(col("sa"), col("sb"))).cast("long"))
      .withColumn("n_union", col("n_a") + col("n_b") - col("n_inter"))
      .filter(col("n_inter") * thrDen >= col("n_union") * thrNum)
      .select(col("doc_a"), col("doc_b"), col("n_inter"), col("n_union"))
  }

  // --- Cluster dedup (connected components) --------------------------------

  /** Connected components over a near-dup pair graph: the "keep one doc
    * per near-dup cluster" step a training pipeline runs AFTER pairwise
    * detection (pairs alone over-delete: a~b and b~c must collapse to one
    * survivor, not two independent drops).
    *
    * Algorithm: iterative min-label propagation to fixpoint — each vertex
    * repeatedly takes the min label among itself and its neighbors. The
    * classic Spark shape for CC: per iteration one join + one aggregation
    * (both partial-aggregatable), state = |vertices| labels, lineage cut
    * per step. Iterations ≤ graph diameter; near-dup graphs are
    * shallow (clusters are quasi-cliques), so convergence is fast at any
    * scale. The fixpoint is unique, so the result is deterministic
    * regardless of execution order.
    *
    * Returns one row per non-singleton cluster: (cluster = min doc_id,
    * n_members, keep_id = cluster) — documents outside any pair are
    * implicitly their own singleton cluster and need no row.
    */
  def nearDupComponents(pairs: DataFrame): DataFrame =
    componentLabels(pairs).groupBy(col("label").as("cluster"))
      .agg(count(lit(1)).as("n_members"), min(col("doc_id")).as("keep_id"))

  /** Member-level cluster labels (doc_id, label = the cluster's min id)
    * for every vertex of the pair graph — the loop behind
    * [[nearDupComponents]], exposed so survivorship consolidation can
    * merge per-member provenance (`pipe_golden_record`) instead of only
    * counting members.
    */
  /** INCREMENTAL connected-component maintenance: fold a batch of NEW
    * near-dup pairs into a STANDING label table without re-running the
    * fixpoint over the corpus graph. Each standing component is
    * contracted to its label (a component is connected by construction,
    * so its label is a complete connectivity proxy); the min-label
    * fixpoint then runs only over the CONTRACTED touched graph — the new
    * pairs with endpoints rewritten to their standing labels — whose
    * size is O(increment), never O(corpus). Components no new pair
    * touches are structurally excluded and keep their labels verbatim.
    *
    * Provably ≡ the full recompute: a standing label IS the minimum
    * member id of its component, so the min over contracted vertex ids
    * of a merged group = the min over all merged members' ids — the
    * exact label the full fixpoint assigns (law-tested in PropertySpec).
    *
    * Returns the UPDATED standing table: every previously-labeled vertex
    * plus every new-pair endpoint, with post-merge labels.
    */
  def componentsIncremental(standing: DataFrame, newPairs: DataFrame): DataFrame = {
    val st = standing.localCheckpoint()
    val e0 = newPairs.select(col("doc_a"), col("doc_b")).localCheckpoint()
    val eRep = e0
      .join(st.select(col("doc_id").as("doc_a"), col("label").as("ra")),
        Seq("doc_a"), "left_outer")
      .join(st.select(col("doc_id").as("doc_b"), col("label").as("rb")),
        Seq("doc_b"), "left_outer")
      .select(coalesce(col("ra"), col("doc_a")).as("doc_a"),
        coalesce(col("rb"), col("doc_b")).as("doc_b"))
    val micro = componentLabels(eRep) // vertex ids = standing labels ∪ new ids
    val baseUpd = st
      .join(micro.select(col("doc_id").as("label"), col("label").as("nl")),
        Seq("label"), "left_outer")
      .select(col("doc_id"), coalesce(col("nl"), col("label")).as("label"))
    val newVerts = e0.select(col("doc_a").as("doc_id"))
      .unionByName(e0.select(col("doc_b").as("doc_id"))).distinct()
      .join(st.select("doc_id"), Seq("doc_id"), "left_anti")
    val newUpd = newVerts.join(micro, Seq("doc_id"), "left_outer")
      .select(col("doc_id"), coalesce(col("label"), col("doc_id")).as("label"))
    baseUpd.unionByName(newUpd)
  }

  /** Shuffle partitions for the component fixpoint, derived from the
    * EDGE count (r19, verdict task 3): the loop runs 3–10 sequential
    * jobs over the pair graph — a table orders of magnitude smaller
    * than the corpus (only paired vertices) — and at the session's
    * default width every iteration pays |parts| shuffle-file creations
    * per stage for mostly-empty partitions. That fixed cost is what io
    * contention amplifies: ShuffleProfile measured dedup_embed_adaptive
    * at 789 tasks moving 4 MB of shuffle total (zero spill), and its
    * wall inflated 15× on a disk-pressured box (6.1 s clean → 91.8 s)
    * while same-volume/few-task queries held ~1.4×.
    *
    * Budget: ~2M edge rows (~64 MB at ~32 B/row) per partition — the
    * standard shuffle-partition sizing, NOT a row count tuned to the
    * small-gate graph. The first r19 cut used 6400 rows/partition
    * (derived from the sf0.1 profile alone) and EXPLODED at 100×: the
    * replica-expanded embed pair graph reaches tens of millions of
    * edges there, the derivation hit the 4096 cap, and ~3 shuffles ×
    * ~10 iterations × 4096 near-empty tasks turned a 21 s query
    * (r14's 32-partition measurement) into 35+ min — the exact
    * tiny-task io-amplification failure this function exists to
    * prevent, recreated at the other end of the scale axis. With the
    * 2M budget the floor (4) still binds at every sf0.1 gate graph
    * (the measured 789 → 147 task cut is unchanged) and the 100×
    * graph derives ~32; 10⁹ edges derive 1024; the 4096 cap binds
    * past ~4×10⁹ edges. Floor 4 keeps tiny graphs off the
    * single-task path, cap 4096 matches the join rule.
    */
  private[graft] def componentParts(nEdges: Long): Int = {
    // p * 2M < 2 * nEdges, written as p * 1M < nEdges so neither side
    // can overflow (2L * nEdges wraps negative past 2^62 edges and
    // would freeze the width at the floor for exactly the graphs that
    // need the cap; the spec pins the Long.MaxValue row)
    var p = 4L
    while (p < 4096 && p * 1000000L < nEdges) p *= 2
    p.toInt
  }

  def componentLabels(pairs: DataFrame): DataFrame = {
    val spark = pairs.sparkSession
    val edges = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .unionByName(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .distinct()
      .localCheckpoint()
    // Labels only ever decrease, so Σlabel strictly decreases until the
    // fixpoint — convergence is one single-row aggregate per step, not a
    // self-join diff of the label table. Summed as DECIMAL(38,0): an
    // int64 sum could wrap a genuine decrease to a multiple of 2^64 and
    // falsely converge on adversarial full-range ids.
    def labelSum(df: DataFrame): java.math.BigDecimal =
      df.agg(coalesce(sum(col("label").cast("decimal(38,0)")),
        lit(java.math.BigDecimal.ZERO))).head().getDecimal(0)
    // Per-iteration snapshots: persist + a LogicalRDD view keeps the plan
    // depth constant, and unpersisting the superseded table bounds the
    // loop at two label copies (localCheckpoint blocks can't be freed
    // selectively). The final snapshot stays persisted for the caller's
    // aggregation.
    // Every job inside the loop runs at the graph-derived shuffle width
    // (see componentParts); the conf is restored on exit, and the caller
    // aggregates the returned persisted table at its own width.
    // Sequential-execution assumption as documented on
    // StreamOps.scopedState.
    val spKey = "spark.sql.shuffle.partitions"
    val prevSp = spark.conf.get(spKey)
    spark.conf.set(spKey, componentParts(edges.count()))
    try {
    var persisted = edges.select(col("src").as("doc_id")).distinct()
      .withColumn("label", col("doc_id")).persist()
    var prev = labelSum(persisted)
    var labels = spark.createDataFrame(persisted.rdd, persisted.schema)
    var converged = false
    var iter = 0
    while (!converged) {
      // neighbor minimum per vertex (map-side combinable), then the
      // pointwise min with the vertex's own label
      val nbrMin = edges.join(labels, edges("src") === labels("doc_id"))
        .groupBy(col("dst")).agg(min(col("label")).as("nbr_label"))
      val hop = labels.join(nbrMin, labels("doc_id") === nbrMin("dst"), "left")
        .select(labels("doc_id"),
          least(col("label"), coalesce(col("nbr_label"), col("label"))).as("label"))
      // POINTER DOUBLING (path halving): jump each vertex to its label's
      // own label. A label is always a vertex id inside the same
      // component, so the jump stays in-component and only decreases —
      // and it halves remaining path lengths, turning the O(diameter)
      // hop-only loop into O(log diameter). The 100× corpus exposed the
      // difference: rotation-chained embeddings form threshold paths
      // ~10³ hops long, and hop-only propagation ran past 900 iterations
      // into a lineage StackOverflow; with the jump the same graph
      // converges in ~10 iterations. GATED past the first iterations:
      // the common near-dup batch graph (stars/cliques) converges in
      // 2–3 hops, and paying the extra self-join per iteration there
      // taxed every per-micro-batch relabel (the r18 bench read
      // pipe_live_corpus +33 s from exactly this); from iteration 3 on —
      // the long-chain regime — the jump's O(log) takes over.
      val jump = iter >= 2
      val nextPersisted = (if (!jump) hop else {
        val jl = hop.select(col("doc_id").as("jv"), col("label").as("jl"))
        hop.join(jl, hop("label") === jl("jv"), "left")
          .select(hop("doc_id"),
            least(hop("label"), coalesce(col("jl"), hop("label"))).as("label"))
      }).persist()
      val cur = labelSum(nextPersisted) // materializes before the unpersist
      converged = cur.compareTo(prev) == 0
      prev = cur
      persisted.unpersist(false)
      persisted = nextPersisted
      labels = spark.createDataFrame(nextPersisted.rdd, nextPersisted.schema)
      iter += 1
      // belt-and-braces lineage cut: the createDataFrame(rdd) view keeps
      // the LOGICAL plan flat but the RDD graph still chains one level
      // per iteration; truncate it before deep loops overflow the stack
      if (iter % 16 == 0) labels = labels.localCheckpoint()
    }
    labels
    } finally spark.conf.set(spKey, prevSp)
  }

  // --- SimHash -------------------------------------------------------------

  /** SimHash signature width: phash64 yields 60-bit longs (15 hex chars),
    * so the signature uses all 60. Bands follow the pigeonhole guarantee:
    * catching every pair within Hamming distance d needs d+1 bands (d
    * differing bits can corrupt at most d bands, leaving one clean shared
    * band) — 5 bands of 12 bits for the default maxHamming = 4.
    */
  val SimhashBits = 60
  val SimhashBands = 5
  val SimhashBandBits: Int = SimhashBits / SimhashBands

  /** 60-bit SimHash signature (doc_id, simhash:long): bit i of the
    * signature is the sign of Σ_shingles (2·bit_i(h(s)) - 1).
    *
    * Shape: one explode to (doc_id, h) — the shingle hash is computed
    * once — then a single codegen'd hash aggregate with 60 sum columns
    * (one per bit), and a final projection packing the signature. No
    * 60×-per-shingle row explosion (the naive shape) and no interpreted
    * higher-order array folds (lambda `aggregate` is not codegen'd and
    * benches 3× slower here).
    */
  def simhashSig(docs: DataFrame, id: Column, text: Column, shingleN: Int = 3): DataFrame = {
    val sh = docs.select(id.as("doc_id"), explode(shingles(text, shingleN)).as("shingle"))
      .select(col("doc_id"), phash64(col("shingle")).as("h"))
    val bitSums = (0 until SimhashBits).map { bit =>
      sum(when(shiftright(col("h"), bit) % 2 === 1, 1L).otherwise(-1L)).as(s"v$bit")
    }
    val simhash = (0 until SimhashBits).map { bit =>
      when(col(s"v$bit") > 0, lit(1L << bit)).otherwise(lit(0L))
    }.reduce(_ + _)
    sh.groupBy(col("doc_id"))
      .agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"), simhash.as("simhash"))
  }

  /** SimHash band rows (doc_id, simhash, band, bkt) — the blocking table
    * [[simhashPairs]] self-joins and [[simhashBandAudit]] accounts.
    */
  def simhashBanded(sig: DataFrame): DataFrame =
    sig.select(col("doc_id"), col("simhash"),
        explode(sequence(lit(0), lit(SimhashBands - 1))).as("band"))
      .withColumn("bkt",
        expr(s"shiftright(simhash, band * $SimhashBandBits) % ${1 << SimhashBandBits}"))

  /** SimHash near-dup pairs: 12-bit-band blocking (pairs agreeing on any
    * of the 5 signature bands are candidates), verified by Hamming
    * distance.
    *
    * Scale shape: 4,096 buckets per band (vs 256 with byte bands — at
    * 1B docs a byte band held ~1M docs and the self-join went quadratic),
    * and buckets larger than `maxBandBucket` are dropped before the
    * self-join, the same quadratic-blowup guard as [[minhashLsh]]. With
    * md5-derived shingle hashes the signature bits are i.i.d., so
    * contiguous bands block as well as permuted ones. Recall guarantee:
    * a pair within the default maxHamming = 4 differs in ≤ 4 bits, which
    * corrupt at most 4 of the 5 bands — the pair always shares at least
    * one clean band (pigeonhole; only capped-out buckets can still drop
    * it, and those pairs resurface through their other bands).
    */
  def simhashPairs(docs: DataFrame, id: Column, text: Column,
      shingleN: Int = 3, maxHamming: Int = 4, maxBandBucket: Int = MaxBandBucket): DataFrame = {
    // Lineage cut: both sides of the banded self-join consume the
    // signature table — without it each side re-runs the full
    // scan→explode→60-sum aggregate (the dominant cost, twice).
    val sig = simhashSig(docs, id, text, shingleN).localCheckpoint()
    val bounded = simhashBanded(sig)
      .withColumn("bkt_n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("band"), col("bkt"))))
      .filter(col("bkt_n") <= maxBandBucket)
    val a = bounded.select(col("band"), col("bkt"),
      col("doc_id").as("doc_a"), col("simhash").as("ha"))
    val b = bounded.select(col("band"), col("bkt"),
      col("doc_id").as("doc_b"), col("simhash").as("hb"))
    a.join(b, Seq("band", "bkt"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        bit_count(col("ha").bitwiseXOR(col("hb"))).cast("long").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  // --- benchmark contamination ---------------------------------------------

  /** Decontamination pass of a training pipeline: flag corpus documents
    * sharing any word `shingleN`-gram with a benchmark/eval document set
    * (the standard n-gram-overlap contamination check; same hashed-shingle
    * representation as [[minhashSignatures]]).
    *
    * Scale shape: eval benchmarks are small by nature, so their distinct
    * shingle-hash set BROADCASTS; the corpus side explodes to thin
    * (doc_id, hash) longs and the overlap is a map-side broadcast hash
    * join + partial-aggregated count — no shuffle of corpus text, no
    * all-pairs anything. Output: each contaminated doc with its distinct
    * overlapping-shingle count and the contaminated fraction of its own
    * shingle set.
    */
  def contamination(docs: DataFrame, id: Column, text: Column,
      benchPred: Column, shingleN: Int = 3): DataFrame = {
    val sets = docs.select(id.as("doc_id"), benchPred.as("is_bench"),
      array_distinct(transform(shingles(text, shingleN),
        s => phash64(s) % lit(4294967296L))).as("s"))
    val bench = sets.filter(col("is_bench"))
      .select(explode(col("s")).as("h")).distinct()
    val corpus = sets.filter(!col("is_bench"))
      .select(col("doc_id"), size(col("s")).as("n_shingles"), explode(col("s")).as("h"))
    corpus.join(broadcast(bench), Seq("h"))
      // `s` is distinct per doc, so count(*) IS the distinct-overlap count
      .groupBy(col("doc_id"), col("n_shingles"))
      .agg(count(lit(1)).as("n_hits"))
      .select(col("doc_id"), col("n_hits"),
        (col("n_hits").cast("double") / col("n_shingles").cast("double"))
          .as("contamination"))
  }
}
