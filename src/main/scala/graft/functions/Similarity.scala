package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`array<float>`).
  *
  * Cosine is computed over 1e-3-quantized integer components: integer dot
  * products and norms (order-free, exact), then a single sqrt + division.
  * This makes every similarity value bit-identical across engines and
  * partitionings — float summation order can never flip a threshold or a
  * rank — at a negligible quantization cost (~1e-3 relative).
  *
  * Scale shapes (100 TB): brute-force kNN broadcasts the (small) query set
  * over a scan; pair search uses blocking keys; the ANN path buckets by
  * random-hyperplane LSH so candidate generation is an equi-join on the
  * bucket id. IVF assignment is a broadcast argmax over a centroid table.
  */
object Similarity {

  /** Shared quadratic-blowup block cap — ONE definition, consumed by the
    * blocked operators, the dropped-mass audit, and (interpolated) the
    * oracle SQL, so cap and accounting cannot drift.
    */
  val MaxBlock = 10000

  /** Hard abandonment bound for [[thresholdPairs]]' three-tier guard:
    * blocks of (MaxBlock, HardMaxBlock] DISTINCT vectors are salt-split
    * and processed completely; only past this do they drop (audited).
    * Sized so one block's worst-case candidate work (HardMaxBlock² ≈
    * 1.6G codegen'd 64-component dot products, split across
    * (HardMaxBlock/MaxBlock)² = 16 bounded tasks) stays minutes, not
    * hours, on one executor core per task.
    */
  val HardMaxBlock = 40000

  /** Quantized vector (array<long>) and its squared norm. */
  def quantize(emb: Column): Column =
    transform(emb, x => round(x.cast("double") * 1000).cast("long"))

  def sqNorm(qv: Column): Column =
    aggregate(transform(qv, x => x * x), lit(0L), (acc, v) => acc + v)

  /** Exact integer dot product of two quantized vectors — the native
    * fused-loop expression ([[graft.plans.DotQ]]; runs once per candidate
    * PAIR in every scored join, so the zip_with intermediate array the
    * composition form allocates is the vector family's hottest garbage).
    * [[dotQLegacy]] keeps the composition for the equivalence law.
    */
  def dotQ(a: Column, b: Column): Column = graft.plans.DotQ(a, b)

  /** The original builtin-composition dot product — law-test reference. */
  private[graft] def dotQLegacy(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, v) => acc + v)

  /** Deterministic cosine from quantized vectors + precomputed sq-norms. */
  def cosineQ(a: Column, na: Column, b: Column, nb: Column): Column =
    dotQ(a, b).cast("double") / sqrt((na * nb).cast("double"))

  /** Embeddings table → (id, v, nrm) with quantized vectors. */
  def prepared(embs: DataFrame, id: Column, emb: Column): DataFrame =
    embs.select(id.as("vec_id"), quantize(emb).as("v"))
      .withColumn("nrm", sqNorm(col("v")))

  /** Maximal-marginal-relevance rerank of the cosine top-`nCandidates`
    * for one query vector: greedily pick `k` results maximizing
    * `λ·rel(c) − (1−λ)·max_{s∈selected} sim(c, s)` — the standard
    * diversified-retrieval head (Carbonell–Goldstein MMR), relevance
    * traded against redundancy so near-duplicate hits don't crowd the
    * result list.
    *
    * Scale shape: the corpus pays ONE scan ending in a distributed
    * TakeOrdered for the candidate head; the head (bounded by the
    * `nCandidates` constant) is then reranked on the driver — a reranker
    * always runs on the retrieval head, never the corpus, so the collect
    * is O(k·dim), not O(data). Driver arithmetic mirrors [[cosineQ]]
    * exactly (integer dot, one sqrt, one division — every op exactly
    * rounded), so the selection is bit-identical to the SQL oracle's.
    */
  def mmrRerank(embs: DataFrame, id: Column, emb: Column, queryId: Long = 0L,
      nCandidates: Int = 20, k: Int = 5, lambda: Double = 0.5): DataFrame = {
    val spark = embs.sparkSession
    val p = prepared(embs, id, emb)
    val q0 = p.filter(col("vec_id") === queryId).select(col("v"), col("nrm")).head()
    val qv = typedLit(q0.getSeq[Long](0))
    val qn = lit(q0.getLong(1))
    val cand = p.filter(col("vec_id") =!= queryId)
      .withColumn("rel", cosineQ(col("v"), col("nrm"), qv, qn))
      .orderBy(col("rel").desc, col("vec_id"))
      .limit(nCandidates)
      .select(col("vec_id"), col("v"), col("nrm"), col("rel"))
      .collect() // bounded by nCandidates
      .map(r => (r.getLong(0), r.getSeq[Long](1).toArray, r.getLong(2), r.getDouble(3)))
    def sim(a: (Long, Array[Long], Long, Double), b: (Long, Array[Long], Long, Double)): Double = {
      var d = 0L
      var i = 0
      while (i < a._2.length) { d += a._2(i) * b._2(i); i += 1 }
      d.toDouble / math.sqrt((a._3 * b._3).toDouble)
    }
    val selected = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Array[Long], Long, Double)]
    val remaining = scala.collection.mutable.ArrayBuffer(cand: _*)
    while (selected.length < math.min(k, cand.length)) {
      val best = remaining.minBy { c =>
        val score =
          if (selected.isEmpty) c._4
          else lambda * c._4 - (1 - lambda) * selected.map(s => sim(c, s)).max
        (-score, c._1)
      }
      selected += best
      remaining -= best
    }
    import spark.implicits._
    selected.zipWithIndex
      .map { case (c, i) => ((i + 1).toLong, c._1, c._4) }.toSeq
      .toDF("rank", "vec_id", "rel")
  }

  /** Brute-force cosine top-k: the exact baseline. The query set is
    * broadcast (nested-loop join); every executor scans its partition of
    * the corpus once; per-query heaps via window rank.
    */
  def knnBrute(embs: DataFrame, id: Column, emb: Column,
      queryPred: Column, k: Int = 5): DataFrame = {
    val p = prepared(embs, id, emb)
    val q = broadcast(embs.filter(queryPred).select(id.as("query_id"), quantize(emb).as("qv"))
      .withColumn("qn", sqNorm(col("qv"))))
    val scored = q.join(p, col("query_id") =!= col("vec_id"))
      .withColumn("sim", cosineQ(col("qv"), col("qn"), col("v"), col("nrm")))
    val w = Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        col("rank").cast("long").as("rank"), col("sim"))
  }

  /** All pairs above a similarity threshold within a blocking key (the
    * embedding-cosine near-dup operator). Blocking bounds the join size;
    * at scale the block key is a coarse cluster / LSH bucket.
    *
    * Three-tier degenerate-mass handling (r17 verdict task 1 — the
    * `embed_block` cap audit measured 120,355 rows silently excluded on
    * the 100× replicated corpus; this recovers them):
    *
    *  1. REPLICA PRE-COLLAPSE: identical quantized vectors within a block
    *     collapse to one key (rep id = min vec_id) BEFORE the self-join.
    *     Verification cost drops by replication² — a boilerplate cluster
    *     of r copies verifies once instead of r²/2 times — and the true
    *     member pairs are recovered exactly by expanding verified key
    *     pairs back through the membership table (within-key members are
    *     pairwise identical, so one `cosineQ(v, v)` decides them all).
    *     Work is linear in OUTPUT size, the floor for an all-pairs
    *     contract.
    *  2. SALT SPLIT: blocks of (maxBlock, hardMaxBlock] DISTINCT vectors
    *     process completely — the a-side chunks into ⌈blk_n/maxBlock⌉
    *     hash slices and the b-side replicates per slice (the
    *     `sim_ivf_split` disjoint-id move applied to blocking), so one
    *     hot block becomes m bounded join tasks instead of one straggler
    *     or a silent drop. Quadratic candidate work, but distributed and
    *     bounded per task.
    *  3. HARD CAP: blocks past `hardMaxBlock` distinct vectors are
    *     dropped from candidate generation — and REPORTED by the
    *     `dedup_cap_audit` dropped-mass counters (no silent caps).
    */
  def thresholdPairs(embs: DataFrame, id: Column, emb: Column,
      block: Column, threshold: Double, maxBlock: Int = MaxBlock,
      hardMaxBlock: Int = HardMaxBlock): DataFrame = {
    val rows = embs.select(id.as("vec_id"), block.as("blk"), quantize(emb).as("v"))
    val keys = rows.groupBy(col("blk"), col("v"))
      .agg(min(col("vec_id")).as("key_id"), count(lit(1)).as("n_mem"))
      .withColumn("nrm", sqNorm(col("v")))
      .withColumn("blk_n", count(lit(1)).over(Window.partitionBy(col("blk"))))
      .filter(col("blk_n") <= hardMaxBlock)
      .withColumn("m",
        floor((col("blk_n") + lit(maxBlock - 1)) / lit(maxBlock)).cast("long"))
    val members = rows
      .join(keys.select(col("blk"), col("v"), col("key_id")), Seq("blk", "v"))
      .select(col("key_id"), col("vec_id"))
    val a = keys.select(col("blk"),
      pmod(xxhash64(col("key_id")), col("m")).as("chunk"),
      col("key_id").as("ka"), col("v").as("va"), col("nrm").as("na"))
    val b = keys.select(col("blk"),
      explode(sequence(lit(0L), col("m") - 1)).as("chunk"),
      col("key_id").as("kb"), col("v").as("vb"), col("nrm").as("nb"))
    val cross = a.join(b, Seq("blk", "chunk")).filter(col("ka") < col("kb"))
      .withColumn("sim", cosineQ(col("va"), col("na"), col("vb"), col("nb")))
      .filter(col("sim") >= threshold)
      .select(col("ka"), col("kb"), col("sim"))
    val within = keys.filter(col("n_mem") >= 2)
      .withColumn("sim", cosineQ(col("v"), col("nrm"), col("v"), col("nrm")))
      .filter(col("sim") >= threshold)
      .select(col("key_id").as("ka"), col("key_id").as("kb"), col("sim"))
    cross.unionByName(within)
      .join(members.select(col("key_id").as("ka"), col("vec_id").as("ia")), Seq("ka"))
      .join(members.select(col("key_id").as("kb"), col("vec_id").as("ib")), Seq("kb"))
      .filter(col("ka") =!= col("kb") || col("ia") < col("ib"))
      .select(least(col("ia"), col("ib")).as("id_a"),
        greatest(col("ia"), col("ib")).as("id_b"), col("sim"))
  }

  /** SQ8 scalar quantization (the IVF storage companion at corpus scale:
    * 4 bytes/component → 1): per-vector min/max affine code,
    * q = round((x - min) · 255 / (max - min)) ∈ [0, 255]; decode is
    * min + q · (max - min) / 255, so reconstruction error is bounded by
    * half a step. A constant vector (max == min) codes to all zeros. Pure
    * codegen'd projection, IEEE-deterministic in both engines.
    */
  def sq8Encode(emb: Column): Column = {
    val mn = array_min(emb).cast("double")
    val mx = array_max(emb).cast("double")
    when(mx > mn,
      transform(emb, x =>
        round((x.cast("double") - mn) * 255.0 / (mx - mn)).cast("int")))
      .otherwise(transform(emb, _ => lit(0)))
  }

  /** ±1 hyperplane component for (plane j, position pos) — an LCG over the
    * flattened index, deterministic and engine-portable. Evaluated in
    * Scala at plan time (the formula stays within Int range for
    * j·dim+pos < 512, matching the oracle's 32-bit arithmetic).
    */
  def planeSign(j: Int, pos: Int, dim: Int): Long =
    if (((1664525 * (j * dim + pos) + 1013904223) >> 15) % 2 == 0) 1L else -1L

  /** Random-hyperplane LSH bucket id (numPlanes bits). Hyperplane sign
    * vectors are plan-time constant arrays, so each plane's dot product is
    * one codegen'd `aggregate(zip_with(...))` over the row's own vector —
    * zero explode, zero shuffle (the previous shape blew each vector into
    * dim×planes = 512 rows through two shuffled groupBys).
    */
  def lshBuckets(p: DataFrame, numPlanes: Int = 8, dim: Int = 64): DataFrame =
    p.select(col("vec_id"), lshBucketCol(col("v"), numPlanes, dim).as("bucket"))

  /** The bucket id as a plain column over a quantized vector column — for
    * callers that want the bucket inline (e.g. as a blocking key) without
    * a join back onto the corpus. One fused native pass over the vector
    * ([[graft.plans.LshBucket]]) — the composed form
    * ([[lshBucketColComposed]]) re-traverses the vector once per plane;
    * the two are value-pinned equal by a PropertySpec law.
    */
  def lshBucketCol(v: Column, numPlanes: Int = 8, dim: Int = 64): Column =
    graft.plans.LshBucket(v, numPlanes, dim)

  /** The pre-fusion builtin composition of [[lshBucketCol]] — kept as the
    * semantic reference the native kernel is property-tested against.
    */
  private[graft] def lshBucketColComposed(v: Column, numPlanes: Int = 8,
      dim: Int = 64): Column =
    (0 until numPlanes).map { j =>
      val signs = typedLit((0 until dim).map(planeSign(j, _, dim)))
      val d = aggregate(zip_with(v, signs, (x, s) => x * s),
        lit(0L), (acc, x) => acc + x)
      when(d > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Hyperplane count that holds expected LSH bucket occupancy — and with
    * it candidate-pair volume per row — constant as the corpus grows: the
    * smallest p with 2^p ≥ ⌈n / targetOccupancy⌉, floored at `base`.
    * This is the knob SCALE_r12.md measured by hand at 10× (8 → 12 planes
    * cut the scaled wall-clock 1.8×); `dedup_embed_adaptive` turns it from
    * corpus stats at plan time. Pure integer arithmetic (no float log2),
    * mirrored exactly by the oracle's `MIN(p) WHERE (1 << p) >= m` scan.
    */
  def adaptivePlanes(n: Long, base: Int = 4, targetOccupancy: Long = 16): Int = {
    val m = (n + targetOccupancy - 1) / targetOccupancy
    val need =
      if (m <= 1L) 0 else 64 - java.lang.Long.numberOfLeadingZeros(m - 1)
    math.max(base, need)
  }

  /** IVF inverted-list count derived from the corpus count at plan time —
    * the `adaptivePlanes` move applied to the coarse quantizer: the
    * smallest power of two p ≥ 8 with p² ≥ n, i.e. the power-of-two
    * ceiling of √n. √n is where the two scan costs of an IVF search
    * balance — a query scans `nlist` centroids plus `nProbe · n / nlist`
    * list members, and `nlist = √n` equalizes the terms (the standard
    * published IVF sizing guidance); a FIXED list count at a growing
    * corpus degrades toward brute force — on the 100× corpus (200k
    * vectors) fixed-8 scores 50,008 vectors per query where the derived
    * 512 scores 1,293, and `tools/IvfProbeBench` measures the effect:
    * a 2000-query batch over prebuilt lists searches 9.2× faster
    * (1.1 vs 10.1 s) for 1.9× the one-time build (SCALE_r16). Index
    * BUILD cost is the flip side: k-means assignment is O(n · nlist)
    * per iteration, so the few-query gate harness is build-dominated —
    * its bench number prices the build; the per-query probe is what the
    * rule holds flat. Pure integer
    * arithmetic; the oracle re-derives the identical count from its own
    * COUNT(*) with a `MIN(p) WHERE p*p >= n` scan, and seeds the SAME
    * k-means (`vec_id < nlist`), so the gate proves the formula through
    * the whole train/assign/probe pipeline.
    */
  def adaptiveLists(n: Long): Int = {
    var p = 8
    while (p < 65536 && p.toLong * p < n) p *= 2
    p
  }

  /** IVF probe count derived WITH the list count (r16 verdict task 1 —
    * the `adaptiveLists` headline was unpriced in recall while nProbe
    * stayed a fixed 2): the smallest power of two p ≥ 4 with p³ ≥ nlist,
    * i.e. the power-of-two ceiling of nlist^(1/3).
    *
    * Anchored on the measured recall/cost curve (IvfProbeBench, 100×
    * corpus, 200k vectors, nlist = 512, 500-query brute ground truth):
    * recall@3 at the adaptive geometry is 0.993 at even 2 probes (the
    * fixed-(8,2) geometry the old gates attested reads 0.689 — 8 coarse
    * cells cover this space far worse than 512 tight ones), and the
    * knee of the curve is 4-8 probes (search 0.97-1.07 s, recall@3
    * 0.995-0.996, vs 2.4-4.7 s at 16-64 probes for ≤ +0.003). The cube
    * root lands on that knee at every measured scale — nlist 32/64
    * (sf0.01/sf0.1) → 4, 512 (100×) → 8 — and keeps probe volume
    * sub-linear at any scale: with nlist = √n, scored vectors per query
    * = nlist + nProbe·n/nlist ≈ n^(1/6)·√n = n^(2/3) (200k → 3.6k
    * scored, 55× under brute). Pure integer arithmetic; oracles
    * re-derive the identical count from nlist with a `MIN(p) WHERE
    * p*p*p >= nlist` scan, so the gates prove the formula end to end.
    */
  def adaptiveProbes(nlist: Int): Int = {
    var p = 4
    while (p < 256 && p.toLong * p * p < nlist) p *= 2
    p
  }

  /** ANN top-1 neighbor within the LSH bucket (the scale path: candidate
    * generation is an equi-join on `bucket`, never all-pairs). Buckets
    * above `maxBucket` members are excluded — the quadratic-blowup guard
    * for degenerate embedding mass (e.g. zero vectors) at corpus scale.
    */
  def annLshTop1(embs: DataFrame, id: Column, emb: Column, numPlanes: Int = 8,
      maxBucket: Int = MaxBlock): DataFrame = {
    val p = prepared(embs, id, emb)
    val withBucket = p.join(lshBuckets(p, numPlanes), Seq("vec_id"))
      .withColumn("bkt_n", count(lit(1)).over(Window.partitionBy(col("bucket"))))
      .filter(col("bkt_n") <= maxBucket)
    val a = withBucket.select(col("bucket"), col("vec_id"), col("v"), col("nrm"))
    val b = withBucket.select(col("bucket"), col("vec_id").as("cand_id"),
      col("v").as("vb"), col("nrm").as("nb"))
    // top-1 as a partial-aggregatable argmax (min over (-sim, cand_id)
    // struct = max sim, ties to smallest id): candidates collapse map-side
    // in the join stage instead of shuffling every scored pair into a
    // window sort.
    a.join(b, Seq("bucket")).filter(col("vec_id") =!= col("cand_id"))
      .withColumn("sim", cosineQ(col("v"), col("nrm"), col("vb"), col("nb")))
      .groupBy(col("vec_id"))
      .agg(min(struct(negate(col("sim")).as("ns"), col("cand_id").as("cand_id"),
        col("sim").as("sim"))).as("m"))
      .select(col("vec_id"), col("m.cand_id").as("ann_id"), col("m.sim").as("sim"))
  }

  /** IVF search (the scale path past coarse assignment): each query probes
    * its `nProbe` nearest centroids and brute-scores only those inverted
    * lists — the scan shrinks by ~|centroids|/nProbe versus brute force.
    *
    * Shape: centroids and the (query, probed-centroid) table are tiny and
    * broadcast; the corpus moves through exactly one equi-join on its
    * assigned centroid id. Each corpus vector lives in exactly one list,
    * so no candidate dedup is needed.
    *
    * @param cents trained or seeded centroid table (centroid_id, cv, cn) —
    *   see [[kmeansTrain]] / [[seedCentroids]].
    */
  def ivfSearch(embs: DataFrame, id: Column, emb: Column,
      cents: DataFrame, queryPred: Column,
      nProbe: Int = 2, k: Int = 3, corpusPred: Column = lit(true)): DataFrame = {
    // Filtered search pre-filters the INVERTED LISTS (the metadata
    // predicate rides the list scan), never the top-k head — post-
    // filtering a k-row head under-fills results wherever the predicate
    // is selective. Queries come from the unfiltered table.
    val corpus = embs.filter(corpusPred)
    ivfSearchOnLists(embs, id, emb, cents, queryPred,
      ivfLists(corpus, id, emb, cents), nProbe, k)
  }

  /** Inverted lists as a standalone artifact: each corpus vector with its
    * assigned centroid — the persisted table an IVF deployment stores.
    * Exposed so an INCREMENTAL add (new vectors assigned to the STANDING
    * centroids, lists appended — no retrain, no touch of existing lists)
    * composes by `unionByName` with the base lists.
    */
  def ivfLists(embs: DataFrame, id: Column, emb: Column,
      cents: DataFrame): DataFrame =
    prepared(embs, id, emb).join(
      ivfAssign(embs, id, emb, cents).select(col("vec_id"), col("centroid_id")),
      Seq("vec_id"))

  /** [[ivfSearch]] over PREBUILT inverted lists (see [[ivfLists]]) — the
    * search path is identical; only list construction is externalized.
    */
  def ivfSearchOnLists(embs: DataFrame, id: Column, emb: Column,
      cents: DataFrame, queryPred: Column, lists: DataFrame,
      nProbe: Int = 2, k: Int = 3): DataFrame = {
    val q = embs.filter(queryPred).select(id.as("query_id"), quantize(emb).as("qv"))
      .withColumn("qn", sqNorm(col("qv")))
    val wProbe = Window.partitionBy(col("query_id"))
      .orderBy(col("csim").desc, col("centroid_id"))
    val probes = q.crossJoin(cents)
      .withColumn("csim", cosineQ(col("qv"), col("qn"), col("cv"), col("cn")))
      .withColumn("prn", row_number().over(wProbe))
      .filter(col("prn") <= nProbe)
      .select(col("query_id"), col("qv"), col("qn"), col("centroid_id"))
    val scored = lists.join(broadcast(probes), Seq("centroid_id"))
      .filter(col("query_id") =!= col("vec_id"))
      .withColumn("sim", cosineQ(col("qv"), col("qn"), col("v"), col("nrm")))
    val wTop = Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(wTop))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        col("rank").cast("long").as("rank"), col("sim"))
  }

  /** IVF RANGE search: all corpus vectors within cosine `threshold` of any
    * query, via the same probed-inverted-list join as [[ivfSearch]] but
    * with a similarity floor instead of a top-k head — the primitive a
    * semantic decontamination pass needs (every train doc near ANY eval
    * probe is a hit; a k-head would silently drop hits past k).
    *
    * Scale shape: the probe set (queries × nProbe cells) broadcasts into
    * the list scan, the threshold filter rides the scored join map-side,
    * and output is bounded by the genuinely-near pair count — never
    * corpus × queries.
    */
  def ivfRange(embs: DataFrame, id: Column, emb: Column,
      cents: DataFrame, queryPred: Column, threshold: Double,
      nProbe: Int = 2, corpusPred: Column = lit(true)): DataFrame = {
    val corpus = embs.filter(corpusPred)
    val lists = prepared(corpus, id, emb).join(
      ivfAssign(corpus, id, emb, cents).select(col("vec_id"), col("centroid_id")),
      Seq("vec_id"))
    val q = embs.filter(queryPred).select(id.as("query_id"), quantize(emb).as("qv"))
      .withColumn("qn", sqNorm(col("qv")))
    val wProbe = Window.partitionBy(col("query_id"))
      .orderBy(col("csim").desc, col("centroid_id"))
    val probes = q.crossJoin(cents)
      .withColumn("csim", cosineQ(col("qv"), col("qn"), col("cv"), col("cn")))
      .withColumn("prn", row_number().over(wProbe))
      .filter(col("prn") <= nProbe)
      .select(col("query_id"), col("qv"), col("qn"), col("centroid_id"))
    lists.join(broadcast(probes), Seq("centroid_id"))
      .filter(col("query_id") =!= col("vec_id"))
      .withColumn("sim", cosineQ(col("qv"), col("qn"), col("v"), col("nrm")))
      .filter(col("sim") >= threshold)
      .select(col("query_id"), col("vec_id"), col("sim"))
  }

  // --- Product quantization ----------------------------------------------

  /** Exact integer squared-L2 distance between quantized vectors (the PQ
    * metric — order-free, no doubles, so argmins are engine-identical).
    */
  def sqDistQ(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0L), (acc, v) => acc + v)

  /** Subvector rows (vec_id, m, sv) of prepared vectors: subspace m is
    * components [m·subDim, (m+1)·subDim). One projection + explode of an
    * nSub-element array — no shuffle.
    */
  def pqSubvectors(p: DataFrame, nSub: Int = PqSub, subDim: Int = PqSubDim): DataFrame = {
    val arms = (0 until nSub).map(m => struct(lit(m).as("m"),
      slice(col("v"), m * subDim + 1, subDim).as("sv")))
    p.select(col("vec_id"), explode(array(arms: _*)).as("a"))
      .select(col("vec_id"), col("a.m").as("m"), col("a.sv").as("sv"))
  }

  /** Nearest-codeword assignment per (vector, subspace): broadcast the
    * codebook (nSub·k rows), collapse the scored candidates map-side via
    * the partial-aggregatable min-struct argmin (ties → smallest code).
    * Codebook schema: (m, code, cw).
    */
  def pqAssign(sub: DataFrame, codebook: DataFrame): DataFrame = {
    // Assignment is a PROJECTION through the native [[graft.plans
    // .PqArgmin]] kernel, not a join: the relational formulation
    // (explode against the broadcast codebook + min-struct argmin)
    // materializes |rows|·|codewords| joined rows — 4.2M at sf0.1 with
    // the 256-codeword production codebook — and paid ~5 µs each through
    // the non-codegen aggregate∘zip_with distance (the +20 s/query
    // regression r18's bench attempt 2 caught). The codebook collects to
    // the driver first: it is a bounded index artifact (≤
    // PqSub·PqCodewords rows), the same class as a broadcast centroid
    // table, and rides into the kernel as a codegen reference object.
    val rows = codebook.select(col("m"), col("code"), col("cw")).collect()
    val nSub = if (rows.isEmpty) 0 else rows.map(_.getInt(0)).max + 1
    val byM = rows.groupBy(_.getInt(0))
    val codes = Array.tabulate(nSub) { m =>
      byM.getOrElse(m, Array.empty[org.apache.spark.sql.Row]).toArray
        .map(_.getLong(1)).sorted // ascending code order = packed tie-break
    }
    require(codes.forall(_.forall(c => c >= 0 && c <= graft.plans.PqArgmin.CodeMask)),
      s"PQ code ids must fit ${graft.plans.PqArgmin.CodeBits} bits")
    val cws = Array.tabulate(nSub) { m =>
      val sorted = byM.getOrElse(m, Array.empty[org.apache.spark.sql.Row]).toArray
        .sortBy(_.getLong(1))
      sorted.map(_.getSeq[Long](2).toArray)
    }
    sub.withColumn("p", graft.plans.PqArgmin(col("m"), col("sv"), codes, cws))
      .filter(col("p").isNotNull)
      .select(col("vec_id"), col("m"),
        col("p").bitwiseAND(lit(graft.plans.PqArgmin.CodeMask)).as("code"),
        shiftright(col("p"), graft.plans.PqArgmin.CodeBits).as("d"))
  }

  /** Product-quantization codebook training: independent Lloyd's runs in
    * each of the nSub subspaces under exact integer squared-L2 (all
    * subspaces advance together — the per-iteration passes are shared).
    * Seeds are the seedPred vectors' subvectors (code = vec_id);
    * re-centering rounds the per-dimension mean back onto the integer
    * grid (exact sums, one rounded division), so the codebook is
    * engine-identical. A codeword that loses all members drops out,
    * identically in both engines (no NaN arm here — distances are
    * integers). Per-iteration cost: one broadcast-assign over the
    * subvector rows, then k·nSub·subDim partial sums through one
    * exchange; localCheckpoint bounds plan depth.
    */
  def pqTrain(embs: DataFrame, id: Column, emb: Column, seedPred: Column,
      nSub: Int = PqSub, subDim: Int = PqSubDim, iters: Int = 2): DataFrame = {
    val sub = pqSubvectors(prepared(embs, id, emb), nSub, subDim).localCheckpoint()
    val seed = sub.filter(seedPred)
      .select(col("m"), col("vec_id").as("code"), col("sv").as("cw"))
    (1 to iters).foldLeft(seed) { (cb, _) =>
      val asg = pqAssign(sub, cb).select(col("vec_id"), col("m"), col("code"))
      val sums = asg.join(sub, Seq("vec_id", "m"))
        .select(col("m"), col("code"), posexplode(col("sv")).as(Seq("pos", "x")))
        .groupBy(col("m"), col("code"), col("pos"))
        .agg(sum(col("x")).as("sx"), count(lit(1)).as("n"))
        .withColumn("cx", round(col("sx").cast("double") / col("n")).cast("long"))
      sums.groupBy(col("m"), col("code"))
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("cx")))),
          s => s.getField("cx")).as("cw"))
        .localCheckpoint()
    }
  }

  /** PQ encode: each vector compressed to nSub code ids (64 quantized
    * longs → 4 small ints — the classic 16-32x inverted-list shrink).
    * Output: (vec_id, codes) with codes in subspace order.
    */
  def pqEncode(embs: DataFrame, id: Column, emb: Column, codebook: DataFrame,
      nSub: Int = PqSub, subDim: Int = PqSubDim): DataFrame =
    pqAssign(pqSubvectors(prepared(embs, id, emb), nSub, subDim), codebook)
      .groupBy(col("vec_id"))
      .agg(transform(array_sort(collect_list(struct(col("m"), col("code")))),
        s => s.getField("code")).as("codes"))

  /** Asymmetric-distance (ADC) top-k search over PQ codes: per query, a
    * lookup table of |Q|·nSub·k exact subspace distances is broadcast;
    * the corpus moves through ONE equi-join on (m, code) and a partial-
    * aggregatable integer sum — the scored pairs collapse map-side, and
    * no full-dimension vector is touched after encoding (the point of
    * PQ at 100 TB: the scan reads 4 codes, not 64 components).
    */
  def pqAdcSearch(embs: DataFrame, id: Column, emb: Column, codebook: DataFrame,
      queryPred: Column, k: Int = 3, nSub: Int = PqSub, subDim: Int = PqSubDim): DataFrame = {
    val p = prepared(embs, id, emb)
    val codes = pqAssign(pqSubvectors(p, nSub, subDim), codebook)
      .select(col("vec_id"), col("m"), col("code"))
    val lut = pqSubvectors(p.filter(queryPred), nSub, subDim)
      .select(col("vec_id").as("query_id"), col("m"), col("sv").as("qsv"))
      .join(broadcast(codebook), Seq("m"))
      .withColumn("d", sqDistQ(col("qsv"), col("cw")))
      .select(col("query_id"), col("m"), col("code"), col("d"))
    val adc = codes.join(broadcast(lut), Seq("m", "code"))
      .filter(col("query_id") =!= col("vec_id"))
      .groupBy(col("query_id"), col("vec_id"))
      .agg(sum(col("d")).as("adc"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("adc"), col("vec_id"))
    adc.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        col("rank").cast("long").as("rank"), col("adc"))
  }

  /** The production ANN index layout — IVF coarse pruning composed with
    * PQ asymmetric-distance ranking (IVF-PQ, the FAISS/SPANN default at
    * billion scale): each query probes its nProbe nearest centroids, and
    * only the vectors ASSIGNED to those lists are ranked, by ADC over
    * their 4 PQ codes (never a full-dimension vector). Scale shape: the
    * centroid table, the per-query probe set, and the |Q|·nSub·k LUT all
    * broadcast; the corpus-side cost is one assignment pass + one
    * equi-join on (centroid_id) to prune + one equi-join on (m, code) to
    * rank, with the integer ADC sums collapsing map-side. Compared to
    * [[pqAdcSearch]] the candidate set shrinks from the corpus to the
    * probed lists (~nProbe/k of it); compared to [[ivfSearch]] the
    * ranking reads 4 codes instead of 64 components.
    */
  def ivfPqSearch(embs: DataFrame, id: Column, emb: Column,
      cents: DataFrame, codebook: DataFrame, queryPred: Column,
      nProbe: Int = 2, k: Int = 3, nSub: Int = PqSub, subDim: Int = PqSubDim): DataFrame = {
    val p = prepared(embs, id, emb)
    val codes = pqAssign(pqSubvectors(p, nSub, subDim), codebook)
      .select(col("vec_id"), col("m"), col("code"))
    val assigned = assignTo(p, cents).select(col("vec_id"), col("centroid_id"))
    val q = p.filter(queryPred)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("nrm").as("qn"))
    val wProbe = Window.partitionBy(col("query_id"))
      .orderBy(col("csim").desc, col("centroid_id"))
    val probes = q.crossJoin(broadcast(cents))
      .withColumn("csim", cosineQ(col("qv"), col("qn"), col("cv"), col("cn")))
      .withColumn("prn", row_number().over(wProbe))
      .filter(col("prn") <= nProbe)
      .select(col("query_id"), col("centroid_id"))
    // COSINE-ADC ranking (r18, verdict task 2): the corpus is unit-norm
    // and the index's metric is cosine, but classic L2-ADC ranks by
    // ‖q‖² − 2·dot + ‖recon(x)‖² — and the reconstruction-norm term
    // varies per vector with coarse codebooks, a pure ranking bias. The
    // measured effect at 100× (PqCodecBench): L2-ADC recall@3 SATURATES
    // at 0.41–0.47 no matter how many bytes the codec spends (2 → 12
    // B/vec), while cosine-ADC — dot(q, recon)/ (‖q‖·‖recon‖), both
    // factors exact integer LUT sums over the same 4 codes — tracks the
    // coarse index. Two broadcast LUTs per query batch: the per-(query,
    // m, code) integer dot and the per-(m, code) integer codeword
    // norm²; the corpus-side scan still reads codes only.
    val lut = pqSubvectors(p.filter(queryPred), nSub, subDim)
      .select(col("vec_id").as("query_id"), col("m"), col("sv").as("qsv"))
      .join(broadcast(codebook), Seq("m"))
      .withColumn("dm", dotQ(col("qsv"), col("cw")))
      .withColumn("n2", sqNorm(col("cw")))
      .select(col("query_id"), col("m"), col("code"), col("dm"), col("n2"))
    val adc = codes.join(assigned, Seq("vec_id"))
      .join(broadcast(probes), Seq("centroid_id"))
      .filter(col("query_id") =!= col("vec_id"))
      .join(broadcast(lut), Seq("query_id", "m", "code"))
      .groupBy(col("query_id"), col("vec_id"))
      .agg(sum(col("dm")).as("dotsum"), sum(col("n2")).as("n2sum"))
      .join(broadcast(q.select(col("query_id"), col("qn"))), Seq("query_id"))
      .withColumn("sim",
        col("dotsum").cast("double") / sqrt((col("qn") * col("n2sum")).cast("double")))
    val w = Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("vec_id"))
    adc.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        col("rank").cast("long").as("rank"), col("sim"))
  }

  /** PQ codec geometry — documented constants with the measured table
    * behind them (r18 verdict task 2; PqCodecBench, 100× corpus, 200k
    * unit-norm 64-dim vectors, IVF-PQ at the adaptive (512, 8) coarse
    * geometry, brute top-3 ground truth over 100 queries):
    *
    * | codec        | B/vec | raw-ADC r@3 | +refine@50 | @200 | @400 |
    * |--------------|-------|-------------|-----------|------|------|
    * | 4×16, 8 cw   | 2     | 0.20        | 0.40      |  —   |  —   |
    * | 4×16, 256 cw | 4     | 0.41        | 0.74      |  —   |  —   |
    * | 8×8, 64 cw   | 6     | 0.43        | 0.79      | 0.93 | 0.96 |
    * | **8×8, 256** | **8** | 0.43        | 0.88      | **0.99** | 0.9933 |
    * | 16×4, 256 cw | 16    | 0.59 (L2)   |  —        |  —   |  —   |
    * | coarse-exact reference at (512, 8):            0.9933          |
    *
    * Two findings the table encodes: (1) RAW ADC recall saturates at
    * 0.41–0.59 regardless of byte budget — the reconstruction error
    * swamps the similarity gaps between close neighbors, so no codec
    * resolution alone closes the r17 9/30 gap; (2) the refine stage
    * closes it completely — 8 subspaces × 256 codewords (the standard
    * 8-byte PQ8×8 layout) with a 200-deep exact rerank reads 0.990 at
    * 100×, and 400-deep matches the coarse index exactly. Codebook size
    * is a STORAGE choice, not a corpus-size function; a corpus smaller
    * than PqCodewords seeds fewer codewords naturally (seeds are
    * `vec_id < PqCodewords`).
    */
  val PqSub = 8
  val PqSubDim = 64 / PqSub
  val PqCodewords = 256

  /** Default refine shortlist for [[ivfPqSearchRefined]] — the measured
    * knee (see the table above): 200-deep exact rerank restores the
    * coarse index's recall at the shipping codec, while full-vector
    * reads stay |Q|·200 — the corpus scan is still codes-only.
    */
  val PqRefine = 200

  /** Corpus-clamped refine depth — the plan-time derivation the
    * adaptive geometry constants (nlist, nProbe) already follow (r19,
    * verdict task 4). Two regimes:
    *
    *  - large corpora: the knee is ABSOLUTE — PqRefine = 200 was
    *    measured at 100× (200k vectors, table above) and the rerank
    *    cost |Q|·depth full-vector reads is independent of n, so the
    *    depth does not grow with the corpus (at 200k vectors n/10 =
    *    20k ≫ 200; PqRefine binds).
    *  - small corpora: a 200-deep shortlist is a large corpus fraction
    *    (40% at the sf0.01 gate's 500 vectors), so clamp to n/10 — the
    *    shortlist stays a shortlist and the rerank stays an order
    *    cheaper than brute force. MEASURED HARMLESS at both gate
    *    scales via the oracle replica: sf0.01 (500 vecs) reads 27/30
    *    recall at depth 50 AND 200; sf0.1 (2000 vecs) reads 28/30 at
    *    depth 50 AND 200 — both equal to the coarse-only ceiling, so
    *    the clamp costs nothing where it binds. (Depth only helps
    *    monotonically — the rerank is exact cosine — so the knee is
    *    about not paying for depth past the ceiling.)
    *
    * Floor at k: the rerank must at least fill the head it returns.
    */
  def refineDepth(n: Long, k: Int = 3): Int =
    math.max(k, math.min(PqRefine.toLong, n / 10L).toInt)

  /** [[ivfPqSearch]] with the production REFINE stage (FAISS's
    * IndexRefineFlat composition): the code-only ADC scan produces a
    * `shortlist`-deep candidate head per query, then ONLY those
    * candidates' full vectors are read back for an exact cosine rerank.
    * This is the standard cure for PQ's resolution ceiling — measured at
    * 100× (PqCodecBench): raw ADC recall@3 SATURATES at 0.41–0.58
    * regardless of codec bytes (the reconstruction error swamps the
    * sim gaps between close neighbors), while the refined composition
    * recovers the coarse index's recall at shortlist depths the scan
    * cost barely notices. Scale shape: the bulk scan reads 4–8 byte
    * codes; full vectors are fetched for |Q|·shortlist rows only — an
    * id-equi-join against the corpus, broadcast on the query side.
    */
  def ivfPqSearchRefined(embs: DataFrame, id: Column, emb: Column,
      cents: DataFrame, codebook: DataFrame, queryPred: Column,
      nProbe: Int = 2, k: Int = 3, nSub: Int = PqSub, subDim: Int = PqSubDim,
      shortlist: Int = PqRefine): DataFrame = {
    val p = prepared(embs, id, emb)
    val shortl = ivfPqSearch(embs, id, emb, cents, codebook, queryPred,
        nProbe, shortlist, nSub, subDim)
      .select(col("query_id"), col("neighbor_id"))
    val q = p.filter(queryPred)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("nrm").as("qn"))
    // Gather the shortlist's full vectors by STREAMING the corpus against
    // a broadcast hash of the |Q|·depth two-column shortlist (r19 left
    // the build side to the planner, which hash-built the prepared CORPUS
    // — a corpus-sized broadcast relation, the exact thing that cannot
    // scale; the shortlist side is the one with the engine-known bound).
    // The query vectors attach from the second, |Q|-row broadcast.
    val reranked = p
      .select(col("vec_id").as("neighbor_id"), col("v"), col("nrm"))
      .join(broadcast(shortl), Seq("neighbor_id"))
      .join(broadcast(q), Seq("query_id"))
      .withColumn("sim", cosineQ(col("qv"), col("qn"), col("v"), col("nrm")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    reranked.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"),
        col("rank").cast("long").as("rank"), col("sim"))
  }

  /** Prepared rows in centroid form (centroid_id, cv, cn) — the ONE
    * definition of the centroid-table schema.
    */
  private def toCentroids(p: DataFrame): DataFrame =
    p.select(col("vec_id").as("centroid_id"), col("v").as("cv"), col("nrm").as("cn"))

  /** Seed centroid table: corpus rows selected by a deterministic
    * predicate, in centroid form (centroid_id, cv, cn).
    */
  def seedCentroids(embs: DataFrame, id: Column, emb: Column, pred: Column): DataFrame =
    toCentroids(prepared(embs, id, emb).filter(pred))

  /** Nearest-centroid argmax of prepared rows against a centroid table —
    * broadcast the centroids, collapse the |corpus|×k scored rows map-side
    * via a partial-aggregatable min-struct (a window would shuffle all of
    * them).
    */
  def assignTo(p: DataFrame, cents: DataFrame): DataFrame =
    p.crossJoin(broadcast(cents))
      .withColumn("sim", cosineQ(col("v"), col("nrm"), col("cv"), col("cn")))
      .groupBy(col("vec_id"))
      .agg(min(struct(negate(col("sim")).as("ns"), col("centroid_id").as("centroid_id"),
        col("sim").as("sim"))).as("m"))
      .select(col("vec_id"), col("m.centroid_id").as("centroid_id"), col("m.sim").as("sim"))

  /** IVF coarse assignment against a centroid table. */
  def ivfAssign(embs: DataFrame, id: Column, emb: Column, cents: DataFrame): DataFrame =
    assignTo(prepared(embs, id, emb), cents)

  /** Lloyd's k-means training as DataFrame aggregations, fully
    * deterministic: seeds from `seedPred`, a fixed number of iterations,
    * centroid updates on the integer-quantized grid (component =
    * round(mean) of the assigned quantized components — exact integer
    * sums, one rounded division), cosine assignment with the same
    * argmax tie-break as [[assignTo]]. A cluster that loses all members
    * drops out (k shrinks), identically in both engines.
    *
    * Scale shape per iteration: one broadcast-assign pass over the corpus
    * (map-side argmax), then a posexplode to (centroid_id, dim) — dim×
    * rows, but collapsing map-side into k·dim partial sums before the one
    * exchange. `localCheckpoint` cuts the per-iteration lineage so T
    * iterations don't nest T cross-joins in one plan.
    */
  def kmeansTrain(embs: DataFrame, id: Column, emb: Column, seedPred: Column,
      iters: Int = 2): DataFrame = {
    val p = prepared(embs, id, emb).localCheckpoint()
    val seed = toCentroids(p.filter(seedPred))
    (1 to iters).foldLeft(seed) { (cents, _) =>
      val asg = assignTo(p, cents).select(col("vec_id"), col("centroid_id"))
      val sums = asg.join(p, Seq("vec_id"))
        .select(col("centroid_id"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy(col("centroid_id"), col("pos"))
        .agg(sum(col("x")).as("sx"), count(lit(1)).as("n"))
        .withColumn("cx", round(col("sx").cast("double") / col("n")).cast("long"))
      sums.groupBy(col("centroid_id"))
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("cx")))),
          s => s.getField("cx")).as("cv"))
        .withColumn("cn", sqNorm(col("cv")))
        // a centroid that re-centers to the zero vector would score NaN
        // cosine against everything — and Spark's min-struct argmax ranks
        // NaN last while SQL ORDER BY DESC ranks it first. Degenerate
        // clusters die instead (k shrinks), identically in both engines.
        .filter(col("cn") > 0)
        .localCheckpoint()
    }
  }
}
