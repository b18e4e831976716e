package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Similarity

/** Similarity-search queries over `embeddings`, with exact DuckDB oracles
  * built on the same quantized-integer cosine (see [[Similarity]]).
  */
object VectorOps {

  private def embs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "embeddings")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Exact baseline: brute-force top-5 for the 10 lowest-id query vectors.
    "sim_knn_brute" -> ((s, dir) =>
      Similarity.knnBrute(embs(s, dir), col("vec_id"), col("embedding"),
        col("vec_id") < 10, k = 5)),

    // Dimension pruning (matryoshka-style truncation eval): rank the 64
    // dimensions by corpus variance (n·Σx² − (Σx)², BIGINT-exact), keep
    // the top 16, and attest the pruned cosine's top-5 recall against the
    // full cosine per probe. The variance pass is one map-side-mergeable
    // aggregate to a 64-row table; the 16 chosen dims are a bounded
    // driver read inlined as projection literals, so the pruned corpus
    // pass is a pure codegen'd projection — the 4× scan-width/FLOP cut a
    // production deployment actually banks. Probes broadcast as in
    // sim_knn_brute.
    "sim_dim_prune" -> ((s, dir) => {
      val p = Similarity.prepared(embs(s, dir), col("vec_id"), col("embedding"))
      val comps = p.select(col("vec_id"), posexplode(col("v")).as(Seq("i", "x")))
      val topDims = comps.groupBy(col("i"))
        .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
          sum(col("x") * col("x")).as("sxx"))
        .select(col("i"), (col("n") * col("sxx") - col("sx") * col("sx")).as("varn"))
        .orderBy(col("varn").desc, col("i").asc).limit(16)
        .select(col("i")).collect().map(_.getInt(0)).sorted // |dims| = 16, bounded
      def pruneV(v: Column): Column =
        array(topDims.map(d => element_at(v, d + 1)): _*)
      val pp = p.select(col("vec_id"), pruneV(col("v")).as("pv"))
        .withColumn("pnrm", Similarity.sqNorm(col("pv")))
      val q = broadcast(pp.filter(col("vec_id") < 10)
        .select(col("vec_id").as("query_id"), col("pv").as("qv"), col("pnrm").as("qn")))
      val wP = Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("vec_id"))
      val prunedTop = q.join(pp, col("query_id") =!= col("vec_id"))
        .withColumn("sim", Similarity.cosineQ(col("qv"), col("qn"), col("pv"), col("pnrm")))
        .withColumn("rank", row_number().over(wP))
        .filter(col("rank") <= 5).select(col("query_id"), col("vec_id"))
      val fullTop = Similarity.knnBrute(embs(s, dir), col("vec_id"),
          col("embedding"), col("vec_id") < 10, k = 5)
        .select(col("query_id"), col("neighbor_id").as("vec_id"))
      fullTop.join(prunedTop.withColumn("hit", lit(1L)),
          Seq("query_id", "vec_id"), "left_outer")
        .groupBy(col("query_id"))
        .agg(count(lit(1)).as("n_true"),
          coalesce(sum(col("hit")), lit(0L)).as("n_overlap"))
    }),

    // Diversified rerank (MMR, λ = 0.5) of the cosine top-20 for the
    // fixed query vector: the retrieval head reranked so near-duplicate
    // hits don't crowd the top-5 (Carbonell–Goldstein). One corpus scan
    // ends in a distributed TakeOrdered; the 20-row head reranks on the
    // driver with the same integer-quantized cosine.
    "sim_mmr" -> ((s, dir) =>
      Similarity.mmrRerank(embs(s, dir), col("vec_id"), col("embedding"))),

    // Embedding-cosine near-dup: same-label blocking, threshold 0.4.
    "sim_threshold_pairs" -> ((s, dir) =>
      Similarity.thresholdPairs(embs(s, dir), col("vec_id"), col("embedding"),
        col("label"), threshold = 0.4)),

    // Scale path: random-hyperplane LSH buckets, top-1 within bucket.
    "sim_ann_lsh" -> ((s, dir) =>
      Similarity.annLshTop1(embs(s, dir), col("vec_id"), col("embedding"))),

    // SQ8 storage codes: per-vector 8-bit affine quantization (4x smaller
    // inverted lists — the standard IVF+SQ8 pairing). Digested codes plus
    // the affine params the decoder needs.
    "sim_sq8" -> ((s, dir) =>
      embs(s, dir).select(col("vec_id"),
        array_min(col("embedding")).cast("double").as("qmin"),
        array_max(col("embedding")).cast("double").as("qmax"),
        Similarity.sq8Encode(col("embedding")).as("q"))
        .select(col("vec_id"), col("qmin"), col("qmax"),
          aggregate(col("q"), lit(0L), (a, x) => a + x).as("q_sum"),
          md5(encode(concat_ws(",",
            transform(col("q"), x => x.cast("string"))), "UTF-8")).as("q_md5"))),

    // SemDeDup-style semantic dedup: the trained k-means clusters are the
    // blocking key (not a data label, not an LSH heuristic — the learned
    // partition of embedding space), near-dup pairs only within a
    // cluster. At corpus scale this is the standard "cluster then
    // pairwise within cluster" shape: candidate generation is an
    // equi-join on centroid_id with the maxBlock quadratic guard.
    "dedup_semantic" -> ((s, dir) => {
      val e = embs(s, dir)
      val cents = Similarity.kmeansTrain(e, col("vec_id"), col("embedding"),
        col("vec_id") < 8, iters = KmeansIters)
      // checkpoint the clustered corpus once: the threshold self-join
      // otherwise duplicates the whole assignment subtree (2 extra full
      // corpus scans per side); at cluster scale this would be a persist
      // of the thin (id, cluster, vector) projection
      val withCluster = e.join(
        Similarity.ivfAssign(e, col("vec_id"), col("embedding"), cents)
          .select(col("vec_id"), col("centroid_id")),
        Seq("vec_id"))
        .localCheckpoint()
      Similarity.thresholdPairs(withCluster, col("vec_id"), col("embedding"),
        col("centroid_id"), threshold = 0.4)
    }),

    // Product quantization, the ANN storage/search companion past SQ8:
    // PqSub subspaces x PqSubDim dims, up-to-PqCodewords codebooks per
    // subspace (2 Lloyd's iterations under exact integer L2, seeds = the
    // PqCodewords lowest-id vectors' subvectors — a smaller corpus seeds
    // fewer, gracefully); each vector compresses to PqSub codes. The
    // geometry constants carry the r18 measured table (see
    // [[Similarity.PqSub]]).
    "sim_pq_encode" -> ((s, dir) => {
      val e = embs(s, dir)
      val cb = Similarity.pqTrain(e, col("vec_id"), col("embedding"),
        col("vec_id") < Similarity.PqCodewords)
      val coded = Similarity.pqEncode(e, col("vec_id"), col("embedding"), cb)
      coded.select(col("vec_id") +:
        (0 until Similarity.PqSub).map(m => col("codes")(m).as(s"c$m")): _*)
    }),

    // ADC search over the PQ codes: per-query subspace distance LUT
    // (broadcast), corpus moves through one (m, code) equi-join + integer
    // sum — after encoding, the scan never touches a full vector again.
    "sim_pq_adc" -> ((s, dir) => {
      val e = embs(s, dir)
      val cb = Similarity.pqTrain(e, col("vec_id"), col("embedding"),
        col("vec_id") < Similarity.PqCodewords)
      Similarity.pqAdcSearch(e, col("vec_id"), col("embedding"), cb,
        col("vec_id") < 10)
    }),

    // IVF coarse quantizer: k-means-trained centroids (2 Lloyd's
    // iterations from the 8 lowest-id seeds), nearest-centroid histogram.
    "sim_ivf_assign" -> ((s, dir) => {
      val e = embs(s, dir)
      val cents = Similarity.kmeansTrain(e, col("vec_id"), col("embedding"),
        col("vec_id") < 8, iters = KmeansIters)
      Similarity.ivfAssign(e, col("vec_id"), col("embedding"), cents)
        .groupBy(col("centroid_id"))
        .agg(count(lit(1)).as("n_assigned"))
    }),

    // IVF search on the trained centroids: probe the 2 nearest, top-3
    // within the probed inverted lists.
    "sim_ivf_search" -> ((s, dir) => {
      val e = embs(s, dir)
      val cents = Similarity.kmeansTrain(e, col("vec_id"), col("embedding"),
        col("vec_id") < 8, iters = KmeansIters)
      Similarity.ivfSearch(e, col("vec_id"), col("embedding"),
        cents, queryPred = col("vec_id") < 10)
    }),

    // SELF-TUNED IVF: the inverted-list count derives from the corpus
    // count at plan time (`Similarity.adaptiveLists`: power-of-two
    // ceiling of √n, the published IVF sizing rule) instead of the fixed
    // 8 the hand-sized harness trains — sf0.01 resolves 32 lists, sf0.1
    // 64, the 100× corpus 512, holding per-query probe volume ~2√n as
    // the corpus grows (IvfProbeBench measures the 100× effect: 9.2×
    // faster search over prebuilt lists for 1.9× the one-time build). Same k-means, same seeds-by-derived-count, same
    // probe/top-k as sim_ivf_search; the oracle re-derives nlist from
    // its own COUNT(*) and seeds identically, so the gate proves the
    // formula through the whole train → assign → probe pipeline.
    "sim_ivf_adaptive" -> ((s, dir) => {
      // one materialized scan feeds the count job, the training, and
      // both probe sides (the count is what a production run reads from
      // catalog statistics). nProbe derives WITH nlist since r17
      // (`Similarity.adaptiveProbes`: po2 ceiling of nlist^(1/3), the
      // measured recall/cost knee) — both knobs re-derived by the oracle.
      val e = embs(s, dir).localCheckpoint()
      val nlist = Similarity.adaptiveLists(e.count())
      val nProbe = Similarity.adaptiveProbes(nlist)
      val cents = Similarity.kmeansTrain(e, col("vec_id"), col("embedding"),
        col("vec_id") < nlist, iters = KmeansIters)
      Similarity.ivfSearch(e, col("vec_id"), col("embedding"),
          cents, queryPred = col("vec_id") < 10, nProbe = nProbe)
        .withColumn("nlist", lit(nlist.toLong))
        .withColumn("n_probe", lit(nProbe.toLong))
    }),

    // RECALL AT THE ADAPTIVE GEOMETRY (r16 verdict task 1): the recall
    // eval `sim_ivf_recall` runs on the fixed-(8, 2) index, so the
    // self-tuned (nlist, nProbe) pair shipped unpriced in recall. This
    // gate grades the DERIVED geometry — nlist from COUNT(*), nProbe
    // from nlist, both re-derived independently by the oracle — against
    // the exact brute-force top-3, the same integer (n_exact, n_hit)
    // contract as sim_ivf_recall. The 100× recall curve behind the
    // derivation (adaptive 0.993-0.996 recall@3 vs fixed-geometry
    // 0.689) is IvfProbeBench's measured artifact; this gate pins the
    // formula + plumbing at the sf scales.
    "sim_ivf_adaptive_recall" -> ((s, dir) => {
      val e = embs(s, dir).localCheckpoint()
      val nlist = Similarity.adaptiveLists(e.count())
      val nProbe = Similarity.adaptiveProbes(nlist)
      val cents = Similarity.kmeansTrain(e, col("vec_id"), col("embedding"),
        col("vec_id") < nlist, iters = KmeansIters)
      val ivf = Similarity.ivfSearch(e, col("vec_id"), col("embedding"),
        cents, queryPred = col("vec_id") < 10, nProbe = nProbe)
        .select(col("query_id"), col("neighbor_id"))
      val exact = Similarity.knnBrute(e, col("vec_id"), col("embedding"),
        col("vec_id") < 10, k = 3)
        .select(col("query_id"), col("neighbor_id"))
      recallGrade(exact, ivf)
        .withColumn("nlist", lit(nlist.toLong))
        .withColumn("n_probe", lit(nProbe.toLong))
    }),

    // CDC-DRIVEN INDEX SYNC — the cross-pillar composition a production
    // Mongo→vector-store pipeline runs: the operational DB's change feed
    // (here a deterministic derivation: every vector inserted at t1,
    // vec_id % 7 == 0 updated to a rotated embedding at t2,
    // vec_id % 11 == 0 deleted at t3 — delete beats update) MAINTAINS
    // the standing IVF index instead of rebuilding it: deleted and
    // stale-version rows anti-join out of the persisted lists, new
    // versions assign to the STANDING centroids in one broadcast pass —
    // O(changed vectors), never O(corpus). The gated output is a search
    // over the MAINTAINED lists; the oracle searches an index rebuilt
    // from the folded final state — so the gate proves maintenance ≡
    // rebuild, row for row (SimilaritySpec pins list-level equality too).
    "cdc_vector_sync" -> ((s, dir) => {
      val e = embs(s, dir)
      val isUpd = col("vec_id") % 7 === 0
      val isDel = col("vec_id") % 11 === 0
      def rot(c: org.apache.spark.sql.Column) =
        concat(slice(c, lit(2), size(c) - 1), slice(c, lit(1), lit(1)))
      val cents = Similarity.kmeansTrain(e, col("vec_id"), col("embedding"),
        col("vec_id") < 8, iters = KmeansIters).localCheckpoint()
      // the standing index after the initial load (the persisted artifact)
      val baseLists = Similarity.ivfLists(e, col("vec_id"), col("embedding"),
        cents).localCheckpoint()
      val changed = e.filter(isUpd || isDel).select(col("vec_id"))
      val newVersions = e.filter(isUpd && !isDel)
        .select(col("vec_id"), rot(col("embedding")).as("embedding"))
      val maintained = baseLists.join(changed, Seq("vec_id"), "left_anti")
        .unionByName(Similarity.ivfLists(newVersions, col("vec_id"),
          col("embedding"), cents))
      val finalState = e.filter(!isDel)
        .select(col("vec_id"),
          when(isUpd, rot(col("embedding"))).otherwise(col("embedding"))
            .as("embedding"))
      Similarity.ivfSearchOnLists(finalState, col("vec_id"), col("embedding"),
        cents, col("vec_id") < 10, maintained)
    }),

    // HOT-LIST SPLITTING — the skew-management move of a live IVF index
    // (the vector-side sibling of cdc_rebucket): duplicated/boilerplate
    // content piles one inverted list far past the mean, and every query
    // probing that centroid scans the pile. Split = local 2-means over
    // ONLY the hottest list's members (seeds: its two lowest ids, same
    // integer grid as the global training), children replace the parent
    // in a disjoint id space (1e6 + seed id), members reassign within
    // the subtree, and EVERY OTHER LIST IS UNTOUCHED by construction —
    // the rebalance touches O(hot list), never O(corpus). Output: the
    // post-split occupancy table. Driver-side: a 1-row argmax + a 2-row
    // seed head, both bounded.
    "sim_ivf_split" -> ((s, dir) => {
      import s.implicits._
      val e = embs(s, dir)
      val cents = Similarity.kmeansTrain(e, col("vec_id"), col("embedding"),
        col("vec_id") < 8, iters = KmeansIters).localCheckpoint()
      val asg = Similarity.ivfAssign(e, col("vec_id"), col("embedding"), cents)
        .select(col("vec_id"), col("centroid_id")).localCheckpoint()
      val hotId = asg.groupBy(col("centroid_id")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("centroid_id")).limit(1)
        .head().getLong(0)
      val m = e.join(asg.filter(col("centroid_id") === lit(hotId))
        .select("vec_id"), Seq("vec_id")).localCheckpoint()
      val seeds = m.select(col("vec_id")).orderBy(col("vec_id")).limit(2)
        .as[Long].collect()
      val kids = Similarity.kmeansTrain(m, col("vec_id"), col("embedding"),
        col("vec_id").isin(seeds.map(Long.box): _*), iters = KmeansIters)
        .localCheckpoint()
      val reasg = Similarity.ivfAssign(m, col("vec_id"), col("embedding"), kids)
        .select(col("vec_id"), (col("centroid_id") + lit(1000000L)).as("centroid_id"))
      asg.filter(col("centroid_id") =!= lit(hotId))
        .unionByName(reasg)
        .groupBy(col("centroid_id")).agg(count(lit(1)).as("n_assigned"))
    }),

    // INCREMENTAL index maintenance — the ADD path every growing vector
    // deployment runs between retrains: the increment (vec_id % 5 == 0)
    // is assigned to the STANDING base-trained centroids and its rows
    // append to the inverted lists (base lists untouched, nothing
    // retrained, nothing reassigned); a full retrain over base+increment
    // is built alongside, and both indexes answer the same probe set
    // against the exact brute-force truth. The output is the measured
    // recall cost of deferring the retrain — per query, hits@3 from the
    // stale-centroid index vs the retrained one. Scale shape: the add is
    // ONE broadcast-assign pass over the increment (the base corpus is
    // never rescanned); both search arms are the audited one-probe-join.
    "sim_ivf_incremental" -> ((s, dir) => {
      val e = embs(s, dir)
      val isIncr = col("vec_id") % 5 === 0
      val base = e.filter(!isIncr)
      val bc = Similarity.kmeansTrain(base, col("vec_id"), col("embedding"),
        col("vec_id") < 8, iters = KmeansIters).localCheckpoint()
      // The lists ARE the stored index artifact (base lists persisted,
      // the add appended) — the lineage cut mirrors that storage boundary.
      val lists = Similarity.ivfLists(base, col("vec_id"), col("embedding"), bc)
        .unionByName(Similarity.ivfLists(e.filter(isIncr), col("vec_id"),
          col("embedding"), bc))
        .localCheckpoint()
      val incr = Similarity.ivfSearchOnLists(e, col("vec_id"), col("embedding"),
        bc, col("vec_id") < 10, lists)
      val fc = Similarity.kmeansTrain(e, col("vec_id"), col("embedding"),
        col("vec_id") < 8, iters = KmeansIters).localCheckpoint()
      val retr = Similarity.ivfSearch(e, col("vec_id"), col("embedding"), fc,
        col("vec_id") < 10)
      val exact = Similarity.knnBrute(e, col("vec_id"), col("embedding"),
        col("vec_id") < 10, k = 3)
      exact.select(col("query_id"), col("neighbor_id"))
        .join(incr.select(col("query_id"), col("neighbor_id"))
          .withColumn("hi", lit(1L)), Seq("query_id", "neighbor_id"), "left_outer")
        .join(retr.select(col("query_id"), col("neighbor_id"))
          .withColumn("hr", lit(1L)), Seq("query_id", "neighbor_id"), "left_outer")
        .groupBy(col("query_id"))
        .agg(count(lit(1)).as("n_exact"),
          sum(coalesce(col("hi"), lit(0L))).as("hits_incr"),
          sum(coalesce(col("hr"), lit(0L))).as("hits_retrain"))
    }),

    // FILTERED vector search — the metadata-predicate ANN every vector
    // store ships (WHERE label is even AND nearest-k): the predicate
    // pre-filters the INVERTED LISTS, never the k-row head — post-
    // filtering a head under-fills results wherever the predicate is
    // selective (here it halves the corpus, so a post-filter would
    // return ~1.5 of 3 asked-for neighbors). Same one-probe-join shape
    // as sim_ivf_search; at scale the label predicate pushes into the
    // list scan as a partition/zone filter.
    "sim_filtered_search" -> ((s, dir) => {
      val e = embs(s, dir)
      val cents = Similarity.kmeansTrain(e, col("vec_id"), col("embedding"),
        col("vec_id") < 8, iters = KmeansIters)
      Similarity.ivfSearch(e, col("vec_id"), col("embedding"),
        cents, queryPred = col("vec_id") < 10,
        corpusPred = pmod(col("label"), lit(2)) === 0)
    }),

    // Recall@k CURVE (k = 1..10) — the full tuning plot an ANN
    // deployment reads, not one recall point: a hit at (query,
    // neighbor) counts toward every k ≥ max(exact rank, IVF rank)
    // (the standard top-k∩top-k definition), so one join of the two
    // 10-row heads plus a bounded explode yields the whole curve.
    // Integer outputs (n_hits, n_possible = k·|queries|) keep the gate
    // engine-exact; recall is the consumer's quotient. Shape at scale:
    // identical to sim_ivf_recall — ground truth is one brute pass
    // over the PROBE set only.
    "sim_recall_curve" -> ((s, dir) => {
      val e = embs(s, dir)
      val cents = Similarity.kmeansTrain(e, col("vec_id"), col("embedding"),
        col("vec_id") < 8, iters = KmeansIters)
      val exact = Similarity.knnBrute(e, col("vec_id"), col("embedding"),
          col("vec_id") < 10, k = 10)
        .select(col("query_id"), col("neighbor_id"), col("rank").as("erank"))
      val ivf = Similarity.ivfSearch(e, col("vec_id"), col("embedding"), cents,
          queryPred = col("vec_id") < 10, k = 10)
        .select(col("query_id"), col("neighbor_id"), col("rank").as("irank"))
      val nq = e.filter(col("vec_id") < 10).count()
      val hits = exact.join(ivf, Seq("query_id", "neighbor_id"))
        .select(greatest(col("erank"), col("irank")).as("mk"))
        .select(explode(sequence(col("mk"), lit(10L))).as("k"))
        .groupBy(col("k")).agg(count(lit(1)).as("n_hits"))
      s.range(1, 11).select(col("id").as("k"))
        .join(hits, Seq("k"), "left_outer")
        .select(col("k"), coalesce(col("n_hits"), lit(0L)).as("n_hits"),
          (col("k") * nq).as("n_possible"))
    }),

    // SEMANTIC decontamination: flag every train vector within cosine
    // 0.35 of ANY eval-set probe (eval = vec_id % 25 == 0, train = the
    // rest) — the embedding-level analogue of text_contamination's
    // n-gram overlap, catching paraphrased eval leakage a literal
    // n-gram match misses. Built on ivfRange (threshold over the probed
    // inverted lists, NOT a top-k head — a k-head would silently keep
    // contaminated docs past rank k). One window over the hit set
    // yields the per-train-doc verdict: hit count, worst (most similar)
    // eval probe, and its similarity. Shape at 100 TB: eval probes are
    // thousands, the corpus is the 100 TB side — probes broadcast into
    // the list scan and only genuinely-near pairs survive to the window.
    "sim_decontam" -> ((s, dir) => {
      val e = embs(s, dir)
      val cents = Similarity.kmeansTrain(e, col("vec_id"), col("embedding"),
        col("vec_id") < 8, iters = KmeansIters)
      val hits = Similarity.ivfRange(e, col("vec_id"), col("embedding"),
        cents, queryPred = pmod(col("vec_id"), lit(25)) === 0, threshold = 0.35,
        corpusPred = pmod(col("vec_id"), lit(25)) =!= 0)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("vec_id")).orderBy(col("sim").desc, col("query_id"))
      hits
        .withColumn("rn", row_number().over(w))
        .withColumn("n_eval_hits", count(lit(1)).over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("vec_id"))))
        .filter(col("rn") === 1)
        .select(col("vec_id").as("doc_id"), col("n_eval_hits"),
          col("query_id").as("eval_id"), col("sim"))
    }),

    // ANN quality evaluation: recall@3 of the IVF(nprobe = 2) head
    // against the exact brute-force top-3 ground truth, per probe query
    // — the measurement an ANN deployment is tuned by (nprobe/k trade
    // recall for scan fraction). Integer outputs (n_exact, n_hit) so
    // the gate is engine-exact; recall is the consumer's quotient.
    // Shape at scale: ground truth is one brute pass over the probe
    // set (the eval runs on a sampled query set, never the corpus) and
    // the comparison is one left join on the two k-row heads.
    "sim_ivf_recall" -> ((s, dir) => {
      val e = embs(s, dir)
      val cents = Similarity.kmeansTrain(e, col("vec_id"), col("embedding"),
        col("vec_id") < 8, iters = KmeansIters)
      val ivf = Similarity.ivfSearch(e, col("vec_id"), col("embedding"),
        cents, queryPred = col("vec_id") < 10)
        .select(col("query_id"), col("neighbor_id"))
      val exact = Similarity.knnBrute(e, col("vec_id"), col("embedding"),
        col("vec_id") < 10, k = 3)
        .select(col("query_id"), col("neighbor_id"))
      recallGrade(exact, ivf)
    }),

    // Recall@3 of the combined IVF-PQ path against the exact brute-force
    // ground truth — the end-of-pipeline eval that closes the ANN eval
    // triangle (sim_ivf_recall grades the coarse index alone,
    // sim_quant_error grades the codec alone; this grades their
    // composition, where coarse-probe misses AND 4-byte ADC ranking
    // errors both cost recall). Same bounded shape: ground truth is one
    // brute pass over the 10-probe set, the comparison one left join of
    // two k-row heads.
    "sim_ivfpq_recall" -> ((s, dir) => {
      val e = embs(s, dir)
      val cents = Similarity.kmeansTrain(e, col("vec_id"), col("embedding"),
        col("vec_id") < 8, iters = KmeansIters)
      val cb = Similarity.pqTrain(e, col("vec_id"), col("embedding"),
        col("vec_id") < Similarity.PqCodewords)
      val adc = Similarity.ivfPqSearch(e, col("vec_id"), col("embedding"),
        cents, cb, queryPred = col("vec_id") < 10)
        .select(col("query_id"), col("neighbor_id"))
      val exact = Similarity.knnBrute(e, col("vec_id"), col("embedding"),
        col("vec_id") < 10, k = 3)
        .select(col("query_id"), col("neighbor_id"))
      recallGrade(exact, adc)
    }),

    // The IVF-PQ composition at the ADAPTIVE geometry, WITH the
    // production refine stage (r18, verdict task 2): the coarse
    // quantizer derives (nlist, nProbe) like sim_ivf_adaptive_recall,
    // the code-only ADC scan yields a PqRefine-deep shortlist, and the
    // true top-3 come from an exact cosine rerank of only that
    // shortlist. This is the composition that ships — the r17 gate
    // graded the RAW ADC head and read 9/30, which PqCodecBench showed
    // to be a codec-resolution ceiling no byte budget fixes (recall
    // saturates 0.41–0.58 at 2–16 B/vec); sim_ivfpq_recall still pins
    // the raw ADC math, this gate grades what a user gets.
    "sim_ivfpq_adaptive_recall" -> ((s, dir) => {
      val e = embs(s, dir).localCheckpoint()
      val nlist = Similarity.adaptiveLists(e.count())
      val nProbe = Similarity.adaptiveProbes(nlist)
      val cents = Similarity.kmeansTrain(e, col("vec_id"), col("embedding"),
        col("vec_id") < nlist, iters = KmeansIters)
      val cb = Similarity.pqTrain(e, col("vec_id"), col("embedding"),
        col("vec_id") < Similarity.PqCodewords)
      val adc = Similarity.ivfPqSearchRefined(e, col("vec_id"), col("embedding"),
        cents, cb, queryPred = col("vec_id") < 10, nProbe = nProbe,
        shortlist = Similarity.refineDepth(e.count()))
        .select(col("query_id"), col("neighbor_id"))
      val exact = Similarity.knnBrute(e, col("vec_id"), col("embedding"),
        col("vec_id") < 10, k = 3)
        .select(col("query_id"), col("neighbor_id"))
      recallGrade(exact, adc)
        .withColumn("nlist", lit(nlist.toLong))
        .withColumn("n_probe", lit(nProbe.toLong))
    }),

    // Clustering-quality report — the diagnostic that decides whether an
    // IVF index needs retraining or more centroids: per-cluster member
    // count and inertia (summed squared L2 distance to the assigned
    // centroid on the integer grid: ‖v‖² + ‖c‖² − 2·v·c, all BIGINT so
    // the gate is engine-exact). Unbalanced lists or high inertia mean
    // the coarse quantizer is mis-sized. Scale shape: the assignment is
    // the same broadcast map-side argmax the IVF path uses; the report
    // collapses to k rows via partial aggregation — one corpus scan.
    "sim_kmeans_quality" -> ((s, dir) => {
      val e = embs(s, dir)
      val p = Similarity.prepared(e, col("vec_id"), col("embedding")).localCheckpoint()
      val cents = Similarity.kmeansTrain(e, col("vec_id"), col("embedding"),
        col("vec_id") < 8, iters = KmeansIters)
      Similarity.assignTo(p, cents).select(col("vec_id"), col("centroid_id"))
        .join(p, Seq("vec_id"))
        .join(broadcast(cents), Seq("centroid_id"))
        .withColumn("dist2",
          col("nrm") + col("cn") - lit(2L) * Similarity.dotQ(col("v"), col("cv")))
        .groupBy(col("centroid_id"))
        .agg(count(lit(1)).as("n_members"), sum(col("dist2")).as("inertia"),
          min(col("vec_id")).as("min_member"), max(col("vec_id")).as("max_member"))
    }),

    // Quantization-error report — the metric that picks the codec: total
    // and per-vector squared reconstruction error of SQ8 (per-vector
    // affine, 64 bytes) vs PQ (trained codebooks, 4 bytes), on the same
    // integer grid the cosine pipeline uses. The PQ error is exactly the
    // assignment distance pqAssign already computes; the SQ8 error
    // decodes each byte back through the affine map. Both collapse
    // map-side to two integer sums — an eval pass costs one corpus scan
    // per codec at any scale.
    "sim_quant_error" -> ((s, dir) => {
      val e = embs(s, dir)
      val p = Similarity.prepared(e, col("vec_id"), col("embedding"))
      val nVec = e.count()
      // SQ8: vhat_int = round((qmin + q*(qmax-qmin)/255)*1000) on the
      // same milli-integer grid as prepared's v
      val sq8 = e.select(col("vec_id"),
          array_min(col("embedding")).cast("double").as("qmin"),
          array_max(col("embedding")).cast("double").as("qmax"),
          Similarity.sq8Encode(col("embedding")).as("q"))
        .join(p.select(col("vec_id"), col("v")), Seq("vec_id"))
        .select(aggregate(zip_with(col("v"),
          transform(col("q"), q =>
            round((col("qmin") + q.cast("double") *
              (col("qmax") - col("qmin")) / lit(255.0)) * lit(1000.0))
              .cast("long")),
          (x, xhat) => (x - xhat) * (x - xhat)), lit(0L), (a, x) => a + x).as("err"))
        .agg(sum(col("err")).as("total_sqerr"))
        .select(lit("sq8").as("method"), col("total_sqerr"))
      val cb = Similarity.pqTrain(e, col("vec_id"), col("embedding"),
        col("vec_id") < Similarity.PqCodewords)
      val pq = Similarity.pqAssign(Similarity.pqSubvectors(p), cb)
        .agg(sum(col("d")).as("total_sqerr"))
        .select(lit("pq").as("method"), col("total_sqerr"))
      sq8.unionByName(pq)
        .withColumn("mean_sqerr",
          round(col("total_sqerr").cast("double") / lit(nVec.toDouble), 4))
    }),

    // IVF-PQ combined search — the billion-scale index layout (coarse
    // quantizer prunes to nProbe inverted lists, cosine-ADC over 8-byte
    // PQ codes shortlists the survivors, exact cosine reranks ONLY the
    // shortlist): the REFINED composition is the named search surface
    // (r19, verdict task 2 — the raw-ADC head this query used to
    // demonstrate has a measured recall ceiling of ~0.43 that no codec
    // byte budget fixes; PqCodecBench proved the refine stage is the
    // cure, and `sim_ivfpq_recall` still pins the raw ADC math). The
    // oracle replays the identical pipeline — trained centroids,
    // trained codebooks, probe selection, candidate pruning, integer
    // ADC shortlist, exact integer-cosine rerank — so a drift anywhere
    // in the composed index math hash-diverges.
    "sim_ivfpq" -> ((s, dir) => {
      val e = embs(s, dir)
      val cents = Similarity.kmeansTrain(e, col("vec_id"), col("embedding"),
        col("vec_id") < 8, iters = KmeansIters)
      val cb = Similarity.pqTrain(e, col("vec_id"), col("embedding"),
        col("vec_id") < Similarity.PqCodewords)
      Similarity.ivfPqSearchRefined(e, col("vec_id"), col("embedding"), cents, cb,
        queryPred = col("vec_id") < 10,
        shortlist = Similarity.refineDepth(e.count()))
    }),

    // The production train-once shape: ONE k-means run and ONE PQ
    // codebook run, each materialized once (kmeansTrain/pqTrain end in a
    // lineage cut), then THREE consumers read the same trained tables —
    // the coarse-assignment histogram, IVF search, and ADC search. At
    // corpus scale the trained tables are tiny artifacts (k centroids,
    // nSub·k codewords) broadcast to every consumer; training per query
    // (the other sim_* entries train inline for oracle isolation) would
    // re-scan the corpus per use. Sections: assign (per-centroid
    // histogram), ivf (top-3 per probe query), adc (PQ top-3 per query).
    "pipe_ann" -> ((s, dir) => {
      val e = embs(s, dir)
      val idc = col("vec_id")
      val emc = col("embedding")
      val cents = Similarity.kmeansTrain(e, idc, emc, idc < 8, iters = KmeansIters)
      val cb = Similarity.pqTrain(e, idc, emc, idc < Similarity.PqCodewords)
      val hist = Similarity.ivfAssign(e, idc, emc, cents)
        .groupBy(col("centroid_id")).agg(count(lit(1)).as("n"))
        .select(lit("assign").as("section"), col("centroid_id").cast("string").as("a"),
          lit("").as("b"), col("n").as("x"), lit(0L).as("y"), lit(0.0).as("v"))
      val ivf = Similarity.ivfSearch(e, idc, emc, cents, queryPred = idc < 10)
        .select(lit("ivf").as("section"), col("query_id").cast("string").as("a"),
          col("neighbor_id").cast("string").as("b"), col("rank").as("x"),
          lit(0L).as("y"), col("sim").as("v"))
      val adc = Similarity.pqAdcSearch(e, idc, emc, cb, queryPred = idc < 10)
        .select(lit("adc").as("section"), col("query_id").cast("string").as("a"),
          col("neighbor_id").cast("string").as("b"), col("rank").as("x"),
          col("adc").as("y"), lit(0.0).as("v"))
      hist.unionByName(ivf).unionByName(adc)
    }))

  private[operators] val KmeansIters = 2

  // ---- oracle fragments -----------------------------------------------------

  /** Quantized vectors + squared norms, as a CTE over `embeddings`. */
  private[operators] val prepCte: String =
    """prep AS (
         SELECT vec_id, label, v, list_sum([y*y for y in v]) AS nrm
         FROM (SELECT vec_id, label,
                 [CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT) for x in embedding] AS v
               FROM embeddings))"""

  /** The recall-grading contract shared by all four recall gates
    * (fixed/adaptive × IVF/IVF-PQ): per query, exact-head size and how
    * many of its rows the approximate head recovered — integer outputs
    * so the gates are engine-exact; recall is the consumer's quotient.
    */
  private def recallGrade(exact: DataFrame, approx: DataFrame): DataFrame =
    exact
      .join(approx.withColumn("hit", lit(1L)),
        Seq("query_id", "neighbor_id"), "left_outer")
      .groupBy(col("query_id"))
      .agg(count(lit(1)).as("n_exact"),
        coalesce(sum(col("hit")), lit(0L)).as("n_hit"))

  /** The self-tuned IVF geometry, re-derived natively: `nl.nlist` =
    * power-of-two ceiling of √COUNT(*) ([[Similarity.adaptiveLists]]'
    * p*p >= n scan), `npl.np` = power-of-two ceiling of nlist^(1/3)
    * ([[Similarity.adaptiveProbes]]' p*p*p >= nlist scan, floor 4).
    */
  private[operators] val adaptiveGeomCtes: String =
    """nl AS (
         SELECT CAST(COALESCE(MIN(p), 65536) AS BIGINT) AS nlist
         FROM (SELECT CAST(UNNEST([8,16,32,64,128,256,512,1024,2048,4096,
                 8192,16384,32768,65536]) AS BIGINT) AS p),
              (SELECT COUNT(*) AS n FROM prep)
         WHERE p * p >= n),
       npl AS (
         SELECT CAST(COALESCE(MIN(p), 256) AS BIGINT) AS np
         FROM (SELECT CAST(UNNEST([4,8,16,32,64,128,256]) AS BIGINT) AS p), nl
         WHERE p * p * p >= nlist)"""

  /** Deterministic cosine between prepared rows a/b (aliases in scope).
    * Shared with [[TextOps]]'s embedding-cosine dedup oracle so the two
    * stay in lockstep with [[Similarity.cosineQ]].
    */
  private[operators] def simSql(va: String, na: String, vb: String, nb: String): String =
    s"""CAST(list_sum([$va[i] * $vb[i] for i in generate_series(1, len($va))]) AS DOUBLE)
        / sqrt(CAST($na * $nb AS DOUBLE))"""

  /** LSH-bucket CTE chain over a `prep(vec_id, v, ...)` CTE — shared with
    * [[TextOps]]'s embedding-cosine dedup oracle so the bucket formula
    * stays in lockstep with [[Similarity.lshBucketCol]].
    */
  private[operators] val bucketCte: String =
    s"""pe AS (
          SELECT vec_id, i, v[i] AS q, j
          FROM prep, (SELECT unnest(generate_series(1, 64)) AS i),
               (SELECT unnest(generate_series(0, 7)) AS j)),
        dots AS (
          SELECT vec_id, j,
            SUM(CASE WHEN ((1664525 * (j * 64 + (i - 1)) + 1013904223) >> 15) % 2 = 0
                     THEN q ELSE -q END) AS d
          FROM pe GROUP BY 1, 2),
        buck AS (
          SELECT vec_id,
            SUM(CASE WHEN d > 0 THEN (CAST(1 AS BIGINT) << j) ELSE CAST(0 AS BIGINT) END) AS bucket
          FROM dots GROUP BY 1)"""

  /** [[bucketCte]] with the hyperplane count DERIVED from the corpus count
    * in-query (`dedup_embed_adaptive`): planes = max(base, min p with
    * 2^p ≥ ⌈count/targetOcc⌉) — the exact integer mirror of
    * [[graft.functions.Similarity.adaptivePlanes]]. The LCG sign product
    * is cast to BIGINT up front: adaptive plane counts push the flattened
    * index past the 32-bit-safe 511 the fixed 8-plane CTE stays under
    * (DuckDB raises on INTEGER overflow rather than wrapping).
    */
  private[operators] def adaptiveBucketCte(base: Int, targetOcc: Int,
      pfx: String = "", countSrc: String = "prep"): String =
    s"""${pfx}planecnt AS (
          SELECT CAST(GREATEST($base, (
            SELECT MIN(p) FROM generate_series(0, 62) AS g(p)
            WHERE (CAST(1 AS BIGINT) << p) >=
              (SELECT (COUNT(*) + ${targetOcc - 1}) // $targetOcc FROM $countSrc))) AS BIGINT) AS planes),
        ${pfx}pe AS (
          SELECT vec_id, i, v[i] AS q, j
          FROM prep, (SELECT unnest(generate_series(1, 64)) AS i),
               (SELECT unnest(generate_series(0, (SELECT planes FROM ${pfx}planecnt) - 1)) AS j)),
        ${pfx}dots AS (
          SELECT vec_id, j,
            SUM(CASE WHEN ((CAST(1664525 AS BIGINT) * (j * 64 + (i - 1)) + 1013904223) >> 15) % 2 = 0
                     THEN q ELSE -q END) AS d
          FROM ${pfx}pe GROUP BY 1, 2),
        ${pfx}buck AS (
          SELECT vec_id,
            SUM(CASE WHEN d > 0 THEN (CAST(1 AS BIGINT) << j) ELSE CAST(0 AS BIGINT) END) AS bucket
          FROM ${pfx}dots GROUP BY 1)"""

  def oracles: Map[String, String] = Map(
    "sim_knn_brute" ->
      s"""WITH $prepCte
          SELECT query_id, neighbor_id, rank, sim FROM (
            SELECT q.vec_id AS query_id, p.vec_id AS neighbor_id,
              CAST(ROW_NUMBER() OVER (PARTITION BY q.vec_id
                ORDER BY ${simSql("q.v", "q.nrm", "p.v", "p.nrm")} DESC, p.vec_id) AS BIGINT) AS rank,
              ${simSql("q.v", "q.nrm", "p.v", "p.nrm")} AS sim
            FROM prep q JOIN prep p ON q.vec_id < 10 AND q.vec_id <> p.vec_id)
          WHERE rank <= 5""",

    "sim_dim_prune" ->
      s"""WITH $prepCte,
          comp AS (
            SELECT vec_id, i, v[i] AS x
            FROM prep, (SELECT unnest(generate_series(1, 64)) AS i)),
          vstat AS (
            SELECT i, COUNT(*) AS n, SUM(x) AS sx, SUM(x*x) AS sxx
            FROM comp GROUP BY 1),
          topd AS (
            SELECT i FROM (SELECT i, n*sxx - sx*sx AS varn FROM vstat)
            ORDER BY varn DESC, i LIMIT 16),
          pp AS (
            SELECT vec_id, list(x ORDER BY i) AS pv, CAST(SUM(x*x) AS BIGINT) AS pnrm
            FROM comp WHERE i IN (SELECT i FROM topd) GROUP BY vec_id),
          fullt AS (
            SELECT query_id, vec_id FROM (
              SELECT q.vec_id AS query_id, p.vec_id AS vec_id,
                ROW_NUMBER() OVER (PARTITION BY q.vec_id
                  ORDER BY ${simSql("q.v", "q.nrm", "p.v", "p.nrm")} DESC, p.vec_id) AS rank
              FROM prep q JOIN prep p ON q.vec_id < 10 AND q.vec_id <> p.vec_id)
            WHERE rank <= 5),
          prunedt AS (
            SELECT query_id, vec_id FROM (
              SELECT q.vec_id AS query_id, p.vec_id AS vec_id,
                ROW_NUMBER() OVER (PARTITION BY q.vec_id
                  ORDER BY ${simSql("q.pv", "q.pnrm", "p.pv", "p.pnrm")} DESC, p.vec_id) AS rank
              FROM pp q JOIN pp p ON q.vec_id < 10 AND q.vec_id <> p.vec_id)
            WHERE rank <= 5)
          SELECT f.query_id, COUNT(*) AS n_true,
            CAST(SUM(CASE WHEN pr.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_overlap
          FROM fullt f LEFT JOIN prunedt pr USING (query_id, vec_id)
          GROUP BY 1""",

    // MMR unrolled: k = 5 greedy selections as five chained CTE layers
    // (no recursion — each picks the argmax of 0.5·rel − 0.5·max-sim-to-
    // selected over the not-yet-picked candidates, ties on vec_id).
    "sim_mmr" -> {
      def selUnion(n: Int): String =
        (1 to n).map(i => s"SELECT vec_id FROM s$i").mkString(" UNION ALL ")
      def layer(i: Int): String =
        s"""s$i AS (
            SELECT c.vec_id, c.rel FROM cand c
            WHERE c.vec_id NOT IN (${selUnion(i - 1)})
            ORDER BY 0.5 * c.rel - 0.5 * (
                SELECT MAX(p.sim) FROM pair p
                WHERE p.ia = c.vec_id AND p.ib IN (${selUnion(i - 1)})) DESC,
              c.vec_id
            LIMIT 1)"""
      s"""WITH $prepCte,
          qv AS (SELECT v, nrm FROM prep WHERE vec_id = 0),
          cand AS MATERIALIZED (
            SELECT vec_id, rel FROM (
              SELECT p.vec_id,
                ${simSql("p.v", "p.nrm", "qv.v", "qv.nrm")} AS rel,
                ROW_NUMBER() OVER (ORDER BY
                  ${simSql("p.v", "p.nrm", "qv.v", "qv.nrm")} DESC,
                  p.vec_id) AS rk
              FROM prep p, qv WHERE p.vec_id <> 0)
            WHERE rk <= 20),
          -- MATERIALIZED: the selection layers' correlated MAX subqueries
          -- reference these CTEs once per candidate row; inlined (the
          -- DuckDB default) each reference re-evaluates the corpus-wide
          -- join, which at sf0.1 spilled past the disk. Materialized,
          -- cand is 20 rows and pair 380, computed once.
          pair AS MATERIALIZED (
            SELECT a.vec_id AS ia, b.vec_id AS ib,
              ${simSql("a.v", "a.nrm", "b.v", "b.nrm")} AS sim
            FROM prep a, prep b
            WHERE a.vec_id IN (SELECT vec_id FROM cand)
              AND b.vec_id IN (SELECT vec_id FROM cand)
              AND a.vec_id <> b.vec_id),
          s1 AS (SELECT vec_id, rel FROM cand ORDER BY rel DESC, vec_id LIMIT 1),
          ${layer(2)}, ${layer(3)}, ${layer(4)}, ${layer(5)}
          SELECT CAST(r AS BIGINT) AS rank, vec_id, rel FROM (
            SELECT 1 AS r, vec_id, rel FROM s1
            UNION ALL SELECT 2, vec_id, rel FROM s2
            UNION ALL SELECT 3, vec_id, rel FROM s3
            UNION ALL SELECT 4, vec_id, rel FROM s4
            UNION ALL SELECT 5, vec_id, rel FROM s5)"""
    },

    "sim_threshold_pairs" ->
      s"""WITH $prepCte,
          trows AS (SELECT vec_id, label AS blk, v, nrm FROM prep),
          ${threeTierPairCtes("0.4")}
          SELECT id_a, id_b, sim FROM tpairs""",

    "sim_ann_lsh" ->
      s"""WITH $prepCte, $bucketCte,
          wb AS (
            SELECT * FROM (
              SELECT p.vec_id, p.v, p.nrm, b.bucket,
                COUNT(*) OVER (PARTITION BY b.bucket) AS bkt_n
              FROM prep p JOIN buck b USING (vec_id)) WHERE bkt_n <= ${Similarity.MaxBlock}),
          scored AS (
            SELECT a.vec_id, b.vec_id AS ann_id,
              ${simSql("a.v", "a.nrm", "b.v", "b.nrm")} AS sim,
              ROW_NUMBER() OVER (PARTITION BY a.vec_id
                ORDER BY ${simSql("a.v", "a.nrm", "b.v", "b.nrm")} DESC, b.vec_id) AS rn
            FROM wb a JOIN wb b ON a.bucket = b.bucket AND a.vec_id <> b.vec_id)
          SELECT vec_id, ann_id, sim FROM scored WHERE rn = 1""",

    "sim_sq8" ->
      s"""WITH enc AS (
            SELECT vec_id,
              CAST(list_min(embedding) AS DOUBLE) AS qmin,
              CAST(list_max(embedding) AS DOUBLE) AS qmax,
              embedding AS e
            FROM embeddings),
          coded AS (
            SELECT vec_id, qmin, qmax,
              CASE WHEN qmax > qmin
                THEN [CAST(round((CAST(x AS DOUBLE) - qmin) * 255.0 / (qmax - qmin)) AS INT)
                      for x in e]
                ELSE [0 for x in e] END AS q
            FROM enc)
          SELECT vec_id, qmin, qmax,
            CAST(list_sum(q) AS BIGINT) AS q_sum,
            md5(array_to_string(list_transform(q, y -> CAST(y AS VARCHAR)), ',')) AS q_md5
          FROM coded""",

    "dedup_semantic" ->
      s"""WITH $prepCte, ${kmeansCtes(2)},
          assigned AS (
            SELECT vec_id, centroid_id FROM (
              SELECT p.vec_id, c.centroid_id,
                ROW_NUMBER() OVER (PARTITION BY p.vec_id
                  ORDER BY ${simSql("p.v", "p.nrm", "c.cv", "c.cn")} DESC, c.centroid_id) AS rn
              FROM prep p, cents2 c) WHERE rn = 1),
          trows AS (
            SELECT p.vec_id, a.centroid_id AS blk, p.v, p.nrm
            FROM assigned a JOIN prep p USING (vec_id)),
          ${threeTierPairCtes("0.4")}
          SELECT id_a, id_b, sim FROM tpairs""",

    "sim_pq_encode" ->
      s"""WITH $prepCte, ${pqCtes(2)}, ${pqEncCte(2)}
          SELECT vec_id,
            ${(0 until Similarity.PqSub)
              .map(m => s"MAX(CASE WHEN m = $m THEN code END) AS c$m")
              .mkString(",\n            ")}
          FROM enc GROUP BY vec_id""",

    "sim_pq_adc" ->
      s"""WITH $prepCte, ${pqCtes(2)}, ${pqEncCte(2)},
          lut AS (
            SELECT s.vec_id AS query_id, s.m, c.code, ${l2Sql("s.sv", "c.cw")} AS d
            FROM subprep s JOIN cb2 c USING (m) WHERE s.vec_id < 10),
          adc AS (
            SELECT l.query_id, a.vec_id, CAST(SUM(l.d) AS BIGINT) AS adc
            FROM enc a JOIN lut l ON l.m = a.m AND l.code = a.code
            WHERE l.query_id <> a.vec_id
            GROUP BY 1, 2)
          SELECT query_id, vec_id AS neighbor_id, CAST(rank AS BIGINT) AS rank, adc
          FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
              ORDER BY adc, vec_id) AS rank
            FROM adc)
          WHERE rank <= 3""",

    "sim_ivf_assign" ->
      s"""WITH $prepCte, ${kmeansCtes(2)},
          assigned AS (
            SELECT p.vec_id, c.centroid_id,
              ROW_NUMBER() OVER (PARTITION BY p.vec_id
                ORDER BY ${simSql("p.v", "p.nrm", "c.cv", "c.cn")} DESC, c.centroid_id) AS rn
            FROM prep p, cents2 c)
          SELECT centroid_id, COUNT(*) AS n_assigned
          FROM assigned WHERE rn = 1 GROUP BY 1""",

    "sim_filtered_search" ->
      s"""WITH $prepCte, ${kmeansCtes(2)},
          assigned AS (
            SELECT vec_id, centroid_id FROM (
              SELECT p.vec_id, c.centroid_id,
                ROW_NUMBER() OVER (PARTITION BY p.vec_id
                  ORDER BY ${simSql("p.v", "p.nrm", "c.cv", "c.cn")} DESC, c.centroid_id) AS rn
              FROM prep p, cents2 c WHERE p.label % 2 = 0)
            WHERE rn = 1),
          probes AS (
            SELECT query_id, centroid_id FROM (
              SELECT q.vec_id AS query_id, c.centroid_id,
                ROW_NUMBER() OVER (PARTITION BY q.vec_id
                  ORDER BY ${simSql("q.v", "q.nrm", "c.cv", "c.cn")} DESC, c.centroid_id) AS prn
              FROM prep q, cents2 c WHERE q.vec_id < 10)
            WHERE prn <= 2),
          scored AS (
            SELECT pr.query_id, a.vec_id AS neighbor_id,
              ${simSql("q.v", "q.nrm", "p.v", "p.nrm")} AS sim,
              ROW_NUMBER() OVER (PARTITION BY pr.query_id
                ORDER BY ${simSql("q.v", "q.nrm", "p.v", "p.nrm")} DESC, a.vec_id) AS rank
            FROM probes pr
            JOIN assigned a ON a.centroid_id = pr.centroid_id AND a.vec_id <> pr.query_id
            JOIN prep q ON q.vec_id = pr.query_id
            JOIN prep p ON p.vec_id = a.vec_id)
          SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank, sim
          FROM scored WHERE rank <= 3""",

    "sim_decontam" ->
      s"""WITH $prepCte, ${kmeansCtes(2)},
          assigned AS (
            SELECT vec_id, centroid_id FROM (
              SELECT p.vec_id, c.centroid_id,
                ROW_NUMBER() OVER (PARTITION BY p.vec_id
                  ORDER BY ${simSql("p.v", "p.nrm", "c.cv", "c.cn")} DESC, c.centroid_id) AS rn
              FROM prep p, cents2 c WHERE p.vec_id % 25 <> 0)
            WHERE rn = 1),
          probes AS (
            SELECT query_id, centroid_id FROM (
              SELECT q.vec_id AS query_id, c.centroid_id,
                ROW_NUMBER() OVER (PARTITION BY q.vec_id
                  ORDER BY ${simSql("q.v", "q.nrm", "c.cv", "c.cn")} DESC, c.centroid_id) AS prn
              FROM prep q, cents2 c WHERE q.vec_id % 25 = 0)
            WHERE prn <= 2),
          hits AS (
            SELECT pr.query_id, a.vec_id,
              ${simSql("q.v", "q.nrm", "p.v", "p.nrm")} AS sim
            FROM probes pr
            JOIN assigned a ON a.centroid_id = pr.centroid_id AND a.vec_id <> pr.query_id
            JOIN prep q ON q.vec_id = pr.query_id
            JOIN prep p ON p.vec_id = a.vec_id
            WHERE ${simSql("q.v", "q.nrm", "p.v", "p.nrm")} >= 0.35)
          SELECT vec_id AS doc_id, n_eval_hits, query_id AS eval_id, sim FROM (
            SELECT vec_id, query_id, sim,
              ROW_NUMBER() OVER (PARTITION BY vec_id
                ORDER BY sim DESC, query_id) AS rn,
              COUNT(*) OVER (PARTITION BY vec_id) AS n_eval_hits
            FROM hits)
          WHERE rn = 1""",

    "sim_ivf_search" ->
      s"""WITH $prepCte, ${kmeansCtes(2)},
          assigned AS (
            SELECT vec_id, centroid_id FROM (
              SELECT p.vec_id, c.centroid_id,
                ROW_NUMBER() OVER (PARTITION BY p.vec_id
                  ORDER BY ${simSql("p.v", "p.nrm", "c.cv", "c.cn")} DESC, c.centroid_id) AS rn
              FROM prep p, cents2 c)
            WHERE rn = 1),
          probes AS (
            SELECT query_id, centroid_id FROM (
              SELECT q.vec_id AS query_id, c.centroid_id,
                ROW_NUMBER() OVER (PARTITION BY q.vec_id
                  ORDER BY ${simSql("q.v", "q.nrm", "c.cv", "c.cn")} DESC, c.centroid_id) AS prn
              FROM prep q, cents2 c WHERE q.vec_id < 10)
            WHERE prn <= 2),
          scored AS (
            SELECT pr.query_id, a.vec_id AS neighbor_id,
              ${simSql("q.v", "q.nrm", "p.v", "p.nrm")} AS sim,
              ROW_NUMBER() OVER (PARTITION BY pr.query_id
                ORDER BY ${simSql("q.v", "q.nrm", "p.v", "p.nrm")} DESC, a.vec_id) AS rank
            FROM probes pr
            JOIN assigned a ON a.centroid_id = pr.centroid_id AND a.vec_id <> pr.query_id
            JOIN prep q ON q.vec_id = pr.query_id
            JOIN prep p ON p.vec_id = a.vec_id)
          SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank, sim
          FROM scored WHERE rank <= 3""",

    // nlist re-derived from COUNT(*): power-of-two ceiling of sqrt(n)
    // (integer-exact p*p >= n scan), then nProbe from nlist (po2 ceiling
    // of its cube root, p*p*p >= nlist scan), then the SAME kmeans
    // seeded vec_id < nlist.
    "sim_ivf_adaptive" ->
      s"""WITH $prepCte, $adaptiveGeomCtes,
          ${kmeansCtes(2, seedWhere = "vec_id < (SELECT nlist FROM nl)")},
          assigned AS (
            SELECT vec_id, centroid_id FROM (
              SELECT p.vec_id, c.centroid_id,
                ROW_NUMBER() OVER (PARTITION BY p.vec_id
                  ORDER BY ${simSql("p.v", "p.nrm", "c.cv", "c.cn")} DESC, c.centroid_id) AS rn
              FROM prep p, cents2 c)
            WHERE rn = 1),
          probes AS (
            SELECT query_id, centroid_id FROM (
              SELECT q.vec_id AS query_id, c.centroid_id,
                ROW_NUMBER() OVER (PARTITION BY q.vec_id
                  ORDER BY ${simSql("q.v", "q.nrm", "c.cv", "c.cn")} DESC, c.centroid_id) AS prn
              FROM prep q, cents2 c WHERE q.vec_id < 10)
            WHERE prn <= (SELECT np FROM npl)),
          scored AS (
            SELECT pr.query_id, a.vec_id AS neighbor_id,
              ${simSql("q.v", "q.nrm", "p.v", "p.nrm")} AS sim,
              ROW_NUMBER() OVER (PARTITION BY pr.query_id
                ORDER BY ${simSql("q.v", "q.nrm", "p.v", "p.nrm")} DESC, a.vec_id) AS rank
            FROM probes pr
            JOIN assigned a ON a.centroid_id = pr.centroid_id AND a.vec_id <> pr.query_id
            JOIN prep q ON q.vec_id = pr.query_id
            JOIN prep p ON p.vec_id = a.vec_id)
          SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank, sim,
            (SELECT nlist FROM nl) AS nlist, (SELECT np FROM npl) AS n_probe
          FROM scored WHERE rank <= 3""",

    // The derived-geometry recall gate: same (nlist, nProbe) derivation
    // as sim_ivf_adaptive, graded against the brute top-3 ground truth
    // with sim_ivf_recall's integer contract.
    "sim_ivf_adaptive_recall" ->
      s"""WITH $prepCte, $adaptiveGeomCtes,
          ${kmeansCtes(2, seedWhere = "vec_id < (SELECT nlist FROM nl)")},
          assigned AS (
            SELECT vec_id, centroid_id FROM (
              SELECT p.vec_id, c.centroid_id,
                ROW_NUMBER() OVER (PARTITION BY p.vec_id
                  ORDER BY ${simSql("p.v", "p.nrm", "c.cv", "c.cn")} DESC, c.centroid_id) AS rn
              FROM prep p, cents2 c)
            WHERE rn = 1),
          probes AS (
            SELECT query_id, centroid_id FROM (
              SELECT q.vec_id AS query_id, c.centroid_id,
                ROW_NUMBER() OVER (PARTITION BY q.vec_id
                  ORDER BY ${simSql("q.v", "q.nrm", "c.cv", "c.cn")} DESC, c.centroid_id) AS prn
              FROM prep q, cents2 c WHERE q.vec_id < 10)
            WHERE prn <= (SELECT np FROM npl)),
          ivf AS (
            SELECT query_id, neighbor_id FROM (
              SELECT pr.query_id, a.vec_id AS neighbor_id,
                ROW_NUMBER() OVER (PARTITION BY pr.query_id
                  ORDER BY ${simSql("q.v", "q.nrm", "p.v", "p.nrm")} DESC, a.vec_id) AS rank
              FROM probes pr
              JOIN assigned a ON a.centroid_id = pr.centroid_id AND a.vec_id <> pr.query_id
              JOIN prep q ON q.vec_id = pr.query_id
              JOIN prep p ON p.vec_id = a.vec_id)
            WHERE rank <= 3),
          exact AS (
            SELECT query_id, neighbor_id FROM (
              SELECT q.vec_id AS query_id, p.vec_id AS neighbor_id,
                ROW_NUMBER() OVER (PARTITION BY q.vec_id
                  ORDER BY ${simSql("q.v", "q.nrm", "p.v", "p.nrm")} DESC, p.vec_id) AS rank
              FROM prep q JOIN prep p ON q.vec_id < 10 AND q.vec_id <> p.vec_id)
            WHERE rank <= 3)
          SELECT e.query_id, COUNT(*) AS n_exact,
            CAST(SUM(CASE WHEN i.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
              AS BIGINT) AS n_hit,
            (SELECT nlist FROM nl) AS nlist, (SELECT np FROM npl) AS n_probe
          FROM exact e LEFT JOIN ivf i
            ON e.query_id = i.query_id AND e.neighbor_id = i.neighbor_id
          GROUP BY e.query_id""",

    "sim_ivf_recall" ->
      s"""WITH $prepCte, ${kmeansCtes(2)},
          assigned AS (
            SELECT vec_id, centroid_id FROM (
              SELECT p.vec_id, c.centroid_id,
                ROW_NUMBER() OVER (PARTITION BY p.vec_id
                  ORDER BY ${simSql("p.v", "p.nrm", "c.cv", "c.cn")} DESC, c.centroid_id) AS rn
              FROM prep p, cents2 c)
            WHERE rn = 1),
          probes AS (
            SELECT query_id, centroid_id FROM (
              SELECT q.vec_id AS query_id, c.centroid_id,
                ROW_NUMBER() OVER (PARTITION BY q.vec_id
                  ORDER BY ${simSql("q.v", "q.nrm", "c.cv", "c.cn")} DESC, c.centroid_id) AS prn
              FROM prep q, cents2 c WHERE q.vec_id < 10)
            WHERE prn <= 2),
          ivf AS (
            SELECT query_id, neighbor_id FROM (
              SELECT pr.query_id, a.vec_id AS neighbor_id,
                ROW_NUMBER() OVER (PARTITION BY pr.query_id
                  ORDER BY ${simSql("q.v", "q.nrm", "p.v", "p.nrm")} DESC, a.vec_id) AS rank
              FROM probes pr
              JOIN assigned a ON a.centroid_id = pr.centroid_id AND a.vec_id <> pr.query_id
              JOIN prep q ON q.vec_id = pr.query_id
              JOIN prep p ON p.vec_id = a.vec_id)
            WHERE rank <= 3),
          exact AS (
            SELECT query_id, neighbor_id FROM (
              SELECT q.vec_id AS query_id, p.vec_id AS neighbor_id,
                ROW_NUMBER() OVER (PARTITION BY q.vec_id
                  ORDER BY ${simSql("q.v", "q.nrm", "p.v", "p.nrm")} DESC, p.vec_id) AS rank
              FROM prep q JOIN prep p ON q.vec_id < 10 AND q.vec_id <> p.vec_id)
            WHERE rank <= 3)
          SELECT e.query_id, COUNT(*) AS n_exact,
            CAST(SUM(CASE WHEN i.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
              AS BIGINT) AS n_hit
          FROM exact e LEFT JOIN ivf i
            ON e.query_id = i.query_id AND e.neighbor_id = i.neighbor_id
          GROUP BY e.query_id""",

    // Index REBUILT from the folded final state — what the maintained
    // lists must be indistinguishable from.
    "cdc_vector_sync" ->
      s"""WITH $prepCte, ${kmeansCtes(2)},
          prepf AS (
            SELECT vec_id, label, v, list_sum([y*y for y in v]) AS nrm
            FROM (SELECT vec_id, label,
                    CASE WHEN vec_id % 7 = 0
                         THEN list_concat(v0[2:len(v0)], [v0[1]])
                         ELSE v0 END AS v
                  FROM (SELECT vec_id, label,
                          [CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT) for x in embedding] AS v0
                        FROM embeddings)
                  WHERE vec_id % 11 <> 0)),
          fassigned AS (
            SELECT vec_id, centroid_id FROM (
              SELECT p.vec_id, c.centroid_id,
                ROW_NUMBER() OVER (PARTITION BY p.vec_id
                  ORDER BY ${simSql("p.v", "p.nrm", "c.cv", "c.cn")} DESC, c.centroid_id) AS rn
              FROM prepf p, cents2 c)
            WHERE rn = 1),
          fprobes AS (
            SELECT query_id, centroid_id FROM (
              SELECT q.vec_id AS query_id, c.centroid_id,
                ROW_NUMBER() OVER (PARTITION BY q.vec_id
                  ORDER BY ${simSql("q.v", "q.nrm", "c.cv", "c.cn")} DESC, c.centroid_id) AS prn
              FROM prepf q, cents2 c WHERE q.vec_id < 10)
            WHERE prn <= 2),
          fscored AS (
            SELECT pr.query_id, a.vec_id AS neighbor_id,
              ${simSql("q.v", "q.nrm", "p.v", "p.nrm")} AS sim,
              ROW_NUMBER() OVER (PARTITION BY pr.query_id
                ORDER BY ${simSql("q.v", "q.nrm", "p.v", "p.nrm")} DESC, a.vec_id) AS rank
            FROM fprobes pr
            JOIN fassigned a ON a.centroid_id = pr.centroid_id AND a.vec_id <> pr.query_id
            JOIN prepf q ON q.vec_id = pr.query_id
            JOIN prepf p ON p.vec_id = a.vec_id)
          SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank, sim
          FROM fscored WHERE rank <= 3""",

    "sim_ivf_split" ->
      s"""WITH $prepCte, ${kmeansCtes(2)},
          asg AS (
            SELECT vec_id, centroid_id FROM (
              SELECT p.vec_id, c.centroid_id,
                ROW_NUMBER() OVER (PARTITION BY p.vec_id
                  ORDER BY ${simSql("p.v", "p.nrm", "c.cv", "c.cn")} DESC, c.centroid_id) AS rn
              FROM prep p, cents2 c)
            WHERE rn = 1),
          counts AS (SELECT centroid_id, COUNT(*) AS n FROM asg GROUP BY 1),
          hot AS (SELECT centroid_id FROM counts ORDER BY n DESC, centroid_id LIMIT 1),
          hotm AS (
            SELECT p.* FROM prep p
            JOIN asg a ON a.vec_id = p.vec_id
            JOIN hot h ON a.centroid_id = h.centroid_id),
          seeds AS (SELECT vec_id FROM hotm ORDER BY vec_id LIMIT 2),
          ${kmeansCtes(2, "hotm", "s", "vec_id IN (SELECT vec_id FROM seeds)")},
          reasg AS (
            SELECT vec_id, 1000000 + centroid_id AS centroid_id FROM (
              SELECT p.vec_id, c.centroid_id,
                ROW_NUMBER() OVER (PARTITION BY p.vec_id
                  ORDER BY ${simSql("p.v", "p.nrm", "c.cv", "c.cn")} DESC, c.centroid_id) AS rn
              FROM hotm p, scents2 c)
            WHERE rn = 1)
          SELECT centroid_id, COUNT(*) AS n_assigned FROM (
            SELECT a.centroid_id, a.vec_id FROM asg a
            WHERE a.centroid_id NOT IN (SELECT centroid_id FROM hot)
            UNION ALL SELECT centroid_id, vec_id FROM reasg)
          GROUP BY 1""",

    "sim_ivf_incremental" ->
      s"""WITH $prepCte,
          base AS (SELECT * FROM prep WHERE vec_id % 5 <> 0),
          ${kmeansCtes(2, "base", "b")}, ${kmeansCtes(2)},
          iasg AS (
            SELECT vec_id, centroid_id FROM (
              SELECT p.vec_id, c.centroid_id,
                ROW_NUMBER() OVER (PARTITION BY p.vec_id
                  ORDER BY ${simSql("p.v", "p.nrm", "c.cv", "c.cn")} DESC, c.centroid_id) AS rn
              FROM prep p, bcents2 c)
            WHERE rn = 1),
          iprobes AS (
            SELECT query_id, centroid_id FROM (
              SELECT q.vec_id AS query_id, c.centroid_id,
                ROW_NUMBER() OVER (PARTITION BY q.vec_id
                  ORDER BY ${simSql("q.v", "q.nrm", "c.cv", "c.cn")} DESC, c.centroid_id) AS prn
              FROM prep q, bcents2 c WHERE q.vec_id < 10)
            WHERE prn <= 2),
          iivf AS (
            SELECT query_id, neighbor_id FROM (
              SELECT pr.query_id, a.vec_id AS neighbor_id,
                ROW_NUMBER() OVER (PARTITION BY pr.query_id
                  ORDER BY ${simSql("q.v", "q.nrm", "p.v", "p.nrm")} DESC, a.vec_id) AS rank
              FROM iprobes pr
              JOIN iasg a ON a.centroid_id = pr.centroid_id AND a.vec_id <> pr.query_id
              JOIN prep q ON q.vec_id = pr.query_id
              JOIN prep p ON p.vec_id = a.vec_id)
            WHERE rank <= 3),
          rasg AS (
            SELECT vec_id, centroid_id FROM (
              SELECT p.vec_id, c.centroid_id,
                ROW_NUMBER() OVER (PARTITION BY p.vec_id
                  ORDER BY ${simSql("p.v", "p.nrm", "c.cv", "c.cn")} DESC, c.centroid_id) AS rn
              FROM prep p, cents2 c)
            WHERE rn = 1),
          rprobes AS (
            SELECT query_id, centroid_id FROM (
              SELECT q.vec_id AS query_id, c.centroid_id,
                ROW_NUMBER() OVER (PARTITION BY q.vec_id
                  ORDER BY ${simSql("q.v", "q.nrm", "c.cv", "c.cn")} DESC, c.centroid_id) AS prn
              FROM prep q, cents2 c WHERE q.vec_id < 10)
            WHERE prn <= 2),
          rivf AS (
            SELECT query_id, neighbor_id FROM (
              SELECT pr.query_id, a.vec_id AS neighbor_id,
                ROW_NUMBER() OVER (PARTITION BY pr.query_id
                  ORDER BY ${simSql("q.v", "q.nrm", "p.v", "p.nrm")} DESC, a.vec_id) AS rank
              FROM rprobes pr
              JOIN rasg a ON a.centroid_id = pr.centroid_id AND a.vec_id <> pr.query_id
              JOIN prep q ON q.vec_id = pr.query_id
              JOIN prep p ON p.vec_id = a.vec_id)
            WHERE rank <= 3),
          exact AS (
            SELECT query_id, neighbor_id FROM (
              SELECT q.vec_id AS query_id, p.vec_id AS neighbor_id,
                ROW_NUMBER() OVER (PARTITION BY q.vec_id
                  ORDER BY ${simSql("q.v", "q.nrm", "p.v", "p.nrm")} DESC, p.vec_id) AS rank
              FROM prep q JOIN prep p ON q.vec_id < 10 AND q.vec_id <> p.vec_id)
            WHERE rank <= 3)
          SELECT e.query_id, COUNT(*) AS n_exact,
            CAST(SUM(CASE WHEN i.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
              AS BIGINT) AS hits_incr,
            CAST(SUM(CASE WHEN r.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
              AS BIGINT) AS hits_retrain
          FROM exact e
          LEFT JOIN iivf i
            ON e.query_id = i.query_id AND e.neighbor_id = i.neighbor_id
          LEFT JOIN rivf r
            ON e.query_id = r.query_id AND e.neighbor_id = r.neighbor_id
          GROUP BY e.query_id""",

    "sim_recall_curve" ->
      s"""WITH $prepCte, ${kmeansCtes(2)},
          assigned AS (
            SELECT vec_id, centroid_id FROM (
              SELECT p.vec_id, c.centroid_id,
                ROW_NUMBER() OVER (PARTITION BY p.vec_id
                  ORDER BY ${simSql("p.v", "p.nrm", "c.cv", "c.cn")} DESC, c.centroid_id) AS rn
              FROM prep p, cents2 c)
            WHERE rn = 1),
          probes AS (
            SELECT query_id, centroid_id FROM (
              SELECT q.vec_id AS query_id, c.centroid_id,
                ROW_NUMBER() OVER (PARTITION BY q.vec_id
                  ORDER BY ${simSql("q.v", "q.nrm", "c.cv", "c.cn")} DESC, c.centroid_id) AS prn
              FROM prep q, cents2 c WHERE q.vec_id < 10)
            WHERE prn <= 2),
          ivf AS (
            SELECT query_id, neighbor_id, rank FROM (
              SELECT pr.query_id, a.vec_id AS neighbor_id,
                ROW_NUMBER() OVER (PARTITION BY pr.query_id
                  ORDER BY ${simSql("q.v", "q.nrm", "p.v", "p.nrm")} DESC, a.vec_id) AS rank
              FROM probes pr
              JOIN assigned a ON a.centroid_id = pr.centroid_id AND a.vec_id <> pr.query_id
              JOIN prep q ON q.vec_id = pr.query_id
              JOIN prep p ON p.vec_id = a.vec_id)
            WHERE rank <= 10),
          exact AS (
            SELECT query_id, neighbor_id, rank FROM (
              SELECT q.vec_id AS query_id, p.vec_id AS neighbor_id,
                ROW_NUMBER() OVER (PARTITION BY q.vec_id
                  ORDER BY ${simSql("q.v", "q.nrm", "p.v", "p.nrm")} DESC, p.vec_id) AS rank
              FROM prep q JOIN prep p ON q.vec_id < 10 AND q.vec_id <> p.vec_id)
            WHERE rank <= 10),
          pairs AS (
            SELECT GREATEST(e.rank, i.rank) AS mk
            FROM exact e JOIN ivf i
              ON e.query_id = i.query_id AND e.neighbor_id = i.neighbor_id),
          nq AS (SELECT COUNT(*) AS n FROM prep WHERE vec_id < 10),
          spine AS (SELECT unnest(generate_series(1, 10)) AS k),
          hits AS (
            SELECT s.k, CAST(COUNT(*) AS BIGINT) AS n_hits
            FROM spine s JOIN pairs p ON p.mk <= s.k GROUP BY 1)
          SELECT CAST(s.k AS BIGINT) AS k,
            COALESCE(h.n_hits, 0) AS n_hits,
            CAST(s.k * (SELECT n FROM nq) AS BIGINT) AS n_possible
          FROM spine s LEFT JOIN hits h ON s.k = h.k""",

    "sim_ivfpq_recall" ->
      s"""WITH $prepCte, ${kmeansCtes(2)}, ${pqCtes(2)}, ${pqEncCte(2)},
          assigned AS (
            SELECT vec_id, centroid_id FROM (
              SELECT p.vec_id, c.centroid_id,
                ROW_NUMBER() OVER (PARTITION BY p.vec_id
                  ORDER BY ${simSql("p.v", "p.nrm", "c.cv", "c.cn")} DESC, c.centroid_id) AS rn
              FROM prep p, cents2 c)
            WHERE rn = 1),
          probes AS (
            SELECT query_id, centroid_id FROM (
              SELECT q.vec_id AS query_id, c.centroid_id,
                ROW_NUMBER() OVER (PARTITION BY q.vec_id
                  ORDER BY ${simSql("q.v", "q.nrm", "c.cv", "c.cn")} DESC, c.centroid_id) AS prn
              FROM prep q, cents2 c WHERE q.vec_id < 10)
            WHERE prn <= 2),
          lut AS (
            SELECT s.vec_id AS query_id, s.m, c.code,
              CAST(list_sum([s.sv[i]*c.cw[i] for i in generate_series(1, len(s.sv))]) AS BIGINT) AS dm,
              CAST(list_sum([y*y for y in c.cw]) AS BIGINT) AS n2
            FROM subprep s JOIN cb2 c USING (m) WHERE s.vec_id < 10),
          adcq AS (
            SELECT l.query_id, a.vec_id,
              CAST(SUM(l.dm) AS BIGINT) AS dotsum, CAST(SUM(l.n2) AS BIGINT) AS n2sum
            FROM enc a
            JOIN assigned g USING (vec_id)
            JOIN probes pr ON pr.centroid_id = g.centroid_id
            JOIN lut l ON l.query_id = pr.query_id AND l.m = a.m AND l.code = a.code
            WHERE l.query_id <> a.vec_id
            GROUP BY 1, 2),
          ivfpq AS (
            SELECT query_id, vec_id AS neighbor_id FROM (
              SELECT adcq.query_id, adcq.vec_id, ROW_NUMBER() OVER (PARTITION BY adcq.query_id
                ORDER BY CAST(dotsum AS DOUBLE) / sqrt(CAST(q.nrm * n2sum AS DOUBLE)) DESC,
                  adcq.vec_id) AS rank
              FROM adcq JOIN prep q ON q.vec_id = adcq.query_id)
            WHERE rank <= 3),
          exact AS (
            SELECT query_id, neighbor_id FROM (
              SELECT q.vec_id AS query_id, p.vec_id AS neighbor_id,
                ROW_NUMBER() OVER (PARTITION BY q.vec_id
                  ORDER BY ${simSql("q.v", "q.nrm", "p.v", "p.nrm")} DESC, p.vec_id) AS rank
              FROM prep q JOIN prep p ON q.vec_id < 10 AND q.vec_id <> p.vec_id)
            WHERE rank <= 3)
          SELECT e.query_id, COUNT(*) AS n_exact,
            CAST(SUM(CASE WHEN i.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
              AS BIGINT) AS n_hit
          FROM exact e LEFT JOIN ivfpq i
            ON e.query_id = i.query_id AND e.neighbor_id = i.neighbor_id
          GROUP BY e.query_id""",

    // Same CTE chain as sim_ivfpq_recall with the coarse geometry
    // re-derived (seeds vec_id < nlist, probes prn <= np); the PQ
    // codebook CTEs are untouched.
    "sim_ivfpq_adaptive_recall" ->
      s"""WITH $prepCte, $adaptiveGeomCtes,
          ${kmeansCtes(2, seedWhere = "vec_id < (SELECT nlist FROM nl)")},
          ${pqCtes(2)}, ${pqEncCte(2)},
          assigned AS (
            SELECT vec_id, centroid_id FROM (
              SELECT p.vec_id, c.centroid_id,
                ROW_NUMBER() OVER (PARTITION BY p.vec_id
                  ORDER BY ${simSql("p.v", "p.nrm", "c.cv", "c.cn")} DESC, c.centroid_id) AS rn
              FROM prep p, cents2 c)
            WHERE rn = 1),
          probes AS (
            SELECT query_id, centroid_id FROM (
              SELECT q.vec_id AS query_id, c.centroid_id,
                ROW_NUMBER() OVER (PARTITION BY q.vec_id
                  ORDER BY ${simSql("q.v", "q.nrm", "c.cv", "c.cn")} DESC, c.centroid_id) AS prn
              FROM prep q, cents2 c WHERE q.vec_id < 10)
            WHERE prn <= (SELECT np FROM npl)),
          lut AS (
            SELECT s.vec_id AS query_id, s.m, c.code,
              CAST(list_sum([s.sv[i]*c.cw[i] for i in generate_series(1, len(s.sv))]) AS BIGINT) AS dm,
              CAST(list_sum([y*y for y in c.cw]) AS BIGINT) AS n2
            FROM subprep s JOIN cb2 c USING (m) WHERE s.vec_id < 10),
          adcq AS (
            SELECT l.query_id, a.vec_id,
              CAST(SUM(l.dm) AS BIGINT) AS dotsum, CAST(SUM(l.n2) AS BIGINT) AS n2sum
            FROM enc a
            JOIN assigned g USING (vec_id)
            JOIN probes pr ON pr.centroid_id = g.centroid_id
            JOIN lut l ON l.query_id = pr.query_id AND l.m = a.m AND l.code = a.code
            WHERE l.query_id <> a.vec_id
            GROUP BY 1, 2),
          rf AS (SELECT GREATEST(3, LEAST(${Similarity.PqRefine},
                   COUNT(*) // 10)) AS depth FROM embeddings),
          ivfpq AS ( -- code-only ADC SHORTLIST (corpus-clamped refine knee)
            SELECT query_id, vec_id AS neighbor_id FROM (
              SELECT adcq.query_id, adcq.vec_id, ROW_NUMBER() OVER (PARTITION BY adcq.query_id
                ORDER BY CAST(dotsum AS DOUBLE) / sqrt(CAST(q.nrm * n2sum AS DOUBLE)) DESC,
                  adcq.vec_id) AS rank
              FROM adcq JOIN prep q ON q.vec_id = adcq.query_id)
            WHERE rank <= (SELECT depth FROM rf)),
          refined AS ( -- exact cosine rerank of ONLY the shortlist
            SELECT query_id, neighbor_id FROM (
              SELECT i.query_id, i.neighbor_id,
                ROW_NUMBER() OVER (PARTITION BY i.query_id
                  ORDER BY ${simSql("q.v", "q.nrm", "p.v", "p.nrm")} DESC, i.neighbor_id) AS rank
              FROM ivfpq i
              JOIN prep q ON q.vec_id = i.query_id
              JOIN prep p ON p.vec_id = i.neighbor_id)
            WHERE rank <= 3),
          exact AS (
            SELECT query_id, neighbor_id FROM (
              SELECT q.vec_id AS query_id, p.vec_id AS neighbor_id,
                ROW_NUMBER() OVER (PARTITION BY q.vec_id
                  ORDER BY ${simSql("q.v", "q.nrm", "p.v", "p.nrm")} DESC, p.vec_id) AS rank
              FROM prep q JOIN prep p ON q.vec_id < 10 AND q.vec_id <> p.vec_id)
            WHERE rank <= 3)
          SELECT e.query_id, COUNT(*) AS n_exact,
            CAST(SUM(CASE WHEN i.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
              AS BIGINT) AS n_hit,
            (SELECT nlist FROM nl) AS nlist, (SELECT np FROM npl) AS n_probe
          FROM exact e LEFT JOIN refined i
            ON e.query_id = i.query_id AND e.neighbor_id = i.neighbor_id
          GROUP BY e.query_id""",

    "sim_kmeans_quality" ->
      s"""WITH $prepCte, ${kmeansCtes(2)},
          asg AS (
            SELECT vec_id, centroid_id FROM (
              SELECT p.vec_id, c.centroid_id,
                ROW_NUMBER() OVER (PARTITION BY p.vec_id
                  ORDER BY ${simSql("p.v", "p.nrm", "c.cv", "c.cn")} DESC, c.centroid_id) AS rn
              FROM prep p, cents2 c)
            WHERE rn = 1)
          SELECT a.centroid_id, COUNT(*) AS n_members,
            CAST(SUM(p.nrm + c.cn
              - 2 * list_sum([p.v[i] * c.cv[i]
                              for i in generate_series(1, len(p.v))])) AS BIGINT) AS inertia,
            MIN(p.vec_id) AS min_member, MAX(p.vec_id) AS max_member
          FROM asg a JOIN prep p USING (vec_id)
          JOIN cents2 c ON c.centroid_id = a.centroid_id
          GROUP BY 1""",

    "sim_quant_error" -> {
      val dec = "CAST(round((sc.qmin + CAST(sc.q[i] AS DOUBLE) * (sc.qmax - sc.qmin) / 255.0) * 1000.0) AS BIGINT)"
      s"""WITH $prepCte, ${pqCtes(2)}, ${pqEncCte(2)},
          senc AS (SELECT vec_id,
              CAST(list_min(embedding) AS DOUBLE) AS qmin,
              CAST(list_max(embedding) AS DOUBLE) AS qmax,
              embedding AS e
            FROM embeddings),
          sc AS (SELECT vec_id, qmin, qmax,
              CASE WHEN qmax > qmin
                THEN [CAST(round((CAST(x AS DOUBLE) - qmin) * 255.0 / (qmax - qmin)) AS INT)
                      for x in e]
                ELSE [0 for x in e] END AS q
            FROM senc),
          sqerr AS (
            SELECT CAST(SUM(list_sum(list_transform(generate_series(1, len(p.v)),
              i -> (p.v[i] - $dec) * (p.v[i] - $dec)))) AS BIGINT) AS total_sqerr
            FROM prep p JOIN sc ON sc.vec_id = p.vec_id),
          pqerr AS (
            SELECT CAST(SUM(${l2Sql("s.sv", "c.cw")}) AS BIGINT) AS total_sqerr
            FROM enc a
            JOIN subprep s ON s.vec_id = a.vec_id AND s.m = a.m
            JOIN cb2 c ON c.m = a.m AND c.code = a.code),
          nv AS (SELECT COUNT(*) AS n FROM embeddings)
          SELECT method, total_sqerr,
            ROUND(CAST(total_sqerr AS DOUBLE) / CAST(n AS DOUBLE), 4) AS mean_sqerr
          FROM (SELECT 'sq8' AS method, total_sqerr FROM sqerr
                UNION ALL SELECT 'pq', total_sqerr FROM pqerr), nv"""
    },

    "sim_ivfpq" ->
      s"""WITH $prepCte, ${kmeansCtes(2)}, ${pqCtes(2)}, ${pqEncCte(2)},
          assigned AS (
            SELECT vec_id, centroid_id FROM (
              SELECT p.vec_id, c.centroid_id,
                ROW_NUMBER() OVER (PARTITION BY p.vec_id
                  ORDER BY ${simSql("p.v", "p.nrm", "c.cv", "c.cn")} DESC, c.centroid_id) AS rn
              FROM prep p, cents2 c)
            WHERE rn = 1),
          probes AS (
            SELECT query_id, centroid_id FROM (
              SELECT q.vec_id AS query_id, c.centroid_id,
                ROW_NUMBER() OVER (PARTITION BY q.vec_id
                  ORDER BY ${simSql("q.v", "q.nrm", "c.cv", "c.cn")} DESC, c.centroid_id) AS prn
              FROM prep q, cents2 c WHERE q.vec_id < 10)
            WHERE prn <= 2),
          lut AS (
            SELECT s.vec_id AS query_id, s.m, c.code,
              CAST(list_sum([s.sv[i]*c.cw[i] for i in generate_series(1, len(s.sv))]) AS BIGINT) AS dm,
              CAST(list_sum([y*y for y in c.cw]) AS BIGINT) AS n2
            FROM subprep s JOIN cb2 c USING (m) WHERE s.vec_id < 10),
          adcq AS (
            SELECT l.query_id, a.vec_id,
              CAST(SUM(l.dm) AS BIGINT) AS dotsum, CAST(SUM(l.n2) AS BIGINT) AS n2sum
            FROM enc a
            JOIN assigned g USING (vec_id)
            JOIN probes pr ON pr.centroid_id = g.centroid_id
            JOIN lut l ON l.query_id = pr.query_id AND l.m = a.m AND l.code = a.code
            WHERE l.query_id <> a.vec_id
            GROUP BY 1, 2),
          rf AS (SELECT GREATEST(3, LEAST(${Similarity.PqRefine},
                   COUNT(*) // 10)) AS depth FROM embeddings),
          shortl AS ( -- code-only cosine-ADC shortlist, corpus-clamped depth
            SELECT query_id, vec_id AS neighbor_id FROM (
              SELECT adcq.query_id, adcq.vec_id, ROW_NUMBER() OVER (PARTITION BY adcq.query_id
                ORDER BY CAST(dotsum AS DOUBLE) / sqrt(CAST(q.nrm * n2sum AS DOUBLE)) DESC,
                  adcq.vec_id) AS rank
              FROM adcq JOIN prep q ON q.vec_id = adcq.query_id)
            WHERE rank <= (SELECT depth FROM rf))
          SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank, sim
          FROM ( -- exact cosine rerank of ONLY the shortlist
            SELECT i.query_id, i.neighbor_id,
              ${simSql("q.v", "q.nrm", "p.v", "p.nrm")} AS sim,
              ROW_NUMBER() OVER (PARTITION BY i.query_id
                ORDER BY ${simSql("q.v", "q.nrm", "p.v", "p.nrm")} DESC,
                  i.neighbor_id) AS rank
            FROM shortl i
            JOIN prep q ON q.vec_id = i.query_id
            JOIN prep p ON p.vec_id = i.neighbor_id)
          WHERE rank <= 3""",

    "pipe_ann" ->
      s"""WITH $prepCte, ${kmeansCtes(2)}, ${pqCtes(2)}, ${pqEncCte(2)},
          assigned AS (
            SELECT vec_id, centroid_id FROM (
              SELECT p.vec_id, c.centroid_id,
                ROW_NUMBER() OVER (PARTITION BY p.vec_id
                  ORDER BY ${simSql("p.v", "p.nrm", "c.cv", "c.cn")} DESC, c.centroid_id) AS rn
              FROM prep p, cents2 c)
            WHERE rn = 1),
          probes AS (
            SELECT query_id, centroid_id FROM (
              SELECT q.vec_id AS query_id, c.centroid_id,
                ROW_NUMBER() OVER (PARTITION BY q.vec_id
                  ORDER BY ${simSql("q.v", "q.nrm", "c.cv", "c.cn")} DESC, c.centroid_id) AS prn
              FROM prep q, cents2 c WHERE q.vec_id < 10)
            WHERE prn <= 2),
          ivf AS (
            SELECT query_id, neighbor_id, rank, sim FROM (
              SELECT pr.query_id, a.vec_id AS neighbor_id,
                ${simSql("q.v", "q.nrm", "p.v", "p.nrm")} AS sim,
                ROW_NUMBER() OVER (PARTITION BY pr.query_id
                  ORDER BY ${simSql("q.v", "q.nrm", "p.v", "p.nrm")} DESC, a.vec_id) AS rank
              FROM probes pr
              JOIN assigned a ON a.centroid_id = pr.centroid_id AND a.vec_id <> pr.query_id
              JOIN prep q ON q.vec_id = pr.query_id
              JOIN prep p ON p.vec_id = a.vec_id)
            WHERE rank <= 3),
          lut AS (
            SELECT s.vec_id AS query_id, s.m, c.code, ${l2Sql("s.sv", "c.cw")} AS d
            FROM subprep s JOIN cb2 c USING (m) WHERE s.vec_id < 10),
          adc AS (
            SELECT query_id, vec_id, adc, rank FROM (
              SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                ORDER BY adc, vec_id) AS rank
              FROM (
                SELECT l.query_id, a.vec_id, CAST(SUM(l.d) AS BIGINT) AS adc
                FROM enc a JOIN lut l ON l.m = a.m AND l.code = a.code
                WHERE l.query_id <> a.vec_id
                GROUP BY 1, 2))
            WHERE rank <= 3)
          SELECT 'assign' AS section, CAST(centroid_id AS VARCHAR) AS a, '' AS b,
            COUNT(*) AS x, CAST(0 AS BIGINT) AS y, 0.0 AS v
          FROM assigned GROUP BY centroid_id
          UNION ALL
          SELECT 'ivf', CAST(query_id AS VARCHAR), CAST(neighbor_id AS VARCHAR),
            CAST(rank AS BIGINT), CAST(0 AS BIGINT), sim
          FROM ivf
          UNION ALL
          SELECT 'adc', CAST(query_id AS VARCHAR), CAST(vec_id AS VARCHAR),
            CAST(rank AS BIGINT), adc, 0.0
          FROM adc"""
  )

  /** The three-tier [[Similarity.thresholdPairs]] semantics as oracle
    * CTEs (r19, ADVICE r18): the executable spec must mirror what the
    * engine DOES — replica pre-collapse (one key per distinct (block,
    * vector), key pairs verified once, member pairs recovered by
    * membership expansion) and the hard bound applied to DISTINCT keys
    * per block, not raw rows. The engine's salt split (tier 2) has no
    * SQL mirror because it does not change the OUTPUT — every key pair
    * meets in exactly one hash chunk — it only bounds per-task work.
    * The previous oracle bounded on raw rows ≤ MaxBlock, so any corpus
    * with a block between the caps (or a replicated block over MaxBlock
    * raw rows but few distinct vectors) had the engine emitting pairs
    * the spec dropped.
    *
    * Caller supplies `trows AS (SELECT vec_id, blk, v, nrm ...)`;
    * these CTEs end in `tpairs(id_a, id_b, sim)`.
    */
  private[operators] def threeTierPairCtes(threshold: String): String =
    s"""tkeys AS ( -- tier 1: replica pre-collapse to distinct (blk, v)
          SELECT blk, v, MIN(vec_id) AS key_id, COUNT(*) AS n_mem,
            list_sum([y*y for y in v]) AS nrm
          FROM trows GROUP BY blk, v),
        tkb AS ( -- tier 3: hard bound on DISTINCT keys per block
          SELECT * FROM (
            SELECT *, COUNT(*) OVER (PARTITION BY blk) AS blk_n FROM tkeys)
          WHERE blk_n <= ${Similarity.HardMaxBlock}),
        tmembers AS (
          SELECT k.key_id, r.vec_id FROM trows r
          JOIN tkb k ON r.blk = k.blk AND r.v = k.v),
        tkp AS ( -- key pairs across keys + within replicated keys
          SELECT ka, kb, sim FROM (
            SELECT a.key_id AS ka, b.key_id AS kb,
              ${simSql("a.v", "a.nrm", "b.v", "b.nrm")} AS sim
            FROM tkb a JOIN tkb b ON a.blk = b.blk AND a.key_id < b.key_id)
          WHERE sim >= $threshold
          UNION ALL
          SELECT ka, kb, sim FROM (
            SELECT key_id AS ka, key_id AS kb, n_mem,
              ${simSql("v", "nrm", "v", "nrm")} AS sim FROM tkb)
          WHERE n_mem >= 2 AND sim >= $threshold),
        tpairs AS ( -- membership expansion back to true row pairs
          SELECT LEAST(ma.vec_id, mb.vec_id) AS id_a,
            GREATEST(ma.vec_id, mb.vec_id) AS id_b, kp.sim
          FROM tkp kp
          JOIN tmembers ma ON ma.key_id = kp.ka
          JOIN tmembers mb ON mb.key_id = kp.kb
          WHERE kp.ka <> kp.kb OR ma.vec_id < mb.vec_id)"""

  /** Integer squared-L2 over DuckDB lists — [[Similarity.sqDistQ]]'s SQL. */
  private def l2Sql(a: String, b: String): String =
    s"list_sum([($a[i]-$b[i])*($a[i]-$b[i]) for i in generate_series(1, len($a))])"

  /** PQ training CTE chain mirroring [[Similarity.pqTrain]] (PqSub
    * subspaces x PqSubDim dims, seeds = vec_id < PqCodewords, integer-L2
    * argmin with code tie-break, round(mean) re-centering on the integer
    * grid) — every geometry literal interpolates from the SAME constants
    * the engine uses, so codec and oracle cannot drift.
    */
  private def pqCtes(iters: Int): String = {
    val d = Similarity.PqSubDim
    val sub =
      s"""subprep AS (
           SELECT vec_id, m, v[m*$d+1 : m*$d+$d] AS sv
           FROM prep, (SELECT unnest(generate_series(0, ${Similarity.PqSub - 1})) AS m))"""
    val seed = s"cb0 AS (SELECT m, vec_id AS code, sv AS cw FROM subprep WHERE vec_id < ${Similarity.PqCodewords})"
    val steps = (1 to iters).map { t =>
      s"""pasg$t AS (
            SELECT vec_id, m, code FROM (
              SELECT s.vec_id, s.m, c.code,
                ROW_NUMBER() OVER (PARTITION BY s.vec_id, s.m
                  ORDER BY ${l2Sql("s.sv", "c.cw")} ASC, c.code) AS rn
              FROM subprep s JOIN cb${t - 1} c USING (m)) WHERE rn = 1),
          psums$t AS (
            SELECT a.m, a.code, i, SUM(s.sv[i]) AS sx, COUNT(*) AS n
            FROM pasg$t a JOIN subprep s USING (vec_id, m),
                 (SELECT unnest(generate_series(1, $d)) AS i)
            GROUP BY 1, 2, 3),
          cb$t AS (
            SELECT m, code, list(CAST(round(CAST(sx AS DOUBLE) / n) AS BIGINT) ORDER BY i) AS cw
            FROM psums$t GROUP BY 1, 2)"""
    }
    (Seq(sub, seed) ++ steps).mkString(", ")
  }

  /** Final-codebook assignment CTE (the encode pass over cb`iters`). */
  private def pqEncCte(iters: Int): String =
    s"""enc AS (
          SELECT vec_id, m, code FROM (
            SELECT s.vec_id, s.m, c.code,
              ROW_NUMBER() OVER (PARTITION BY s.vec_id, s.m
                ORDER BY ${l2Sql("s.sv", "c.cw")} ASC, c.code) AS rn
            FROM subprep s JOIN cb$iters c USING (m)) WHERE rn = 1)"""

  /** Lloyd's-iteration CTE chain mirroring [[Similarity.kmeansTrain]]:
    * cents0 = the 8 lowest-id seeds; each iteration assigns every vector
    * to its argmax-cosine centroid and re-centers on the quantized grid
    * (round(mean) per dimension of the integer components).
    */
  /** Lloyd's-iteration CTE chain ending in `${pfx}cents$iters`. `src` is
    * the training-set CTE (default the full `prep`); `pfx` namespaces the
    * chain so two independently-trained centroid tables (e.g. base-only
    * vs retrained-on-everything) coexist in one oracle query.
    */
  private[operators] def kmeansCtes(iters: Int, src: String = "prep",
      pfx: String = "", seedWhere: String = "vec_id < 8"): String = {
    val seed =
      s"${pfx}cents0 AS (SELECT vec_id AS centroid_id, v AS cv, nrm AS cn FROM $src WHERE $seedWhere)"
    val steps = (1 to iters).map { t =>
      s"""${pfx}asg$t AS (
            SELECT vec_id, centroid_id FROM (
              SELECT p.vec_id, c.centroid_id,
                ROW_NUMBER() OVER (PARTITION BY p.vec_id
                  ORDER BY ${simSql("p.v", "p.nrm", "c.cv", "c.cn")} DESC, c.centroid_id) AS rn
              FROM $src p, ${pfx}cents${t - 1} c) WHERE rn = 1),
          ${pfx}sums$t AS (
            SELECT a.centroid_id, i, SUM(p.v[i]) AS sx, COUNT(*) AS n
            FROM ${pfx}asg$t a JOIN $src p USING (vec_id),
                 (SELECT unnest(generate_series(1, 64)) AS i)
            GROUP BY 1, 2),
          ${pfx}cents$t AS (
            -- cn > 0: degenerate (zero-vector) centroids die, mirroring
            -- kmeansTrain — NaN cosines order differently in the engines
            SELECT * FROM (
              SELECT centroid_id, cv, list_sum([y*y for y in cv]) AS cn FROM (
                SELECT centroid_id,
                  list(CAST(round(CAST(sx AS DOUBLE) / n) AS BIGINT) ORDER BY i) AS cv
                FROM ${pfx}sums$t GROUP BY 1)) WHERE cn > 0)"""
    }
    (seed +: steps).mkString(", ")
  }
}
