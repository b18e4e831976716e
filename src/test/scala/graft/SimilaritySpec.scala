package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Similarity

class SimilaritySpec extends AnyFunSuite {
  lazy val spark = SparkTest.spark
  import spark.implicits._

  // 4-dim toy corpus: v1 ≈ v2 (near-dup), v3 orthogonal-ish, v4 = -v1.
  private def toy = Seq(
    (1L, Seq(1.0f, 0.0f, 0.0f, 0.0f), 0),
    (2L, Seq(0.999f, 0.01f, 0.0f, 0.0f), 0),
    (3L, Seq(0.0f, 1.0f, 0.0f, 0.0f), 0),
    (4L, Seq(-1.0f, 0.0f, 0.0f, 0.0f), 1)
  ).toDF("vec_id", "embedding", "label")

  test("knnBrute ranks the near-duplicate first, negation last") {
    val got = Similarity.knnBrute(toy, col("vec_id"), col("embedding"), col("vec_id") === 1, k = 3)
      .orderBy("rank").select("neighbor_id", "sim").as[(Long, Double)].collect()
    assert(got.map(_._1).toSeq == Seq(2L, 3L, 4L))
    assert(got(0)._2 > 0.99 && got(1)._2 === 0.0 && got(2)._2 === -1.0)
  }

  test("thresholdPairs respects blocking: cross-label near-pairs are not compared") {
    val pairs = Similarity.thresholdPairs(toy, col("vec_id"), col("embedding"), col("label"), 0.9)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L))) // v4 is blocked away by label
  }

  test("thresholdPairs block-size tiers: maxBlock salts (complete), hardMaxBlock drops") {
    // label 0 holds 3 distinct vectors, label 1 holds 1: maxBlock = 2 is
    // the SALT unit now (r17 task 1) — the block processes completely in
    // ⌈3/2⌉ = 2 hash slices; only past hardMaxBlock does it drop.
    val salted = Similarity.thresholdPairs(
      toy, col("vec_id"), col("embedding"), col("label"), 0.0, maxBlock = 2)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(salted == Set((1L, 2L), (1L, 3L), (2L, 3L))) // complete through the slices
    val dropped = Similarity.thresholdPairs(
      toy, col("vec_id"), col("embedding"), col("label"), 0.0,
      maxBlock = 2, hardMaxBlock = 2)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(dropped.isEmpty)
    val open = Similarity.thresholdPairs(
      toy, col("vec_id"), col("embedding"), col("label"), -1.0)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(open == Set((1L, 2L), (1L, 3L), (2L, 3L))) // all label-0 pairs
  }

  test("cosine is quantization-deterministic: sim(v,v) == 1 exactly") {
    val self = Similarity.thresholdPairs(
      toy.union(toy.withColumn("vec_id", col("vec_id") + 10)),
      col("vec_id"), col("embedding"), col("label"), 0.999999)
      .filter(col("id_b") === col("id_a") + 10)
      .select("sim").as[Double].collect()
    assert(self.forall(_ == 1.0))
  }

  test("ivfAssign: every vector lands on exactly one centroid, self-assignment wins") {
    val seeds = Similarity.seedCentroids(toy, col("vec_id"), col("embedding"),
      col("vec_id") <= 3)
    val a = Similarity.ivfAssign(toy, col("vec_id"), col("embedding"), seeds)
    assert(a.count() == 4)
    val self = a.filter(col("vec_id") === 3).select("centroid_id").as[Long].head()
    assert(self == 3L)
  }

  test("kmeansTrain: centroids converge to cluster means on the quantized grid") {
    // Two tight clusters around e1 and e2; seeds 1 and 3 (one per cluster).
    val corpus = Seq(
      (1L, Seq(1.0f, 0.0f, 0.0f, 0.0f), 0),
      (2L, Seq(0.9f, 0.1f, 0.0f, 0.0f), 0),
      (3L, Seq(0.0f, 1.0f, 0.0f, 0.0f), 0),
      (4L, Seq(0.1f, 0.9f, 0.0f, 0.0f), 0),
      (5L, Seq(0.0f, 0.8f, 0.0f, 0.0f), 0)
    ).toDF("vec_id", "embedding", "label")
    val cents = Similarity.kmeansTrain(corpus, col("vec_id"), col("embedding"),
      col("vec_id").isin(1, 3), iters = 2)
      .orderBy("centroid_id")
      .select("centroid_id", "cv").as[(Long, Seq[Long])].collect()
    assert(cents.map(_._1).toSeq == Seq(1L, 3L))
    // centroid 1 = mean of v1,v2 = (950, 50, 0, 0); centroid 3 = mean of
    // v3,v4,v5 = (round(100/3), round(2700/3), 0, 0) = (33, 900, 0, 0)
    assert(cents(0)._2 == Seq(950L, 50L, 0L, 0L))
    assert(cents(1)._2 == Seq(33L, 900L, 0L, 0L))
  }

  test("PQ: codes reference the codebook; ADC equals the summed subspace LUT distance") {
    // 12 vectors in 64 dims with two obvious per-subspace clusters
    val corpus = (0 until 12).map { i =>
      (i.toLong, Seq.tabulate(64)(d =>
        (if ((i + d / 16) % 2 == 0) 0.9f else -0.9f) + (i % 3) * 0.01f), 0)
    }.toDF("vec_id", "embedding", "label")
    // geometry pinned EXPLICITLY on every call (the codec defaults are
    // the production 8×8 constants; this test checks the mechanics at a
    // hand-checkable 4×16)
    val cb = Similarity.pqTrain(corpus, col("vec_id"), col("embedding"),
      col("vec_id") < 4, nSub = 4, subDim = 16, iters = 2)
    val cbRows = cb.select("m", "code").as[(Int, Long)].collect()
    assert(cbRows.map(_._1).toSet == Set(0, 1, 2, 3))
    val codeSet = cbRows.toSet
    val enc = Similarity.pqEncode(corpus, col("vec_id"), col("embedding"), cb,
      nSub = 4, subDim = 16)
      .as[(Long, Seq[Long])].collect()
    assert(enc.length == 12 && enc.forall(_._2.length == 4))
    // every emitted code exists in its subspace's codebook
    assert(enc.forall { case (_, codes) =>
      codes.zipWithIndex.forall { case (c, m) => codeSet((m, c)) } })
    // ADC: ranks are 1..k per query, distances non-decreasing in rank
    val adc = Similarity.pqAdcSearch(corpus, col("vec_id"), col("embedding"),
      cb, col("vec_id") < 3, k = 3, nSub = 4, subDim = 16)
      .orderBy("query_id", "rank")
      .as[(Long, Long, Long, Long)].collect()
    assert(adc.groupBy(_._1).forall { case (_, rows) =>
      rows.map(_._3).toSeq == Seq(1L, 2L, 3L) &&
        rows.sortBy(_._3).map(_._4).sliding(2).forall(p => p.head <= p.last) })
  }

  test("ivfPqSearch: coarse pruning is real — every neighbor lies in a probed inverted list") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val cents = Similarity.kmeansTrain(e, col("vec_id"), col("embedding"),
      col("vec_id") < 8, iters = 2)
    val cb = Similarity.pqTrain(e, col("vec_id"), col("embedding"), col("vec_id") < 8)
    val res = Similarity.ivfPqSearch(e, col("vec_id"), col("embedding"),
      cents, cb, col("vec_id") < 10)
    // ivfSearch with an unbounded k enumerates EXACTLY the probed-list
    // candidate sets; ivf-pq must never rank a vector outside them
    val candidates = Similarity.ivfSearch(e, col("vec_id"), col("embedding"),
      cents, col("vec_id") < 10, nProbe = 2, k = Int.MaxValue)
      .select("query_id", "neighbor_id")
    assert(res.join(candidates, Seq("query_id", "neighbor_id"), "left_anti").count() == 0)
    // ranks are a clean 1..3 per query with non-increasing cosine-ADC sim
    val rows = res.orderBy("query_id", "rank")
      .select("query_id", "rank", "sim").as[(Long, Long, Double)].collect()
    assert(rows.groupBy(_._1).forall { case (_, rs) =>
      rs.map(_._2).toSeq == Seq(1L, 2L, 3L) &&
        rs.sortBy(_._2).map(_._3).sliding(2).forall(p => p.head >= p.last) })
  }

  test("sim_quant_error: the codec trade is visible — 64-byte SQ8 beats 4-byte PQ on fidelity") {
    val out = graft.operators.VectorOps.queries("sim_quant_error")(
      spark, "/root/testdata/sf0.001")
      .select("method", "total_sqerr").as[(String, Long)].collect().toMap
    assert(out.keySet == Set("sq8", "pq"))
    assert(out.values.forall(_ >= 0L))
    // 16x more bytes must buy strictly less reconstruction error
    assert(out("sq8") < out("pq"))
  }

  test("annLshTop1: bucketed candidates only, each result is the bucket argmax") {
    val corpus = (0 until 50).map { i =>
      (i.toLong, Seq.tabulate(64)(d => ((i * 37 + d * 13) % 17 - 8).toFloat / 8f), 0)
    }.toDF("vec_id", "embedding", "label")
    val res = Similarity.annLshTop1(corpus, col("vec_id"), col("embedding"))
    val n = res.count()
    assert(n > 0 && n <= 50)
    assert(res.groupBy("vec_id").count().filter(col("count") > 1).count() == 0)
  }

  test("sim_filtered_search: every neighbor satisfies the predicate, heads " +
      "stay full (pre-filter, not post-filter), and the filter is load-bearing") {
    val dir = "/root/testdata/sf0.001"
    val out = graft.operators.VectorOps.queries("sim_filtered_search")(spark, dir)
      .select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Long)].collect()
    assert(out.nonEmpty)
    val labels = spark.read.parquet(s"$dir/embeddings.parquet")
      .select("vec_id", "label").as[(Long, Int)].collect().toMap
    // the predicate holds on every returned neighbor
    assert(out.forall { case (_, n, _) => labels(n) % 2 == 0 })
    // heads are FULL k=3 per query — a post-filter of the unfiltered
    // head would leave ~half-empty result lists
    val perQuery = out.groupBy(_._1).view.mapValues(_.length).toMap
    assert(perQuery.values.forall(_ == 3))
    // and the filter actually changes the answer vs the unfiltered search
    val unf = graft.operators.VectorOps.queries("sim_ivf_search")(spark, dir)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    assert(out.map(t => (t._1, t._2)).toSet != unf)
  }

  test("ivfRange: all-probe range search ≡ brute-force threshold pairs; " +
      "fewer probes only ever shrink the hit set") {
    val dir = "/root/testdata/sf0.001"
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val evalP = pmod(col("vec_id"), lit(25)) === 0
    val cents = Similarity.kmeansTrain(e, col("vec_id"), col("embedding"),
      col("vec_id") < 8, iters = 2)
    val nCells = cents.count().toInt
    def rangeHits(nProbe: Int) = Similarity.ivfRange(
      e, col("vec_id"), col("embedding"), cents,
      queryPred = evalP, threshold = 0.35, nProbe = nProbe,
      corpusPred = pmod(col("vec_id"), lit(25)) =!= 0)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val allProbe = rangeHits(nCells)
    // brute-force ground truth: every eval × train pair at cosine ≥ 0.35
    val p = Similarity.prepared(e, col("vec_id"), col("embedding"))
    val q = p.filter(pmod(col("vec_id"), lit(25)) === 0)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("nrm").as("qn"))
    val brute = p.filter(pmod(col("vec_id"), lit(25)) =!= 0)
      .crossJoin(q)
      .withColumn("sim", Similarity.cosineQ(col("qv"), col("qn"), col("v"), col("nrm")))
      .filter(col("sim") >= 0.35)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    assert(allProbe == brute)
    assert(brute.nonEmpty)
    // nProbe = 1 is a subset (IVF trades recall for scan fraction, never adds)
    assert(rangeHits(1).subsetOf(allProbe))
  }

  test("sim_recall_curve: cumulative hits are monotone, bounded by k·|q|, " +
      "and the k=3 point reproduces sim_ivf_recall exactly") {
    val dir = "/root/testdata/sf0.001"
    val got = graft.operators.VectorOps.queries("sim_recall_curve")(spark, dir)
      .select("k", "n_hits", "n_possible")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(got.map(_._1).toSeq == (1L to 10L))
    got.foreach { case (k, h, p) => assert(h >= 0 && h <= p && p % k == 0) }
    // cumulative: a hit at k counts at every k' ≥ k
    assert(got.map(_._2).sliding(2).forall(w => w(0) <= w(1)))
    // the curve's k=3 point IS sim_ivf_recall's total hit count
    val r3 = graft.operators.VectorOps.queries("sim_ivf_recall")(spark, dir)
      .agg(sum(col("n_hit"))).head().getLong(0)
    assert(got(2)._2 == r3)
    // the curve is informative: IVF at nProbe=2 misses something by k=10
    assert(got.last._2 < got.last._3)
    assert(got.last._2 > 0)
  }

  test("sim_decontam flags only train docs, argmaxes the worst eval probe, " +
      "and its hit counts reconcile with ivfRange") {
    val dir = "/root/testdata/sf0.001"
    val got = graft.operators.VectorOps.queries("sim_decontam")(spark, dir)
      .select("doc_id", "n_eval_hits", "eval_id", "sim")
      .as[(Long, Long, Long, Double)].collect()
    assert(got.nonEmpty)
    assert(got.forall { case (d, _, q, s) => d % 25 != 0 && q % 25 == 0 && s >= 0.35 })
    // reconcile against the raw range hits: counts and per-doc argmax agree
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val cents = Similarity.kmeansTrain(e, col("vec_id"), col("embedding"),
      col("vec_id") < 8, iters = 2)
    val hits = Similarity.ivfRange(e, col("vec_id"), col("embedding"), cents,
      queryPred = pmod(col("vec_id"), lit(25)) === 0, threshold = 0.35,
      corpusPred = pmod(col("vec_id"), lit(25)) =!= 0)
      .select("vec_id", "query_id", "sim").as[(Long, Long, Double)].collect()
      .groupBy(_._1)
    assert(got.length == hits.size)
    got.foreach { case (d, n, q, s) =>
      val hs = hits(d)
      assert(hs.length == n)
      val best = hs.maxBy(h => (h._3, -h._2))
      assert(best._2 == q && best._3 == s)
    }
  }

  test("cdc_vector_sync maintenance ≡ a rebuild from the folded final state, " +
      "list row for list row") {
    val dir = "/root/testdata/sf0.001"
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val isUpd = col("vec_id") % 7 === 0
    val isDel = col("vec_id") % 11 === 0
    def rot(c: org.apache.spark.sql.Column) =
      concat(slice(c, lit(2), size(c) - 1), slice(c, lit(1), lit(1)))
    val cents = Similarity.kmeansTrain(e, col("vec_id"), col("embedding"),
      col("vec_id") < 8, iters = 2).localCheckpoint()
    val maintained = Similarity.ivfLists(e, col("vec_id"), col("embedding"), cents)
      .join(e.filter(isUpd || isDel).select("vec_id"), Seq("vec_id"), "left_anti")
      .unionByName(Similarity.ivfLists(
        e.filter(isUpd && !isDel)
          .select(col("vec_id"), rot(col("embedding")).as("embedding")),
        col("vec_id"), col("embedding"), cents))
    val finalState = e.filter(!isDel).select(col("vec_id"),
      when(isUpd, rot(col("embedding"))).otherwise(col("embedding")).as("embedding"))
    val rebuilt = Similarity.ivfLists(finalState, col("vec_id"),
      col("embedding"), cents)
    def key(df: org.apache.spark.sql.DataFrame) =
      df.select(col("vec_id"), col("centroid_id"), col("nrm"),
          md5(concat_ws(",", col("v"))).as("vh"))
        .as[(Long, Long, Long, String)].collect().toSet
    val (m, r) = (key(maintained), key(rebuilt))
    assert(m == r)
    // the maintenance really touched something: updates moved or rewrote
    // rows, deletes removed them
    assert(m.nonEmpty && e.filter(isDel).count() > 0 &&
      e.filter(isUpd && !isDel).count() > 0)
  }

  test("refineDepth: knee absolute at scale, n/10 clamp at small corpora, floor k") {
    import Similarity.{refineDepth, PqRefine}
    assert(refineDepth(200000L) == PqRefine) // 100x regime: measured knee binds
    assert(refineDepth(2001L) == PqRefine) // n/10 crosses the knee exactly here
    assert(refineDepth(2000L) == PqRefine) // sf0.1 gate corpus: 2000/10 = 200
    assert(refineDepth(500L) == 50) // sf0.01 gate corpus (measured recall-equal)
    assert(refineDepth(25L) == 3) // floor: the head must be fillable
    assert(refineDepth(0L) == 3)
    assert(refineDepth(500L, k = 7) == 50 && refineDepth(25L, k = 7) == 7)
  }

  test("PqArgmin saturates the distance side: huge components cannot corrupt the packing") {
    import graft.plans.PqArgmin
    // one subspace, two far codewords (codes 5 and 2) + a near one (code 7)
    val far = Array.fill(8)(0L)
    val near = Array.fill(8)(2999999L)
    val sv = typedLit(Seq.fill(8)(3000000L)) // d(far) = 8*9e12 = 7.2e13 > DistCap
    def run(codes: Array[Long], cws: Array[Array[Long]]): Long =
      spark.range(1).select(
        PqArgmin(lit(0), sv, Array(codes), Array(cws)).as("p"))
        .head().getLong(0)
    // both candidates saturate -> distances equal at DistCap, tie to the
    // SMALLER code, and the packed long stays positive / well-formed
    val tie = run(Array(5L, 2L), Array(far, far.clone()))
    assert(tie > 0L)
    assert((tie & PqArgmin.CodeMask) == 2L)
    assert((tie >>> PqArgmin.CodeBits) == PqArgmin.DistCap)
    // a genuinely-near codeword still wins over saturated ones: the cap
    // orders after every uncapped distance
    val mixed = run(Array(5L, 7L), Array(far, near))
    assert((mixed & PqArgmin.CodeMask) == 7L)
    assert((mixed >>> PqArgmin.CodeBits) == 8L) // 8 dims x (3000000-2999999)^2
  }

  test("ivfPqSearchRefined: the rerank head is drawn from the ADC shortlist, " +
    "exact-cosine ordered, and never worse than raw ADC on the true top-1") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val cents = Similarity.kmeansTrain(e, col("vec_id"), col("embedding"),
      col("vec_id") < 8, iters = 2)
    val cb = Similarity.pqTrain(e, col("vec_id"), col("embedding"),
      col("vec_id") < Similarity.PqCodewords)
    val depth = Similarity.refineDepth(e.count())
    val short = Similarity.ivfPqSearch(e, col("vec_id"), col("embedding"),
      cents, cb, col("vec_id") < 5, k = depth)
      .select("query_id", "neighbor_id")
    val refined = Similarity.ivfPqSearchRefined(e, col("vec_id"), col("embedding"),
      cents, cb, col("vec_id") < 5, shortlist = depth)
    // containment: every refined neighbor came from the code-only shortlist
    assert(refined.join(short, Seq("query_id", "neighbor_id"), "left_anti")
      .count() == 0)
    // ranks 1..3 per query with non-increasing EXACT cosine
    val rows = refined.orderBy("query_id", "rank")
      .select("query_id", "rank", "sim").as[(Long, Long, Double)].collect()
    assert(rows.nonEmpty && rows.groupBy(_._1).forall { case (_, rs) =>
      rs.map(_._2).toSeq == Seq(1L, 2L, 3L) &&
        rs.sortBy(_._2).map(_._3).sliding(2).forall(p => p.head >= p.last) })
  }
}
