package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{Dedup, Similarity}

/** Regression spec for the quadratic-blowup guards.
  *
  * Every near-dup / ANN operator blocks candidates by a key (LSH band,
  * shared shingle, SimHash band, cluster id) and DROPS blocks larger than
  * a cap before the self-join — at corpus scale one boilerplate cluster
  * or degenerate embedding mass would otherwise go O(n²) on its own.
  * Those caps have no effect on the green sf corpora (no block comes
  * near them), so dropping one would pass every oracle and only blow up
  * in production. This spec synthesizes the adversarial shape — ONE
  * cluster larger than every cap — and asserts, per guarded path:
  *
  *  1. the guarded call's output carries NO pair/row from the oversized
  *     cluster (the cap engaged) while a genuine small near-dup still
  *     surfaces (the cap is a guard, not a lobotomy), and
  *  2. the same call with the cap lifted yields the quadratic
  *     C·(C-1)/2 cluster pairs — so if a cap is ever dropped from the
  *     implementation, the guarded call degenerates into the unguarded
  *     one and assertion 1 fails.
  *
  * Counts, not wall-clock: a timing assertion flakes under load; the
  * candidate-count explosion IS the scale failure, observed exactly.
  */
class ScaleGuardSpec extends AnyFunSuite {
  lazy val spark = SparkTest.spark
  import spark.implicits._

  /** One boilerplate cluster of C identical documents (ids ≥ 1000),
    * a genuine near-dup pair (1, 2), and distinct background docs.
    */
  private val C = 300
  private val Cap = 100
  private val NoCap = 1 << 30
  private val clusterPairs = C.toLong * (C - 1) / 2

  private lazy val docs: DataFrame = {
    val boiler = "all rights reserved this page is copyright of the site " +
      "owner and may not be reproduced without prior written permission " +
      "terms of service apply to every visitor of this website"
    val nearA = "galaxies rotate faster than their visible matter allows " +
      "which points astronomers toward unseen dark matter halos around them"
    val nearB = "galaxies rotate faster than their visible matter allows " +
      "which points astronomers toward unseen dark matter halos near them"
    // (3, 4): an identical pair — MinHash-LSH recall on a non-identical
    // pair is probabilistic in the band family (P ≈ 0.7 at J ≈ 0.7), so
    // the presence assertion rides a J = 1 pair; (1, 2) stays one word
    // apart for the exact-Jaccard paths.
    val dupText = "the hubble tension names the stubborn gap between early " +
      "universe and late universe measurements of the expansion rate"
    val cluster = (0 until C).map(i => (1000L + i, boiler))
    val pair = Seq((1L, nearA), (2L, nearB), (3L, dupText), (4L, dupText))
    val background = (0 until 50).map { i =>
      val words = (0 until 24).map(w => s"tok${(i * 131 + w * 17) % 9973}x$w")
      (10L + i, words.mkString(" "))
    }
    (cluster ++ pair ++ background).toDF("doc_id", "text").localCheckpoint()
  }

  private def inCluster(c: org.apache.spark.sql.Column) = c >= 1000L

  /** Pair-output splits: (pairs inside the oversized cluster, others). */
  private def split(pairs: DataFrame): (Long, Long) = {
    val cl = pairs.filter(inCluster(col("doc_a")) && inCluster(col("doc_b"))).count()
    (cl, pairs.count() - cl)
  }

  test("minhashLsh: maxBandBucket drops the boilerplate cluster, keeps the genuine pair") {
    val guarded = Dedup.minhashLsh(docs, col("doc_id"), col("text"),
      maxBandBucket = Cap)
    val (cl, rest) = split(guarded)
    assert(cl == 0, s"cap dropped? $cl cluster pairs leaked through the banded join")
    assert(guarded.filter(col("doc_a") === 3 && col("doc_b") === 4).count() == 1)
    assert(rest <= 10) // background is distinct: output stays ~linear

    val unguarded = Dedup.minhashLsh(docs, col("doc_id"), col("text"),
      maxBandBucket = NoCap)
    assert(split(unguarded)._1 == clusterPairs) // the blowup the cap prevents
  }

  test("ngramJaccard: maxDf drops boilerplate shingles from the inverted index") {
    val guarded = Dedup.ngramJaccard(docs, col("doc_id"), col("text"), maxDf = Cap)
    val (cl, rest) = split(guarded)
    assert(cl == 0, s"cap dropped? $cl cluster pairs leaked through the index join")
    assert(guarded.filter(col("doc_a") === 1 && col("doc_b") === 2).count() == 1)
    assert(rest <= 10)

    val unguarded = Dedup.ngramJaccard(docs, col("doc_id"), col("text"), maxDf = NoCap)
    assert(split(unguarded)._1 == clusterPairs)
  }

  test("simhashPairs: maxBandBucket drops the identical-signature cluster") {
    val guarded = Dedup.simhashPairs(docs, col("doc_id"), col("text"),
      maxBandBucket = Cap)
    val (cl, rest) = split(guarded)
    assert(cl == 0, s"cap dropped? $cl cluster pairs leaked through the band join")
    // the near-pair differs by one word; identical docs aside, SimHash at
    // hamming<=4 keeps output ~linear on distinct background
    assert(rest <= 10)

    val unguarded = Dedup.simhashPairs(docs, col("doc_id"), col("text"),
      maxBandBucket = NoCap)
    assert(split(unguarded)._1 == clusterPairs) // hamming 0, every pair joins
  }

  // --- embedding-side guards -----------------------------------------------

  /** 64-dim embeddings: one degenerate mass of C identical vectors
    * (ids ≥ 1000, one LSH bucket, one k-means cluster), a genuine
    * near-identical pair (1, 2), distinct background.
    */
  private lazy val embs: DataFrame = {
    def bg(i: Int): Seq[Float] =
      (0 until 64).map(d => (((i * 31 + d * 7) % 13) - 6) / 6.0f)
    val degenerate = (0 until C).map(i => (1000L + i, Seq.fill(64)(0.5f), "big"))
    val pair = Seq(
      (1L, (0 until 64).map(d => if (d == 0) 1.0f else -0.9f), "ok"),
      (2L, (0 until 64).map(d => if (d == 0) 1.0f else -0.905f), "ok"))
    val background = (0 until 50).map(i => (10L + i, bg(i), s"l${i % 7}"))
    (degenerate ++ pair ++ background).toDF("vec_id", "embedding", "label")
      .localCheckpoint()
  }

  private def splitIds(pairs: DataFrame, a: String, b: String): (Long, Long) = {
    val cl = pairs.filter(inCluster(col(a)) && inCluster(col(b))).count()
    (cl, pairs.count() - cl)
  }

  test("cap audits: dropped-mass counters FIRE on the adversarial corpus") {
    // The no-silent-caps rule's other half: dedup_cap_audit reads all
    // zeros on the green sf corpora, so this is the only place the
    // firing path is exercised — the same oversized cluster the guards
    // drop must show up in the counters, bucket count and row mass.
    def one(df: DataFrame): (String, Long, Long, Long) = {
      val r = df.head()
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))
    }
    // generic collapse: one 300-row group over cap, one small group
    val keyed = (0 until C).map(i => ("hot", i)) ++ Seq(("cold", 0), ("cold", 1))
    val (_, cap0, nb0, nr0) = one(Dedup.capAuditRow(
      keyed.toDF("k", "x"), Seq(col("k")), Cap, "t"))
    assert((cap0, nb0, nr0) == (Cap.toLong, 1L, C.toLong))

    // site audits: the identical-doc cluster floods every band/shingle
    val (_, _, mhB, mhR) = one(Dedup.minhashBandAudit(docs, col("doc_id"),
      col("text"), maxBandBucket = Cap))
    assert(mhB >= 4 && mhR >= 4L * C, s"minhash audit silent: $mhB/$mhR")
    val (_, _, shB, shR) = one(Dedup.simhashBandAudit(docs, col("doc_id"),
      col("text"), maxBandBucket = Cap))
    assert(shB >= 5 && shR >= 5L * C, s"simhash audit silent: $shB/$shR")
    val (_, _, dfB, dfR) = one(Dedup.shingleDfAudit(docs, col("doc_id"),
      col("text"), maxDf = Cap))
    assert(dfB >= 20 && dfR >= 20L * C, s"shingle-df audit silent: $dfB/$dfR")

    // and the quiet side: distinct background alone reads 0 / 0
    val bg = docs.filter(col("doc_id") >= 10 && col("doc_id") < 1000)
    val (_, _, qB, qR) = one(Dedup.minhashBandAudit(bg, col("doc_id"),
      col("text"), maxBandBucket = Cap))
    assert((qB, qR) == (0L, 0L))
  }

  test("thresholdPairs: maxBlock drops the degenerate block") {
    val guarded = Similarity.thresholdPairs(embs, col("vec_id"), col("embedding"),
      col("label"), threshold = 0.9, maxBlock = Cap)
    val (cl, rest) = splitIds(guarded, "id_a", "id_b")
    assert(cl == 0, s"cap dropped? $cl degenerate-block pairs leaked")
    assert(guarded.filter(col("id_a") === 1 && col("id_b") === 2).count() == 1)
    assert(rest <= 10)

    val unguarded = Similarity.thresholdPairs(embs, col("vec_id"), col("embedding"),
      col("label"), threshold = 0.9, maxBlock = NoCap)
    assert(splitIds(unguarded, "id_a", "id_b")._1 == clusterPairs) // sim = 1.0
  }

  test("annLshTop1: maxBucket excludes the degenerate LSH bucket") {
    val guarded = Similarity.annLshTop1(embs, col("vec_id"), col("embedding"),
      maxBucket = Cap)
    assert(guarded.filter(inCluster(col("vec_id"))).count() == 0,
      "cap dropped? degenerate-bucket members were scored")
    // the genuine pair shares a bucket and finds each other
    assert(guarded.filter(col("vec_id") === 1 && col("ann_id") === 2).count() == 1)
    assert(guarded.filter(col("vec_id") === 2 && col("ann_id") === 1).count() == 1)

    val unguarded = Similarity.annLshTop1(embs, col("vec_id"), col("embedding"),
      maxBucket = NoCap)
    // every degenerate member gets scored against its C-1 twins
    assert(unguarded.filter(inCluster(col("vec_id"))).count() == C)
  }

  test("semantic-dedup shape: trained-cluster blocking still respects maxBlock") {
    // the composed dedup_semantic path: train, assign, pairwise within
    // cluster — the degenerate mass lands in ONE centroid
    val cents = Similarity.kmeansTrain(embs, col("vec_id"), col("embedding"),
      col("vec_id") === 1000L || col("vec_id") === 1L, iters = 1)
    val withCluster = embs.join(
      Similarity.ivfAssign(embs, col("vec_id"), col("embedding"), cents)
        .select(col("vec_id"), col("centroid_id")),
      Seq("vec_id")).localCheckpoint()
    val guarded = Similarity.thresholdPairs(withCluster, col("vec_id"),
      col("embedding"), col("centroid_id"), threshold = 0.9, maxBlock = Cap)
    assert(splitIds(guarded, "id_a", "id_b")._1 == 0,
      "cap dropped? degenerate-cluster pairs leaked through the trained blocking")

    val unguarded = Similarity.thresholdPairs(withCluster, col("vec_id"),
      col("embedding"), col("centroid_id"), threshold = 0.9, maxBlock = NoCap)
    assert(splitIds(unguarded, "id_a", "id_b")._1 == clusterPairs)
  }
}
