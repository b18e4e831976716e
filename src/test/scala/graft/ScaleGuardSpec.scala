package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{Dedup, Similarity}

/** Regression spec for the quadratic-blowup guards.
  *
  * Every near-dup / ANN operator blocks candidates by a key (LSH band,
  * shared shingle, SimHash band, cluster id) and guards blocks larger
  * than a cap before the self-join — at corpus scale one boilerplate
  * cluster or degenerate embedding mass would otherwise go O(n²) on its
  * own. The edit-distance and embedding families carry the THREE-TIER
  * guard (r17 task 1): replica pre-collapse (identical content is one
  * key — its true pairs are recovered by expansion, never joined),
  * salt-split (distinct-key blocks between the caps process completely
  * in bounded hash slices), hard cap (drop + audit past the hard bound);
  * the band/shingle families keep the single drop-at-cap guard. None of
  * these bind on the green sf corpora (no block comes near them), so
  * breaking one would pass every oracle and only blow up in production.
  * This spec synthesizes the adversarial shapes — replica clusters,
  * distinct-key degenerate blocks — and asserts, per guarded path:
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

  test("thresholdPairs: replica pre-collapse RECOVERS the identical-vector block " +
      "(r17 task 1 — one verification, expansion emits the true pairs)") {
    // C identical vectors are ONE distinct key after the collapse: the
    // block holds 1 key regardless of replication, no cap can bind, and
    // the C·(C-1)/2 true pairs come back through the membership
    // expansion — the mass the old doc-level cap silently dropped.
    val guarded = Similarity.thresholdPairs(embs, col("vec_id"), col("embedding"),
      col("label"), threshold = 0.9, maxBlock = Cap)
    val (cl, rest) = splitIds(guarded, "id_a", "id_b")
    assert(cl == clusterPairs, s"replica mass not recovered: $cl of $clusterPairs")
    assert(guarded.filter(col("id_a") === 1 && col("id_b") === 2).count() == 1)
    assert(rest <= 10 + clusterPairs - cl)

    // and the recovery is NOT cap-sensitive: the uncapped run agrees
    val unguarded = Similarity.thresholdPairs(embs, col("vec_id"), col("embedding"),
      col("label"), threshold = 0.9, maxBlock = NoCap, hardMaxBlock = NoCap)
    assert(splitIds(unguarded, "id_a", "id_b")._1 == clusterPairs) // sim = 1.0
  }

  /** A degenerate block of C DISTINCT vectors (ids ≥ 1000, one label,
    * pairwise near-identical so every pair is a true pair), plus the
    * genuine pair (1, 2) in its own label. Replicas collapse; this mass
    * does NOT — it is what the salt and hard tiers exist for.
    */
  private lazy val distinctEmbs: DataFrame = {
    val block = (0 until C).map { i =>
      // base 0.5 everywhere, one distinct perturbation per vector: all
      // pairwise cosines stay ≈ 1 (true pairs), all vectors distinct
      (1000L + i, (0 until 64).map(d => if (d == i % 64) 0.5f + 0.001f * (i / 64 + 1) else 0.5f), "big")
    }
    val pair = Seq(
      (1L, (0 until 64).map(d => if (d == 0) 1.0f else -0.9f), "ok"),
      (2L, (0 until 64).map(d => if (d == 0) 1.0f else -0.905f), "ok"))
    (block ++ pair).toDF("vec_id", "embedding", "label").localCheckpoint()
  }

  test("thresholdPairs salt tier: a DISTINCT-vector block between maxBlock and " +
      "hardMaxBlock processes COMPLETELY through bounded hash slices") {
    val salted = Similarity.thresholdPairs(distinctEmbs, col("vec_id"),
      col("embedding"), col("label"), threshold = 0.9,
      maxBlock = Cap, hardMaxBlock = NoCap) // C=300 distinct keys, m=3 slices
    val (cl, rest) = splitIds(salted, "id_a", "id_b")
    assert(cl == clusterPairs,
      s"salt slices lost pairs: $cl of $clusterPairs (the split must be complete)")
    assert(salted.filter(col("id_a") === 1 && col("id_b") === 2).count() == 1)
    assert(rest == 1)
  }

  test("thresholdPairs hard cap: a DISTINCT-vector block past hardMaxBlock drops " +
      "and the audit construction reports the mass") {
    val dropped = Similarity.thresholdPairs(distinctEmbs, col("vec_id"),
      col("embedding"), col("label"), threshold = 0.9,
      maxBlock = Cap, hardMaxBlock = 2 * Cap) // 300 distinct keys > 200
    assert(splitIds(dropped, "id_a", "id_b")._1 == 0,
      "hard cap dropped? distinct-block pairs leaked past hardMaxBlock")
    assert(dropped.filter(col("id_a") === 1 && col("id_b") === 2).count() == 1)

    // the no-silent-caps counter over the SAME collapsed construction
    val keys = distinctEmbs.select(col("label").as("blk"),
        Similarity.quantize(col("embedding")).as("v"), col("vec_id"))
      .groupBy(col("blk"), col("v")).agg(count(lit(1)).as("n_mem"))
    val r = Dedup.capAuditRow(keys, Seq(col("blk")), 2L * Cap, "embed_block").head()
    assert(r.getLong(2) == 1L && r.getLong(3) == C.toLong,
      s"audit silent on the dropped distinct block: ${r.mkString(",")}")
  }

  // --- edit-distance tiers --------------------------------------------------

  /** n docs sharing ONLY their first pigeonhole segment (a low-entropy
    * "customerre…" opening over otherwise j-unique bodies): consecutive
    * ids (2j, 2j+1) are a true pair at exactly ed = 5 — one substitution
    * at the first char of EACH remaining segment — so every true pair is
    * discoverable through the shared segment-0 bucket ALONE, and any
    * tier that drops that bucket provably loses them. Bodies alternate
    * the two base-26 digits of j, so cross-pair distances are ≥ 27.
    */
  private def sharedOpeningDocs(n: Int): DataFrame = {
    val segStarts = Seq(10, 21, 32, 42, 53) // EditBnd interior boundaries
    val rows = (0 until n).map { id =>
      val j = id / 2
      // hash-random body per (j, p): any ALGEBRAIC j-encoding (digit
      // alternation, +p gradients) leaves shift/translation aliases that
      // create accidental low-ed cross-pairs; murmur noise has none, so
      // cross-pair distances sit near the 54-char maximum
      val body = (10 until 64).map(p =>
        ('a' + Math.floorMod(
          scala.util.hashing.MurmurHash3.productHash((j, p)), 26)).toChar).mkString
      val s0 = "customerre" + body
      val s = if (id % 2 == 0) s0
        else segStarts.foldLeft(s0)((acc, p) =>
          acc.updated(p, if (acc(p) == 'z') 'a' else (acc(p) + 1).toChar))
      (id.toLong, s)
    }
    rows.toDF("doc_id", "text").localCheckpoint()
  }

  test("editDistancePairs: replica pre-collapse recovers identical-key mass at ANY cap " +
      "(within-key pairs bypass blocking entirely)") {
    val Cr = 120
    val reps = (0 until Cr).map(i => (1000L + i,
      "all rights reserved this page is copyright of the site owner and may not"))
    val near = Seq(
      (1L, "galaxies rotate faster than their visible matter allows which points astronomers"),
      (2L, "galaxies rotate faster than their visible matter allows which points astrophysics"))
    val background = (0 until 40).map { i =>
      (10L + i, (0 until 24).map(w => s"tok${(i * 131 + w * 17) % 9973}x$w").mkString(" "))
    }
    val d = (reps ++ near ++ background).toDF("doc_id", "text").localCheckpoint()
    // brute ground truth over the same normalized 64-char keys
    val p = d.select(col("doc_id"), rpad(substring(col("text"), 1, 64), 64, "~").as("s"))
    val brute = p.as("a").crossJoin(p.as("b"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .filter(levenshtein(col("a.s"), col("b.s")) <= 5)
      .count()
    assert(brute >= Cr.toLong * (Cr - 1) / 2) // the replica mass is in the truth
    // even a cap of 1 — every multi-row bucket dropped — loses nothing
    // here: replicas are ONE key, their pairs never enter the join
    val out = graft.operators.TextOps.editDistancePairs(d,
      maxSegBucket = 1, hardSegBucket = 1)
    assert(out.count() == brute,
      s"collapse tier incomplete: ${out.count()} vs brute $brute")
  }

  test("editDistancePairs salt tier: a shared-opening bucket between the caps " +
      "processes COMPLETELY through bounded hash slices") {
    val d = sharedOpeningDocs(150) // seg-0 bucket = 150 distinct keys
    val out = graft.operators.TextOps.editDistancePairs(d,
      maxSegBucket = 50, hardSegBucket = 1000) // m = 3 slices
    val pairs = out.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.length == 75, s"salt slices lost pairs: ${pairs.length} of 75")
    assert(pairs.forall { case (a, b, dist) => b == a + 1 && a % 2 == 0 && dist == 5L })
  }

  test("editDistancePairs hard cap: a shared-opening bucket past hardSegBucket " +
      "drops and the audit construction reports the mass") {
    val d = sharedOpeningDocs(150)
    val out = graft.operators.TextOps.editDistancePairs(d,
      maxSegBucket = 50, hardSegBucket = 120) // 150 > 120: dropped
    assert(out.count() == 0,
      "hard cap dropped? pairs leaked past hardSegBucket through the seg-0 bucket")
    // the no-silent-caps counter over the SAME collapsed construction:
    // exactly one bucket (segment 0's shared opening), all 150 keys
    val r = graft.operators.TextOps.editSegAudit(d, hardSegBucket = 120).head()
    assert(r.getLong(2) == 1L && r.getLong(3) == 150L,
      s"audit silent on the dropped seg bucket: ${r.mkString(",")}")
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

  test("semantic-dedup shape: trained-cluster blocking recovers replica mass, " +
      "hard-caps distinct mass") {
    // the composed dedup_semantic path: train, assign, pairwise within
    // cluster — the IDENTICAL-vector mass lands in ONE centroid and,
    // post-collapse, in ONE distinct key: recovered at any cap
    val cents = Similarity.kmeansTrain(embs, col("vec_id"), col("embedding"),
      col("vec_id") === 1000L || col("vec_id") === 1L, iters = 1)
    val withCluster = embs.join(
      Similarity.ivfAssign(embs, col("vec_id"), col("embedding"), cents)
        .select(col("vec_id"), col("centroid_id")),
      Seq("vec_id")).localCheckpoint()
    val guarded = Similarity.thresholdPairs(withCluster, col("vec_id"),
      col("embedding"), col("centroid_id"), threshold = 0.9, maxBlock = Cap)
    assert(splitIds(guarded, "id_a", "id_b")._1 == clusterPairs,
      "replica mass in the trained cluster not recovered")

    // DISTINCT degenerate mass in one trained centroid still hard-caps
    val dcents = Similarity.kmeansTrain(distinctEmbs, col("vec_id"), col("embedding"),
      col("vec_id") === 1000L || col("vec_id") === 1L, iters = 1)
    val dCluster = distinctEmbs.join(
      Similarity.ivfAssign(distinctEmbs, col("vec_id"), col("embedding"), dcents)
        .select(col("vec_id"), col("centroid_id")),
      Seq("vec_id")).localCheckpoint()
    val hardCapped = Similarity.thresholdPairs(dCluster, col("vec_id"),
      col("embedding"), col("centroid_id"), threshold = 0.9,
      maxBlock = Cap, hardMaxBlock = 2 * Cap)
    assert(splitIds(hardCapped, "id_a", "id_b")._1 == 0,
      "hard cap dropped? distinct-cluster pairs leaked through the trained blocking")
  }
}
