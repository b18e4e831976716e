package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{Dedup, Text}

class TextDedupSpec extends AnyFunSuite {
  lazy val spark = SparkTest.spark
  import spark.implicits._

  test("shingles: distinct word n-grams, short-text guard") {
    val df = Seq("a b c d", "a b", "x x x x").toDF("text")
    val got = df.select(Text.shingles(col("text"), 3).as("s")).as[Seq[String]].collect()
    assert(got(0) == Seq("a b c", "b c d"))
    assert(got(1) == Seq.empty) // shorter than n
    assert(got(2) == Seq("x x x")) // duplicates collapsed
  }

  test("langId picks marker-max language with fixed precedence, und on no hits") {
    val df = Seq(
      "the cat and the dog of it",
      "el la la de casa",
      "nomarkers here at all").toDF("text")
    val got = df.select(Text.langId(col("text"))).as[String].collect().toSeq
    assert(got == Seq("en", "es", "und"))
  }

  test("gopherStats: every rule boundary — 50-word floor and mwl=3.0 inclusive, " +
      "distinct (not total) stops, alpha_frac 0.8 strict") {
    def doc(words: Seq[String]) = words.mkString(" ")
    val base = Seq.fill(48)("abc")
    val rows = Seq(
      (1L, doc(base ++ Seq("the", "and"))), // 50 words, mwl 3.0, 2 stops, alpha 1.0 → keep
      (2L, doc(base.take(47) ++ Seq("the", "and"))), // 49 words → n_words floor fails
      (3L, doc(base ++ Seq("the", "the"))), // 2 stop TOKENS but 1 distinct → fails
      (4L, doc(Seq.fill(38)("abc") ++ Seq.fill(10)("123") ++ Seq("the", "and"))), // alpha 0.8 exactly → strict > fails
      (5L, doc(Seq.fill(48)("abcdefghijk") ++ Seq("the", "and"))) // mwl 10.68 → ceiling fails
    ).toDF("doc_id", "text")
    val got = Text.gopherStats(rows, col("doc_id"), col("text"))
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getLong(3), r.getDouble(4), r.getBoolean(5)))
    assert(got(0) == ((1L, 50L, 3.0, 2L, 1.0, true)))
    assert(got(1)._2 == 49L && !got(1)._6)
    assert(got(2)._4 == 1L && !got(2)._6)
    assert(got(3)._5 == 0.8 && !got(3)._6)
    assert(got(4)._3 > 10.0 && !got(4)._6)
  }

  test("repetitionStats: concentration and dup fractions; single-token doc has no bigrams") {
    val df = Seq(
      (1L, "a b a b a"),   // words: a×3,b×2 → top 3/5; bigrams: "a b"×2,"b a"×2 → top 2/4, dup 1-2/4
      (2L, "x y z w"),     // all distinct → top_word 1/4, top_bigram 1/3, dup 0
      (3L, "solo")         // no bigrams → bigram stats null
    ).toDF("doc_id", "text")
    val got = graft.functions.Text.repetitionStats(df, col("doc_id"), col("text"))
      .orderBy("doc_id")
      .as[(Long, Long, Double, Option[Double], Option[Double])].collect()
    assert(got(0) == ((1L, 5L, 0.6, Some(0.5), Some(0.5))))
    assert(got(1) == ((2L, 4L, 0.25, Some(1.0 / 3.0), Some(0.0))))
    assert(got(2) == ((3L, 1L, 1.0, None, None)))
  }

  test("exact dedup groups identical texts and keeps the min id") {
    val df = Seq((1L, "same text"), (2L, "same text"), (3L, "other")).toDF("doc_id", "text")
    val got = Dedup.exact(df, col("doc_id"), col("text"))
      .orderBy("keep_id").select("keep_id", "n_copies").as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 2L), (3L, 1L)))
  }

  test("minhashLsh and ngramJaccard find a planted near-duplicate, not unrelated docs") {
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    val nearDup = (1 to 40).map(i => if (i == 20) "CHANGED" else s"tok$i").mkString(" ")
    val other = (100 to 140).map(i => s"z$i").mkString(" ")
    val df = Seq((1L, base), (2L, nearDup), (3L, other)).toDF("doc_id", "text")
    val lsh = Dedup.minhashLsh(df, col("doc_id"), col("text"))
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(lsh == Set((1L, 2L)))
    val ng = Dedup.ngramJaccard(df, col("doc_id"), col("text"))
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(ng == Set((1L, 2L)))
  }

  test("simhash: identical texts have hamming 0; near-dups small; signature in 60-bit range") {
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    val nearDup = (1 to 40).map(i => if (i == 20) "CHANGED" else s"tok$i").mkString(" ")
    val df = Seq((1L, base), (2L, base), (3L, nearDup)).toDF("doc_id", "text")
    val sig = Dedup.simhashSig(df, col("doc_id"), col("text"))
      .orderBy("doc_id").select("simhash").as[Long].collect()
    assert(sig(0) == sig(1))
    assert(sig.forall(h => h >= 0 && h < (1L << Dedup.SimhashBits)))
    val pairs = Dedup.simhashPairs(df, col("doc_id"), col("text"))
      .select("doc_a", "doc_b", "hamming").as[(Long, Long, Long)].collect()
    assert(pairs.exists { case (a, b, h) => a == 1 && b == 2 && h == 0 })
  }

  test("nearDupComponents: chains collapse to one cluster; keep_id is the min member") {
    // pair graph: 1-2, 2-3 (one chain), 7-9 (separate), 5 untouched
    val pairs = Seq((1L, 2L), (2L, 3L), (9L, 7L)).toDF("doc_a", "doc_b")
    val got = Dedup.nearDupComponents(pairs)
      .orderBy("cluster")
      .select("cluster", "n_members", "keep_id")
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 3L, 1L), (7L, 2L, 7L)))
    // a long path (diameter > 2) still converges to the single min label
    val path = (1L to 6L).sliding(2).map(s => (s(0), s(1))).toSeq.toDF("doc_a", "doc_b")
    val one = Dedup.nearDupComponents(path)
      .as[(Long, Long, Long)].collect().toSeq
    assert(one == Seq((1L, 6L, 1L)))
  }

  test("simhash band-bucket cap drops oversized buckets (quadratic guard)") {
    // 12 identical docs land in the same bucket of every band: with the
    // cap below the group size the self-join sees none of them; with the
    // default cap all 66 pairs surface.
    val txt = (1 to 30).map(i => s"w$i").mkString(" ")
    val df = (1L to 12L).map(i => (i, txt)).toDF("doc_id", "text")
    val capped = Dedup.simhashPairs(df, col("doc_id"), col("text"), maxBandBucket = 10)
    assert(capped.count() == 0)
    val open = Dedup.simhashPairs(df, col("doc_id"), col("text"))
    assert(open.count() == 12L * 11 / 2)
  }

  test("streaming dedup: a digest's first batch wins; later duplicates are suppressed by state") {
    val work = java.nio.file.Files.createTempDirectory("graft_sdedup").toFile.getAbsolutePath
    // batch 1: digest A twice (ids 4, 2), digest B once (id 6);
    // batch 2: digest A again with a SMALLER id (must NOT win), new C.
    // stageOrdered pins mod times so batch order is not a mod-time race.
    graft.operators.StreamOps.stageOrdered(spark, s"$work/feed", Seq(
      Seq((4L, "A"), (2L, "A"), (6L, "B")).toDF("doc_id", "digest"),
      Seq((1L, "A"), (3L, "C")).toDF("doc_id", "digest")))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("digest",
        org.apache.spark.sql.types.StringType)))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$work/feed")
    val q = Dedup.streamingFirstPerDigest(stream).writeStream
      .option("checkpointLocation", s"$work/ckpt")
      .option("path", s"$work/out")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .format("parquet").start()
    q.awaitTermination()
    val got = spark.read.parquet(s"$work/out")
      .as[(String, Long)].collect().toSet
    assert(got == Set(("A", 2L), ("B", 6L), ("C", 3L)))

    // restart with a THIRD file: the ledger survives the checkpoint —
    // another A duplicate stays suppressed, new D emits
    Seq((9L, "A"), (8L, "D")).toDF("doc_id", "digest")
      .coalesce(1).write.mode("append").parquet(s"$work/feed")
    val q2 = Dedup.streamingFirstPerDigest(stream).writeStream
      .option("checkpointLocation", s"$work/ckpt")
      .option("path", s"$work/out")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .format("parquet").start()
    q2.awaitTermination()
    val got2 = spark.read.parquet(s"$work/out")
      .as[(String, Long)].collect().toSet
    assert(got2 == got + (("D", 8L)))
  }

  test("dedup_incremental keeps every odd doc and drops every re-delivered even") {
    val dir = "/root/testdata/sf0.001"
    val out = graft.operators.TextOps.queries("dedup_incremental")(spark, dir)
    val nNew = out.agg(org.apache.spark.sql.functions.sum("n_new")).head().getLong(0)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    // the corpus has no cross-parity duplicate texts, so the survivors are
    // exactly the odd half; every re-delivered even (id % 10 == 0) is in
    // the corpus ledger by construction and must be anti-joined away
    val nOdd = docs.filter(org.apache.spark.sql.functions.expr("doc_id % 2 = 1")).count()
    assert(nNew == nOdd)
    val minDocs = out.select("min_doc").as[Long].collect()
    assert(minDocs.forall(_ % 2 == 1))
  }

  test("text_block_dedup: canonical first copy survives, later copies drop, " +
      "unique docs reassemble byte-identical") {
    val dir = "/root/testdata/sf0.001"
    val out = graft.operators.TextOps.queries("text_block_dedup")(spark, dir)
      .select("doc_id", "n_blocks", "n_removed", "n_kept_tokens", "kept_fp")
      .as[(Long, Long, Long, Long, String)].collect()
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    assert(out.length == docs.size)
    // removal happens (the corpus repeats 16-token blocks across docs)…
    assert(out.map(_._3).sum > 0)
    // …and an untouched document reassembles to EXACTLY its original text
    val md = java.security.MessageDigest.getInstance("MD5")
    def md5hex(s: String) = md.digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val untouched = out.filter(_._3 == 0L)
    assert(untouched.nonEmpty)
    untouched.foreach { case (id, _, _, nKept, fp) =>
      val orig = docs(id)
      assert(fp == md5hex(orig), s"doc $id reassembly drifted")
      assert(nKept == orig.split(" ").length)
    }
    // token conservation: kept tokens never exceed the original count
    out.foreach { case (id, _, _, nKept, _) =>
      assert(nKept <= docs(id).split(" ").length)
    }
  }

  test("text_pii_audit: detectors fire pre-scrub, re-detection post-scrub " +
      "is zero — the completeness gate is not vacuous") {
    val out = graft.operators.TextOps.queries("text_pii_audit")(
        spark, "/root/testdata/sf0.001")
      .select("n_docs", "pre_email", "pre_ip", "pre_phone",
        "post_email", "post_ip", "post_phone")
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
    assert(out.nonEmpty)
    val (docs, preE, preI, preP) =
      (out.map(_._1).sum, out.map(_._2).sum, out.map(_._3).sum, out.map(_._4).sum)
    // every planted doc carries exactly one email and one IP; the phone
    // detector also fires on the planted phone run (and the IP is
    // phone-shaped, so pre_phone counts both)
    assert(preE == docs && preI == docs && preP >= docs)
    // completeness: nothing PII-shaped survives the scrub
    assert(out.forall(r => r._5 == 0 && r._6 == 0 && r._7 == 0))
  }

  test("pipe_two_stage: every result is a stage-1 candidate, the final " +
      "order is the reranker's, and the reranker is load-bearing") {
    val dir = "/root/testdata/sf0.01"
    val out = graft.operators.TextOps.queries("pipe_two_stage")(spark, dir)
      .select("doc_id", "r_lex", "sim", "r_final")
      .as[(Long, Long, Double, Long)].collect().sortBy(_._4)
    assert(out.length == 10)
    // cascade containment: nothing outside the BM25 top-50 can surface
    assert(out.forall(_._2 <= 50))
    // final order is similarity order (ties by doc_id)
    assert(out.map(r => (-r._3, r._1)).sameElements(
      out.map(r => (-r._3, r._1)).sorted))
    // the reranker changes the head: final order != candidate order
    assert(out.map(_._2).toSeq != (1L to 10L).toSeq)
  }

  test("dedup_minhash_incr: probe pairs are exactly the batch pairs that " +
      "touch the increment — no base-base pair, none missed") {
    val dir = "/root/testdata/sf0.01"
    val d = spark.read.parquet(s"$dir/documents.parquet")
    val incr = graft.functions.Dedup.minhashLshIncremental(
        d, col("doc_id"), col("text"), incrPred = col("doc_id") % 5 === 0)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val full = graft.functions.Dedup.minhashLsh(d, col("doc_id"), col("text"))
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(incr.nonEmpty)
    assert(incr.forall { case (a, b) => a % 5 == 0 || b % 5 == 0 })
    assert(incr == full.filter { case (a, b) => a % 5 == 0 || b % 5 == 0 })
  }

  test("pipe_gate_ablation: cube totals telescope — grand total is the " +
      "corpus, marginals sum to it, the all-gates cell is the minimum") {
    val dir = "/root/testdata/sf0.001"
    val rows = graft.operators.TextOps.queries("pipe_gate_ablation")(spark, dir)
      .select("quality_ok", "lang_ok", "gopher_ok", "n_docs")
      .collect()
      .map(r => (Option(r.get(0)).map(_.asInstanceOf[Boolean]),
        Option(r.get(1)).map(_.asInstanceOf[Boolean]),
        Option(r.get(2)).map(_.asInstanceOf[Boolean]),
        r.getLong(3)))
    val total = spark.read.parquet(s"$dir/documents.parquet").count()
    def cell(q: Option[Boolean], l: Option[Boolean], g: Option[Boolean]) =
      rows.filter(r => r._1 == q && r._2 == l && r._3 == g).map(_._4).sum
    assert(cell(None, None, None) == total)
    // marginal split over any one flag reassembles the corpus
    assert(cell(Some(true), None, None) + cell(Some(false), None, None) == total)
    // the pass-all cell is bounded by every single-gate pass count
    val allPass = cell(Some(true), Some(true), Some(true))
    assert(allPass <= cell(Some(true), None, None))
    assert(allPass <= cell(None, Some(true), None))
    assert(allPass <= cell(None, None, Some(true)))
    assert(allPass > 0)
  }

  test("pipe_curriculum: ranks are the exact sort permutation and the " +
      "four stages balance to within one document") {
    val dir = "/root/testdata/sf0.001"
    val got = graft.operators.TextOps.queries("pipe_curriculum")(spark, dir)
      .select("doc_id", "difficulty_milli", "rank", "stage")
      .as[(Long, Long, Long, Long)].collect()
    val n = got.length
    assert(n > 0)
    // rank is the exact permutation of 1..n in (difficulty, doc_id) order —
    // the property approxQuantile staging cannot give
    val sorted = got.sortBy(r => (r._2, r._1))
    assert(sorted.map(_._3).toSeq == (1L to n.toLong))
    // stage law and ±1 balance
    got.foreach(r => assert(r._4 == (r._3 - 1) * 4 / n))
    val sizes = got.groupBy(_._4).view.mapValues(_.size).toMap
    assert(sizes.keySet == Set(0L, 1L, 2L, 3L))
    assert(sizes.values.max - sizes.values.min <= 1)
  }

  test("pipe_epoch_shuffle: each epoch is an exact permutation of 1..N " +
      "and the two epoch orders genuinely differ") {
    val dir = "/root/testdata/sf0.001"
    val got = graft.operators.TextOps.queries("pipe_epoch_shuffle")(spark, dir)
      .select("doc_id", "epoch", "skey", "pos")
      .as[(Long, Long, Long, Long)].collect()
    val byEpoch = got.groupBy(_._2)
    assert(byEpoch.keySet == Set(0L, 1L))
    val n = byEpoch(0L).length
    byEpoch.values.foreach { rows =>
      assert(rows.length == n)
      assert(rows.map(_._4).sorted.toSeq == (1L to n.toLong))
      // pos is the (skey, doc_id) sort rank — the hash IS the order
      assert(rows.sortBy(r => (r._3, r._1)).map(_._4).toSeq == (1L to n.toLong))
    }
    // the permutations differ (hash decorrelates epochs)
    val ord0 = byEpoch(0L).sortBy(_._4).map(_._1).toSeq
    val ord1 = byEpoch(1L).sortBy(_._4).map(_._1).toSeq
    assert(ord0 != ord1)
    assert(ord0.toSet == ord1.toSet)
  }

  test("pipe_drift_monitor: per-(source, dim) shares telescope to ~1e6, " +
      "TVD is the halved L1 and rides every cell") {
    val dir = "/root/testdata/sf0.001"
    val got = graft.operators.TextOps.queries("pipe_drift_monitor")(spark, dir)
      .select("source", "dim", "bucket", "prev_ppm", "curr_ppm",
        "delta_ppm", "tvd_ppm")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(got.map(_._2).toSet == Set("lang", "len"))
    got.groupBy(r => (r._1, r._2)).foreach { case (_, cells) =>
      val k = cells.length
      // floor-division shares: within k of the full million on each side
      val ps = cells.map(_._4).sum
      val cs = cells.map(_._5).sum
      assert(ps <= 1000000L && ps > 1000000L - k)
      assert(cs <= 1000000L && cs > 1000000L - k)
      // TVD = Σ|Δ| / 2, constant across the group's cells
      val tvd = cells.map(r => math.abs(r._6)).sum / 2
      assert(cells.forall(_._7 == tvd))
      assert(tvd >= 0 && tvd <= 1000000L)
    }
  }

  test("text_quality_calibration: pass counts are monotone in the " +
      "threshold and the 0.5 column reproduces text_quality exactly") {
    val dir = "/root/testdata/sf0.001"
    val got = graft.operators.TextOps.queries("text_quality_calibration")(spark, dir)
      .select("th_milli", "lang", "n_docs", "n_pass", "pass_ppm")
      .as[(Long, String, Long, Long, Long)].collect()
    assert(got.map(_._1).toSet == Set(300L, 400L, 500L, 600L, 700L))
    got.foreach(r => assert(r._5 == r._4 * 1000000L / r._3 && r._4 <= r._3))
    // per lang: raising the threshold never passes more documents
    got.groupBy(_._2).foreach { case (_, rows) =>
      val byTh = rows.sortBy(_._1).map(_._4)
      assert(byTh.sliding(2).forall(w => w(0) >= w(1)))
      assert(rows.map(_._3).distinct.length == 1)
    }
    // the 0.5 cut telescopes to exactly the shipped gate's output
    val gate = graft.operators.TextOps.queries("text_quality")(spark, dir).count()
    assert(got.filter(_._1 == 500L).map(_._4).sum == gate)
    // the sweep is informative: not all thresholds pass the same count
    assert(got.filter(_._1 == 300L).map(_._4).sum >
      got.filter(_._1 == 700L).map(_._4).sum)
  }

  test("text_ngram_novelty: the first document is fully novel, novelty " +
      "telescopes to the distinct-shingle count, near-dups score low") {
    val dir = "/root/testdata/sf0.001"
    val got = graft.operators.TextOps.queries("text_ngram_novelty")(spark, dir)
      .select("doc_id", "n_shingles", "n_novel", "novelty_ppm")
      .as[(Long, Long, Long, Long)].collect()
    assert(got.nonEmpty)
    got.foreach { case (_, n, novel, ppm) =>
      assert(novel >= 0 && novel <= n)
      assert(ppm == novel * 1000000L / n)
    }
    // the earliest doc introduces every one of its shingles
    val first = got.minBy(_._1)
    assert(first._4 == 1000000L)
    // every distinct shingle is charged to exactly one doc
    val distinctShingles = spark.read.parquet(s"$dir/documents.parquet")
      .select(explode(array_distinct(transform(
        graft.functions.Text.shingles(col("text"), 3),
        x => graft.functions.Portable.phash64(x) % lit(4294967296L)))).as("h"))
      .distinct().count()
    assert(got.map(_._3).sum == distinctShingles)
    // and the long tail is real: some docs are mostly derivative
    assert(got.exists(_._4 < 500000L))
  }

  test("pipe_token_budget: kept set is exactly the quality-ordered prefix " +
      "and closes the budget with the straddling document") {
    val dir = "/root/testdata/sf0.001"
    val kept = graft.operators.TextOps.queries("pipe_token_budget")(spark, dir)
      .select("doc_id", "q", "n_tokens", "cum")
      .as[(Long, Double, Long, Long)].collect()
    assert(kept.nonEmpty)
    val all = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), graft.functions.Text.qualityScore(col("text")).as("q"),
        graft.functions.Text.tokenCount(col("text")).cast("long").as("n"))
      .as[(Long, Double, Long)].collect()
    val budget = all.map(_._3).sum / 2
    // prefix property: in (q desc, doc_id) order the kept docs form an
    // exact prefix of the corpus
    val ordered = all.sortBy(r => (-r._2, r._1)).map(_._1).toSeq
    val keptSet = kept.map(_._1).toSet
    assert(ordered.take(kept.length).toSet == keptSet)
    // budget closure: spent-before-last < budget ≤ spent (straddle kept)
    val spent = kept.map(_._3).sum
    val last = kept.maxBy(_._4)
    assert(spent - last._3 < budget)
    assert(spent >= budget || kept.length == all.length)
    // cum is the running total in the same order
    assert(kept.sortBy(r => (-r._2, r._1)).map(_._3).scanLeft(0L)(_ + _).tail
      .zip(kept.sortBy(r => (-r._2, r._1)).map(_._4)).forall(p => p._1 == p._2))
  }

  test("text_split_leakfree: cluster keying never splits a near-dup family; " +
      "doc keying measurably does") {
    import org.apache.spark.sql.functions.{countDistinct, sum => fsum}
    val dir = "/root/testdata/sf0.01"
    val d = spark.read.parquet(s"$dir/documents.parquet")
    val labels = graft.functions.Dedup.componentLabels(
      graft.functions.Dedup.minhashLsh(d, col("doc_id"), col("text")))
    val members = d.select(col("doc_id")).join(labels, Seq("doc_id"))
      .withColumn("naive", graft.functions.Text.splitAssign(col("doc_id")))
      .withColumn("leakfree", graft.functions.Text.splitAssign(col("label")))
    // cluster keying: every family lands whole in ONE split
    assert(members.groupBy("label").agg(countDistinct("leakfree").as("n"))
      .filter(col("n") > 1).count() == 0)
    // doc keying: real families straddle sets — the leak being closed
    val naiveSpans = members.groupBy("label").agg(countDistinct("naive").as("n"))
      .filter(col("n") > 1).count()
    assert(naiveSpans > 0)
    // the query's summary agrees with the member-level count, and the
    // split is total (every document lands somewhere, exactly once)
    val q = graft.operators.TextOps.queries("text_split_leakfree")(spark, dir)
    assert(q.agg(fsum("n_clusters_naive_leaky")).head().getLong(0) == naiveSpans)
    assert(q.agg(fsum("n_docs")).head().getLong(0) == d.count())
  }

  test("text_bloom_contaminate: no false negatives, and FP accounting is exact") {
    val dir = "/root/testdata/sf0.001"
    val bloom = graft.operators.TextOps.queries("text_bloom_contaminate")(spark, dir)
      .select("doc_id", "n_bloom_hits", "n_true_hits", "n_false_pos")
      .as[(Long, Long, Long, Long)].collect()
    assert(bloom.nonEmpty)
    assert(bloom.forall { case (_, b, t, f) => b == t + f && f >= 0 && t >= 0 })
    // the Bloom guarantee: a true benchmark shingle can NEVER be missed —
    // every doc text_contamination flags appears here with the SAME
    // distinct-overlap count
    val trueHits = graft.operators.TextOps.queries("text_contamination")(spark, dir)
      .select("doc_id", "n_hits").as[(Long, Long)].collect().toMap
    val byDoc = bloom.map { case (d, _, t, _) => d -> t }.toMap
    assert(trueHits.forall { case (d, n) => byDoc.get(d).contains(n) })
  }

  test("text_cms_heavy: the sketch error is one-sided and collisions are exercised") {
    val out = graft.operators.TextOps.queries("text_cms_heavy")(
      spark, "/root/testdata/sf0.001")
      .select("est", "true_n", "overestimate").as[(Long, Long, Long)].collect()
    assert(out.length == 20)
    // CMS can only OVER-count (est = min over d counters, each a
    // superset sum); an under-count anywhere is a broken sketch
    assert(out.forall { case (e, t, o) => e >= t && o == e - t })
    assert(out.exists(_._3 > 0), "width chosen to collide, yet no overestimate")
  }

  test("CMS counters are mergeable: CMS(even docs) + CMS(odd docs) == CMS(corpus)") {
    // the property that lets the sketch build map-side and union across
    // corpora at 100 TB — counter tables are plain sums, so splitting the
    // corpus any way and adding cell-wise must reproduce the whole
    val dir = "/root/testdata/sf0.001"
    val d = spark.read.parquet(s"$dir/documents.parquet")
    def counters(part: org.apache.spark.sql.DataFrame) =
      graft.operators.TextOps.cmsCounters(graft.operators.TextOps.cmsHashed(
        part.select(explode(split(col("text"), " ")).as("term"))
          .groupBy(col("term")).agg(count(lit(1)).as("n"))))
        .as[(Int, Long, Long)].collect().map { case (j, p, c) => (j, p) -> c }.toMap
    val whole = counters(d)
    val even = counters(d.filter(col("doc_id") % 2 === 0))
    val odd = counters(d.filter(col("doc_id") % 2 === 1))
    val merged = (even.keySet ++ odd.keySet).map(k =>
      k -> (even.getOrElse(k, 0L) + odd.getOrElse(k, 0L))).toMap
    assert(merged == whole)
  }

  test("text_weighted_sample: the A-ES key law — for a fixed draw, more weight wins") {
    // key = ln(u)/w is strictly increasing in w for u in (0,1); the
    // sample must therefore prefer the heavier doc whenever hashes tie
    val u = 0.37
    val keys = Seq(1L, 10L, 1000L).map(w => math.log(u) / w)
    assert(keys == keys.sorted)
    // and on the corpus: every selected key is >= every unselected key
    // (top-k really is the global top-k of the one-pass projection)
    val dir = "/root/testdata/sf0.001"
    val sel = graft.operators.TextOps.queries("text_weighted_sample")(spark, dir)
      .select("doc_id", "wkey").as[(Long, Double)].collect()
    assert(sel.length == 20)
    val minSel = sel.map(_._2).min
    val selIds = sel.map(_._1).toSet
    // recompute the keyed projection for the UNSELECTED remainder with
    // the oracle-mirrored formula: no remainder key may beat the
    // selected minimum (the head really is the global top-k)
    val rest = spark.read.parquet(s"$dir/documents.parquet")
      .filter(!col("doc_id").isin(selIds.toSeq: _*))
      .select(col("doc_id"),
        graft.functions.Text.tokenCount(col("text")).cast("long").as("n"))
      .withColumn("u",
        (pmod(graft.functions.Portable.phash64(
          concat(col("doc_id").cast("string"), lit(":es"))), lit(1000000L)) +
          lit(1L)).cast("double") / lit(1000001.0))
      .withColumn("wkey", round(log(col("u")) / col("n").cast("double"), 6))
      .select("wkey").as[Double].collect()
    assert(rest.forall(_ <= minSel))
  }

  test("containment catches a near-superset pair that Jaccard misses") {
    // doc 2 = doc 1 quoted inside a much larger article: the small doc's
    // shingles are ~fully contained, but the big doc dilutes the union
    // so J < 0.5 — a resemblance-only pass would not pair them
    val quoted = (1 to 12).map(i => s"q$i").mkString(" ")
    val article = (1 to 60).map(i => s"w$i").mkString(" ") + " " + quoted
    val unrelated = (1 to 30).map(i => s"z$i").mkString(" ")
    val docs = Seq((1L, quoted), (2L, article), (3L, unrelated))
      .toDF("doc_id", "text")
    val got = Dedup.containmentPairs(docs, col("doc_id"), col("text"))
      .select("doc_a", "doc_b", "n_a", "n_b", "n_inter", "jaccard_low")
      .as[(Long, Long, Long, Long, Long, Boolean)].collect().toSeq
    // exactly the (quote, article) pair, flagged as Jaccard-invisible
    assert(got.map(r => (r._1, r._2)) == Seq((1L, 2L)))
    val (_, _, na, nb, ni, jLow) = got.head
    assert(ni == na) // the quote is FULLY contained (9 shingles of 12 words)
    assert(ni * 3 < na + nb && jLow) // J < 1/2: containment-only catch
    // and the resemblance pass indeed misses it at its 0.5 bar
    assert(Dedup.ngramJaccard(docs, col("doc_id"), col("text")).count() == 0L)
  }

  test("prefixFilterJaccard: equals brute force (completeness), and finds the " +
      "common-shingle pair that a df-cutoff inverted index structurally misses") {
    // Docs 1 and 2 are IDENTICAL (J = 1), but every one of their shingles
    // also appears in docs 3..12 (df = 12 for all of them): a df-cutoff
    // index with maxDf below 12 drops all their shingles and never pairs
    // them. The prefix index keeps each doc's rarest-half shingles
    // regardless of absolute df, so the pair survives by construction.
    val core = (1 to 12).map(i => s"w$i").mkString(" ")
    val docs = (Seq((1L, core), (2L, core)) ++
      (3L to 12L).map(i => (i, core + " " + (1 to 40).map(j => s"u${i}x$j").mkString(" ")))
    ).toDF("doc_id", "text")
    val got = Dedup.prefixFilterJaccard(docs, col("doc_id"), col("text"))
      .as[(Long, Long, Long, Long)].collect().toSet
    // Brute force over the same hashed 4-shingle sets, J ≥ 1/2 ⟺ 3i ≥ a+b.
    val sets = docs.select(col("doc_id"), array_distinct(transform(
        Text.shingles(col("text"), 4),
        x => graft.functions.Portable.phash64(x))).as("s"))
      .as[(Long, Seq[Long])].collect().map(t => t._1 -> t._2.toSet).toMap
    val brute = (for {
      a <- sets.keys; b <- sets.keys if a < b
      i = (sets(a) & sets(b)).size.toLong
      u = sets(a).size + sets(b).size - i
      if sets(a).nonEmpty && sets(b).nonEmpty && i * 2 >= u
    } yield (a, b, i, u)).toSet
    assert(got == brute)
    assert(got.exists(p => p._1 == 1L && p._2 == 2L)) // the planted pair
    // df-cutoff at maxDf=5 misses it (its shingles all have df 12)…
    assert(!Dedup.ngramJaccard(docs, col("doc_id"), col("text"), maxDf = 5)
      .collect().exists(r => r.getLong(0) == 1L && r.getLong(1) == 2L))
    // …while the prefix filter needed no recall knob at all.
  }

  test("text_boilerplate golden: df ≥ 3 drops EVERY occurrence (no canonical " +
      "survivor, repeats within one doc included); df = 2 keeps both") {
    val header = (1 to 8).map(i => s"h$i").mkString(" ") // df = 4 → boiler
    val pair = (1 to 8).map(i => s"p$i").mkString(" ") // df = 2 → kept
    def uniq(tag: String) = (1 to 8).map(i => s"$tag$i").mkString(" ")
    val docs = Seq(
      (1L, s"$header ${uniq("a")}"),
      (2L, s"$header ${uniq("b")}"),
      (3L, header), // boiler only → empty reassembly
      (4L, s"$pair ${uniq("c")}"),
      (5L, s"$pair ${uniq("d")}"),
      (6L, s"$header $header")) // boiler twice IN ONE DOC → both dropped
    val dir = s"${System.getProperty("java.io.tmpdir")}/graft_boiler_golden"
    graft.streaming.IncrSync.deletePath(spark, dir)
    docs.toDF("doc_id", "text")
      .select(col("doc_id"), col("text"), lit("en").as("lang"),
        lit("src0").as("source"), length(col("text")).cast("long").as("n_chars"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = graft.operators.TextOps.queries("text_boilerplate")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))).toMap
    val emptyMd5 = java.security.MessageDigest.getInstance("MD5")
      .digest(Array.emptyByteArray).map("%02x".format(_)).mkString
    assert(out(1L) == (2L, 1L, 8L, md5Of(uniq("a"))))
    assert(out(2L) == (2L, 1L, 8L, md5Of(uniq("b"))))
    assert(out(3L) == (1L, 1L, 0L, emptyMd5))
    assert(out(4L) == (2L, 0L, 16L, md5Of(s"$pair ${uniq("c")}")))
    assert(out(5L) == (2L, 0L, 16L, md5Of(s"$pair ${uniq("d")}")))
    assert(out(6L) == (2L, 2L, 0L, emptyMd5))
  }

  private def md5Of(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("pipe_pref_pairs law: chosen is the group's quality argmax, rejected " +
      "the argmin (ties on doc_id via struct order), singletons absent") {
    val dir = "/root/testdata/sf0.001"
    val d = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("lang"), col("source"),
        graft.functions.Text.qualityScore(col("text")).as("q"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getDouble(3)))
    val groups = d.groupBy(t => (t._2, t._3))
    val out = graft.operators.TextOps.queries("pipe_pref_pairs")(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(3), r.getLong(4), r.getDouble(5))).toMap
    for ((key, members) <- groups) {
      if (members.size >= 2) {
        val ch = members.maxBy(t => (t._4, t._1))
        val rj = members.minBy(t => (t._4, t._1))
        val (gotCh, gotRj, margin) = out(key)
        assert(gotCh == ch._1 && gotRj == rj._1, s"$key")
        assert(margin == ch._4 - rj._4 && margin >= 0.0, s"$key margin")
      } else assert(!out.contains(key), s"singleton $key must be absent")
    }
    assert(out.keySet == groups.filter(_._2.size >= 2).keySet)
  }

  test("componentParts: byte-budget width derivation pinned at every regime " +
      "(the r19 6400-row budget hit the 4096 cap at the 100x pair graph " +
      "and ran a 21 s query past 35 min - this spec locks the corrected " +
      "2M-row/~64MB budget so the boundary values cannot silently drift)") {
    import graft.functions.Dedup.componentParts
    // floor 4: every sf0.01/sf0.1 gate graph (hundreds to thousands of
    // edges) and anything below the exact 4->8 boundary at 4M edges
    assert(componentParts(0) == 4)
    assert(componentParts(150) == 4)
    assert(componentParts(4000000L) == 4) // 4 * 2M >= 2n exactly at n = 4M
    assert(componentParts(4000001L) == 8)
    // the 100x replica-expanded embed graph class (~24M edges) -> 32,
    // the width whose measured wall is 73.8 s (SCALE_r19 sec. 1)
    assert(componentParts(24000000L) == 32)
    // 1e9 edges -> 1024; the 4096 cap binds only past ~4.1e9 edges
    assert(componentParts(1000000000L) == 1024)
    assert(componentParts(4100000000L) == 4096)
    assert(componentParts(Long.MaxValue) == 4096)
  }
}
