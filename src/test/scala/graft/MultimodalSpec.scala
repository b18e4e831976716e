package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Multimodal

/** Multimodal binary-column plumbing tests: header synthesis/parse
  * round-trip, decode-stub batch contract, frame arithmetic.
  */
class MultimodalSpec extends AnyFunSuite {
  lazy val spark = SparkTest.spark
  import spark.implicits._

  private def docs = Seq(
    (0L, "Hello, World! This is a png-tagged document."),
    (1L, "Another doc; JPEG header expected here."),
    (2L, "and a third one that pretends to be a WAV file."),
    (3L, "x")).toDF("doc_id", "text")

  test("binary header round-trips: magic sniff, dims, payload digest") {
    val got = Multimodal.meta(Multimodal.withBinary(docs))
      .orderBy("doc_id")
      .as[(Long, String, Long, Long, Long, String)].collect().toSeq
    assert(got.map(_._2) == Seq("png", "jpeg", "wav", "png"))
    got.foreach { case (id, _, w, h, plen, pmd5) =>
      assert(w == 16 + (id * 7) % 1024)
      assert(h == 16 + (id * 13) % 1024)
      val text = docs.filter(col("doc_id") === id).select("text").as[String].head()
      assert(plen == text.getBytes("UTF-8").length)
      val md = java.security.MessageDigest.getInstance("MD5")
      assert(pmd5 == md.digest(text.getBytes("UTF-8")).map("%02x".format(_)).mkString)
    }
  }

  test("decode stub: per-partition batch contract, deterministic fake decode") {
    val got = Multimodal.decodeStub(Multimodal.withBinary(docs))
      .orderBy("doc_id")
      .as[(Long, Int, Int, Int, Long, Long)].collect().toSeq
    assert(got.size == 4)
    got.foreach { case (id, magic, w, h, nPix, crc) =>
      assert(nPix == w.toLong * h)
      val expectMagic = (id % 3) match {
        case 0 => 0x89504E47
        case 1 => 0xFFD8FFE0
        case 2 => 0x52494646
      }
      assert(magic == expectMagic)
      val text = docs.filter(col("doc_id") === id).select("text").as[String].head()
      val c = new java.util.zip.CRC32
      c.update(text.getBytes("UTF-8"))
      assert(crc == c.getValue)
    }
  }

  test("ascii-normalize kernel ≡ lower(regexp_replace) on arbitrary UTF-8 " +
      "(multibyte chars strip whole, ASCII case folds, class survives)") {
    val rnd = new scala.util.Random(16)
    val pool = "AZaz09 ,.!?~é中😀ß\n\tXq3"
    val texts = (0L until 200L).map { i =>
      (i, (0 until rnd.nextInt(80)).map(_ => pool(rnd.nextInt(pool.length))).mkString)
    } :+ (999L, "") :+ (998L, "é中") // empty + all-multibyte
    val media = Multimodal.withBinary(texts.toDF("doc_id", "text"))
    val got = media.select(col("doc_id"),
        Multimodal.normPayload.as("k"),
        Multimodal.normPayloadComposed.as("r"))
      .filter(col("k") =!= col("r") ||
        col("k").isNull =!= col("r").isNull)
    assert(got.count() == 0, got.collect().take(3).mkString("; "))
  }

  test("audio energy: fused kernel ≡ the explode/aggregate composition " +
      "(values, trim offsets, silence counts — incl. all-silent and tails)") {
    val rnd = new scala.util.Random(20260815)
    val alphabet = "abcdefghijklmnopqrstuvwxyz0123456789 "
    val generated = (10L until 70L).map { i =>
      val len = 1 + rnd.nextInt(140)
      (i, (0 until len).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
    }
    val edges = Seq(
      (0L, "n" * 48), // sample == 0 everywhere: all-silent, null trim offsets
      (1L, "n" * 33), // all-silent with a 1-char tail window
      (2L, "0000000000000000"), // exactly one window, loud (d² = 3844 > 3000/16·…)
      (3L, "nnnnnnnnnnnnnnnn00000000000000000nnnnnnnnnnnnnnnn"), // loud mid-span
      (4L, "z")) // single sample
    val media = Multimodal.withBinary((edges ++ generated).toDF("doc_id", "text"))
    for (win <- Seq(16, 7)) {
      val fused = Multimodal.audioEnergy(media, win = win)
      val hof = Multimodal.audioEnergyHof(media, win = win)
      val composed = Multimodal.audioEnergyComposed(media, win = win)
      for (other <- Seq(hof, composed)) {
        assert(fused.schema.map(f => (f.name, f.dataType)) ==
          other.schema.map(f => (f.name, f.dataType)))
        assert(fused.count() == other.count())
        assert(fused.exceptAll(other).isEmpty && other.exceptAll(fused).isEmpty,
          s"win=$win: variants diverge")
      }
    }
    // the all-silent doc really exercises the null-trim arm
    val row = Multimodal.audioEnergy(media).filter(col("doc_id") === 0L).head()
    assert(row.isNullAt(row.fieldIndex("first_loud"))
      && row.isNullAt(row.fieldIndex("last_loud")))
    assert(row.getAs[Long]("n_silent") == row.getAs[Long]("n_windows"))
  }

  test("vad segments: kernel islands ≡ window-function gaps-and-islands " +
      "over the exploded energies (incl. all-silent → empty, tail run)") {
    val rnd = new scala.util.Random(777)
    val alphabet = "abcdefghijklmnopqrstuvwxyz0123456789 "
    val generated = (10L until 80L).map { i =>
      val len = 1 + rnd.nextInt(200)
      (i, (0 until len).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
    }
    val edges = Seq(
      (0L, "n" * 64), // all silent → NO rows
      (1L, "0" * 64), // all loud → one segment spanning every window
      (2L, ("n" * 16) + ("0" * 16) + ("n" * 16) + ("0" * 16)), // two islands, tail loud
      (3L, ("0" * 16) + ("n" * 16) + ("0" * 16))) // loud at both edges
    val media = Multimodal.withBinary((edges ++ generated).toDF("doc_id", "text"))
    val fused = Multimodal.vadSegments(media)
    // independent derivation: explode energies → filter loud → islands
    // via w − row_number, then re-rank — Spark window functions only
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("w"))
    val exploded = media
      .select(col("doc_id"), Multimodal.normPayload.as("norm"))
      .filter(length(col("norm")) > 0)
      .select(col("doc_id"), posexplode(
        graft.plans.AudioEnergies(col("norm"), 16)))
      .select(col("doc_id"), col("pos").cast("long").as("w"),
        col("col").as("energy"))
      .filter(col("energy") >= 3000L)
      .withColumn("grp", col("w") - row_number().over(w))
    val seg = exploded.groupBy(col("doc_id"), col("grp"))
      .agg(min(col("w")).as("w_start"), max(col("w")).as("w_end"),
        count(lit(1)).as("n_windows"), sum(col("energy")).as("seg_energy"))
    val composed = seg.select(col("doc_id"),
        (row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("doc_id")).orderBy(col("w_start"))) - 1L)
          .cast("long").as("seg_idx"),
        col("w_start"), col("w_end"), col("n_windows"), col("seg_energy"))
    assert(fused.count() == composed.count())
    assert(fused.exceptAll(composed).isEmpty && composed.exceptAll(fused).isEmpty)
    // the edge docs pin the shapes directly
    assert(fused.filter(col("doc_id") === 0L).count() == 0)
    val allLoud = fused.filter(col("doc_id") === 1L).collect()
    assert(allLoud.length == 1 && allLoud(0).getAs[Long]("w_start") == 0L
      && allLoud(0).getAs[Long]("n_windows") == 4L)
    assert(fused.filter(col("doc_id") === 2L).count() == 2)
  }

  test("frame sampling: every 3rd fixed-width frame, tail frame short") {
    val one = Seq((7L, "a" * 70)).toDF("doc_id", "text")
    val got = Multimodal.frameSample(Multimodal.withBinary(one))
      .orderBy("frame_idx")
      .select("frame_idx", "frame_len").as[(Long, Long)].collect().toSeq
    // 70 chars → frames 0,1,2 (len 32,32,6); sampled: 0 only (0%3==0)
    assert(got == Seq((0L, 32L)))
    val three = Seq((8L, "b" * 200)).toDF("doc_id", "text")
    val got2 = Multimodal.frameSample(Multimodal.withBinary(three))
      .orderBy("frame_idx")
      .select("frame_idx", "frame_len").as[(Long, Long)].collect().toSeq
    // 200 chars → frames 0..6 (tail len 8); sampled 0,3,6
    assert(got2 == Seq((0L, 32L), (3L, 32L), (6L, 8L)))
  }

  test("near-dup: identical payload chunks pair up, distinct ones do not") {
    val sentence = "the quick brown fox jumps over the lazy dog " // 44 chars
    val base = sentence * 4 // chunks align exactly with the 4 repeats
    val d = Seq(
      (1L, base), (2L, base), // exact near-dups: all 4 chunks equal
      (3L, sentence * 3 + sentence.replace("dog", "cat")), // last chunk differs
      (4L, "completely different content with nothing shared at all " * 3))
      .toDF("doc_id", "text")
    val got = Multimodal.nearDup(Multimodal.withBinary(d))
      .select("doc_a", "doc_b", "n_frames").as[(Long, Long, Long)].collect().toSeq.sorted
    // 176-char payload → 11 distinct 16-char frames, all shared by 1 and 2;
    // doc 3 differs only in the last frame (dog→cat at chars 172-174)
    assert(got.contains((1L, 2L, 11L)))
    assert(got.contains((1L, 3L, 10L)))
    assert(got.contains((2L, 3L, 10L)))
    assert(!got.exists(t => t._1 == 4L || t._2 == 4L))
  }

  test("mm_interleave: packing conserves docs/bytes, placeholder budget is " +
      "exactly the modality mix, sequences are contiguous") {
    val dir = "/root/testdata/sf0.001"
    val out = graft.operators.MmOps.queries("mm_interleave")(spark, dir)
      .select("seq_id", "n_docs", "n_placeholder_tokens", "n_images",
        "n_audio", "media_bytes")
      .as[(Long, Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    assert(out.map(_._2).sum == docs.count())
    // the placeholder budget IS the modality mix
    assert(out.forall(r => r._3 == 64 * r._4 + 32 * r._5))
    // bytes conserve against the payload universe
    val totalBytes = docs.select(
      org.apache.spark.sql.functions.sum(length(col("text")).cast("long")))
      .head().getLong(0)
    assert(out.map(_._6).sum == totalBytes)
    // sequence ids are contiguous from 0 (no empty bins)
    assert(out.map(_._1).toSeq == out.indices.map(_.toLong))
  }

  test("mm_clip_filter: every embedding pairs exactly once, the keep verdict " +
      "is the threshold, and the gate separates the corpus") {
    val dir = "/root/testdata/sf0.001"
    val out = graft.operators.MmOps.queries("mm_clip_filter")(spark, dir)
      .select("pair_id", "label_img", "label_txt", "clip_sim", "keep")
      .as[(Long, Int, Int, Double, Boolean)].collect()
    val nVecs = spark.read.parquet(s"$dir/embeddings.parquet").count()
    assert(out.length == nVecs / 2) // every (even, odd) adjacency pairs once
    assert(out.map(_._1).distinct.length == out.length)
    assert(out.forall(p => p._1 % 2 == 0))
    assert(out.forall { case (_, _, _, sim, keep) => keep == (sim >= 0.1) })
    // the gate is live: it keeps some pairs and drops some pairs (a
    // threshold that passes or rejects everything gates nothing)
    assert(out.exists(_._5) && out.exists(!_._5))
    // cosine is a similarity: bounded
    assert(out.forall(p => p._4 >= -1.0 - 1e-9 && p._4 <= 1.0 + 1e-9))
  }

  test("mm_storage_dedup: block-CAS savings law — physical ≤ logical, " +
      "ppm formula exact, logical bytes reconcile with the normalized corpus") {
    val dir = "/root/testdata/sf0.001"
    val got = graft.operators.MmOps.queries("mm_storage_dedup")(spark, dir)
      .select("kind", "n_blocks", "n_unique", "logical_bytes",
        "physical_bytes", "saved_ppm")
      .as[(String, Long, Long, Long, Long, Long)].collect()
    assert(got.map(_._1).toSet == Set("png", "jpeg", "wav"))
    got.foreach { case (_, blocks, uniq, logical, physical, ppm) =>
      assert(uniq <= blocks && physical <= logical && physical > 0)
      assert(ppm == (logical - physical) * 1000000L / logical)
    }
    // blocks genuinely repeat (the same shared runs mm_near_dup banks on)
    assert(got.forall(r => r._2 > r._3))
    assert(got.exists(_._6 > 0))
    // every normalized content byte is accounted exactly once in logical
    val normLen = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"),
        expr("CASE doc_id % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' ELSE 'wav' END")
          .as("kind"),
        length(lower(regexp_replace(col("text"), "[^A-Za-z0-9 ]", "")))
          .cast("long").as("n"))
      .groupBy(col("kind")).agg(sum(col("n")).as("total"))
      .as[(String, Long)].collect().toMap
    got.foreach(r => assert(normLen(r._1) == r._4))
  }
}
