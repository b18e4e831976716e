package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.sinks.Envelope
import graft.transform.UpdateSpec

/** Property-based invariants (SURVEY.md §5's additions over the
  * reference's example tests): apply idempotence, partitioning-order
  * invariance, update-spec algebra, codec round-trip on arbitrary inputs.
  */
class PropertySpec extends AnyFunSuite {
  lazy val spark = SparkTest.spark
  import spark.implicits._

  /** Deterministic generator drive (no scalatest-scalacheck bridge in the
    * dependency set): n samples from fixed seeds.
    */
  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  private val opGen = Gen.oneOf("i", "u", "d")
  private val batchGen = Gen.listOfN(60, for {
    key <- Gen.choose(0, 9)
    op <- opGen
    v <- Gen.choose(0, 999)
  } yield (key.toString, op, v.toDouble / 100))

  private def toOplog(rows: List[(String, String, Double)]) =
    rows.zipWithIndex.map { case ((k, op, v), i) =>
      (i.toLong, (1000 + i).toLong, op, "app", "u0", "app.u0", k, "", v, false, s"""{"k": $i}""")
    }.toDF("event_id", "ts_packed", "op", "db", "coll", "ns",
      "doc_key", "g", "value", "from_migrate", "props")

  test("apply idempotence: replaying a batch on top of itself changes nothing") {
    samples(batchGen, 5).foreach { rows =>
      val df = toOplog(rows)
      val once = graft.apply.Replay.materialize(df)
        .orderBy("doc_key").collect().toSeq
      val twice = graft.apply.Replay.materialize(df.unionByName(df))
        .orderBy("doc_key").collect().toSeq
      // same final keys and values; only the op count doubles
      assert(once.map(r => (r.getString(1), r.getDouble(2), r.getLong(3))) ==
        twice.map(r => (r.getString(1), r.getDouble(2), r.getLong(3))))
    }
  }

  test("routing-order invariance: materialized state is the same under any partition count") {
    samples(batchGen.flatMap(r => Gen.oneOf(1, 3, 7, 32).map(r -> _)), 5)
      .foreach { case (rows, n) =>
        val df = toOplog(rows)
        val base = graft.apply.Replay.materialize(df).orderBy("doc_key").collect().toSeq
        val rep = graft.apply.Replay.materialize(df.repartition(n)).orderBy("doc_key").collect().toSeq
        assert(base == rep)
      }
  }

  private val docGen: Gen[String] = for {
    a <- Gen.choose(-1000L, 1000L)
    s <- Gen.alphaNumStr.map(_.take(8))
    arr <- Gen.listOfN(4, Gen.choose(0, 9))
  } yield s"""{"a":$a,"s":"$s","arr":[${arr.mkString(",")}]}"""

  test("update-spec algebra: $set then $unset removes; $inc sums associatively") {
    samples(for { d <- docGen; x <- Gen.choose(-50L, 50L); y <- Gen.choose(-50L, 50L) }
        yield (d, x, y), 20).foreach { case (doc, x, y) =>
        val afterSetUnset = UpdateSpec.applySpecJson(
          UpdateSpec.applySpecJson(doc, s"""{"$$set":{"tmp":$x}}"""),
          """{"$unset":{"tmp":true}}""")
        assert(org.json4s.jackson.JsonMethods.parse(afterSetUnset) ==
          org.json4s.jackson.JsonMethods.parse(doc))
        val incTwice = UpdateSpec.applySpecJson(
          UpdateSpec.applySpecJson(doc, s"""{"$$inc":{"a":$x}}"""), s"""{"$$inc":{"a":$y}}""")
        val incOnce = UpdateSpec.applySpecJson(doc, s"""{"$$inc":{"a":${x + y}}}""")
        assert(org.json4s.jackson.JsonMethods.parse(incTwice) ==
          org.json4s.jackson.JsonMethods.parse(incOnce))
    }
  }

  test("$push/$pop inverse on nonempty tails; $slice bounds the array") {
    samples(for { d <- docGen; v <- Gen.choose(0L, 99L) } yield (d, v), 20)
        .foreach { case (doc, v) =>
      val pushed = UpdateSpec.applySpecJson(doc, s"""{"$$push":{"arr":$v}}""")
      val popped = UpdateSpec.applySpecJson(pushed, """{"$pop":{"arr":1}}""")
      assert(org.json4s.jackson.JsonMethods.parse(popped) ==
        org.json4s.jackson.JsonMethods.parse(doc))
      val sliced = UpdateSpec.applySpecJson(pushed,
        """{"$v":2,"diff":{"sarr":{"a":true,"l":2}}}""")
      val arr = (org.json4s.jackson.JsonMethods.parse(sliced) \ "arr")
        .asInstanceOf[org.json4s.JArray].arr
      assert(arr.size == 2)
    }
  }

  test("txn fold: batch-split invariance — any micro-batch cut of a chain emits the same ops and leaves the same buffer") {
    import graft.streaming.TxnAssembler.{foldEntries, TxnEntry, TxnKey}
    val key = TxnKey("L", 1L)
    val chainGen = for {
      n <- Gen.choose(1, 8)
      kinds <- Gen.listOfN(n, Gen.frequency(4 -> "partial", 2 -> "commit", 1 -> "abort"))
    } yield kinds.zipWithIndex.map { case (k, i) =>
      TxnEntry("L", 1L, i.toLong, k,
        if (k == "abort") Nil else Seq(s"op${i}a", s"op${i}b"), 100L + i)
    }
    samples(for { es <- chainGen; cut <- Gen.choose(0, 8) } yield (es, cut), 30)
      .foreach { case (entries, cut0) =>
        val cut = math.min(cut0, entries.size)
        // one shot vs split at `cut` with the buffer threaded through —
        // exactly what the streaming state does across triggers
        val (wholeBuf, whole) = foldEntries(key, entries, Nil)
        val (b1, out1) = foldEntries(key, entries.take(cut), Nil)
        val (b2, out2) = foldEntries(key, entries.drop(cut), b1)
        assert(out1 ++ out2 == whole)
        assert(b2 == wholeBuf)
      }
  }

  test("pii scrub is idempotent and total on arbitrary text") {
    // the replacement tags contain no digit/@ material, so a second pass
    // must be a fixpoint — on generated text salted with real PII shapes
    val piiGen = for {
      pre <- Gen.alphaStr.map(_.take(12))
      user <- Gen.alphaNumStr.map(_.take(6).padTo(1, 'x'))
      n <- Gen.choose(1000, 9999)
      a <- Gen.choose(0, 255); b <- Gen.choose(0, 255)
    } yield s"$pre $user@test.org call +1-555-$n from $a.$b.2.3 end"
    val texts = samples(piiGen, 40)
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val once = df.select(col("id"), graft.functions.Text.piiScrub(col("text")).as("c"))
    val twice = once.select(col("id"), graft.functions.Text.piiScrub(col("c")).as("c"))
    assert(once.except(twice).count() == 0 && twice.except(once).count() == 0)
    // every pattern class fired on every row
    val counts = once.select(
      sum(graft.functions.Text.occurrences(col("c"), "<EMAIL>")),
      sum(graft.functions.Text.occurrences(col("c"), "<PHONE>")),
      sum(graft.functions.Text.occurrences(col("c"), "<IP>"))).head()
    assert(counts.getLong(0) >= 40 && counts.getLong(1) >= 40 && counts.getLong(2) >= 40)
  }

  test("dynamic QoS with one control row equals the static token bucket") {
    val arrivalsGen = Gen.listOfN(200, Gen.choose(0L, 5000000000L))
    samples(arrivalsGen, 3).foreach { tss =>
      val df = tss.zipWithIndex.map { case (ts, i) => (i.toLong, ts << 32) }
        .toDF("event_id", "ts_packed")
      val budget = 7L
      val limits = Seq((Long.MinValue, budget)).toDF("from_tick", "budget")
      val dyn = graft.streaming.Coordinator
        .qosAdmissionDynamic(df, 86400L, limits, defaultBudget = budget)
        .select("tick", "n_arrived", "n_admitted", "n_deferred")
      val stat = graft.streaming.Coordinator.qosAdmission(df, 86400L, budget)
      assert(dyn.except(stat).count() == 0 && stat.except(dyn).count() == 0)
    }
  }

  test("contamination: an exact copy of a benchmark doc is fully contaminated") {
    val textGen = Gen.listOfN(12, Gen.oneOf("alpha", "beta", "gamma", "delta",
      "epsilon", "zeta", "eta")).map(_.mkString(" "))
    val texts = samples(textGen, 10)
    // doc 0 is the benchmark; doc 10 copies it verbatim; others are random
    val rows = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) } :+ (10L, texts.head)
    val df = rows.toDF("doc_id", "text")
    val out = graft.functions.Dedup
      .contamination(df, col("doc_id"), col("text"), benchPred = col("doc_id") === 0)
      .filter(col("doc_id") === 10).head()
    assert(out.getAs[Double]("contamination") == 1.0)
  }

  test("chunk windows cover every token; stripping the overlap reconstructs the document") {
    val textGen = Gen.choose(1, 200).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("aa", "bb", "cc", "dd")).map(_.mkString(" ")))
    val texts = samples(textGen, 20)
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val chunks = df.select(col("id"),
        explode(graft.functions.Text.chunkWindows(col("text"), size = 64, stride = 56)).as("c"))
      .select(col("id"), col("c.chunk_idx").as("idx"), col("c.chunk_tokens").as("w"))
      .as[(Long, Int, Seq[String])].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      val toks = t.split(" ").toSeq
      val ws = chunks(i.toLong)
      // chunk k holds tokens [k*56, k*56+64); the first 56 of each chunk
      // plus the tail of the last reconstruct the document exactly
      assert(ws.map(_._2).toSeq == ws.indices.toSeq)
      val rebuilt = (ws.dropRight(1).flatMap(_._3.take(56)) ++ ws.last._3).toSeq
      assert(rebuilt == toks, s"doc $i not reconstructed")
    }
  }

  test("hash split is stable and lands near the requested fractions") {
    val ids = (0L until 5000L).toDF("doc_id")
    val split = ids.select(col("doc_id"),
      graft.functions.Text.splitAssign(col("doc_id")).as("s"))
    val counts = split.groupBy("s").count().as[(String, Long)].collect().toMap
    assert(math.abs(counts("train") - 4000L) < 300)
    assert(math.abs(counts("val") - 500L) < 150)
    assert(math.abs(counts("test") - 500L) < 150)
    // deterministic: a re-evaluation under different partitioning agrees
    val again = ids.repartition(7).select(col("doc_id"),
      graft.functions.Text.splitAssign(col("doc_id")).as("s"))
    assert(split.except(again).count() == 0)
  }

  test("sq8 reconstruction error is bounded by half a quantization step") {
    val vecGen = Gen.listOfN(16, Gen.choose(-1000, 1000).map(_ / 250.0f))
    val vecs = samples(vecGen, 30)
    val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "e")
    val rows = df.select(col("id"), col("e"),
        graft.functions.Similarity.sq8Encode(col("e")).as("q"))
      .as[(Long, Seq[Float], Seq[Int])].collect()
    rows.foreach { case (_, e, q) =>
      assert(q.forall(c => c >= 0 && c <= 255))
      val (mn, mx) = (e.min.toDouble, e.max.toDouble)
      if (mx > mn) {
        val step = (mx - mn) / 255.0
        e.zip(q).foreach { case (x, c) =>
          val recon = mn + c * step
          assert(math.abs(x - recon) <= step / 2 + 1e-9,
            s"component $x reconstructed as $recon (step $step)")
        }
      } else assert(q.forall(_ == 0))
    }
  }

  test("envelope codec round-trips arbitrary payload content") {
    val payloadGen = Gen.listOfN(5, Gen.asciiPrintableStr.map(_.take(40)))
    samples(payloadGen, 10).foreach { payloads =>
      val df = payloads.zipWithIndex.map { case (p, i) =>
        (i.toLong, (100 + i).toLong, "i", "app", "u0", "app.u0", s"k$i", "",
          0.0, false, """{"k":0}""")
      }.toDF("event_id", "ts_packed", "op", "db", "coll", "ns",
        "doc_key", "g", "value", "from_migrate", "props")
      val frames = Envelope.messages(Envelope.encode(df, 2))
        .select("frame").as[Array[Byte]].collect()
      val decoded = frames.flatMap(f => Envelope.decodeMessage(f).payloads)
      assert(decoded.length == payloads.size)
      // compressed frames carry the same content
      val zframes = Envelope.messages(Envelope.encode(df, 2))
      val zdecoded = Envelope.compressFrames(zframes)
        .select("frame").as[Array[Byte]].collect()
        .flatMap(f => Envelope.decodeMessage(f).payloads)
      assert(zdecoded.map(new String(_, "UTF-8")).sorted.toSeq ==
        decoded.map(new String(_, "UTF-8")).sorted.toSeq)
    }
  }

  test("detSum6 is order-invariant where a raw double sum is not guaranteed to be") {
    import graft.functions.Portable
    val valGen = Gen.listOfN(40, Gen.choose(-1e6, 1e6))
    samples(valGen, 5).foreach { xs =>
      val a = xs.zipWithIndex.map { case (x, i) => (i, x) }.toDF("i", "x")
      val fwd = a.agg(Portable.detSum6(col("x"))).head().getDouble(0)
      val rev = xs.reverse.zipWithIndex.map { case (x, i) => (i, x) }.toDF("i", "x")
        .repartition(7).agg(Portable.detSum6(col("x"))).head().getDouble(0)
      assert(fwd == rev, s"detSum6 order-dependent on $xs")
    }
  }

  test("pqAssign is a true argmin: assigned distance <= distance to every codeword") {
    import graft.functions.Similarity
    val vecGen = Gen.listOfN(8, Gen.listOfN(64, Gen.choose(-1.0f, 1.0f)))
    samples(vecGen, 3).foreach { vecs =>
      val corpus = vecs.zipWithIndex
        .map { case (v, i) => (i.toLong, v, 0) }
        .toDF("vec_id", "embedding", "label")
      val cb = Similarity.pqTrain(corpus, col("vec_id"), col("embedding"),
        col("vec_id") < 3, iters = 1)
      val sub = Similarity.pqSubvectors(
        Similarity.prepared(corpus, col("vec_id"), col("embedding")))
      val assigned = Similarity.pqAssign(sub, cb)
      // join every (vector, subspace) against EVERY codeword of that
      // subspace: no alternative may beat the assigned distance, and an
      // equal-distance alternative may only have a LARGER code id
      val beaten = sub.join(cb, Seq("m"))
        .withColumn("alt", Similarity.sqDistQ(col("sv"), col("cw")))
        .join(assigned.withColumnRenamed("code", "got"), Seq("vec_id", "m"))
        .filter(col("alt") < col("d") ||
          (col("alt") === col("d") && col("code") < col("got")))
      assert(beaten.count() == 0)
    }
  }

  test("hash split is a pure function of the id: stable under re-partitioning and re-run") {
    import graft.functions.Text
    val ids = (0 until 500).map(_.toLong).toDF("doc_id")
    val once = ids.select(col("doc_id"), Text.splitAssign(col("doc_id")).as("s"))
      .as[(Long, String)].collect().toMap
    val again = ids.repartition(13)
      .select(col("doc_id"), Text.splitAssign(col("doc_id")).as("s"))
      .as[(Long, String)].collect().toMap
    assert(once == again)
    // and the buckets are all populated in sane proportion (80/10/10)
    val n = once.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(n("train") > n("val") && n("train") > n("test") && n.values.sum == 500)
  }

  test("prefixSum law: two-phase bucketed cumsum ≡ the global-window cumsum " +
      "on arbitrary inputs, any order-aligned bucketing, any partitioning") {
    import org.apache.spark.sql.expressions.Window
    val gen = Gen.listOfN(200, for {
      key <- Gen.choose(0L, 5000L)
      v <- Gen.choose(0L, 100L)
    } yield (key, v))
    samples(gen, 4).zipWithIndex.foreach { case (rows, i) =>
      // keys may collide — disambiguate with the index so order is total
      val df = rows.zipWithIndex.map { case ((k, v), j) => (k, j.toLong, v) }
        .toDF("k", "j", "v").repartition(7)
      val got = graft.operators.Relational.prefixSum(df, col("v"),
          struct(col("k"), col("j")), expr(s"k DIV ${100 << i}"), out = "ps")
        .select(col("k"), col("j"), col("ps"))
        .as[(Long, Long, Long)].collect()
        .map(r => ((r._1, r._2), r._3)).toMap
      val oracle = df.withColumn("ps", sum(col("v")).over(
          Window.orderBy(col("k"), col("j"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .select(col("k"), col("j"), col("ps"))
        .as[(Long, Long, Long)].collect()
        .map(r => ((r._1, r._2), r._3)).toMap
      assert(got == oracle, s"bucket granularity ${100 << i}")
    }
  }

  test("phash64 law: the native codegen expression ≡ the builtin composition " +
      "conv(substr(md5,1,15),16,10) on arbitrary strings, and in SQL") {
    val gen = Gen.oneOf(
      Gen.alphaNumStr.map(_.take(40)),
      Gen.listOfN(12, Gen.choose(32, 0x2fff)).map(cs =>
        new String(cs.map(_.toChar).toArray)), // multi-byte UTF-8
      Gen.const(""), Gen.const(" "), Gen.const("a b\tc\nd"))
    val strs = samples(gen, 60).distinct
    val df = strs.toDF("s").repartition(3)
      .select(col("s"), graft.functions.Portable.phash64(col("s")).as("h"),
        graft.functions.Portable.phash64Legacy(col("s")).as("hl"))
    val rows = df.as[(String, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (s, h, hl) =>
      assert(h == hl, s"phash64 mismatch on ${s.take(20).map(_.toInt)}")
      assert(h >= 0L && h < (1L << 60))
    }
    // the SQL registration produces the same values
    graft.plans.GraftExtensions.register(spark)
    strs.toDF("s").createOrReplaceTempView("phash_law_v")
    val viaSql = spark.sql(
      "SELECT s, phash64(s) AS h FROM phash_law_v").as[(String, Long)]
      .collect().toMap
    rows.foreach { case (s, h, _) => assert(viaSql(s) == h) }
  }

  test("dotQ law: the native fused-loop expression ≡ aggregate(zip_with) on " +
      "random vectors, including length mismatches and null elements") {
    val vecGen = Gen.listOfN(16, Gen.choose(-1000L, 1000L))
    val pairGen = for {
      a <- vecGen; b <- vecGen
      cut <- Gen.oneOf(16, 16, 16, 12) // occasionally unequal lengths
    } yield (a, b.take(cut))
    samples(Gen.listOfN(40, pairGen), 2).foreach { pairs =>
      val df = pairs.toDF("a", "b").repartition(3)
        .select(graft.functions.Similarity.dotQ(col("a"), col("b")).as("d"),
          graft.functions.Similarity.dotQLegacy(col("a"), col("b")).as("dl"))
      df.as[(Option[Long], Option[Long])].collect().foreach { case (d, dl) =>
        assert(d == dl)
      }
    }
    // null element → null, matching the composition
    val withNull = Seq((Seq(Some(1L), None, Some(3L)), Seq(Some(2L), Some(2L), Some(2L))))
      .toDF("a", "b")
      .select(graft.functions.Similarity.dotQ(col("a"), col("b")).as("d"),
        graft.functions.Similarity.dotQLegacy(col("a"), col("b")).as("dl"))
      .as[(Option[Long], Option[Long])].head()
    assert(withNull._1.isEmpty && withNull._2.isEmpty)
  }

  test("minhash-signature law: the fused MinhashSig expression ≡ the " +
      "per-permutation composition, column for column, incl. empty docs") {
    val docGen = for {
      n <- Gen.choose(0, 12) // 0..2 words → EMPTY shingle set (null sigs)
      ws <- Gen.listOfN(n, Gen.choose(0, 9).map(i => s"w$i"))
    } yield ws.mkString(" ")
    samples(Gen.listOfN(25, docGen), 3).foreach { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text").repartition(4)
      def dump(df: org.apache.spark.sql.DataFrame) =
        df.orderBy("doc_id").collect().map(_.toSeq).toSeq
      val fused = dump(graft.functions.Dedup.minhashSignatures(
        docs, col("doc_id"), col("text")))
      val legacy = dump(graft.functions.Dedup.minhashSignaturesLegacy(
        docs, col("doc_id"), col("text")))
      assert(fused == legacy)
    }
  }

  test("lsh-bucket law: the fused LshBucket expression ≡ the per-plane " +
      "composition, incl. wrong-length and null-element vectors") {
    val vecGen = Gen.frequency(
      (8, Gen.listOfN(64, Gen.choose(-2000L, 2000L).map(Option(_)))),
      (1, Gen.listOfN(63, Gen.choose(-2000L, 2000L).map(Option(_)))), // len ≠ dim → bucket 0
      (1, Gen.listOfN(64, Gen.option(Gen.choose(-2000L, 2000L))))) // null elems → bucket 0
    samples(Gen.listOfN(30, vecGen), 3).foreach { vecs =>
      for (planes <- Seq(4, 8)) {
        val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
          .toDF("id", "v").repartition(4)
          .select(col("id"),
            graft.functions.Similarity.lshBucketCol(col("v"), planes).as("b"),
            graft.functions.Similarity.lshBucketColComposed(col("v"), planes).as("bc"))
        df.as[(Long, Long, Long)].collect().foreach { case (id, b, bc) =>
          assert(b == bc, s"planes=$planes id=$id")
        }
      }
    }
    // Intended NULL-vector behavior: a top-level NULL vector lands in
    // bucket 0, same as the composition's when(NULL > 0, ...).otherwise(0)
    // per-plane sum — NOT NULL (a null bucket would silently drop the row
    // from every bucket equi-join). The expression is non-nullable.
    locally {
      val df = Seq((0L, Option.empty[Seq[Long]]),
          (1L, Option(Seq.fill(64)(7L))))
        .toDF("id", "v")
        .select(col("id"),
          graft.functions.Similarity.lshBucketCol(col("v"), 8).as("b"),
          graft.functions.Similarity.lshBucketColComposed(col("v"), 8).as("bc"))
      val rows = df.orderBy("id").collect()
      assert(!rows(0).isNullAt(1), "fused bucket of NULL vector must not be NULL")
      assert(rows(0).getLong(1) == 0L, "NULL vector lands in bucket 0")
      val composedNull = if (rows(0).isNullAt(2)) 0L else rows(0).getLong(2)
      assert(composedNull == 0L)
      assert(rows(1).getLong(1) == rows(1).getLong(2))
    }
    // Beyond 8 planes the 64-bit LCG IS the definition (the 32-bit composed
    // form would overflow past flat index 511) — pin against a direct
    // Scala reference at 12 planes.
    def refSign(idx: Int): Long =
      if ((((1664525L * idx + 1013904223L) >> 15) % 2) == 0) 1L else -1L
    samples(Gen.listOfN(64, Gen.choose(-2000L, 2000L)), 5).foreach { v =>
      val want = (0 until 12).map { j =>
        val d = v.indices.map(i => v(i) * refSign(j * 64 + i)).sum
        if (d > 0) 1L << j else 0L
      }.sum
      val got = Seq(Tuple1(v)).toDF("v")
        .select(graft.functions.Similarity.lshBucketCol(col("v"), 12).as("b"))
        .as[Long].head()
      assert(got == want)
    }
  }

  test("pigeonhole-blocking law: every pair within ed ≤ k shares a segment-window " +
      "match under dedup_edit_distance's MULTI-MATCH-AWARE blocking (shift bound " +
      "min(i, k−i) per segment index, Li et al. VLDB'11 §4), on random perturbed strings") {
    val k = 5; val W = 64; val nseg = k + 1
    val bnd = (0 to nseg).map(i => i * W / nseg)
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    def blocked(a: String, b: String): Boolean =
      (0 until nseg).exists { i =>
        val seg = a.substring(bnd(i), bnd(i + 1))
        val len = bnd(i + 1) - bnd(i)
        val w = math.min(i, k - i) // the implementation's tightened window
        (math.max(0, bnd(i) - w) to math.min(bnd(i) + w, W - len)).exists { p =>
          b.substring(p, p + len) == seg
        }
      }
    val strGen = for {
      n <- Gen.choose(20, 64)
      cs <- Gen.listOfN(n, Gen.oneOf('a', 'b', 'c', ' '))
    } yield cs.mkString.padTo(W, '~')
    // perturbations within k edits of the base: the MUST-CATCH side
    val pairGen = for {
      a <- strGen
      nEdits <- Gen.choose(0, k)
      ops <- Gen.listOfN(nEdits, for {
        pos <- Gen.choose(0, 50); kind <- Gen.choose(0, 2); c <- Gen.oneOf('x', 'y')
      } yield (pos, kind, c))
    } yield (a, ops.foldLeft(a.take(W)) { case (s, (pos, kind, c)) =>
      val p = math.min(pos, s.length - 1)
      (kind match {
        case 0 => s.updated(p, c) // substitute
        case 1 => s.take(p) + c + s.drop(p) // insert
        case _ => s.take(p) + s.drop(p + 1) // delete
      }).padTo(W, '~').take(W)
    })
    samples(pairGen, 300).foreach { case (a, b) =>
      if (lev(a, b) <= k)
        assert(blocked(a, b) || blocked(b, a),
          s"pair within ed ${lev(a, b)} missed by the blocking:\n$a\n$b")
    }
  }

  test("edit-histogram filter law: 16-bucket char-count L1 ≤ 2·levenshtein on " +
      "random perturbed string pairs (the pre-verification reject is sound)") {
    // the bound dedup_edit_distance's candidate filter rides: one edit
    // op changes at most one bucket count on each side, so a candidate
    // with L1 > 2k can never be a true pair
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    def hist(s: String): Array[Int] = {
      val h = new Array[Int](16)
      s.foreach(c => h(java.lang.Math.floorMod(c.toInt, 16)) += 1)
      h
    }
    def l1(a: Array[Int], b: Array[Int]): Int =
      a.zip(b).map { case (x, y) => math.abs(x - y) }.sum
    val pairGen = for {
      n <- Gen.choose(10, 64)
      cs <- Gen.listOfN(n, Gen.oneOf('a' to 'z'))
      nEdits <- Gen.choose(0, 12)
      ops <- Gen.listOfN(nEdits, for {
        pos <- Gen.choose(0, 60); kind <- Gen.choose(0, 2); c <- Gen.oneOf('a' to 'z')
      } yield (pos, kind, c))
    } yield {
      val a = cs.mkString.padTo(64, '~').take(64)
      val b = ops.foldLeft(a) { case (s, (pos, kind, c)) =>
        val p = math.min(pos, s.length - 1)
        (kind match {
          case 0 => s.updated(p, c)
          case 1 => s.take(p) + c + s.drop(p)
          case _ => s.take(p) + s.drop(p + 1)
        }).padTo(64, '~').take(64)
      }
      (a, b)
    }
    samples(pairGen, 300).foreach { case (a, b) =>
      assert(l1(hist(a), hist(b)) <= 2 * lev(a, b),
        s"histogram bound violated:\n$a\n$b")
    }
  }

  test("adaptive-banding law: rows = smallest r in [base, 22] with 2^r·occ ≥ n, " +
      "bands = ⌈3·5^r/4^r⌉ — matches a brute BigInt scan for random corpus sizes") {
    val gen = for {
      n <- Gen.choose(0L, 100000000L)
      occ <- Gen.oneOf(1L, 4L, 16L, 64L)
    } yield (n, occ)
    def bandsFor(r: Int): Int =
      ((BigInt(3) * BigInt(5).pow(r) + BigInt(4).pow(r) - 1) / BigInt(4).pow(r)).toInt
    samples(gen, 200).foreach { case (n, occ) =>
      val r0 = (4 to 22).find(r => (BigInt(1) << r) * occ >= n).getOrElse(22)
      // perm budget: largest r ≤ r0 with b(r)·r ≤ 128 (b·r is monotone in r)
      val r = (4 to r0).filter(r => bandsFor(r) * r <= 128).lastOption.getOrElse(4)
      assert(graft.functions.Dedup.adaptiveBanding(n, occ) == (bandsFor(r), r),
        s"n=$n occ=$occ")
    }
    // documented corpus anchors: sf0.01 → (b=10, r=5, 50 perms); 10×-sf0.1
    // → (b=15, r=7, 105 perms — the occupancy formula's 207 trims to budget)
    assert(graft.functions.Dedup.adaptiveBanding(500) == (10, 5))
    assert(graft.functions.Dedup.adaptiveBanding(5000) == (15, 7))
    // the 0.8-Jaccard catch rate the b-formula guarantees: ≥ 95% at both
    (Seq(500L, 5000L, 50000000L)).foreach { n =>
      val (b, r) = graft.functions.Dedup.adaptiveBanding(n)
      val p = 1.0 - math.pow(1.0 - math.pow(0.8, r), b)
      assert(p >= 0.95, s"n=$n (b=$b, r=$r) catch=$p")
    }
  }

  test("adaptive-planes law: smallest p with 2^p ≥ ⌈n/occ⌉, floored at base " +
      "— matches a brute scan over p for random corpus sizes") {
    val gen = for {
      n <- Gen.choose(0L, 3000000L)
      occ <- Gen.oneOf(1L, 4L, 16L, 64L)
      base <- Gen.oneOf(0, 4, 8)
    } yield (n, occ, base)
    samples(gen, 200).foreach { case (n, occ, base) =>
      val m = (n + occ - 1) / occ
      val brute = (0 to 62).find(p => (1L << p) >= math.max(m, 1L)).get
      val want = math.max(base, brute)
      assert(graft.functions.Similarity.adaptivePlanes(n, base, occ) == want,
        s"n=$n occ=$occ base=$base")
    }
    // the documented corpus anchors: sf0.01 → 5 planes, 10×-sf0.1 → 12
    assert(graft.functions.Similarity.adaptivePlanes(500) == 5)
    assert(graft.functions.Similarity.adaptivePlanes(50000) == 12)
  }

  test("adaptive-lists law: smallest power of two p ≥ 8 with p² ≥ n " +
      "(the √n IVF sizing rule), capped at 65536 — matches a brute scan") {
    samples(Gen.choose(0L, 5000000000L), 200).foreach { n =>
      val brute = Iterator.iterate(8L)(_ * 2)
        .find(p => p * p >= n || p >= 65536L).get.toInt
      assert(graft.functions.Similarity.adaptiveLists(n) == brute, s"n=$n")
    }
    // corpus anchors (embeddings counts): sf0.01 (500) → 32,
    // sf0.1 (2000) → 64, 100× (200k) → 512; floor + cap
    assert(graft.functions.Similarity.adaptiveLists(500) == 32)
    assert(graft.functions.Similarity.adaptiveLists(2000) == 64)
    assert(graft.functions.Similarity.adaptiveLists(200000) == 512)
    assert(graft.functions.Similarity.adaptiveLists(0) == 8)
    assert(graft.functions.Similarity.adaptiveLists(Long.MaxValue) == 65536)
  }

  test("adaptive-probes law: smallest power of two p ≥ 4 with p³ ≥ nlist " +
      "(the cube-root probe rule), capped at 256 — matches a brute scan") {
    samples(Gen.choose(0, 65536), 200).foreach { nlist =>
      val brute = Iterator.iterate(4L)(_ * 2)
        .find(p => p * p * p >= nlist || p >= 256L).get.toInt
      assert(graft.functions.Similarity.adaptiveProbes(nlist) == brute,
        s"nlist=$nlist")
    }
    // geometry anchors: sf0.01 (nlist 32) → 4, sf0.1 (64) → 4,
    // 100× (512) → 8 — the measured recall/cost knee (IvfProbeBench:
    // recall@3 0.996 at 8 probes vs 0.689 at the old fixed-(8,2));
    // floor + cap
    assert(graft.functions.Similarity.adaptiveProbes(32) == 4)
    assert(graft.functions.Similarity.adaptiveProbes(64) == 4)
    assert(graft.functions.Similarity.adaptiveProbes(512) == 8)
    assert(graft.functions.Similarity.adaptiveProbes(0) == 4)
    assert(graft.functions.Similarity.adaptiveProbes(65536) == 64)
  }

  test("incremental-components law: componentsIncremental ≡ the full fixpoint " +
      "over base ∪ increment edges, on random graphs and random splits") {
    val gen = for {
      nBase <- Gen.choose(0, 25)
      nIncr <- Gen.choose(1, 15)
      mk = for {
        a <- Gen.choose(0L, 30L); b <- Gen.choose(0L, 30L) if a != b
      } yield (math.min(a, b), math.max(a, b))
      base <- Gen.listOfN(nBase, mk)
      incr <- Gen.listOfN(nIncr, mk)
    } yield (base, incr)
    samples(gen, 6).foreach { case (base, incr) =>
      val basePairs = base.toDF("doc_a", "doc_b")
      val incrPairs = incr.toDF("doc_a", "doc_b")
      val standing = graft.functions.Dedup.componentLabels(basePairs)
      val got = graft.functions.Dedup
        .componentsIncremental(standing, incrPairs)
        .as[(Long, Long)].collect().toSet
      val want = graft.functions.Dedup
        .componentLabels(basePairs.unionByName(incrPairs))
        .as[(Long, Long)].collect().toSet
      // the full fixpoint labels every base-graph vertex too; restrict to
      // the same vertex set (incremental returns standing ∪ new endpoints,
      // which IS the full vertex set here since every base vertex is in
      // standing)
      assert(got == want, s"base=$base incr=$incr")
    }
  }

  test("prefix-filter law: prefixFilterJaccard ≡ brute-force threshold join " +
      "on random corpora with a shared vocabulary, at two thresholds") {
    // Small shared vocabulary forces heavy shingle collisions across docs —
    // the regime where the prefix index earns its keep and where a pruning
    // bug would actually drop pairs.
    val docGen = Gen.listOfN(14, for {
      n <- Gen.choose(4, 18)
      ws <- Gen.listOfN(n, Gen.choose(0, 11).map(i => s"v$i"))
    } yield ws.mkString(" "))
    samples(docGen, 3).foreach { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text").repartition(5)
      val sets = docs.select(col("doc_id"), array_distinct(transform(
          graft.functions.Text.shingles(col("text"), 4),
          x => graft.functions.Portable.phash64(x))).as("s"))
        .as[(Long, Seq[Long])].collect().map(t => t._1 -> t._2.toSet).toMap
      for ((tn, td) <- Seq((1, 2), (4, 5))) {
        val got = graft.functions.Dedup.prefixFilterJaccard(docs,
            col("doc_id"), col("text"), thrNum = tn, thrDen = td)
          .as[(Long, Long, Long, Long)].collect().toSet
        val brute = (for {
          a <- sets.keys; b <- sets.keys if a < b
          if sets(a).nonEmpty && sets(b).nonEmpty
          i = (sets(a) & sets(b)).size.toLong
          u = sets(a).size + sets(b).size - i
          if i * td >= u * tn
        } yield (a, b, i, u)).toSet
        assert(got == brute, s"threshold $tn/$td")
      }
    }
  }
}
