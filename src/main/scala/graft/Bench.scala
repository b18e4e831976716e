package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Optional state-store backend flag (default: engine default) — see
    // graft.streaming.StateBackend; inert unless the env var is set.
    graft.streaming.StateBackend.applyFromEnv(spark)
    // Untimed warmup: absorb JIT/session/codegen startup (~6s) so the
    // first timed query measures the plan, not the JVM — and touch every
    // input table once so no suite's alphabetically-first query absorbs
    // the cold parquet footer/page reads as phantom regression.
    try {
      spark.range(1000000).selectExpr("sum(id)").collect()
      Tables.names.foreach { t =>
        try { Tables.load(spark, sfDir, t).count() } catch { case _: Throwable => () }
      }
      SparkEntry.queries.get("q7_distinct").foreach(_(spark, sfDir).count())
    } catch { case _: Throwable => () }
    // Self-calibration probes: a fixed CPU-bound plan timed before the
    // suite, after it, and INTERLEAVED every few queries, plus the OS
    // load average. On a quiet box every probe agrees at ~0.1s; a
    // contended capture (other builds/tests sharing the cores) inflates
    // whichever probes bracket the contention window — r6's 5x artifact
    // AND r7's mid-run one both become machine-detectable AND localizable
    // (pre/post probes alone miss contention that starts and ends inside
    // the run). `scripts/bench_compare.py` reads the spread.
    // Each probe point is the MIN of three back-to-back samples: right
    // after a heavy query the session's async teardown (context cleaner,
    // state-store maintenance) inflates a single sample 2-3x on an
    // otherwise idle box; the min is the capacity sample, while genuine
    // external contention inflates all three and still shows.
    def probe(): Double = (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      spark.range(100000000L).selectExpr("sum(id * 3 + 1)").collect()
      (System.nanoTime() - t0) / 1e9
    }.min
    // IO probe: the CPU probes CANNOT see host-level I/O throttling (the
    // r14 finding: two same-code captures read 470 s and 577 s three
    // hours apart with CLEAN CPU probes — the streaming/checkpoint-heavy
    // queries inflated while pure compute stayed flat). A small
    // write+fsync+read loop samples the filesystem the state stores and
    // staged feeds actually live on; reported alongside the CPU series
    // so a downstream reader can classify that capture class. Min of 3,
    // same rationale as the CPU probe.
    val ioDir = java.nio.file.Files.createTempDirectory("graft_ioprobe")
    def ioProbe(): Double = (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      (0 until 20).foreach { i =>
        val p = ioDir.resolve(s"f$i")
        val ch = java.nio.channels.FileChannel.open(p,
          java.nio.file.StandardOpenOption.CREATE,
          java.nio.file.StandardOpenOption.WRITE)
        ch.write(java.nio.ByteBuffer.wrap(Array.fill[Byte](65536)(i.toByte)))
        ch.force(true)
        ch.close()
        java.nio.file.Files.readAllBytes(p)
        java.nio.file.Files.delete(p)
      }
      (System.nanoTime() - t0) / 1e9
    }.min
    def loadAvg(): Double =
      java.lang.management.ManagementFactory.getOperatingSystemMXBean.getSystemLoadAverage
    val probeEvery = 12
    val probes = scala.collection.mutable.ArrayBuffer.empty[Double]
    val ioProbes = scala.collection.mutable.ArrayBuffer.empty[Double]
    val loadPre = loadAvg()
    // Warm the probe plan itself (untimed): the first few executions JIT
    // the codegen'd sum loop — without this the series drifts ~3x from
    // first to last on a perfectly quiet box, which is exactly the
    // signature the spread check treats as contention.
    (1 to 3).foreach(_ => probe())
    ioProbe() // warm the temp dir / dentry cache
    probes += probe()
    ioProbes += ioProbe()
    // Optional args = query-name filter (dev iteration); driver passes none.
    val selected = if (args.nonEmpty) SparkEntry.queries.filter(kv => args.contains(kv._1))
                   else SparkEntry.queries
    val results = selected.toSeq.sortBy(_._1).zipWithIndex.map { case ((name, fn), i) =>
      val t0 = System.nanoTime()
      // A failing query is recorded as -1, never as its (suspiciously
      // fast) wall-clock — a broken query must scream in the bench too,
      // not only in the CORRECTNESS gate.
      val ok = try { fn(spark, sfDir).count(); true } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          false
      }
      val dt = if (ok) (System.nanoTime() - t0) / 1e9 else -1.0
      // Untimed: drop cache entries and localCheckpoint blocks the query
      // left behind — accumulated block-manager pressure would otherwise
      // tax every LATER query's timing for state it never created.
      // (SPARK_GRAFT_KEEP_CACHE=1 disables, for A/B-ing the policy.)
      if (!sys.env.get("SPARK_GRAFT_KEEP_CACHE").contains("1")) {
        try {
          spark.sharedState.cacheManager.clearCache()
          spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
          // Streaming debris: ~15 harness queries run streams; the
          // terminated-query registry and the state-store maintenance
          // pool otherwise accumulate across the whole suite and tax
          // late queries with multi-second stalls (observed: a 3.9 s
          // receiver query stretching to 49 s in a full-tree run while
          // the CPU probes stayed flat).
          spark.streams.resetTerminated()
          org.apache.spark.sql.execution.streaming.state.StateStore.stop()
        } catch { case _: Throwable => () }
      }
      // Untimed interleave: lands between query timings, charged to none.
      if ((i + 1) % probeEvery == 0) { probes += probe(); ioProbes += ioProbe() }
      name -> dt
    }
    probes += probe()
    ioProbes += ioProbe()
    val loadPost = loadAvg()
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // Failures (-1 entries) are excluded from the total: a partial-failure
    // capture must not report a *lower* total than a clean one.
    val total = results.map(_._2).filter(_ >= 0).sum
    // Self-describing contention verdict (same rules as
    // scripts/bench_compare.py: spread = max/median > 2x, or the probe
    // floor never reaching a quiet-box baseline, or a busy start load):
    // a downstream reader (driver, judge, compare) can discount a
    // contended capture from the JSON alone, without re-deriving the
    // probe math.
    val cleanFloor = sys.env.getOrElse("GRAFT_CLEAN_FLOOR", "0.25").toDouble
    val (probeSpread, ioSpread, contended) =
      Bench.verdict(probes.toSeq, ioProbes.toSeq, loadPre, cleanFloor)
    // Shared field core: the stdout/raw capture and the repo side-channel
    // summary are both assembled from THIS string, so the summary splice
    // cannot corrupt if the capture shape ever changes (ADVICE r17 — the
    // old `json.dropRight(1)` silently broke on any trailing character).
    val jsonCore = s""""metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"""" +
      s""","probe_pre":${probes.head},"probe_post":${probes.last}""" +
      s""","probes":${probes.mkString("[", ",", "]")},"probe_every":$probeEvery""" +
      s""","io_probes":${ioProbes.mkString("[", ",", "]")},"io_spread":$ioSpread""" +
      s""","load_avg":${math.max(loadPre, loadPost)},"load_pre":$loadPre""" +
      s""","probe_spread":$probeSpread,"contended":$contended"""
    val json = "{" + jsonCore + "}"
    // Raw captures always land on a /tmp scratch path; the repo capture
    // (`bench_latest.json`, the drift-comparison anchor) is only touched
    // when the run is a FULL suite AND self-judged clean, or when the
    // caller explicitly points SPARK_GRAFT_BENCH_OUT at it. This is the
    // r13 finding: a contended raw run overwrote the promoted capture and
    // shadowed the honest number for a whole round.
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT",
      if (args.isEmpty) "/tmp/graft_bench_raw.json" else "/tmp/graft_bench_partial.json")
    // Side-channel for capture paths that mangle stdout (four rounds of
    // the driver's `parsed: null` through bare sbt): EVERY run — clean
    // or contended, full or partial — leaves its full capture at a
    // fixed repo path, self-describing (`contended`, `partial`) so a
    // reader can discount it without the stdout line. Written FIRST in
    // its own try: a failure writing the $out path must not leave a
    // STALE summary silently attributed to this run. The promoted clean
    // anchor stays `bench_latest.json`, untouched by this.
    // Repo root for the summary/anchor writes, resolved from a POSITIVE
    // signal (ADVICE r18): GRAFT_REPO_ROOT if set, else walk up from the
    // working directory to the nearest `.git` marker — scripts/bench.sh
    // and the check.py/bench_gate.py recipes run from the checkout root,
    // but a bench launched from an unrelated cwd must fail loudly (the
    // summary/anchor land on /tmp and stderr says so) instead of
    // silently forking the drift anchor into a different tree.
    val repoRoot = sys.env.get("GRAFT_REPO_ROOT").orElse {
      Iterator.iterate(java.nio.file.Paths.get(
          sys.props.getOrElse("user.dir", ".")).toAbsolutePath)(_.getParent)
        .takeWhile(_ != null)
        .find(p => java.nio.file.Files.exists(p.resolve(".git")))
        .map(_.toString)
    }.getOrElse {
      System.err.println("[bench] no .git above the working directory and " +
        "GRAFT_REPO_ROOT unset — summary/anchor writes diverted to /tmp")
      "/tmp"
    }
    // The summary is cpus-keyed so the driver's low-core SCALING run no
    // longer clobbers the 32-core main-run record (VERDICT r19 finding:
    // the c8 run overwrote bench_summary.json and destroyed the only
    // surviving per-query record of the driver's main run), and partial
    // (query-filtered) dev runs land on their own path so they cannot
    // clobber any full-run record either. The legacy un-suffixed path is
    // kept as the 32-core full-run record.
    val summaryLine =
      "{" + jsonCore + s""","partial":${args.nonEmpty},"n_queries":${results.size},"cpus":$cpus}""" + "\n"
    val summaryName =
      if (args.nonEmpty) "bench_summary_partial.json" else s"bench_summary_c$cpus.json"
    try {
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(repoRoot, summaryName), summaryLine)
      if (args.isEmpty && cpus == "32") java.nio.file.Files.writeString(
        java.nio.file.Paths.get(repoRoot, "bench_summary.json"), summaryLine)
    } catch { case e: Throwable => System.err.println(s"[bench] summary write failed: ${e.getMessage}") }
    try {
      java.nio.file.Files.writeString(java.nio.file.Paths.get(out), json + "\n")
      if (args.isEmpty && !contended && !sys.env.contains("SPARK_GRAFT_BENCH_OUT"))
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(repoRoot, "bench_latest.json"), json + "\n")
    } catch { case e: Throwable => System.err.println(s"[bench] file write failed: ${e.getMessage}") }
    // Output ordering (VERDICT r19 task 2): the compact summary first,
    // then the FULL per-query JSON as the LAST stdout line, so a driver
    // last-line parser gets the per-query map. Combined with the
    // unprefixed forked-run output (build.sbt StdoutOutput) this restores
    // the driver-parseable contract that "parsed: null" broke since r15.
    println(s"""{"metric":"total","value":$total,"unit":"sec","sf":"$sfDir","contended":$contended,"probe_spread":$probeSpread,"load_pre":$loadPre,"path":"$out"}""")
    println(json)
    spark.stop()
  }

  /** The contention verdict as a pure function, so the thresholds are
    * spec-locked rows (`BenchVerdictSpec`) instead of inline magic:
    *
    *  - CPU probe spread (max/median) > 2.0 — external load inside the
    *    capture window (r6/r7's artifacts);
    *  - CPU probe floor above `cleanFloor` (quiet-box ≈ 0.05-0.1 s,
    *    default bar 0.25 s) — the box was never quiet at all;
    *  - start load average > 2.5 — the capture began on a busy box
    *    (r15's driver capture: load 8.63);
    *  - IO probe spread > 2.5 — host-level I/O throttling the CPU
    *    probes cannot see (the r14 finding: a 709 s capture with CPU
    *    spread 1.94 — wrongly clean under the old rule — read IO spread
    *    2.98 against the ~10-20 ms quiet-box floor pinned in
    *    BASELINE.md). 2.5 sits between the quiet captures (≈1.0-1.6)
    *    and the caught drift.
    *
    * Returns (probeSpread, ioSpread, contended).
    */
  def verdict(probes: Seq[Double], ioProbes: Seq[Double], loadPre: Double,
      cleanFloor: Double = 0.25): (Double, Double, Boolean) = {
    def spread(xs: Seq[Double]): Double = {
      if (xs.isEmpty) return 1.0
      val med = xs.sorted.apply(xs.length / 2)
      if (med > 0) xs.max / med else 1.0
    }
    val probeSpread = spread(probes)
    val ioSpread = spread(ioProbes)
    val contended = probeSpread > 2.0 ||
      (probes.nonEmpty && probes.min > cleanFloor) ||
      loadPre > 2.5 || ioSpread > 2.5
    (probeSpread, ioSpread, contended)
  }
}
