package graft

import org.scalatest.funsuite.AnyFunSuite

/** Spec-locks the bench self-calibration thresholds (`Bench.verdict`)
  * against the MEASURED capture classes they were tuned on, so a silent
  * threshold edit fails a test instead of silently re-classifying a
  * contended capture as clean (the r14 near-miss: CPU spread 1.94 under
  * the old CPU-only rule stamped a 709 s I/O-drift capture clean).
  *
  * The io_spread baseline the threshold sits against is pinned in
  * BASELINE.md: quiet-box IO probe floor ≈ 8-12 ms, median ≈ 12-20 ms,
  * spread ≈ 1.0-1.6; drift capture r14 read spread 2.98, the r15
  * contended capture 2.06 (but load 8.63). Bar: 2.5, strictly between.
  */
class BenchVerdictSpec extends AnyFunSuite {

  private val quietCpu = Seq(0.046, 0.080, 0.079, 0.081, 0.078, 0.099)
  private val quietIo = Seq(0.012, 0.011, 0.013, 0.015, 0.012, 0.014)

  test("quiet box: flat CPU + IO probes, idle load → clean") {
    val (ps, ios, contended) = Bench.verdict(quietCpu, quietIo, loadPre = 0.77)
    assert(!contended && ps < 2.0 && ios < 2.5, s"($ps, $ios)")
  }

  test("CPU spread > 2.0 → contended (the r6/r7 artifact class)") {
    val (_, _, contended) =
      Bench.verdict(quietCpu :+ 0.30, quietIo, loadPre = 0.8)
    assert(contended)
  }

  test("probe floor above the quiet bar → contended (never-quiet box)") {
    val busy = quietCpu.map(_ + 0.30) // flat spread but floor > 0.25
    val (ps, _, contended) = Bench.verdict(busy, quietIo, loadPre = 0.8)
    assert(contended && ps < 2.0)
  }

  test("busy start load > 2.5 → contended (the r15 driver capture: 8.63)") {
    val (_, _, contended) = Bench.verdict(quietCpu, quietIo, loadPre = 8.63)
    assert(contended)
  }

  test("IO spread > 2.5 → contended even with clean CPU probes " +
      "(the r14 I/O-drift capture: CPU 1.94, IO 2.98)") {
    // the r14 drift capture's measured IO series shape: quiet median,
    // inflated max — spread 2.98 against a ~13 ms median
    val driftIo = Seq(0.0106, 0.0111, 0.0125, 0.0131, 0.0193, 0.0391)
    val cpuJustUnder = quietCpu :+ (0.080 * 1.94)
    val (ps, ios, contended) = Bench.verdict(cpuJustUnder, driftIo, loadPre = 0.9)
    assert(ps <= 2.0 && ios > 2.5 && contended, s"($ps, $ios)")
  }

  test("the 2.5 IO bar is strict: spread exactly at the bar stays clean") {
    val io = Seq(0.010, 0.010, 0.010, 0.010, 0.025) // max/med = 2.5
    val (_, ios, contended) = Bench.verdict(quietCpu, io, loadPre = 0.8)
    assert(ios == 2.5 && !contended)
  }

  test("degenerate inputs never crash the verdict: empty series are clean") {
    val (ps, ios, contended) = Bench.verdict(Nil, Nil, loadPre = 0.5)
    assert(ps == 1.0 && ios == 1.0 && !contended)
  }
}
