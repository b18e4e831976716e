package graft.tools

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.CatalystBridge
import org.apache.spark.sql.types.{DataType, LongType}

import graft.plans.PqArgmin

/** Quiet-box A/B of the `PqArgmin` saturation branch (VERDICT r19 task 3:
  * `sim_pq_adc` +38% / `sim_pq_encode` +34% clean-vs-clean in the round
  * that added one compare per codeword to their shared inner loop — noise
  * or real?). Three kernels over identical data in ONE JVM, alternating
  * sweeps so JIT/codegen warmup amortizes equally:
  *
  *  - `capped`    — the shipped kernel (per-codeword saturation compare)
  *  - `uncapped`  — the r18 kernel (no branch; the overflow-corruptible
  *                  form, A/B baseline ONLY — never ship)
  *  - `hoisted`   — branch-free inner loop guarded by one per-row bound
  *                  check (n·(max|sv|+max|cw|)² < DistCap ⇒ no codeword
  *                  can saturate ⇒ the compare is provably dead)
  *
  * Data mirrors the engine's regime: 8-dim quantized (×1000 grid)
  * subvectors, 16 subspaces × 256 codewords.
  *
  * Usage: `graft.tools.PqArgminBench [nRows]` — prints one line per sweep.
  */
object PqArgminBench {

  /** The r18 kernel: no saturation. A/B baseline only. */
  case class PqArgminUncapped(left: Expression, right: Expression,
      codes: Array[Array[Long]], cws: Array[Array[Array[Long]]])
    extends BinaryExpression {
    override def dataType: DataType = LongType
    override def prettyName: String = "pq_argmin_uncapped"
    override def nullable: Boolean = true
    override protected def nullSafeEval(mAny: Any, svAny: Any): Any = {
      val m = mAny.asInstanceOf[Int]
      if (m < 0 || m >= cws.length || cws(m).isEmpty) return null
      val sv = svAny.asInstanceOf[ArrayData]
      val n = sv.numElements()
      var i = 0
      while (i < n) { if (sv.isNullAt(i)) return null; i += 1 }
      val cwm = cws(m)
      val codm = codes(m)
      var best = Long.MaxValue
      var j = 0
      while (j < cwm.length) {
        val cw = cwm(j)
        if (cw.length != n) return null
        var d = 0L
        var p = 0
        while (p < n) { val x = sv.getLong(p) - cw(p); d += x * x; p += 1 }
        val packed = (d << 20) | codm(j)
        if (packed < best) best = packed
        j += 1
      }
      best
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val cwsRef = ctx.addReferenceObj("pqCws", cws, "long[][][]")
      val codesRef = ctx.addReferenceObj("pqCodes", codes, "long[][]")
      nullSafeCodeGen(ctx, ev, (mv, sv) => {
        val n = ctx.freshName("n"); val i = ctx.freshName("i")
        val j = ctx.freshName("j"); val p = ctx.freshName("p")
        val d = ctx.freshName("d"); val x = ctx.freshName("x")
        val cwm = ctx.freshName("cwm"); val codm = ctx.freshName("codm")
        val cw = ctx.freshName("cw"); val best = ctx.freshName("best")
        val anyNull = ctx.freshName("anyNull"); val packed = ctx.freshName("packed")
        s"""
           |if ($mv < 0 || $mv >= $cwsRef.length || $cwsRef[$mv].length == 0) {
           |  ${ev.isNull} = true;
           |} else {
           |  final int $n = $sv.numElements();
           |  boolean $anyNull = false;
           |  for (int $i = 0; $i < $n; $i++) {
           |    if ($sv.isNullAt($i)) { $anyNull = true; break; }
           |  }
           |  if ($anyNull) {
           |    ${ev.isNull} = true;
           |  } else {
           |    final long[][] $cwm = $cwsRef[$mv];
           |    final long[] $codm = $codesRef[$mv];
           |    long $best = Long.MAX_VALUE;
           |    for (int $j = 0; $j < $cwm.length && !${ev.isNull}; $j++) {
           |      final long[] $cw = $cwm[$j];
           |      if ($cw.length != $n) { ${ev.isNull} = true; break; }
           |      long $d = 0L;
           |      for (int $p = 0; $p < $n; $p++) {
           |        final long $x = $sv.getLong($p) - $cw[$p];
           |        $d += $x * $x;
           |      }
           |      final long $packed = ($d << 20) | $codm[$j];
           |      if ($packed < $best) $best = $packed;
           |    }
           |    ${ev.value} = $best;
           |  }
           |}
         """.stripMargin
      })
    }
    override protected def withNewChildrenInternal(newLeft: Expression,
        newRight: Expression): PqArgminUncapped = copy(left = newLeft, right = newRight)
  }

  /** Branch-free inner loop behind a per-row saturation-possibility check:
    * max|cw| is precomputed per subspace at construction; per row one pass
    * (the existing null scan) also takes max|sv|, and if
    * n·(max|sv|+max|cw|)² stays under DistCap no codeword distance can
    * saturate — run the r18 loop; otherwise run the shipped guarded loop.
    * Results are bit-identical to the shipped kernel in both regimes.
    */
  case class PqArgminHoisted(left: Expression, right: Expression,
      codes: Array[Array[Long]], cws: Array[Array[Array[Long]]])
    extends BinaryExpression {
    override def dataType: DataType = LongType
    override def prettyName: String = "pq_argmin_hoisted"
    override def nullable: Boolean = true
    private val maxAbsCw: Array[Long] =
      cws.map(sub => if (sub.isEmpty) 0L
        else sub.iterator.flatMap(_.iterator).map(math.abs).foldLeft(0L)(math.max))
    override protected def nullSafeEval(mAny: Any, svAny: Any): Any = {
      val m = mAny.asInstanceOf[Int]
      if (m < 0 || m >= cws.length || cws(m).isEmpty) return null
      val sv = svAny.asInstanceOf[ArrayData]
      val n = sv.numElements()
      var maxAbs = 0L
      var i = 0
      while (i < n) {
        if (sv.isNullAt(i)) return null
        val a = math.abs(sv.getLong(i))
        if (a > maxAbs) maxAbs = a
        i += 1
      }
      val span = maxAbs + maxAbsCw(m)
      val safe = span < (1L << 30) && n.toLong * span * span < PqArgmin.DistCap
      val cwm = cws(m)
      val codm = codes(m)
      var best = Long.MaxValue
      var j = 0
      if (safe) {
        while (j < cwm.length) {
          val cw = cwm(j)
          if (cw.length != n) return null
          var d = 0L
          var p = 0
          while (p < n) { val x = sv.getLong(p) - cw(p); d += x * x; p += 1 }
          val packed = (d << 20) | codm(j)
          if (packed < best) best = packed
          j += 1
        }
      } else {
        while (j < cwm.length) {
          val cw = cwm(j)
          if (cw.length != n) return null
          var d = 0L
          var p = 0
          while (p < n) { val x = sv.getLong(p) - cw(p); d += x * x; p += 1 }
          if (d > PqArgmin.DistCap || d < 0L) d = PqArgmin.DistCap
          val packed = (d << 20) | codm(j)
          if (packed < best) best = packed
          j += 1
        }
      }
      best
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val cwsRef = ctx.addReferenceObj("pqCws", cws, "long[][][]")
      val codesRef = ctx.addReferenceObj("pqCodes", codes, "long[][]")
      val maxRef = ctx.addReferenceObj("pqMaxCw", maxAbsCw, "long[]")
      nullSafeCodeGen(ctx, ev, (mv, sv) => {
        val n = ctx.freshName("n"); val i = ctx.freshName("i")
        val j = ctx.freshName("j"); val p = ctx.freshName("p")
        val d = ctx.freshName("d"); val x = ctx.freshName("x")
        val cwm = ctx.freshName("cwm"); val codm = ctx.freshName("codm")
        val cw = ctx.freshName("cw"); val best = ctx.freshName("best")
        val anyNull = ctx.freshName("anyNull"); val packed = ctx.freshName("packed")
        val maxAbs = ctx.freshName("maxAbs"); val a = ctx.freshName("a")
        val span = ctx.freshName("span"); val safe = ctx.freshName("safe")
        s"""
           |if ($mv < 0 || $mv >= $cwsRef.length || $cwsRef[$mv].length == 0) {
           |  ${ev.isNull} = true;
           |} else {
           |  final int $n = $sv.numElements();
           |  boolean $anyNull = false;
           |  long $maxAbs = 0L;
           |  for (int $i = 0; $i < $n; $i++) {
           |    if ($sv.isNullAt($i)) { $anyNull = true; break; }
           |    final long $a = Math.abs($sv.getLong($i));
           |    if ($a > $maxAbs) $maxAbs = $a;
           |  }
           |  if ($anyNull) {
           |    ${ev.isNull} = true;
           |  } else {
           |    final long[][] $cwm = $cwsRef[$mv];
           |    final long[] $codm = $codesRef[$mv];
           |    final long $span = $maxAbs + $maxRef[$mv];
           |    final boolean $safe = $span < (1L << 30) &&
           |      (long) $n * $span * $span < ${PqArgmin.DistCap}L;
           |    long $best = Long.MAX_VALUE;
           |    if ($safe) {
           |      for (int $j = 0; $j < $cwm.length && !${ev.isNull}; $j++) {
           |        final long[] $cw = $cwm[$j];
           |        if ($cw.length != $n) { ${ev.isNull} = true; break; }
           |        long $d = 0L;
           |        for (int $p = 0; $p < $n; $p++) {
           |          final long $x = $sv.getLong($p) - $cw[$p];
           |          $d += $x * $x;
           |        }
           |        final long $packed = ($d << 20) | $codm[$j];
           |        if ($packed < $best) $best = $packed;
           |      }
           |    } else {
           |      for (int $j = 0; $j < $cwm.length && !${ev.isNull}; $j++) {
           |        final long[] $cw = $cwm[$j];
           |        if ($cw.length != $n) { ${ev.isNull} = true; break; }
           |        long $d = 0L;
           |        for (int $p = 0; $p < $n; $p++) {
           |          final long $x = $sv.getLong($p) - $cw[$p];
           |          $d += $x * $x;
           |        }
           |        if ($d > ${PqArgmin.DistCap}L || $d < 0L) $d = ${PqArgmin.DistCap}L;
           |        final long $packed = ($d << 20) | $codm[$j];
           |        if ($packed < $best) $best = $packed;
           |      }
           |    }
           |    ${ev.value} = $best;
           |  }
           |}
         """.stripMargin
      })
    }
    override protected def withNewChildrenInternal(newLeft: Expression,
        newRight: Expression): PqArgminHoisted = copy(left = newLeft, right = newRight)
  }

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(8000000L)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // Engine regime: 16 subspaces × 256 codewords × 8 dims, components on
    // the ×1000 quantized grid of a unit-norm corpus (|c| ≤ ~1000).
    val rnd = new scala.util.Random(42)
    val cws: Array[Array[Array[Long]]] = Array.tabulate(16, 256, 8) {
      (_, _, _) => rnd.nextInt(2001).toLong - 1000L
    }
    val codes: Array[Array[Long]] = Array.tabulate(16, 256)((_, j) => j.toLong)
    val rows = spark.range(n)
      .select(pmod(col("id"), lit(16)).cast("int").as("m"),
        transform(sequence(lit(0), lit(7)),
          i => pmod(col("id") * (i + lit(11)), lit(2001L)) - lit(1000L)).as("sv"))
      .localCheckpoint()
    def time(tag: String, c: Column): Unit = {
      val t0 = System.nanoTime()
      val r = rows.select(sum(pmod(c, lit(1000003L)))).head().getLong(0)
      println(f"$tag%9s ${(System.nanoTime() - t0) / 1e9}%6.3f s  sum=$r")
    }
    val capped = PqArgmin(col("m"), col("sv"), codes, cws)
    val uncapped = CatalystBridge.column(PqArgminUncapped(
      CatalystBridge.expression(col("m")), CatalystBridge.expression(col("sv")),
      codes, cws))
    val hoisted = CatalystBridge.column(PqArgminHoisted(
      CatalystBridge.expression(col("m")), CatalystBridge.expression(col("sv")),
      codes, cws))
    for (_ <- 1 to 5) {
      time("capped", capped)
      time("uncapped", uncapped)
      time("hoisted", hoisted)
    }
    spark.stop()
  }
}
