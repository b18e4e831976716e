package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.CatalystBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Nearest-PQ-codeword argmin as ONE native codegen'd expression: for a
  * subvector row (m, sv), scan subspace m's codewords in a fused loop and
  * return the packed `(minDist << 20) | code` — distance under exact
  * integer squared-L2, ties to the smallest code (the packing makes the
  * lexicographic (d, code) order a plain long min, and codewords are
  * scanned in ascending code order).
  *
  * This is the PQ encode/train kernel. The relational formulation —
  * explode every subvector against a broadcast codebook and argmin with
  * a min-struct aggregate — materializes |rows|·|codewords| joined rows
  * (4.2M at sf0.1 with the 256-codeword production codebook) and paid
  * ~5 µs each through the non-codegen `aggregate∘zip_with` distance; the
  * kernel is a projection, one row in, one long out, the whole codebook
  * riding along as a reference object (an index artifact of ≤
  * PqSub·PqCodewords rows, the same class as a broadcast centroid
  * table). Semantics match the join+argmin exactly — verified by the PQ
  * family's oracle gates and SimilaritySpec/PropertySpec laws.
  *
  * NULL on: null/missing subvector element, subspace index outside the
  * codebook, codeword/subvector length mismatch (mirrors zip_with's
  * null-pad), or an empty subspace.
  */
case class PqArgmin(left: Expression, right: Expression,
    codes: Array[Array[Long]], cws: Array[Array[Array[Long]]])
  extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "pq_argmin"
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
      // saturate the distance side before packing (ADVICE r18): past
      // DistCap the shift would corrupt both code and distance; capped
      // distances stay ordered-after every uncapped one and ties still
      // break to the smallest code
      if (d > PqArgmin.DistCap || d < 0L) d = PqArgmin.DistCap
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
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val p = ctx.freshName("p")
      val d = ctx.freshName("d")
      val x = ctx.freshName("x")
      val cwm = ctx.freshName("cwm")
      val codm = ctx.freshName("codm")
      val cw = ctx.freshName("cw")
      val best = ctx.freshName("best")
      val anyNull = ctx.freshName("anyNull")
      val packed = ctx.freshName("packed")
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
         |      if ($d > ${PqArgmin.DistCap}L || $d < 0L) $d = ${PqArgmin.DistCap}L;
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
      newRight: Expression): PqArgmin = copy(left = newLeft, right = newRight)
}

object PqArgmin {
  /** Packed-code mask: codes must fit 20 bits (the engine seeds codes
    * from `vec_id < PqCodewords` ≤ 256 — asserted by the caller).
    */
  val CodeBits = 20
  val CodeMask: Long = (1L << CodeBits) - 1

  /** Distance saturation bound (ADVICE r18): the largest squared
    * distance `(d << CodeBits)` can carry without overflowing into the
    * sign bit — 2^43. The quantized grid multiplies components by 1000,
    * so this binds only past component magnitudes around ±500 (‖sv−cw‖²
    * ≥ 2^43 needs ~1e6-scale component deltas over an 8-dim subspace);
    * the unit-norm corpus sits 6 orders below. At or past the cap all
    * codewords compare equal on distance and the tie breaks to the
    * smallest code — the same deterministic order, never a corrupted
    * packing. The `d < 0` arm folds the (even further) multiply-overflow
    * case into the same saturation.
    */
  val DistCap: Long = Long.MaxValue >> CodeBits

  def apply(m: Column, sv: Column, codes: Array[Array[Long]],
      cws: Array[Array[Array[Long]]]): Column =
    CatalystBridge.column(PqArgmin(CatalystBridge.expression(m),
      CatalystBridge.expression(sv), codes, cws))
}
