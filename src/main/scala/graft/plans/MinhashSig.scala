package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.CatalystBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** All `numPerms` MinHash permutation minima in ONE pass over the hashed
  * shingle array — the signature-build kernel of the whole MinHash family
  * (`Dedup.minhashSignatures` runs it once per document over the corpus).
  *
  * The composition form runs `numPerms` separate
  * `array_min(transform(s, h => (a_j·h + b_j) % p))` sweeps — 16 array
  * traversals and 16 intermediate product arrays per document. This
  * expression is a single fused loop keeping 16 running minima in local
  * longs. The permutation family is the engine's fixed public one
  * (`Dedup.perm(j) = (2j+1, 101j+17)`, modulus `Dedup.MinhashPrime`), so
  * values are bit-identical to the composition and to the DuckDB oracle's
  * `minhashExprs` — verified by a PropertySpec law and the full gate.
  *
  * Null/empty semantics mirror the composition: null elements are skipped
  * (as `array_min` skips nulls); an empty or all-null input yields a NULL
  * result array (element_at then yields null per signature column, exactly
  * as each `array_min` would).
  */
case class MinhashSig(child: Expression, numPerms: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"
  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    MinhashSig.compute(input.asInstanceOf[ArrayData], numPerms)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val out = ctx.freshName("out")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $out =
         |  graft.plans.MinhashSig.compute($c, $numPerms);
         |if ($out == null) { ${ev.isNull} = true; } else { ${ev.value} = $out; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinhashSig =
    copy(child = newChild)
}

object MinhashSig {
  /** Mirrors Dedup.perm / Dedup.MinhashPrime (kept literal here to avoid a
    * plans→functions dependency cycle; pinned equal by a PropertySpec law).
    */
  private val Prime = 4294967311L
  private def permA(j: Int): Long = 2L * j + 1
  private def permB(j: Int): Long = 101L * j + 17

  def compute(s: ArrayData, numPerms: Int): ArrayData = {
    val n = s.numElements()
    val mins = Array.fill(numPerms)(Long.MaxValue)
    var seen = false
    var i = 0
    while (i < n) {
      if (!s.isNullAt(i)) {
        seen = true
        val h = s.getLong(i)
        var j = 0
        while (j < numPerms) {
          val v = (permA(j) * h + permB(j)) % Prime
          if (v < mins(j)) mins(j) = v
          j += 1
        }
      }
      i += 1
    }
    if (!seen) null else new GenericArrayData(mins)
  }

  def apply(c: Column, numPerms: Int): Column =
    CatalystBridge.column(MinhashSig(CatalystBridge.expression(c), numPerms))
}
