package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.CatalystBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Exact integer dot product of two quantized (long-array) vectors as ONE
  * native codegen'd expression — the scored-join kernel of every vector
  * operator (brute kNN, IVF list scans, threshold pairs, SemDeDup blocks,
  * CLIP-score pairing run it once per CANDIDATE PAIR).
  *
  * The composition form (`aggregate(zip_with(a, b, _*_), 0L, _+_)`)
  * materializes an intermediate product array per pair and dispatches two
  * lambdas per element; this expression is a single fused loop over the
  * `ArrayData`, no allocation. Semantics match the composition exactly:
  * a null element or a length mismatch (zip_with pads with nulls → null
  * sum) yields NULL; products/sums of the ±10^3-quantized grid are
  * ≪ 2^63 by construction (64 dims × 10^6 per term), so plain long
  * arithmetic is exact — the same values the DuckDB oracle's `simSql`
  * computes (`VectorOps.simSql`), verified by the full oracle gate and a
  * PropertySpec equivalence law.
  */
case class DotQ(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "dot_q"
  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getLong(i) * y.getLong(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $acc = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += $a.getLong($i) * $b.getLong($i);
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): DotQ = copy(left = newLeft, right = newRight)
}

object DotQ {
  def apply(a: Column, b: Column): Column =
    CatalystBridge.column(DotQ(CatalystBridge.expression(a),
      CatalystBridge.expression(b)))
}
