package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.CatalystBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** All fixed-width window energies of an audio payload in ONE pass over
  * its bytes — the fused kernel of `Multimodal.audioEnergy` (the VAD /
  * silence-trim step an audio ingest pipeline runs before transcription;
  * reference-free: the decode itself is the declared stub, this is the
  * windowed Σ sample² around it).
  *
  * The composition form explodes one row per WINDOW and then one row per
  * SAMPLE (norm length rows per document through two exchanges) before a
  * hash aggregate rebuilds the per-window sums — SCALE_r14 measured that
  * per-sample row amplification as the worst non-dedup grower in the tree
  * (5.53× wall at 30×). This expression walks the payload bytes once in
  * local longs and emits the `⌈len/win⌉` energies as one array, so the
  * per-document stats derive from array folds with ZERO exchanges.
  *
  * Sample decode contract (the declared deterministic stub, identical to
  * the composition and the DuckDB oracle): `sample(i) = ascii(payload[i])
  * − 110`. The payload is `Multimodal.normPayload` — lowercased
  * `[a-z0-9 ]` ASCII — so byte value == codepoint and the byte walk IS
  * `ascii()`; `MultimodalSpec`'s law pins kernel ≡ composition on the
  * real corpus.
  *
  * Null/empty semantics: null in → null out (`UnaryExpression`
  * null-intolerant default); empty string → empty array (the operator
  * filters empties before the kernel, same as the composition's
  * `length > 0` gate).
  */
case class AudioEnergies(child: Expression, win: Int)
    extends UnaryExpression {
  require(win > 0, s"window width must be positive, got $win")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "audio_energies"
  override def nullable: Boolean = child.nullable

  override protected def nullSafeEval(input: Any): Any =
    AudioEnergies.compute(input.asInstanceOf[UTF8String], win)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.AudioEnergies.compute($c, $win);")

  override protected def withNewChildInternal(newChild: Expression): AudioEnergies =
    copy(child = newChild)
}

object AudioEnergies {
  def compute(s: UTF8String, win: Int): ArrayData = {
    val b = s.getBytes
    val n = b.length
    if (n == 0) return new GenericArrayData(Array.emptyLongArray)
    val out = new Array[Long]((n - 1) / win + 1)
    var i = 0
    while (i < n) {
      // unsigned byte == codepoint for the normalized ASCII payload
      val d = ((b(i) & 0xFF) - 110).toLong
      out(i / win) += d * d
      i += 1
    }
    new GenericArrayData(out)
  }

  def apply(c: Column, win: Int): Column =
    CatalystBridge.column(AudioEnergies(CatalystBridge.expression(c), win))
}
