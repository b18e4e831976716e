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

/** `lower(regexp_replace(s, "[^A-Za-z0-9 ]", ""))` as ONE compiled byte
  * pass — the payload-normalization kernel every multimodal operator runs
  * before windowing/chunking ([[graft.functions.Multimodal.normPayload]]).
  *
  * Exists because of a MEASURED Spark 4.1 pathology, not ordinary regex
  * cost: the identical negated-char-class `regexp_replace` evaluates
  * ~25× slower inside a `Filter` than inside a `Project` (100× corpus,
  * 253 MB of text: 0.3 s projected vs 37 s filtered, positive classes
  * unaffected) — and `filter(length(norm) > 0)` pushes the regex into
  * exactly that Filter shape through alias substitution. A byte-walk
  * kernel is immune and ~regex-fast even in the Project case.
  *
  * Byte-exact equivalence with the regex+lower composition for ANY UTF-8
  * input: the kept class [A-Za-z0-9 ] is pure ASCII, and every byte of a
  * multibyte UTF-8 character is ≥ 0x80, so dropping non-class BYTES drops
  * exactly the non-class CHARACTERS the regex drops, and ASCII lower is
  * the +32 byte map. `MultimodalSpec` pins the law on random strings
  * including multibyte input; the DuckDB oracle keeps the regex form.
  */
case class AsciiNormalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType =
    org.apache.spark.sql.types.StringType
  override def prettyName: String = "ascii_normalize"
  override def nullable: Boolean = child.nullable

  override protected def nullSafeEval(input: Any): Any =
    AsciiNormalize.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.AsciiNormalize.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): AsciiNormalize =
    copy(child = newChild)
}

object AsciiNormalize {
  def compute(s: UTF8String): UTF8String = {
    val b = s.getBytes
    val n = b.length
    val out = new Array[Byte](n)
    var m = 0
    var i = 0
    while (i < n) {
      val c = b(i)
      if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9') || c == ' ') {
        out(m) = c; m += 1
      } else if (c >= 'A' && c <= 'Z') {
        out(m) = (c + 32).toByte; m += 1
      }
      i += 1
    }
    UTF8String.fromBytes(out, 0, m)
  }

  def apply(c: Column): Column =
    CatalystBridge.column(AsciiNormalize(CatalystBridge.expression(c)))
}

/** The per-document trim statistics folded over an [[AudioEnergies]]
  * array in compiled code: (n_windows, n_silent, first_loud, last_loud,
  * total_energy) in ONE array pass. The HOF composition
  * (`aggregate`/`zip_with`/`array_min`) computes the same five folds but
  * through Catalyst's INTERPRETED lambda machinery — measured at 30×
  * (~150k docs × ~200-window arrays) the lambda dispatch dominated the
  * whole query after the explode was fused away, so the stats fold gets
  * the same native treatment as the energy pass. `MultimodalSpec`'s law
  * pins kernel ≡ HOF-composition ≡ explode-composition.
  *
  * first_loud/last_loud are null when no window clears the threshold
  * (the all-silent document), exactly like `min(when(loud, w))`.
  */
case class AudioTrimStats(child: Expression, threshold: Long)
    extends UnaryExpression {
  import org.apache.spark.sql.types.{StructField, StructType}
  override def dataType: DataType = StructType(Seq(
    StructField("n_windows", LongType, nullable = false),
    StructField("n_silent", LongType, nullable = false),
    StructField("first_loud", LongType, nullable = true),
    StructField("last_loud", LongType, nullable = true),
    StructField("total_energy", LongType, nullable = false)))
  override def prettyName: String = "audio_trim_stats"
  override def nullable: Boolean = child.nullable

  override protected def nullSafeEval(input: Any): Any =
    AudioTrimStats.compute(input.asInstanceOf[ArrayData], threshold)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.AudioTrimStats.compute($c, ${threshold}L);")

  override protected def withNewChildInternal(newChild: Expression): AudioTrimStats =
    copy(child = newChild)
}

object AudioTrimStats {
  def compute(e: ArrayData, threshold: Long): org.apache.spark.sql.catalyst.InternalRow = {
    val n = e.numElements()
    var silent = 0L
    var first = -1L
    var last = -1L
    var total = 0L
    var i = 0
    while (i < n) {
      val x = e.getLong(i)
      total += x
      if (x < threshold) silent += 1
      else { if (first < 0) first = i; last = i }
      i += 1
    }
    val row = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(5)
    row.update(0, n.toLong)
    row.update(1, silent)
    row.update(2, if (first < 0) null else java.lang.Long.valueOf(first))
    row.update(3, if (last < 0) null else java.lang.Long.valueOf(last))
    row.update(4, total)
    row
  }

  def apply(c: Column, threshold: Long): Column =
    CatalystBridge.column(AudioTrimStats(CatalystBridge.expression(c), threshold))
}

/** Maximal over-threshold RUNS of an [[AudioEnergies]] array — the
  * voice-activity segments an audio pipeline transcribes (the islands
  * step after [[AudioTrimStats]]'s trim bounds): one compiled pass
  * emitting `struct(w_start, w_end, seg_energy)` per maximal run of
  * consecutive windows with energy ≥ threshold. A document with no loud
  * window yields an EMPTY array (its explode emits nothing — the
  * "all silence, skip transcription" arm). The law partner in
  * `MultimodalSpec` derives the same islands independently with Spark
  * window functions (w − row_number gaps-and-islands) over the exploded
  * energies.
  */
case class AudioVadSegments(child: Expression, threshold: Long)
    extends UnaryExpression {
  import org.apache.spark.sql.types.{StructField, StructType}
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("w_start", LongType, nullable = false),
    StructField("w_end", LongType, nullable = false),
    StructField("seg_energy", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "audio_vad_segments"
  override def nullable: Boolean = child.nullable

  override protected def nullSafeEval(input: Any): Any =
    AudioVadSegments.compute(input.asInstanceOf[ArrayData], threshold)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.AudioVadSegments.compute($c, ${threshold}L);")

  override protected def withNewChildInternal(newChild: Expression): AudioVadSegments =
    copy(child = newChild)
}

object AudioVadSegments {
  def compute(e: ArrayData, threshold: Long): ArrayData = {
    val n = e.numElements()
    val segs = scala.collection.mutable.ArrayBuffer
      .empty[org.apache.spark.sql.catalyst.InternalRow]
    var start = -1L
    var energy = 0L
    var i = 0
    while (i < n) {
      val x = e.getLong(i)
      if (x >= threshold) {
        if (start < 0) { start = i; energy = 0L }
        energy += x
      } else if (start >= 0) {
        segs += seg(start, i - 1L, energy); start = -1L
      }
      i += 1
    }
    if (start >= 0) segs += seg(start, n - 1L, energy)
    new GenericArrayData(segs.toArray[Any])
  }

  private def seg(s: Long, e: Long, en: Long)
      : org.apache.spark.sql.catalyst.InternalRow = {
    val r = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(3)
    r.update(0, s); r.update(1, e); r.update(2, en)
    r
  }

  def apply(c: Column, threshold: Long): Column =
    CatalystBridge.column(AudioVadSegments(CatalystBridge.expression(c), threshold))
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
