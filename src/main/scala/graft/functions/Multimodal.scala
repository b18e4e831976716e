package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multimodal (binary) column operators — the LLM-pipeline pillar for
  * image/audio/video payloads carried as opaque `binary` columns with
  * typed header metadata.
  *
  * The container has no codec libraries, so the *decode* step is a
  * clearly-marked deterministic stub ([[decodeStub]]); everything the
  * engine is responsible for at 100 TB — the binary schema, header
  * parsing, slicing, digesting, frame iteration, candidate joins — is
  * real Spark: pure codegen'd expressions per record (no shuffle until a
  * dedup join, which joins on thin (band, digest) keys only).
  */
object Multimodal {

  /** Header layout: 4-byte magic | u16-BE width | u16-BE height | payload. */
  val HeaderLen = 8

  private val magicHex: Column =
    when(pmod(col("doc_id"), lit(3)) === 0, "89504E47") // PNG
      .when(pmod(col("doc_id"), lit(3)) === 1, "FFD8FFE0") // JPEG/JFIF
      .otherwise("52494646") // RIFF (WAV)

  private def int16be(c: Column): Column = unhex(lpad(hex(c), 4, "0"))

  val widthExpr: Column = lit(16) + pmod(col("doc_id") * 7, lit(1024))
  val heightExpr: Column = lit(16) + pmod(col("doc_id") * 13, lit(1024))

  /** Synthesize the binary media column from the documents corpus: a
    * deterministic stand-in for reading real image/audio blobs (parquet
    * `binary` column), so the downstream operators exercise real binary
    * plumbing with an oracle-computable content.
    */
  def withBinary(documents: DataFrame): DataFrame =
    documents.withColumn("media",
      concat(
        unhex(magicHex),
        int16be(widthExpr), int16be(heightExpr),
        encode(col("text"), "UTF-8")))

  /** Magic-number sniff + header parse + payload digest — all codegen'd
    * expressions over the binary column (no UDF, no shuffle).
    */
  /** Magic-number sniff → modality kind (shared by [[meta]] and the
    * block-CAS report).
    */
  val kindCol: Column =
    when(hex(substring(col("media"), 1, 4)) === "89504E47", "png")
      .when(hex(substring(col("media"), 1, 4)) === "FFD8FFE0", "jpeg")
      .when(hex(substring(col("media"), 1, 4)) === "52494646", "wav")
      .otherwise("unknown")

  def meta(withMedia: DataFrame): DataFrame =
    withMedia.select(
      col("doc_id"),
      kindCol.as("kind"),
      conv(hex(substring(col("media"), 5, 2)), 16, 10).cast("bigint").as("width"),
      conv(hex(substring(col("media"), 7, 2)), 16, 10).cast("bigint").as("height"),
      (octet_length(col("media")) - HeaderLen).cast("bigint").as("payload_len"),
      md5(substring(col("media"), HeaderLen + 1, Int.MaxValue)).as("payload_md5"))

  /** Payload decoded to normalized ASCII (lower over an ASCII-stripped
    * alphabet, so char and byte offsets agree across engines). Runs as
    * the [[graft.plans.AsciiNormalize]] byte-pass kernel — value-equal to
    * `lower(regexp_replace(…, "[^A-Za-z0-9 ]", ""))` (the form the DuckDB
    * oracle keeps, law-pinned in MultimodalSpec), but immune to the
    * measured Filter-vs-Project regex pathology the kernel documents.
    */
  val normPayload: Column =
    graft.plans.AsciiNormalize(
      decode(substring(col("media"), HeaderLen + 1, Int.MaxValue), "UTF-8"))

  /** The regex composition [[normPayload]] is law-tested against. */
  val normPayloadComposed: Column =
    lower(regexp_replace(
      decode(substring(col("media"), HeaderLen + 1, Int.MaxValue), "UTF-8"),
      "[^A-Za-z0-9 ]", ""))

  /** Perceptual-hash-style near-dup over binary payloads: the payload is
    * cut into fixed-width frames, each digested; documents sharing ≥2
    * distinct frame digests are near-dups (a blockhash over content
    * blocks). The band join carries only (doc_id, digest) — thin rows
    * through the exchange — and digests shared by more than `dfCutoff`
    * docs are dropped (the boilerplate guard that keeps one common block
    * from going quadratic at 100 TB).
    */
  def nearDup(withMedia: DataFrame, frameLen: Int = 16, dfCutoff: Int = 100): DataFrame = {
    val frames = withMedia
      .select(col("doc_id"), normPayload.as("norm"))
      .filter(length(col("norm")) > 0)
      .select(col("doc_id"), col("norm"),
        explode(sequence(lit(0L), ((length(col("norm")) - 1) / frameLen).cast("long"))).as("fi"))
      .select(col("doc_id"),
        col("norm").substr((col("fi") * frameLen + 1).cast("int"), lit(frameLen)).as("fr"))
      .filter(length(col("fr")) === frameLen) // full frames only
      .select(col("doc_id"), md5(col("fr")).as("frame_md5"))
      .distinct()
    val rare = frames.groupBy("frame_md5")
      .agg(count(lit(1)).as("df"))
      .filter(col("df") <= dfCutoff && col("df") >= 2)
    // No broadcast hint: `rare` is |distinct digests|-sized; AQE picks the
    // strategy (broadcasts at test scale, shuffles at 100 TB).
    val banded = frames.join(rare.drop("df"), Seq("frame_md5"))
    val pairs = banded.as("a").join(banded.as("b"),
        col("a.frame_md5") === col("b.frame_md5") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
    pairs.groupBy("doc_a", "doc_b").agg(count(lit(1)).as("n_frames"))
      .filter(col("n_frames") >= 2)
  }

  /** Frame-sampling analogue for video/audio payloads: fixed-width frames
    * over the payload, every `step`-th frame sampled and digested. Pure
    * per-row explode — distributes trivially.
    */
  def frameSample(withMedia: DataFrame, frameLen: Int = 32, step: Int = 3): DataFrame =
    withMedia
      .select(col("doc_id"), normPayload.as("norm"))
      .filter(length(col("norm")) > 0)
      .select(col("doc_id"), col("norm"),
        explode(sequence(lit(0L), ((length(col("norm")) - 1) / frameLen).cast("long"))).as("frame_idx"))
      .filter(pmod(col("frame_idx"), lit(step)) === 0)
      .select(col("doc_id"), col("frame_idx"),
        md5(col("norm").substr((col("frame_idx") * frameLen + 1).cast("int"), lit(frameLen))).as("frame_md5"),
        length(col("norm").substr((col("frame_idx") * frameLen + 1).cast("int"), lit(frameLen))).cast("bigint").as("frame_len"))

  /** Audio-path analogue — windowed ENERGY + silence-trim offsets, the
    * VAD/segmentation step an audio ingest pipeline runs before
    * transcription. The PCM decode is a DECLARED DETERMINISTIC STUB
    * (sample(i) = ascii(payload[i]) − 110 — the real codec is
    * sandbox-blocked, as with `resize`'s pixels).
    *
    * Dataflow: ONE fused codegen kernel ([[graft.plans.AudioEnergies]])
    * emits every window's Σ sample² per document in a single byte pass,
    * and the trim stats (first/last over-threshold window, silent count,
    * total energy) fold over that array per row — ZERO exchanges, no row
    * amplification. The previous composition (per-window explode →
    * per-sample explode → two hash aggregates) pushed `len(payload)` rows
    * per document through two shuffles and was SCALE_r14's worst
    * non-dedup grower (5.53× wall at 30×); it survives as
    * [[audioEnergyComposed]], the law partner `MultimodalSpec` pins the
    * kernel against on the real corpus.
    */
  def audioEnergy(withMedia: DataFrame, win: Int = 16,
      threshold: Long = 3000L): DataFrame =
    withMedia
      .select(col("doc_id"), normPayload.as("norm"))
      .filter(length(col("norm")) > 0)
      .select(col("doc_id"), graft.plans.AudioTrimStats(
        graft.plans.AudioEnergies(col("norm"), win), threshold).as("st"))
      .select(col("doc_id"), col("st.n_windows"), col("st.n_silent"),
        col("st.first_loud"), col("st.last_loud"), col("st.total_energy"))

  /** [[audioEnergy]]'s stats fold as HOF builtins over the energies array
    * — the intermediate law partner between the fused kernels and the
    * explode composition (`aggregate`/`zip_with` are Catalyst-interpreted
    * lambdas: correct, shuffle-free, but measured ~5× the kernel's wall
    * at 30× — kept for the three-way MultimodalSpec law only).
    */
  def audioEnergyHof(withMedia: DataFrame, win: Int = 16,
      threshold: Long = 3000L): DataFrame = {
    val loudIdx = zip_with(col("e"),
      sequence(lit(0L), size(col("e")).cast("long") - 1),
      (x, i) => when(x >= threshold, i))
    withMedia
      .select(col("doc_id"), normPayload.as("norm"))
      .filter(length(col("norm")) > 0)
      .select(col("doc_id"), graft.plans.AudioEnergies(col("norm"), win).as("e"))
      .select(col("doc_id"),
        size(col("e")).cast("long").as("n_windows"),
        aggregate(col("e"), lit(0L),
          (a, x) => a + (x < threshold).cast("long")).as("n_silent"),
        array_min(loudIdx).as("first_loud"),
        array_max(loudIdx).as("last_loud"),
        aggregate(col("e"), lit(0L), (a, x) => a + x).as("total_energy"))
  }

  /** The pre-kernel COMPOSITION of [[audioEnergy]] — per-window explode →
    * per-sample explode → two partial-aggregatable hash aggregates. Kept
    * as the executable specification the fused kernel is law-tested
    * against (the `MinhashSig` pattern): same outputs, built from
    * independent builtins.
    */
  def audioEnergyComposed(withMedia: DataFrame, win: Int = 16,
      threshold: Long = 3000L): DataFrame = {
    val winEnergy = withMedia
      .select(col("doc_id"), normPayload.as("norm"))
      .filter(length(col("norm")) > 0)
      .select(col("doc_id"), col("norm"),
        explode(sequence(lit(0L), ((length(col("norm")) - 1) / win).cast("long"))).as("w"))
      .select(col("doc_id"), col("w"), explode(expr(
        s"""transform(sequence(1, length(substring(norm, cast(w * $win + 1 as int), $win))),
            p -> ascii(substring(substring(norm, cast(w * $win + 1 as int), $win), p, 1)) - 110)"""))
        .as("smp"))
      .groupBy(col("doc_id"), col("w"))
      .agg(sum(col("smp") * col("smp")).as("energy"))
    val loud = col("energy") >= threshold
    winEnergy.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_windows"),
        sum((!loud).cast("long")).as("n_silent"),
        min(when(loud, col("w"))).as("first_loud"),
        max(when(loud, col("w"))).as("last_loud"),
        sum(col("energy")).as("total_energy"))
  }

  /** Voice-activity SEGMENTS — the islands step after [[audioEnergy]]'s
    * trim bounds: each maximal run of consecutive over-threshold windows
    * becomes one segment row (the unit an audio pipeline actually
    * transcribes; trim alone cannot skip mid-payload silence). Dataflow:
    * the [[graft.plans.AudioEnergies]] → [[graft.plans.AudioVadSegments]]
    * kernel chain emits the per-doc segment array in one byte pass +
    * one array pass, then `posexplode` yields ~segments-per-doc thin
    * rows — no shuffle, no per-window row amplification; an all-silent
    * document emits nothing. seg_idx is the within-doc rank by position
    * (deterministic: segments emit in window order).
    */
  def vadSegments(withMedia: DataFrame, win: Int = 16,
      threshold: Long = 3000L): DataFrame =
    withMedia
      .select(col("doc_id"), normPayload.as("norm"))
      .filter(length(col("norm")) > 0)
      .select(col("doc_id"), posexplode(graft.plans.AudioVadSegments(
        graft.plans.AudioEnergies(col("norm"), win), threshold)))
      .select(col("doc_id"), col("pos").cast("long").as("seg_idx"),
        col("col.w_start"), col("col.w_end"),
        (col("col.w_end") - col("col.w_start") + 1L).as("n_windows"),
        col("col.seg_energy"))

  /** Resize analogue: halve the header dims and downsample the payload to
    * every 2nd byte (the pixel-skip resample a real decoder would do per
    * axis) — header parse, payload slice, and digest all on the binary
    * column, pure codegen'd expressions.
    */
  def resize(withMedia: DataFrame): DataFrame = {
    val payload = decode(substring(col("media"), HeaderLen + 1, Int.MaxValue), "UTF-8")
    val ds = regexp_replace(payload, "(.).", "$1")
    withMedia.select(
      col("doc_id"),
      ((conv(hex(substring(col("media"), 5, 2)), 16, 10).cast("bigint") + 1)
        .divide(2)).cast("bigint").as("new_width"),
      ((conv(hex(substring(col("media"), 7, 2)), 16, 10).cast("bigint") + 1)
        .divide(2)).cast("bigint").as("new_height"),
      length(ds).cast("bigint").as("ds_len"),
      md5(ds.cast("binary")).as("ds_md5"))
  }

  /** Decode step STUB — the real implementation needs an image/audio codec
    * library that is not in this container. The Spark-side contract is
    * real: batched per-partition iteration over (id, media) binary rows,
    * fixed output schema, no driver collect. The "pixels" are a
    * deterministic fake derived from the header so tests are stable.
    */
  def decodeStub(withMedia: DataFrame): DataFrame = {
    val spark = withMedia.sparkSession
    import spark.implicits._
    withMedia.select(col("doc_id"), col("media")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, media) =>
          val bb = java.nio.ByteBuffer.wrap(media)
          val magic = bb.getInt
          val width = bb.getShort & 0xFFFF
          val height = bb.getShort & 0xFFFF
          // ??? real codec goes here; deterministic fake: payload CRC as
          // the "decoded frame" digest.
          val crc = new java.util.zip.CRC32
          crc.update(media, Multimodal.HeaderLen, media.length - Multimodal.HeaderLen)
          (id, magic, width, height, width.toLong * height, crc.getValue)
        }
      }
      .toDF("doc_id", "magic", "width", "height", "n_pixels", "payload_crc32")
  }
}
