package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{Multimodal, Similarity}

/** Multimodal binary-column queries over the documents corpus (the LLM
  * pipeline's media pillar): header metadata extraction, chunk-digest
  * near-dup, and frame sampling — each with an exact DuckDB oracle
  * computed from the same deterministic generators.
  */
object MmOps {

  private def media(s: SparkSession, dir: String): DataFrame =
    Multimodal.withBinary(s.read.parquet(s"$dir/documents.parquet"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_meta" -> ((s, dir) => Multimodal.meta(media(s, dir))),
    "mm_near_dup" -> ((s, dir) => Multimodal.nearDup(media(s, dir))),
    "mm_frame_sample" -> ((s, dir) => Multimodal.frameSample(media(s, dir))),
    "mm_resize" -> ((s, dir) => Multimodal.resize(media(s, dir))),
    "mm_audio_energy" -> ((s, dir) => Multimodal.audioEnergy(media(s, dir))),
    "mm_vad_segments" -> ((s, dir) => Multimodal.vadSegments(media(s, dir))),

    // BLOCK-level content-addressed storage dedup — the chunked CAS
    // report (restic/borg-style): payloads cut into 16-char blocks
    // (tails kept — every content byte is accounted), each block stored
    // once per modality, savings = 1 − physical/logical in ppm. Whole-
    // payload CAS would be degenerate here (the corpus has no two
    // byte-identical payloads); block granularity is also what real
    // media lakes dedup at, because re-encodes and crops share runs,
    // not files. Only (kind, digest, len) rows cross the exchange —
    // payload bytes never move; the digest groupBy collapses map-side,
    // then a |kinds|-row rollup.
    "mm_storage_dedup" -> ((s, dir) => {
      val frames = media(s, dir)
        .select(Multimodal.kindCol.as("kind"), Multimodal.normPayload.as("norm"))
        .filter(length(col("norm")) > 0)
        .select(col("kind"), col("norm"),
          explode(sequence(lit(0L),
            ((length(col("norm")) - 1) / 16).cast("long"))).as("fi"))
        .select(col("kind"),
          col("norm").substr((col("fi") * 16 + 1).cast("int"), lit(16)).as("fr"))
        .select(col("kind"), md5(col("fr")).as("block_md5"),
          length(col("fr")).cast("long").as("len"))
      frames
        .groupBy(col("kind"), col("block_md5"))
        .agg(count(lit(1)).as("n_copies"), sum(col("len")).as("logical"),
          min(col("len")).as("one"))
        .groupBy(col("kind"))
        .agg(sum(col("n_copies")).as("n_blocks"),
          count(lit(1)).as("n_unique"),
          sum(col("logical")).as("logical_bytes"),
          sum(col("one")).as("physical_bytes"))
        .withColumn("saved_ppm",
          expr("(logical_bytes - physical_bytes) * 1000000 DIV logical_bytes"))
    }),

    // CAS garbage collection — the sweep the block store (mm_storage_dedup)
    // needs once documents get DELETED: mark = the distinct (kind, block)
    // set still referenced by live docs (deletions here: doc_id % 5 == 0,
    // the CDC delete feed's shape), sweep = the standing CAS anti-joined
    // against the mark set; a block survives while ANY live doc still
    // references it (shared blocks with one deleted referrer are NOT
    // reclaimed — the refcount trap a naive per-doc delete hits). Only
    // (kind, digest, len) rows move; mark is a distinct projection,
    // sweep one equi-join.
    "mm_cas_gc" -> ((s, dir) => {
      val fr = media(s, dir)
        .select(col("doc_id"), Multimodal.kindCol.as("kind"),
          Multimodal.normPayload.as("norm"))
        .filter(length(col("norm")) > 0)
        .select(col("doc_id"), col("kind"), col("norm"),
          explode(sequence(lit(0L),
            ((length(col("norm")) - 1) / 16).cast("long"))).as("fi"))
        .select(col("doc_id"), col("kind"),
          md5(col("norm").substr((col("fi") * 16 + 1).cast("int"), lit(16)))
            .as("block_md5"),
          length(col("norm").substr((col("fi") * 16 + 1).cast("int"), lit(16)))
            .cast("long").as("len"))
      val cas = fr.groupBy(col("kind"), col("block_md5"))
        .agg(min(col("len")).as("stored_len"))
      val live = fr.filter(col("doc_id") % 5 =!= 0)
        .select(col("kind"), col("block_md5")).distinct()
      cas.join(live.withColumn("live", lit(1L)),
          Seq("kind", "block_md5"), "left_outer")
        .groupBy(col("kind"))
        .agg(count(lit(1)).as("n_blocks"),
          sum(when(col("live").isNotNull, 1L).otherwise(0L)).as("n_live"),
          sum(when(col("live").isNull, 1L).otherwise(0L)).as("n_reclaimed"),
          sum(when(col("live").isNull, col("stored_len")).otherwise(lit(0L)))
            .as("reclaimed_bytes"))
    }),

    // Training-shard manifest for the media corpus (the WebDataset-style
    // packing step): blobs pack per modality into shards under a byte
    // budget — shard = floor(exclusive-prefix-bytes / budget), so a blob
    // larger than the budget gets its own shard and order is the stable
    // doc_id sequence. One window per kind over the 3-column
    // (doc_id, kind, payload_len) projection — the bytes never move, only
    // their sizes do; production would sub-partition the window key by a
    // coarse ingest-time prefix exactly as text_pack notes.
    "mm_manifest" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("kind")).orderBy(col("doc_id"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      Multimodal.meta(media(s, dir))
        .select(col("doc_id"), col("kind"), col("payload_len"))
        .withColumn("cum", sum(col("payload_len")).over(w))
        .withColumn("shard", expr("(cum - payload_len) DIV 8192"))
        .groupBy(col("kind"), col("shard"))
        .agg(count(lit(1)).as("n_items"),
          sum(col("payload_len")).as("shard_bytes"),
          min(col("doc_id")).as("min_doc"), max(col("doc_id")).as("max_doc"))
    }),

    // INTERLEAVED multimodal sequence packing — the assembly step of an
    // interleaved image/text training corpus: each document contributes
    // its text tokens PLUS a fixed placeholder budget for its media item
    // (64 tokens for an image, 32 for audio — the slots the vision/audio
    // encoder's embeddings occupy in the sequence), and documents pack
    // per modality-mixed stream into 512-token sequences with the same
    // exclusive-prefix running-sum binning as text_pack. Per sequence:
    // doc count, the text/placeholder token split, modality composition,
    // and the media bytes the loader must fetch — the manifest an
    // interleaved dataloader consumes. The running token offset is the
    // TWO-PHASE distributed prefix sum ([[Relational.prefixSum]] — local
    // windows per 4096-doc ingest-shard bucket + broadcast cumulated
    // offsets), so no single-partition window ever sees the corpus rows.
    "mm_interleave" -> ((s, dir) => {
      val base = Multimodal.meta(media(s, dir))
        .join(s.read.parquet(s"$dir/documents.parquet")
          .select(col("doc_id"),
            graft.functions.Text.tokenCount(col("text")).cast("long")
              .as("n_text_tokens")), Seq("doc_id"))
        .withColumn("n_placeholder",
          when(col("kind") === "wav", lit(32L)).otherwise(lit(64L)))
        .withColumn("cost", col("n_text_tokens") + col("n_placeholder"))
      Relational.prefixSum(base, col("cost"), col("doc_id"),
          expr("doc_id DIV 4096"), "cum")
        .withColumn("seq_id", expr("(cum - cost) DIV 512"))
        .groupBy(col("seq_id"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_text_tokens")).as("n_text_tokens"),
          sum(col("n_placeholder")).as("n_placeholder_tokens"),
          sum((col("kind") =!= "wav").cast("long")).as("n_images"),
          sum((col("kind") === "wav").cast("long")).as("n_audio"),
          sum(col("payload_len")).as("media_bytes"))
    }),

    // CLIP-score-style pair curation — the assembly gate a LAION-style
    // image/text corpus build runs: keep an (image, caption) pair only
    // when the two sides' embeddings agree. The corpus models pairs as
    // adjacent embedding rows (even vec_id = image side, odd = caption
    // side); the real decode/embed step is the declared codec stub, the
    // curation dataflow is real. ONE equi-join on the derived pair key —
    // shuffle on pair_id, no candidate explosion, broadcast-free — then
    // the deterministic integer-quantized cosine and the keep verdict at
    // the corpus-calibrated 0.1 bar (the analogue of CLIP's 0.28 on real
    // logits). At 100 TB the two sides arrive as separate tables and the
    // plan is unchanged: co-partitioned equi-join on the pair id.
    "mm_clip_filter" -> ((s, dir) => {
      val e = s.read.parquet(s"$dir/embeddings.parquet")
        .select(col("vec_id"), col("label"),
          Similarity.quantize(col("embedding")).as("v"))
        .withColumn("nrm", Similarity.sqNorm(col("v")))
      val img = e.filter(col("vec_id") % 2 === 0)
        .select(col("vec_id").as("pair_id"), col("label").as("label_img"),
          col("v").as("va"), col("nrm").as("na"))
      val txt = e.filter(col("vec_id") % 2 === 1)
        .select((col("vec_id") - 1).as("pair_id"), col("label").as("label_txt"),
          col("v").as("vb"), col("nrm").as("nb"))
      img.join(txt, Seq("pair_id"))
        .select(col("pair_id"), col("label_img"), col("label_txt"),
          Similarity.cosineQ(col("va"), col("na"), col("vb"), col("nb"))
            .as("clip_sim"))
        .withColumn("keep", col("clip_sim") >= 0.1)
    })
  )

  /** Normalized payload — DuckDB mirror of [[Multimodal.normPayload]]
    * (the corpus is ASCII, so char and byte offsets agree).
    */
  private val normSql = "lower(regexp_replace(text, '[^A-Za-z0-9 ]', '', 'g'))"

  def oracles: Map[String, String] = Map(
    // Same stub decode (sample = ascii − 110), same windowing, exact
    // integer energies.
    "mm_audio_energy" ->
      s"""WITH d AS (SELECT doc_id, $normSql AS norm FROM documents
            WHERE length($normSql) > 0),
          w AS (
            SELECT doc_id, CAST(i AS BIGINT) AS w,
              substring(norm, CAST(i AS INT) * 16 + 1, 16) AS chunk
            FROM d, LATERAL (SELECT unnest(range((length(norm) - 1) // 16 + 1)) AS i)),
          e AS (
            SELECT doc_id, w,
              CAST(list_sum([(ascii(substring(chunk, p, 1)) - 110)
                             * (ascii(substring(chunk, p, 1)) - 110)
                             for p in generate_series(1, length(chunk))])
                AS BIGINT) AS energy
            FROM w)
          SELECT doc_id, COUNT(*) AS n_windows,
            CAST(SUM(CASE WHEN energy < 3000 THEN 1 ELSE 0 END) AS BIGINT)
              AS n_silent,
            MIN(CASE WHEN energy >= 3000 THEN w END) AS first_loud,
            MAX(CASE WHEN energy >= 3000 THEN w END) AS last_loud,
            CAST(SUM(energy) AS BIGINT) AS total_energy
          FROM e GROUP BY doc_id""",

    // Same per-window energies, then textbook gaps-and-islands
    // (w − row_number) over the loud windows — maximal runs, within-doc
    // rank by position.
    "mm_vad_segments" ->
      s"""WITH d AS (SELECT doc_id, $normSql AS norm FROM documents
            WHERE length($normSql) > 0),
          w AS (
            SELECT doc_id, CAST(i AS BIGINT) AS w,
              substring(norm, CAST(i AS INT) * 16 + 1, 16) AS chunk
            FROM d, LATERAL (SELECT unnest(range((length(norm) - 1) // 16 + 1)) AS i)),
          e AS (
            SELECT doc_id, w,
              CAST(list_sum([(ascii(substring(chunk, p, 1)) - 110)
                             * (ascii(substring(chunk, p, 1)) - 110)
                             for p in generate_series(1, length(chunk))])
                AS BIGINT) AS energy
            FROM w),
          loud AS (SELECT doc_id, w, energy FROM e WHERE energy >= 3000),
          isl AS (
            SELECT doc_id, w, energy,
              w - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY w) AS grp
            FROM loud),
          seg AS (
            SELECT doc_id, grp, MIN(w) AS w_start, MAX(w) AS w_end,
              CAST(COUNT(*) AS BIGINT) AS n_windows,
              CAST(SUM(energy) AS BIGINT) AS seg_energy
            FROM isl GROUP BY doc_id, grp)
          SELECT doc_id,
            ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY w_start) - 1
              AS seg_idx,
            w_start, w_end, n_windows, seg_energy
          FROM seg""",

    "mm_interleave" ->
      s"""WITH m AS (
            SELECT doc_id,
              CASE doc_id % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' ELSE 'wav' END AS kind,
              CAST(octet_length(encode(text)) AS BIGINT) AS payload_len,
              CAST(len(string_split(text, ' ')) AS BIGINT) AS n_text_tokens
            FROM documents),
          c AS (
            SELECT *,
              CASE WHEN kind = 'wav' THEN 32 ELSE 64 END AS n_placeholder,
              n_text_tokens + CASE WHEN kind = 'wav' THEN 32 ELSE 64 END AS cost
            FROM m),
          p AS (
            SELECT *,
              CAST((SUM(cost) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
                - cost) // 512 AS BIGINT) AS seq_id
            FROM c)
          SELECT seq_id, COUNT(*) AS n_docs,
            CAST(SUM(n_text_tokens) AS BIGINT) AS n_text_tokens,
            CAST(SUM(n_placeholder) AS BIGINT) AS n_placeholder_tokens,
            CAST(SUM(CASE WHEN kind <> 'wav' THEN 1 ELSE 0 END) AS BIGINT) AS n_images,
            CAST(SUM(CASE WHEN kind = 'wav' THEN 1 ELSE 0 END) AS BIGINT) AS n_audio,
            CAST(SUM(payload_len) AS BIGINT) AS media_bytes
          FROM p GROUP BY seq_id""",

    "mm_clip_filter" -> {
      val sim = VectorOps.simSql("va", "na", "vb", "nb")
      s"""WITH ${VectorOps.prepCte},
          img AS (SELECT vec_id AS pair_id, label AS label_img,
                    v AS va, nrm AS na FROM prep WHERE vec_id % 2 = 0),
          txt AS (SELECT vec_id - 1 AS pair_id, label AS label_txt,
                    v AS vb, nrm AS nb FROM prep WHERE vec_id % 2 = 1)
          SELECT pair_id, label_img, label_txt,
            $sim AS clip_sim, $sim >= 0.1 AS keep
          FROM img JOIN txt USING (pair_id)"""
    },

    "mm_storage_dedup" ->
      s"""WITH d AS (
           SELECT CASE doc_id % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg'
                  ELSE 'wav' END AS kind, $normSql AS norm
           FROM documents WHERE length($normSql) > 0),
         fr AS (
           SELECT kind,
             md5(substring(norm, CAST(i AS INT) * 16 + 1, 16)) AS block_md5,
             CAST(length(substring(norm, CAST(i AS INT) * 16 + 1, 16)) AS BIGINT) AS len
           FROM d, LATERAL (SELECT unnest(range((length(norm) - 1) // 16 + 1)) AS i)),
         g AS (
           SELECT kind, block_md5, CAST(COUNT(*) AS BIGINT) AS n_copies,
             CAST(SUM(len) AS BIGINT) AS logical, MIN(len) AS one
           FROM fr GROUP BY 1, 2)
         SELECT kind, CAST(SUM(n_copies) AS BIGINT) AS n_blocks,
           CAST(COUNT(*) AS BIGINT) AS n_unique,
           CAST(SUM(logical) AS BIGINT) AS logical_bytes,
           CAST(SUM(one) AS BIGINT) AS physical_bytes,
           CAST((SUM(logical) - SUM(one)) * 1000000 // SUM(logical) AS BIGINT) AS saved_ppm
         FROM g GROUP BY 1""",

    "mm_cas_gc" ->
      s"""WITH d AS (
           SELECT doc_id,
             CASE doc_id % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg'
                  ELSE 'wav' END AS kind, $normSql AS norm
           FROM documents WHERE length($normSql) > 0),
         fr AS (
           SELECT doc_id, kind,
             md5(substring(norm, CAST(i AS INT) * 16 + 1, 16)) AS block_md5,
             CAST(length(substring(norm, CAST(i AS INT) * 16 + 1, 16)) AS BIGINT) AS len
           FROM d, LATERAL (SELECT unnest(range((length(norm) - 1) // 16 + 1)) AS i)),
         cas AS (
           SELECT kind, block_md5, MIN(len) AS stored_len
           FROM fr GROUP BY 1, 2),
         live AS (
           SELECT DISTINCT kind, block_md5 FROM fr WHERE doc_id % 5 <> 0)
         SELECT c.kind, CAST(COUNT(*) AS BIGINT) AS n_blocks,
           CAST(SUM(CASE WHEN l.block_md5 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_live,
           CAST(SUM(CASE WHEN l.block_md5 IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_reclaimed,
           CAST(SUM(CASE WHEN l.block_md5 IS NULL THEN c.stored_len ELSE 0 END) AS BIGINT) AS reclaimed_bytes
         FROM cas c LEFT JOIN live l USING (kind, block_md5)
         GROUP BY 1""",

    "mm_meta" ->
      """SELECT doc_id,
           CASE doc_id % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' ELSE 'wav' END AS kind,
           16 + (doc_id * 7) % 1024 AS width,
           16 + (doc_id * 13) % 1024 AS height,
           CAST(octet_length(encode(text)) AS BIGINT) AS payload_len,
           md5(text) AS payload_md5
         FROM documents""",

    "mm_near_dup" ->
      s"""WITH d AS (SELECT doc_id, $normSql AS norm FROM documents
            WHERE length($normSql) > 0),
          frames AS (
            SELECT DISTINCT doc_id,
              md5(substring(norm, CAST(i AS INT) * 16 + 1, 16)) AS frame_md5
            FROM d, LATERAL (SELECT unnest(range((length(norm) - 1) // 16 + 1)) AS i)
            WHERE length(substring(norm, CAST(i AS INT) * 16 + 1, 16)) = 16),
          rare AS (
            SELECT frame_md5 FROM frames
            GROUP BY 1 HAVING COUNT(*) BETWEEN 2 AND 100),
          banded AS (
            SELECT f.* FROM frames f JOIN rare r ON f.frame_md5 = r.frame_md5)
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_frames
          FROM banded a JOIN banded b
            ON a.frame_md5 = b.frame_md5 AND a.doc_id < b.doc_id
          GROUP BY 1, 2 HAVING COUNT(*) >= 2""",

    "mm_frame_sample" ->
      s"""WITH d AS (SELECT doc_id, $normSql AS norm FROM documents
            WHERE length($normSql) > 0)
          SELECT doc_id, i AS frame_idx,
            md5(substring(norm, CAST(i AS INT) * 32 + 1, 32)) AS frame_md5,
            CAST(length(substring(norm, CAST(i AS INT) * 32 + 1, 32)) AS BIGINT) AS frame_len
          FROM d, LATERAL (SELECT unnest(range((length(norm) - 1) // 32 + 1)) AS i)
          WHERE i % 3 = 0""",

    "mm_manifest" ->
      """WITH m AS (
           SELECT doc_id,
             CASE doc_id % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' ELSE 'wav' END AS kind,
             CAST(octet_length(encode(text)) AS BIGINT) AS payload_len
           FROM documents),
         c AS (
           SELECT *, SUM(payload_len) OVER (PARTITION BY kind ORDER BY doc_id
             ROWS UNBOUNDED PRECEDING) AS cum
           FROM m)
         SELECT kind, CAST((cum - payload_len) // 8192 AS BIGINT) AS shard,
           COUNT(*) AS n_items, CAST(SUM(payload_len) AS BIGINT) AS shard_bytes,
           MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
         FROM c GROUP BY 1, 2""",

    "mm_resize" ->
      """SELECT doc_id,
           (16 + (doc_id * 7) % 1024 + 1) // 2 AS new_width,
           (16 + (doc_id * 13) % 1024 + 1) // 2 AS new_height,
           CAST(length(regexp_replace(text, '(.).', '\1', 'g')) AS BIGINT) AS ds_len,
           md5(regexp_replace(text, '(.).', '\1', 'g')) AS ds_md5
         FROM documents"""
  )
}
