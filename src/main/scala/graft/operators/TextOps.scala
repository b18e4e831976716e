package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.{Dedup, Similarity, Text}
import graft.functions.Portable.{phash64, phash64Sql}

/** Text-analysis and deduplication queries over `documents`
  * (the LLM-training-pipeline operator family), each with an exact
  * DuckDB oracle mirroring the computation.
  */
object TextOps {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")

  /** Okapi BM25 per-doc scores against the fixed query-term set (see the
    * `text_bm25` entry's shape notes) — shared by `text_bm25` and the
    * hybrid-retrieval fusion.
    */
  private def bm25Scores(s: SparkSession, dir: String): DataFrame = {
    val qTerms = Seq("spark", "join", "window", "stream")
    val base = docs(s, dir).select(col("doc_id"),
        size(Text.tokens(col("text"))).cast("double").as("dl"),
        filter(Text.tokens(col("text")), t => t.isin(qTerms: _*)).as("hits"))
      .localCheckpoint()
    val st = base.agg(count(lit(1)).cast("double").as("n"),
      avg(col("dl")).as("avgdl")).head()
    val (nDocs, avgdl) = (st.getDouble(0), st.getDouble(1))
    val tf = base.select(col("doc_id"), col("dl"), explode(col("hits")).as("term"))
      .groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).cast("double").as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).cast("double").as("df"))
    tf.join(broadcast(dfreq), Seq("term"))
      .withColumn("idf",
        log(((lit(nDocs) - col("df")) + lit(0.5)) / (col("df") + lit(0.5)) + lit(1.0)))
      .withColumn("contrib", col("idf") * ((col("tf") * lit(2.2)) /
        (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * (col("dl") / lit(avgdl))))))
      .groupBy(col("doc_id"))
      .agg(graft.functions.Portable.detSum6(col("contrib")).as("bm25"))
  }

  /** Bigram-LM negative log-likelihood per document (see `text_lm_score`'s
    * shape notes) — shared by the score query and the CCNet bucketing.
    */
  private def lmScores(s: SparkSession, dir: String): DataFrame = {
    val base = docs(s, dir)
      .select(col("doc_id"), Text.tokens(col("text")).as("t"))
      .filter(size(col("t")) >= 2)
      .select(col("doc_id"), explode(expr(
        """transform(sequence(0, size(t)-2),
           i -> named_struct('w1', element_at(t, i+1),
                             'w2', element_at(t, i+2)))""")).as("b"))
      .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
      .localCheckpoint()
    val cB = base.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("cb"))
    val cU = cB.groupBy(col("w1")).agg(sum(col("cb")).as("cu"))
    val v = cB.agg(countDistinct(col("w1"))).head().getLong(0)
    base.join(cB, Seq("w1", "w2")).join(cU, Seq("w1"))
      .withColumn("nlp", -log((col("cb") + lit(1L)).cast("double") /
        (col("cu") + lit(v)).cast("double")))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        graft.functions.Portable.detSum6(col("nlp")).as("nll"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_stats" -> ((s, dir) =>
      docs(s, dir).select(
        col("doc_id"),
        Text.tokenCount(col("text")).cast("long").as("n_tokens"),
        length(regexp_replace(col("text"), " ", "")).cast("long").as("n_chars_nospace"),
        (length(regexp_replace(col("text"), " ", "")).cast("double") /
          Text.tokenCount(col("text")).cast("double")).as("avg_word_len"),
        (size(array_distinct(Text.tokens(col("text")))).cast("double") /
          Text.tokenCount(col("text")).cast("double")).as("distinct_ratio"))),

    "text_langid" -> ((s, dir) =>
      docs(s, dir).withColumn("lang_pred", Text.langId(col("text")))
        .groupBy(col("lang"), col("lang_pred")).agg(count(lit(1)).as("n"))),

    "text_quality" -> ((s, dir) =>
      docs(s, dir).select(col("doc_id"), Text.qualityScore(col("text")).as("quality"))
        .filter(col("quality") >= 0.5)),

    // Gopher-style document quality gate (Rae et al. 2021 §A.1.1): word
    // count bounds, mean-word-length bounds, ≥2 distinct stop words, and
    // a minimum fraction of alphabetic words, each emitted per-doc next
    // to the combined keep verdict — see [[Text.gopherStats]]; rule
    // boundaries are golden-pinned in TextDedupSpec.
    "text_gopher_quality" -> ((s, dir) =>
      Text.gopherStats(docs(s, dir), col("doc_id"), col("text"))),

    "text_fingerprint" -> ((s, dir) =>
      docs(s, dir).select(col("doc_id"), Text.fingerprint(col("text")).as("fp"))),

    "text_bpe_tokens" -> ((s, dir) =>
      docs(s, dir).select(col("doc_id"),
        Text.bpeTokenCount(col("text")).cast("long").as("n_bpe"))),

    // Tokenizer-fertility evaluation — the per-language report a
    // tokenizer choice is judged by (how many subword tokens a language
    // pays per character/word; a tokenizer trained lopsided makes some
    // languages 2-3× more expensive to train on): per lang, exact
    // integer totals of docs, characters, whitespace words, and BPE-regex
    // tokens. One scan collapsing map-side to |langs| rows; the ratios
    // (chars/token, tokens/word) are the consumer's quotients — stored
    // numbers stay engine-exact integers.
    "text_tokenizer_fertility" -> ((s, dir) =>
      docs(s, dir).groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(length(col("text")).cast("long")).as("n_chars"),
          sum(Text.tokenCount(col("text")).cast("long")).as("n_words"),
          sum(Text.bpeTokenCount(col("text")).cast("long")).as("n_bpe"))),

    // Gopher/C4-style repetition filters: top-(bi)gram concentration and
    // duplicate-bigram fraction per document.
    "text_repetition" -> ((s, dir) =>
      Text.repetitionStats(docs(s, dir), col("doc_id"), col("text"))),

    // Corpus-level term frequencies, top 20 (the vocabulary/heavy-hitter
    // profile a tokenizer-training or quality pass starts from): explode
    // + count collapses map-side; only |vocab| rows shuffle; the top-k
    // sort runs on the tiny aggregated set. Ties break on the term.
    "text_top_terms" -> ((s, dir) =>
      docs(s, dir).select(explode(Text.tokens(col("text"))).as("term"))
        .groupBy(col("term")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("term")).limit(20)),

    // Corpus-wide duplicated-SPAN coverage — the measurement behind
    // suffix-array substring dedup ("how much of the corpus is verbatim
    // repeated text", Lee et al. 2022): a token position is covered when
    // its 8-gram occurs more than once corpus-wide (within OR across
    // docs). A suffix array doesn't distribute; positional n-gram
    // counting does — the gram stream collapses map-side to
    // (gram, count) partials, and the coverage join shuffles on the
    // gram key, both linear in corpus size with no all-pairs step.
    // Per-doc output: total spans, duplicated spans, and the distinct
    // duplicated grams the doc contributes — the triage report that
    // decides whether substring-level dedup is worth running.
    "text_dup_spans" -> ((s, dir) => {
      val g = docs(s, dir)
        .select(col("doc_id"), Text.tokens(col("text")).as("t"))
        .filter(size(col("t")) >= 8)
        .select(col("doc_id"),
          explode(transform(sequence(lit(1), size(col("t")) - 7),
            i => array_join(slice(col("t"), i, lit(8)), " "))).as("gram"))
      val counts = g.groupBy(col("gram")).agg(count(lit(1)).as("c"))
      g.join(counts, Seq("gram"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_spans"),
          sum(when(col("c") > 1, lit(1L)).otherwise(lit(0L))).as("n_dup_spans"),
          countDistinct(when(col("c") > 1, col("gram"))).as("n_dup_grams"))
    }),

    // Corpus-wide block-level exact dedup WITH reconstruction — the
    // removal pass text_dup_spans only measures (C4 removes repeated
    // three-sentence spans; over this single-line corpus the unit is the
    // non-overlapping 16-token block). A block survives when it is
    // corpus-unique OR it is the canonical first occurrence (argmin of
    // doc_id·1e5+pos over the block's occurrences — every later verbatim
    // copy is dropped); each document is then reassembled from its
    // surviving blocks in order. Scale shape: the block stream collapses
    // map-side to (block, count, argmin) partials — an aggregation, NOT a
    // per-block sort window — the survivor join shuffles on the block
    // key, and reassembly groups by doc_id (even keys). All linear, no
    // all-pairs step; the per-doc output (counts + md5 of the rebuilt
    // text) hash-pins both the removal decisions and the re-stitch order.
    "text_block_dedup" -> ((s, dir) => {
      val b = docs(s, dir)
        .select(col("doc_id"), Text.tokens(col("text")).as("t"))
        // zero-token guard: Spark's sequence(1, 0) yields the DESCENDING
        // [1, 0] (two phantom blocks) while the oracle's generate_series
        // is empty — an empty/whitespace-only doc must emit no blocks on
        // both sides (same guard as text_dup_spans / text_boilerplate)
        .filter(size(col("t")) > 0)
        .select(col("doc_id"),
          explode(transform(sequence(lit(1), ceil(size(col("t")) / lit(16.0)).cast("int")),
            i => struct(i.cast("long").as("pos"),
              slice(col("t"), (i - 1) * 16 + 1, lit(16)).as("blk")))).as("u"))
        .select(col("doc_id"), col("u.pos").as("pos"),
          array_join(col("u.blk"), " ").as("blk"),
          size(col("u.blk")).cast("long").as("blk_len"))
      // canonical-first argmin key is the (doc_id, pos) STRUCT, not an
      // arithmetic encoding — doc_id*K+pos collides once a doc holds
      // >= K blocks and can overflow for large ids
      val counts = b.groupBy(col("blk")).agg(count(lit(1)).as("c"),
        min(struct(col("doc_id"), col("pos"))).as("mk"))
      b.join(counts, Seq("blk"))
        .withColumn("keep",
          col("c") === 1 || struct(col("doc_id"), col("pos")) === col("mk"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_blocks"),
          sum((!col("keep")).cast("long")).as("n_removed"),
          sum(when(col("keep"), col("blk_len")).otherwise(lit(0L))).as("n_kept_tokens"),
          md5(array_join(transform(
            array_sort(collect_list(when(col("keep"),
              struct(col("pos"), col("blk"))))),
            x => x.getField("blk")), " ")).as("kept_fp"))
    }),

    // Boilerplate strip — the C4/CCNet "repeated passage" rule, distinct
    // from text_block_dedup's canonical-first dedup: a block seen in ≥ 3
    // DISTINCT documents is template boilerplate (headers, footers,
    // navigation chrome) and EVERY occurrence is dropped — no canonical
    // survivor. Dataflow is two hash aggregations (block df, then per-doc
    // reassembly) + one equi-join on the block key; the df aggregate
    // collapses map-side, nothing is sorted corpus-wide. The per-doc md5
    // of the re-stitched retained text hash-pins both the drop decisions
    // and the stitch order.
    "text_boilerplate" -> ((s, dir) => {
      val b = docs(s, dir)
        .select(col("doc_id"), Text.tokens(col("text")).as("t"))
        // zero-token guard — see text_block_dedup: sequence(1,0) descends
        .filter(size(col("t")) > 0)
        .select(col("doc_id"),
          explode(transform(sequence(lit(1), ceil(size(col("t")) / lit(8.0)).cast("int")),
            i => struct(i.cast("long").as("pos"),
              slice(col("t"), (i - 1) * 8 + 1, lit(8)).as("blk")))).as("u"))
        .select(col("doc_id"), col("u.pos").as("pos"),
          array_join(col("u.blk"), " ").as("blk"),
          size(col("u.blk")).cast("long").as("blk_len"))
      val df = b.groupBy(col("blk"))
        .agg(countDistinct(col("doc_id")).as("df"))
      b.join(df, Seq("blk"))
        .withColumn("keep", col("df") < 3)
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_blocks"),
          sum((!col("keep")).cast("long")).as("n_boiler"),
          sum(when(col("keep"), col("blk_len")).otherwise(lit(0L))).as("n_kept_tokens"),
          md5(array_join(transform(
            array_sort(collect_list(when(col("keep"),
              struct(col("pos"), col("blk"))))),
            x => x.getField("blk")), " ")).as("kept_fp"))
    }),

    // Sequence-length histogram — the planning input for context-window
    // packing and truncation policy: doc counts and token budgets per
    // fixed-width 16-token bucket, with the running token budget up to
    // each bucket. One scan collapses map-side to ~|max_len/16| rows;
    // the cumulative window runs over that tiny aggregated set (never
    // the corpus), so the single-partition window is free at any scale.
    "text_len_histogram" -> ((s, dir) => {
      val h = docs(s, dir)
        .select(size(Text.tokens(col("text"))).cast("long").as("n"))
        .select(floor(col("n") / 16.0).cast("long").as("bucket"), col("n"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n")).as("total_tokens"),
          min(col("n")).as("min_tokens"), max(col("n")).as("max_tokens"))
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("bucket"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      h.withColumn("cum_tokens", sum(col("total_tokens")).over(w))
    }),

    // TF-IDF-style keyword extraction, integer-exact: per-doc top-3
    // terms ranked by (tf desc, df asc, term) — within a document,
    // idf = ln(N/df) is strictly decreasing in df, so for equal tf the
    // (tf, df) rank IS the tf·idf rank, without trusting two engines'
    // ln() to round identically. Terms in more than half the corpus are
    // stoplisted by document frequency (the data-driven stop list).
    // Scale shape: tf collapses map-side per (doc, term); df aggregates
    // the tf table (vocabulary-sized); the rank window partitions by
    // doc_id — even key distribution, no corpus-wide sort.
    "text_keywords" -> ((s, dir) => {
      val d = docs(s, dir)
      val nDocs = d.count()
      val tf = d.select(col("doc_id"), explode(Text.tokens(col("text"))).as("term"))
        .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
      val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("doc_id"))
        .orderBy(col("tf").desc, col("df").asc, col("term"))
      tf.join(dfreq.filter(col("df") * 2 <= nDocs), Seq("term"))
        .withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= 3)
        .select(col("doc_id"), col("rank"), col("term"), col("tf"), col("df"))
    }),

    // Count-Min-Sketch heavy hitters — the FIXED-memory form of
    // text_top_terms (the exact count table is the vocabulary; a CMS is
    // d×w counters regardless of vocabulary growth, and the counter
    // table is partial-aggregatable, so at 100 TB it merges map-side
    // like any sum). d = 3 hash rows × w = 64 buckets, deliberately
    // small so collisions are real: the output carries est (the min
    // over the term's 3 counters), the true count, and the overestimate
    // — CMS's one-sided error (est ≥ true always; a golden pins it).
    // Heavy hitters are ranked BY THE SKETCH, the way a consumer that
    // only kept the sketch would rank them.
    "text_cms_heavy" -> ((s, dir) => {
      val tok = docs(s, dir).select(explode(Text.tokens(col("text"))).as("term"))
      val counts = tok.groupBy(col("term")).agg(count(lit(1)).as("n"))
        .localCheckpoint()
      val hashed = cmsHashed(counts)
      val cms = cmsCounters(hashed)
      hashed.join(broadcast(cms), Seq("j", "pos"))
        .groupBy(col("term"), col("n")).agg(min(col("c")).as("est"))
        .orderBy(col("est").desc, col("term")).limit(20)
        .select(col("term"), col("est"), col("n").as("true_n"),
          (col("est") - col("n")).as("overestimate"))
    }),

    // The first BPE merge iteration (tokenizer training's inner loop):
    // adjacent character-pair frequencies across the corpus, weighted by
    // word frequency — the statistic that picks the next merge rule.
    // Shape at scale: the corpus collapses to its VOCABULARY first (one
    // token shuffle, map-side combined), pairs explode from the tiny
    // word table, and the final count is an agg over |vocab|·avg_len
    // rows — the corpus text is scanned exactly once however many merge
    // iterations run downstream.
    "text_bpe_merges" -> ((s, dir) => {
      val words = docs(s, dir)
        .select(explode(Text.tokens(col("text"))).as("w"))
        .groupBy(col("w")).agg(count(lit(1)).as("n"))
      words.filter(length(col("w")) >= 2)
        .select(col("n"), explode(expr(
          "transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))")).as("pair"))
        .groupBy(col("pair")).agg(sum(col("n")).as("n_pairs"))
        .orderBy(col("n_pairs").desc, col("pair")).limit(20)
    }),

    // The tokenizer-training loop made WHOLE — text_bpe_merges is one
    // round of pair stats; this trains 5 sequential merges (argmax pair
    // → apply → recount, counts genuinely shifting between rounds) and
    // then ENCODES the corpus with them, reporting the unit budget the
    // merges bought. Unit representation: each unit is its characters
    // plus a '|' terminator, units joined by single spaces with one
    // leading space — the replace pattern ' l r' → ' lr' is then
    // boundary-anchored (the space anchors unit start, the '|' anchors
    // unit end) and left-to-right non-overlapping literal replace IS the
    // BPE merge step, bit-identically in both engines. Scale shape: the
    // corpus collapses to the vocabulary ONCE; every round touches
    // |vocab| rows with a 1-row TakeOrdered argmax and a broadcast-
    // literal replace — no shuffle beyond the initial vocab aggregation,
    // regardless of rounds.
    "text_bpe_apply" -> ((s, dir) => {
      import s.implicits._
      val vocab = docs(s, dir)
        .select(explode(Text.tokens(col("text"))).as("w"))
        .groupBy(col("w")).agg(count(lit(1)).as("n"))
        .localCheckpoint()
      var seqs = vocab.withColumn("seq", expr(
        """concat(' ', array_join(transform(sequence(1, length(w)),
             i -> concat(substring(w, i, 1), '|')), ' '))"""))
        .localCheckpoint()
      val merges = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, Long)]
      for (r <- 1 to 5) {
        val top = seqs.select(col("n"), split(trim(col("seq")), " ").as("u"))
          .filter(size(col("u")) >= 2)
          .select(col("n"), explode(expr(
            """transform(sequence(1, size(u) - 1),
                 i -> named_struct('l', element_at(u, i), 'r', element_at(u, i + 1)))""")).as("p"))
          .groupBy(col("p.l").as("l"), col("p.r").as("r"))
          .agg(sum(col("n")).as("c"))
          .orderBy(col("c").desc, col("l"), col("r")).limit(1).collect()
        if (top.nonEmpty) { // a tiny corpus can exhaust its pairs early
          val (l, rr, c) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
          merges += ((r.toLong, l, rr, c))
          val merged = l.dropRight(1) + rr
          seqs = seqs.withColumn("seq", regexp_replace(col("seq"),
            lit(java.util.regex.Pattern.quote(s" $l $rr")), lit(s" $merged")))
            .localCheckpoint()
        }
      }
      val mdf = merges.toSeq.map { case (r, l, rr, c) => ("merge", r, l, rr, c) }
        .toDF("section", "rank", "l", "r", "n")
      val enc = seqs
        .select(col("n"), size(split(trim(col("seq")), " ")).cast("long").as("units"))
        .agg(sum(col("n") * col("units")).as("n"))
        .select(lit("tokens").as("section"), lit(0L).as("rank"),
          lit("").as("l"), lit("").as("r"), col("n"))
      val chars = vocab
        .agg(sum(col("n") * length(col("w")).cast("long")).as("n"))
        .select(lit("chars").as("section"), lit(0L).as("rank"),
          lit("").as("l"), lit("").as("r"), col("n"))
      mdf.unionByName(enc).unionByName(chars)
    }),

    // Distributed weighted sampling without replacement (Efraimidis-
    // Spirakis A-ES): each doc draws a deterministic hash-uniform
    // u ∈ (0,1] and keys on ln(u)/weight (weight = token count — longer
    // docs proportionally likelier); the top-k keys ARE the weighted
    // sample. One projection + a distributed TakeOrdered: no sampling
    // state, no second pass, stable under any partitioning or re-run —
    // the only way to draw a weighted sample from a 100 TB corpus in
    // one scan.
    "text_weighted_sample" -> ((s, dir) => {
      val u = (pmod(phash64(concat(col("doc_id").cast("string"), lit(":es"))),
        lit(1000000L)) + lit(1L)).cast("double") / lit(1000001.0)
      docs(s, dir)
        .select(col("doc_id"), Text.tokenCount(col("text")).cast("long").as("n_tokens"))
        .withColumn("wkey", round(log(u) / col("n_tokens").cast("double"), 6))
        .orderBy(col("wkey").desc, col("doc_id")).limit(20)
    }),

    // Okapi BM25 retrieval scoring against a fixed query-term set (the
    // lexical-search half of a retrieval/dedup stack; k1=1.2, b=0.75).
    // Shape at scale: ONE corpus scan projects a thin checkpointed base
    // (doc_id, dl, matched query terms) — corpus stats, per-doc tf, and
    // per-term df all derive from it (the naive shape re-scans the
    // corpus for df; PlanAuditSpec pins the single scan). Stats land as
    // plan literals; df is a |Q|-row broadcast hash join. No global
    // sort, no wide shuffle. All score arithmetic mirrors the oracle
    // operation-for-operation, and the per-doc sum goes through
    // Portable.detSum6 so addend order cannot desync the engines (ln
    // may differ in the last ulp).
    "text_bm25" -> ((s, dir) => bm25Scores(s, dir)),

    // CDC-MAINTAINED BM25 INDEX — the lexical sibling of cdc_vector_sync:
    // the operational DB's change feed (every doc present at t1,
    // doc_id % 7 == 0 updated in place to text+" v2" at t2, % 11 == 0
    // deleted at t3 — delete beats update) maintains the persisted
    // search-index artifacts instead of rebuilding them. TWO artifacts,
    // both maintained by anti-join + append, O(changed docs) per sync:
    // the postings table (term, doc_id, tf — stats-FREE, the trick that
    // makes incremental maintenance possible at all: df/N/avgdl change
    // with every batch, so anything score-bearing would need a full
    // rewrite) and the doc-length table (doc_id, dl). Global stats are
    // computed AT QUERY TIME from the maintained artifacts (one
    // aggregate over the thin dl table — a read, not a rewrite), then
    // scoring is the audited text_bm25 join. The oracle rebuilds
    // postings from the folded final state and scores identically — so
    // the gate proves maintenance ≡ rebuild for the lexical index the
    // way cdc_vector_sync proves it for the vector index.
    "cdc_bm25_sync" -> ((s, dir) => {
      val qTerms = Seq("spark", "join", "window", "stream")
      val d = docs(s, dir)
      val isUpd = col("doc_id") % 7 === 0
      val isDel = col("doc_id") % 11 === 0
      def lengths(src: DataFrame): DataFrame = src.select(col("doc_id"),
        size(Text.tokens(col("text"))).cast("double").as("dl"))
      def postings(src: DataFrame): DataFrame = src
        .select(col("doc_id"),
          filter(Text.tokens(col("text")), t => t.isin(qTerms: _*)).as("hits"))
        .select(col("doc_id"), explode(col("hits")).as("term"))
        .groupBy(col("doc_id"), col("term"))
        .agg(count(lit(1)).cast("double").as("tf"))
      // the persisted artifacts after the initial load (lineage cut =
      // the storage boundary, as in cdc_vector_sync's baseLists)
      val baseDl = lengths(d).localCheckpoint()
      val basePost = postings(d).localCheckpoint()
      val changed = d.filter(isUpd || isDel).select(col("doc_id"))
      val newVersions = d.filter(isUpd && !isDel)
        .withColumn("text", concat(col("text"), lit(" v2")))
      val dlM = baseDl.join(changed, Seq("doc_id"), "left_anti")
        .unionByName(lengths(newVersions))
        .localCheckpoint() // feeds the stats aggregate AND the score join
      val postM = basePost.join(changed, Seq("doc_id"), "left_anti")
        .unionByName(postings(newVersions))
      val st = dlM.agg(count(lit(1)).cast("double").as("n"),
        avg(col("dl")).as("avgdl")).head()
      val (nDocs, avgdl) = (st.getDouble(0), st.getDouble(1))
      val dfreq = postM.groupBy(col("term")).agg(count(lit(1)).cast("double").as("df"))
      postM.join(broadcast(dfreq), Seq("term"))
        .join(dlM, Seq("doc_id"))
        .withColumn("idf",
          log(((lit(nDocs) - col("df")) + lit(0.5)) / (col("df") + lit(0.5)) + lit(1.0)))
        .withColumn("contrib", col("idf") * ((col("tf") * lit(2.2)) /
          (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * (col("dl") / lit(avgdl))))))
        .groupBy(col("doc_id"))
        .agg(graft.functions.Portable.detSum6(col("contrib")).as("bm25"))
    }),

    // Bigram language-model perplexity scoring (the CCNet-style LM
    // quality filter): train add-one-smoothed bigram probabilities on
    // the corpus itself, then score every document's total negative
    // log-likelihood. Shape at scale: ONE tokenize pass materializes the
    // thin (doc_id, w1, w2) base; bigram counts are one shuffle, context
    // counts fold FROM the bigram table (no second corpus aggregation),
    // V lands as a plan literal, and scoring is an equi-join back on the
    // bigram key — every trained bigram exists by construction, so the
    // join is inner with no miss path. The per-doc sum goes through
    // detSum6 so ln's last-ulp engine variance cannot desync the hash.
    "text_lm_score" -> ((s, dir) => lmScores(s, dir)),

    // CCNet's head/middle/tail split: per-language perplexity terciles
    // over the bigram-LM scores — the bucketing that decides which slice
    // of a crawl is "clean enough to train on". One window per lang on
    // the 2-column (doc_id, ppl) projection; at 100 TB the per-lang
    // tercile is a range-partitioned sort of id+score pairs, never of
    // document text. Ties (identical ppl) break on doc_id so the cut is
    // deterministic; ppl divides two identically-derived values (detSum6
    // nll, exact count), so both engines order identically.
    "text_ccnet_bucket" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("lang")).orderBy(col("ppl"), col("doc_id"))
      lmScores(s, dir)
        .withColumn("ppl", col("nll") / col("n_bigrams").cast("double"))
        .join(docs(s, dir).select(col("doc_id"), col("lang")), Seq("doc_id"))
        .withColumn("bucket", ntile(3).over(w).cast("long"))
        .select(col("doc_id"), col("lang"), col("bucket"))
    }),

    // Hybrid retrieval with reciprocal-rank fusion: the lexical arm
    // (BM25 top 50) and the vector arm (cosine vs a fixed query
    // embedding, top 50) fuse as 1/(60+rank) sums — the standard
    // RRF(k=60) hybrid-search combiner. Shape at scale: both arms end in
    // a distributed TakeOrdered (no global window over the corpus — the
    // rank windows run on the 50-row tops); the query vector is a plan
    // literal, so the vector arm is a pure scan + map-side top-k.
    // Two-stage retrieval CASCADE — the other production retrieval shape
    // next to RRF fusion: cheap lexical recall first (BM25 top-50, the
    // candidate generator), then the expensive scorer only over that
    // head (vector cosine rerank → top-10). At scale stage 1 is the
    // only corpus-wide pass; stage 2 touches 50 rows regardless of
    // corpus size — the cost asymmetry cascades exist for. Output keeps
    // both stages' ranks so a candidate the reranker promoted (low BM25
    // rank, high final rank) is visible.
    "pipe_two_stage" -> ((s, dir) => {
      import graft.functions.Similarity
      val wLex = org.apache.spark.sql.expressions.Window
        .orderBy(col("bm25").desc, col("doc_id"))
      val candidates = bm25Scores(s, dir)
        .orderBy(col("bm25").desc, col("doc_id")).limit(50)
        .withColumn("r_lex", row_number().over(wLex).cast("long"))
      val p = Similarity.prepared(Tables.load(s, dir, "embeddings"),
        col("vec_id"), col("embedding"))
      val q0 = p.filter(col("vec_id") === 0).select(col("v"), col("nrm")).head()
      val qv = typedLit(q0.getSeq[Long](0))
      val qn = lit(q0.getLong(1))
      val wFinal = org.apache.spark.sql.expressions.Window
        .orderBy(col("sim").desc, col("doc_id"))
      candidates
        .join(p.select(col("vec_id").as("doc_id"), col("v"), col("nrm")),
          Seq("doc_id"))
        .withColumn("sim", Similarity.cosineQ(qv, qn, col("v"), col("nrm")))
        .orderBy(col("sim").desc, col("doc_id")).limit(10)
        .withColumn("r_final", row_number().over(wFinal).cast("long"))
        .select(col("doc_id"), col("r_lex"), col("bm25"), col("sim"),
          col("r_final"))
    }),

    "pipe_hybrid_rrf" -> ((s, dir) => {
      import graft.functions.Similarity
      val wLex = org.apache.spark.sql.expressions.Window
        .orderBy(col("bm25").desc, col("doc_id"))
      val lex = bm25Scores(s, dir)
        .orderBy(col("bm25").desc, col("doc_id")).limit(50)
        .withColumn("r_lex", row_number().over(wLex).cast("long"))
      val p = Similarity.prepared(Tables.load(s, dir, "embeddings"),
        col("vec_id"), col("embedding"))
      val q0 = p.filter(col("vec_id") === 0).select(col("v"), col("nrm")).head()
      val qv = typedLit(q0.getSeq[Long](0))
      val qn = lit(q0.getLong(1))
      val wVec = org.apache.spark.sql.expressions.Window
        .orderBy(col("sim").desc, col("doc_id"))
      val vec = p.filter(col("vec_id") =!= 0)
        .select(col("vec_id").as("doc_id"),
          Similarity.cosineQ(qv, qn, col("v"), col("nrm")).as("sim"))
        .orderBy(col("sim").desc, col("doc_id")).limit(50)
        .withColumn("r_vec", row_number().over(wVec).cast("long"))
      lex.select(col("doc_id"), col("r_lex"))
        .join(vec.select(col("doc_id"), col("r_vec")), Seq("doc_id"), "full_outer")
        .withColumn("rrf",
          coalesce(lit(1.0) / (lit(60.0) + col("r_lex")), lit(0.0)) +
            coalesce(lit(1.0) / (lit(60.0) + col("r_vec")), lit(0.0)))
        .orderBy(col("rrf").desc, col("doc_id")).limit(10)
        .select(col("doc_id"), col("r_lex"), col("r_vec"), col("rrf"))
    }),

    // Training-manifest enrichment across BOTH corpora: documents
    // quality-gated, split-assigned, token-counted, joined to their
    // embedding's trained k-means cluster, summarized per (split,
    // cluster) — the manifest a loader would shard by. One equi-join on
    // the id (the cluster side is the thin assignment projection), one
    // final aggregate.
    "pipe_enrich" -> ((s, dir) => {
      import graft.functions.Similarity
      val e = Tables.load(s, dir, "embeddings")
      val cents = Similarity.kmeansTrain(e, col("vec_id"), col("embedding"),
        col("vec_id") < 8, iters = 2)
      val clusters = Similarity.ivfAssign(e, col("vec_id"), col("embedding"), cents)
        .select(col("vec_id").as("doc_id"), col("centroid_id"))
      docs(s, dir)
        .filter(Text.qualityScore(col("text")) >= 0.5)
        .select(col("doc_id"), Text.splitAssign(col("doc_id")).as("split"),
          Text.tokenCount(col("text")).cast("long").as("n_tokens"))
        .join(clusters, Seq("doc_id"))
        .groupBy(col("split"), col("centroid_id"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("tok_sum"),
          min(col("doc_id")).as("min_doc"))
    }),

    // The END-TO-END corpus build — five pillars composed as ONE Catalyst
    // plan: benchmark holdout (eval docs never train) → quality gate →
    // exact dedup (earliest copy per content hash) → EXACT
    // decontamination (any 3-gram overlap with the benchmark drops the
    // doc — the conservative production default; the Bloom variant is the
    // fixed-memory drop-in) → deterministic hash split → token-budget
    // packing, summarized per (split, lang) with the bin count a
    // 2048-token packer would produce. The value over pipe_curation is
    // the DAG: stages keyed on content hash, broadcast shingle set,
    // split hash, and the pack window compose without materialization
    // barriers — Catalyst pipelines the whole chain, proving the stage
    // contracts line up end to end.
    "pipe_corpus_build" -> ((s, dir) => {
      val d = docs(s, dir)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(md5(col("text"))).orderBy(col("doc_id"))
      val contaminated = Dedup.contamination(d, col("doc_id"), col("text"),
        benchPred = col("doc_id") % 50 === 0).select(col("doc_id"))
      val wp = org.apache.spark.sql.expressions.Window
        .partitionBy(col("split"), col("lang")).orderBy(col("doc_id"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      d.filter(col("doc_id") % 50 =!= 0)
        .filter(Text.qualityScore(col("text")) >= 0.5)
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .join(contaminated, Seq("doc_id"), "left_anti")
        .withColumn("split", Text.splitAssign(col("doc_id")))
        .withColumn("n_tokens", Text.tokenCount(col("text")).cast("long"))
        .withColumn("cum", sum(col("n_tokens")).over(wp))
        .withColumn("bin", expr("(cum - n_tokens) DIV 2048"))
        .groupBy(col("split"), col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("n_tokens"),
          (max(col("bin")) + 1).as("n_bins"))
    }),

    // The pillars composed as ONE pipeline (the point of building on a
    // relational engine): quality gate → exact dedup (keep lowest id per
    // content hash) → hash split, summarized per (lang, split). Catalyst
    // plans the whole chain — filter pushdown, one window, one final agg.
    "pipe_curation" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(md5(col("text"))).orderBy(col("doc_id"))
      docs(s, dir)
        .filter(Text.qualityScore(col("text")) >= 0.5)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .withColumn("split", Text.splitAssign(col("doc_id")))
        .groupBy(col("lang"), col("split"))
        .agg(count(lit(1)).as("n_docs"),
          sum(Text.tokenCount(col("text")).cast("long")).as("n_tokens"))
    }),

    // Deterministic shuffle-sharding for training output: every document
    // lands in one of 16 shards by a CONTENT hash — stable under re-runs,
    // input order, and partitioning, the reproducible "global shuffle" a
    // pretraining pipeline applies before sequence packing (at cluster
    // scale the same expression keys the writer's `repartition(16,
    // shard)`, one file group per shard). The audit aggregate proves the
    // assignment: per-shard count, char volume, and an order-independent
    // membership fingerprint (sum of bounded content hashes) — a doc
    // routed to the wrong shard moves its fingerprint term across rows
    // and hash-diverges.
    // Incremental-ingest dedup: the "is this already in the corpus" gate
    // every recurring crawl runs before appending. The corpus keeps a
    // thin digest ledger (16-byte md5 per doc — at rest this is the
    // bucketed side); an incoming batch — here the odd-id docs plus a
    // deterministic RE-DELIVERY of every 10th even-id doc, the crawler
    // re-fetching known pages — is LEFT ANTI joined on content digest,
    // so only genuinely-new content survives. One shuffle on the digest;
    // no full-text comparison ever crosses the wire. The re-delivered
    // subset is dropped by construction, so a pass-through anti-join
    // (or one that over-drops the odd side) hash-diverges.
    "dedup_incremental" -> ((s, dir) => {
      val d = docs(s, dir)
      val corpus = d.filter(col("doc_id") % 2 === 0)
        .select(md5(col("text")).as("digest"))
      // odds ∪ (evens divisible by 10) are disjoint sets on one table —
      // a single OR-filtered scan, not a self-union (one pass at 100 TB)
      val incoming = d.filter(col("doc_id") % 2 === 1 || col("doc_id") % 10 === 0)
      incoming.join(corpus,
          md5(incoming("text")) === corpus("digest"), "left_anti")
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_new"),
          min(col("doc_id")).as("min_doc"), max(col("doc_id")).as("max_doc"),
          sum(col("n_chars")).as("sum_chars"))
    }),

    // Dataset-card summary: the per-(source, lang) release manifest a
    // curated corpus ships with — document count, token and char budgets,
    // distinct-content count (fingerprint cardinality ⇒ exact-dup rate),
    // and the id range. ONE scan + ONE shuffle on the tiny (source, lang)
    // key; tokenize and fingerprint both ride the scan projection. The
    // mean divides two exactly-summed integers, so it is bit-identical
    // across engines and partitionings.
    "pipe_dataset_card" -> ((s, dir) =>
      docs(s, dir)
        .select(col("source"), col("lang"), col("doc_id"), col("n_chars"),
          Text.tokenCount(col("text")).cast("long").as("n_tok"),
          Text.fingerprint(col("text")).as("fp"))
        .groupBy(col("source"), col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tok")).as("tok_sum"),
          sum(col("n_chars")).as("char_sum"),
          (sum(col("n_chars")).cast("double") / count(lit(1)).cast("double"))
            .as("mean_chars"),
          countDistinct(col("fp")).as("n_uniq"),
          min(col("doc_id")).as("min_doc"), max(col("doc_id")).as("max_doc"))),

    "pipe_shard" -> ((s, dir) => {
      docs(s, dir)
        .select(col("n_chars"), phash64(col("text")).as("_h"))
        .select(col("n_chars"), (col("_h") % 16).as("shard"),
          (col("_h") % 1000000007L).as("_fp"))
        .groupBy(col("shard"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("sum_chars"),
          sum(col("_fp")).as("fingerprint"))
    }),

    // Release-over-release corpus DIFF — the dataset-versioning audit a
    // reproducible training run needs: version A and version B (derived
    // deterministically: B drops doc_id % 5, A drops % 7, B edits % 11)
    // full-outer-joined on doc id, each doc classified
    // added/removed/changed/unchanged by CONTENT HASH — never by byte
    // comparison of the payloads, so only (id, source, md5) rows cross
    // the exchange. One join + one |sources×4|-row aggregate.
    "pipe_dataset_diff" -> ((s, dir) => {
      val d = docs(s, dir)
      val vA = d.filter(col("doc_id") % 7 =!= 0)
        .select(col("doc_id"), col("source").as("source_a"),
          md5(col("text")).as("ha"))
      val vB = d.filter(col("doc_id") % 5 =!= 0)
        .select(col("doc_id"), col("source").as("source_b"),
          md5(when(col("doc_id") % 11 === 0, concat(col("text"), lit(" v2")))
            .otherwise(col("text"))).as("hb"))
      vA.join(vB, Seq("doc_id"), "full_outer")
        .select(coalesce(col("source_a"), col("source_b")).as("source"),
          when(col("ha").isNull, "added")
            .when(col("hb").isNull, "removed")
            .when(col("ha") === col("hb"), "unchanged")
            .otherwise("changed").as("status"))
        .groupBy(col("source"), col("status"))
        .agg(count(lit(1)).as("n_docs"))
    }),

    // Preference-pair construction — the DPO/RLHF data-prep shape: within
    // each candidate group (here (lang, source) stands in for the prompt
    // id), the highest- and lowest-quality candidates become the
    // (chosen, rejected) pair with their score margin. One hash aggregate
    // with two struct-argmax accumulators — both merge map-side, so the
    // pair table costs one pass at any corpus size; ties break on doc_id
    // through the struct ordering, deterministic across engines and
    // partitionings. Groups with a single candidate produce no pair.
    "pipe_pref_pairs" -> ((s, dir) => {
      val d = docs(s, dir).select(col("doc_id"), col("lang"), col("source"),
        Text.qualityScore(col("text")).as("q"))
      d.groupBy(col("lang"), col("source"))
        .agg(count(lit(1)).as("n_cands"),
          max(struct(col("q"), col("doc_id"))).as("ch"),
          min(struct(col("q"), col("doc_id"))).as("rj"))
        .filter(col("n_cands") >= 2)
        .select(col("lang"), col("source"), col("n_cands"),
          col("ch.doc_id").as("chosen_id"), col("rj.doc_id").as("rejected_id"),
          (col("ch.q") - col("rj.q")).as("margin"))
    }),

    // Temperature-resampled source mixing (weights ∝ n^α, α = 0.5 — the
    // multi-source rebalancing step of corpus assembly: lift rare
    // sources, damp dominant ones, land on a target budget of half the
    // corpus). All cross-source math is INTEGER once sqrt is taken
    // (sqrt is exactly rounded in every IEEE engine; the scaled floor
    // makes the cross-source sum exact, where a double sum's addend
    // order would not be), so the per-document keep decision —
    // phash64(doc_id) mod 1e6 < rate_ppm(source) — is bit-identical
    // across engines, runs, and partitionings. Shape at scale: one
    // |sources|-row count aggregate broadcast back into a codegen'd
    // filter; no shuffle of document data at all.
    "pipe_mix_temperature" -> ((s, dir) => {
      val d = docs(s, dir).select(col("source"), col("doc_id"))
      val counts = d.groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
        .withColumn("s_i", floor(sqrt(col("n_docs")) * lit(1000)).cast("long"))
      val t = counts.agg(sum(col("s_i")), sum(col("n_docs"))).head()
      val (sSum, nTotal) = (t.getLong(0), t.getLong(1))
      val nTarget = nTotal / 2
      val rates = counts.select(col("source"),
        least(lit(1000000L),
          expr(s"s_i * $nTarget * 1000000 div ($sSum * n_docs)")).as("rate_ppm"))
      val keep = pmod(phash64(col("doc_id")), lit(1000000L)) < col("rate_ppm")
      d.join(broadcast(rates), Seq("source"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), max(col("rate_ppm")).as("rate_ppm"),
          sum(keep.cast("long")).as("n_kept"))
    }),

    // Curriculum staging: EXACT difficulty quartiles with no global
    // single-partition sort. Difficulty = integer avg word length
    // (milli-chars per token — exact in both engines); the global rank
    // is the two-phase distributed prefix sum ([[Relational.prefixSum]])
    // over difficulty-VALUE-range buckets — a difficulty value maps to
    // exactly one bucket, so bucket order IS rank order and no tie can
    // straddle a boundary; stage = (rank−1)·4 DIV total. The exact-ntile
    // a curriculum-ordered training run needs (approxQuantile would put
    // boundary docs in different stages on different runs); corpus total
    // is a 1-row scalar, like pipe_mix_temperature's budget.
    "pipe_curriculum" -> ((s, dir) => {
      val t = docs(s, dir).select(col("doc_id"),
        expr("CAST(length(replace(text, ' ', '')) AS BIGINT) * 1000 DIV " +
          "size(split(text, ' '))").as("difficulty_milli"))
      val total = t.count()
      Relational.prefixSum(t, lit(1L),
          struct(col("difficulty_milli"), col("doc_id")),
          expr("difficulty_milli DIV 500"), out = "rank")
        .withColumn("stage", expr(s"(rank - 1) * 4 DIV ${total}L"))
    }),

    // Deterministic per-epoch GLOBAL shuffle — the training-loader
    // permutation (each epoch visits every document exactly once, in a
    // different pseudorandom order, reproducibly across reruns and
    // partitionings) WITHOUT a global sort: the shuffle key is
    // phash64(doc_id:epoch) and the position is the distributed
    // prefix-sum rank over key-RANGE buckets (phash64 < 2^60, so
    // skey DIV 2^52 is 256 order-aligned buckets — and because the
    // key is a hash, the range buckets are uniformly loaded by
    // construction: this is the one window family where bucket skew
    // cannot occur). Both epochs ride one plan; per-epoch position =
    // global prefix rank − epoch·N.
    "pipe_epoch_shuffle" -> ((s, dir) => {
      val keyed = docs(s, dir)
        .select(col("doc_id"), explode(sequence(lit(0L), lit(1L))).as("epoch"))
        .withColumn("skey", phash64(concat(col("doc_id").cast("string"),
          lit(":e"), col("epoch").cast("string"))))
      val n = docs(s, dir).count()
      Relational.prefixSum(keyed, lit(1L),
          struct(col("epoch"), col("skey"), col("doc_id")),
          struct(col("epoch"), expr("skey DIV 4503599627370496")), out = "gpos")
        .withColumn("pos", expr(s"gpos - epoch * ${n}L"))
        .select(col("doc_id"), col("epoch"), col("skey"), col("pos"))
    }),

    // Release-over-release DRIFT monitor — the distribution-shift report
    // a corpus release pipeline gates on (did the crawler/filter change
    // silently skew languages or document lengths?): the corpus split at
    // its doc_id midpoint into prev/curr releases, each (source, dim,
    // bucket) cell's share computed in ppm (integer-exact — n·10⁶ DIV
    // side total), and the per-(source, dim) total-variation distance
    // Σ|Δppm| DIV 2 carried on every cell. Two dimensions ride ONE scan
    // (a 2-element explode: lang and a 256-char length bucket); the
    // shares and TVD are windows over the AGGREGATED cell table
    // (|sources|×|dims|×|buckets| rows), never the corpus.
    "pipe_drift_monitor" -> ((s, dir) => {
      val d = docs(s, dir)
      val b = d.agg(min(col("doc_id")), max(col("doc_id"))).head()
      val mid = b.getLong(0) + (b.getLong(1) - b.getLong(0)) / 2
      val cells = d.select(col("source"),
          (col("doc_id") <= mid).as("is_prev"),
          explode(array(
            struct(lit("lang").as("dim"), col("lang").as("bucket")),
            struct(lit("len").as("dim"),
              expr("CAST(n_chars DIV 256 AS STRING)").as("bucket"))))
            .as("c"))
        .groupBy(col("source"), col("c.dim").as("dim"),
          col("c.bucket").as("bucket"))
        .agg(sum(when(col("is_prev"), 1L).otherwise(0L)).as("prev_n"),
          sum(when(!col("is_prev"), 1L).otherwise(0L)).as("curr_n"))
      val wSide = org.apache.spark.sql.expressions.Window
        .partitionBy(col("source"), col("dim"))
      cells
        .withColumn("_pt", sum(col("prev_n")).over(wSide))
        .withColumn("_ct", sum(col("curr_n")).over(wSide))
        .withColumn("prev_ppm", expr("prev_n * 1000000 DIV nullif(_pt, 0)"))
        .withColumn("curr_ppm", expr("curr_n * 1000000 DIV nullif(_ct, 0)"))
        .withColumn("delta_ppm", col("curr_ppm") - col("prev_ppm"))
        .withColumn("_sd", sum(abs(col("delta_ppm"))).over(wSide))
        .withColumn("tvd_ppm", expr("_sd DIV 2"))
        .drop("_pt", "_ct", "_sd")
    }),

    // Winnowing fingerprints (the MOSS local-minimum scheme: k-token
    // shingle hashes, minimum per w-wide window, distinct selections):
    // any shared token run of length ≥ k + w − 1 between two documents
    // is GUARANTEED to share a fingerprint — the property plain every-
    // Nth-hash sampling lacks. Entirely array-native higher-order
    // functions: shingle hashes, window minima, and the distinct set
    // all compute inside the row, so the query is a pure codegen'd
    // projection — zero shuffle, zero explode — the 100 TB shape (a
    // posting-list build would explode only the selected minima).
    // Each key packs (hash mod 2^40) · 4096 + (4095 − pos mod 4096), so
    // window ties break deterministically and identically in both
    // engines; n_fp/fp_sum summarize the integer-exact fingerprint set.
    "text_winnow" -> ((s, dir) => {
      val k = 5
      val w = 4
      val toksCol = Text.tokens(col("text"))
      val keys = when(size(toksCol) >= k,
        transform(sequence(lit(0), size(toksCol) - k), p =>
          pmod(phash64(concat_ws(" ", slice(toksCol, p + 1, lit(k)))), lit(1L << 40)) *
            lit(4096L) + (lit(4095) - pmod(p, lit(4096)))))
        .otherwise(array().cast("array<bigint>"))
      docs(s, dir)
        .withColumn("keys", keys)
        .withColumn("fps", when(size(col("keys")) >= w,
          array_distinct(transform(sequence(lit(0), size(col("keys")) - w),
            q => array_min(slice(col("keys"), q + 1, lit(w))))))
          .otherwise(array().cast("array<bigint>")))
        .select(col("doc_id"), size(col("fps")).cast("long").as("n_fp"),
          aggregate(col("fps"), lit(0L), (acc, x) => acc + x).as("fp_sum"))
    }),

    // Deterministic 80/10/10 hash split (train/val/test assignment): a
    // salted portable hash of the id, stable under any partitioning or
    // re-run — the sampling-free split a 100 TB pipeline needs.
    "text_split_assign" -> ((s, dir) =>
      docs(s, dir).select(col("doc_id"),
        Text.splitAssign(col("doc_id")).as("split"))),

    // Context-window chunking: 64-token windows advancing by 56 (8-token
    // overlap), exploded to (doc, chunk) rows — training-prep sequence
    // windowing as one codegen'd projection + explode.
    "text_chunk" -> ((s, dir) =>
      docs(s, dir)
        .select(col("doc_id"),
          explode(Text.chunkWindows(col("text"), size = 64, stride = 56)).as("c"))
        .select(col("doc_id"),
          col("c.chunk_idx").cast("long").as("chunk_idx"),
          size(col("c.chunk_tokens")).cast("long").as("n_tokens"),
          md5(encode(array_join(col("c.chunk_tokens"), " "), "UTF-8")).as("chunk_md5"))),

    // Boilerplate detection: chunk-granular cross-document dedup — a
    // chunk whose content hash recurs across documents is repeated
    // boilerplate (headers, licenses, templates) that a pretraining
    // pipeline strips even when the parent documents are distinct. One
    // shuffle on the chunk hash (same scale shape as exact dedup); only
    // recurring chunks survive.
    "text_chunk_dedup" -> ((s, dir) =>
      docs(s, dir)
        .select(col("doc_id"),
          explode(Text.chunkWindows(col("text"), size = 64, stride = 56)).as("c"))
        .select(col("doc_id"),
          md5(encode(array_join(col("c.chunk_tokens"), " "), "UTF-8")).as("chunk_md5"))
        .groupBy(col("chunk_md5"))
        .agg(countDistinct(col("doc_id")).as("n_docs"),
          count(lit(1)).as("n_occurrences"), min(col("doc_id")).as("keep_doc"))
        .filter(col("n_docs") > 1)),

    // Token-budget packing (training-batch assembly): documents packed
    // into ~2048-token bins by running token offset within a partition
    // key (lang here; a salt at corpus scale), in deterministic doc order
    // — bin = floor(preceding_tokens / budget). One windowed cumsum per
    // partition; no global sort, no sequential driver loop.
    "text_pack" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("lang")).orderBy(col("doc_id"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      docs(s, dir)
        .select(col("doc_id"), col("lang"),
          Text.tokenCount(col("text")).cast("long").as("n_tokens"))
        .withColumn("cum", sum(col("n_tokens")).over(w))
        .withColumn("bin", ((col("cum") - col("n_tokens")) / lit(2048)).cast("long"))
        .groupBy(col("lang"), col("bin"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("bin_tokens"))
    }),

    // Per-group quota sampling (diversity capping): keep at most 25 docs
    // per language, chosen by a salted hash rank — deterministic,
    // partition-stable, no sampling state (the per-source cap step of a
    // data-mixing pipeline).
    "text_quota_sample" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window.partitionBy(col("lang"))
        .orderBy(graft.functions.Portable.phash64(
          concat(col("doc_id").cast("string"), lit(":q"))), col("doc_id"))
      docs(s, dir).select(col("doc_id"), col("lang"))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 25)
        .select(col("doc_id"), col("lang"))
    }),

    // PII scrub: the corpus text salted with a deterministic email, phone,
    // and IPv4 per document (the synthetic corpus carries no organic PII —
    // the salt makes every regex do real work), then redacted by the
    // codegen'd scrub chain. The oracle mirrors salt + regexes verbatim;
    // per-type tag counts prove each pattern class actually fired.
    "text_pii_scrub" -> ((s, dir) =>
      docs(s, dir)
        .withColumn("dirty", concat(
          col("text"), lit(" contact u"), col("doc_id").cast("string"),
          lit("@example.com or +1-555-"),
          lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0"),
          lit(" at 10.0."), pmod(col("doc_id"), lit(256)).cast("string"),
          lit(".7 now")))
        .withColumn("clean", Text.piiScrub(col("dirty")))
        .select(col("doc_id"),
          md5(col("clean")).as("clean_md5"),
          Text.occurrences(col("clean"), "<EMAIL>").as("n_email"),
          Text.occurrences(col("clean"), "<PHONE>").as("n_phone"),
          Text.occurrences(col("clean"), "<IP>").as("n_ip"))),

    // Decontamination: corpus docs sharing any 3-gram shingle with the
    // "benchmark" docs (doc_id % 50 == 0 — the deterministic eval-set
    // stand-in), with overlap count and contaminated fraction.
    "text_contamination" -> ((s, dir) =>
      Dedup.contamination(docs(s, dir), col("doc_id"), col("text"),
        benchPred = col("doc_id") % 50 === 0)),

    // Quality-gate threshold CALIBRATION — the sweep a gate threshold is
    // actually chosen by (what fraction of each language survives at
    // 0.3 / 0.4 / 0.5 / 0.6 / 0.7?): one scan scores the corpus, a
    // 5-element explode prices every (threshold, lang) cell with
    // integer pass counts and pass rate in ppm. text_quality applies
    // ONE threshold; this is the curve that justifies it — and shows
    // the per-language bias a single global cut introduces.
    "text_quality_calibration" -> ((s, dir) => {
      val ths = Seq(300L, 400L, 500L, 600L, 700L)
      docs(s, dir)
        .select(col("lang"), Text.qualityScore(col("text")).as("q"),
          explode(array(ths.map(lit): _*)).as("th_milli"))
        .groupBy(col("th_milli"), col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum((col("q") >= col("th_milli") / 1000.0).cast("long")).as("n_pass"))
        .withColumn("pass_ppm", expr("n_pass * 1000000 DIV n_docs"))
    }),

    // Per-document NOVELTY profile — how much of each document's 3-gram
    // vocabulary first enters the corpus WITH that document (doc_id =
    // ingest order): the memorization/duplication long-tail diagnostic
    // (a near-copy of anything earlier scores ~0 ppm; genuinely fresh
    // text ~1e6). Distinct from text_block_dedup (canonical spans) —
    // this charges each doc for everything ANY earlier doc introduced.
    // Shape: one explode to (shingle, doc), a min-doc groupBy and a
    // join back on the same shingle key (one co-partitioned exchange),
    // then a per-doc rollup — all linear in corpus shingle volume.
    "text_ngram_novelty" -> ((s, dir) => {
      val sh = docs(s, dir).select(col("doc_id"),
        explode(array_distinct(transform(Text.shingles(col("text"), 3),
          x => phash64(x) % lit(4294967296L)))).as("h"))
      val first = sh.groupBy(col("h")).agg(min(col("doc_id")).as("first_doc"))
      sh.join(first, Seq("h"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_shingles"),
          sum(when(col("first_doc") === col("doc_id"), 1L).otherwise(0L))
            .as("n_novel"))
        .withColumn("novelty_ppm", expr("n_novel * 1000000 DIV n_shingles"))
    }),

    // Quality-first BUDGET fill — "take the best documents until the
    // token budget runs out", the selection step that turns a scored
    // corpus into a fixed-size training set: docs ordered by
    // (quality DESC, doc_id), the running token total is the
    // distributed prefix sum over quality-range buckets (a quality
    // value maps to one bucket — no global sort), and a doc is kept
    // iff the budget was not already spent when it starts (the
    // straddling doc closes the budget, exactly like a loader filling
    // its last batch). Budget = half the corpus' tokens, derived.
    "pipe_token_budget" -> ((s, dir) => {
      val t = docs(s, dir).select(col("doc_id"),
        Text.qualityScore(col("text")).as("q"),
        Text.tokenCount(col("text")).cast("long").as("n_tokens"))
      val budget = t.agg(sum(col("n_tokens"))).head().getLong(0) / 2
      Relational.prefixSum(t, col("n_tokens"),
          struct((-col("q")).as("nq"), col("doc_id")),
          floor(-col("q") * 20).cast("long"), out = "cum")
        .filter(col("cum") - col("n_tokens") < budget)
        .select(col("doc_id"), col("q"), col("n_tokens"), col("cum"))
    }),

    // Bloom-filter decontamination — the fixed-memory form of
    // text_contamination: the benchmark shingle set folds into an m-bit
    // Bloom filter (k = 3 derived positions per 32-bit shingle hash) and
    // corpus shingles test membership against the BITS, never the set.
    // At 100 TB that is the point: the filter is a constant-size
    // broadcast no matter how the benchmark suite grows, and the corpus
    // pass is one scan + one broadcast join. The bit array is modeled
    // relationally (the distinct set-position table IS the bitset — both
    // engines derive identical bits), so Bloom FALSE POSITIVES are real
    // and accounted per document: a shingle hits iff all k of its
    // positions are set; n_false_pos = bloom hits that are not true
    // benchmark shingles. m is sized small (2^14) so the FP path is
    // actually exercised — the trade a production deployment tunes.
    "text_bloom_contaminate" -> ((s, dir) => {
      def positions(h: Column): Column =
        array(BloomSalts.map { case (a, b) =>
          pmod(h * lit(a) + lit(b), lit(BloomBits)) }: _*)
      val sets = docs(s, dir).select(col("doc_id"),
          (col("doc_id") % 50 === 0).as("is_bench"),
          array_distinct(transform(Text.shingles(col("text"), 3),
            x => phash64(x) % lit(4294967296L))).as("s"))
        .localCheckpoint()
      val bench = sets.filter(col("is_bench"))
        .select(explode(col("s")).as("h")).distinct()
      val bits = bench.select(explode(positions(col("h"))).as("pos")).distinct()
      val corpus = sets.filter(!col("is_bench"))
        .select(col("doc_id"), size(col("s")).cast("long").as("n_shingles"),
          explode(col("s")).as("h"))
      val bloomHits = corpus
        .select(col("doc_id"), col("n_shingles"), col("h"),
          explode(positions(col("h"))).as("pos"))
        .join(broadcast(bits), Seq("pos"))
        .groupBy(col("doc_id"), col("n_shingles"), col("h"))
        .agg(count(lit(1)).as("n_set"))
        .filter(col("n_set") === BloomSalts.length)
      val trueHits = corpus.select(col("doc_id"), col("h"))
        .join(broadcast(bench), Seq("h")).withColumn("t", lit(1L))
      bloomHits.join(trueHits, Seq("doc_id", "h"), "left_outer")
        .groupBy(col("doc_id"), col("n_shingles"))
        .agg(count(lit(1)).as("n_bloom_hits"), count(col("t")).as("n_true_hits"))
        .select(col("doc_id"), col("n_shingles"), col("n_bloom_hits"),
          col("n_true_hits"),
          (col("n_bloom_hits") - col("n_true_hits")).as("n_false_pos"))
    }),

    // DSIR data selection (Xie et al. 2023, hashed-n-gram importance
    // resampling): unigrams hash into 1024 buckets; the "target"
    // distribution is the English slice, the "raw" distribution the
    // whole corpus; a document's importance weight is its tokens' summed
    // log-likelihood ratio under add-one-smoothed bucket models, and the
    // top 100 by weight are selected. Shape at scale: both bucket models
    // are 1024-row broadcasts, the corpus is ONE tokenize pass (the
    // exploded base feeds doc scoring and both count tables), the totals
    // land as plan literals, and the selection is a distributed
    // TakeOrdered over per-doc aggregates — no global sort of the
    // corpus, nothing quadratic anywhere.
    "text_dsir_select" -> ((s, dir) => {
      val base = docs(s, dir)
        .select(col("doc_id"), col("lang"),
          explode(Text.tokens(col("text"))).as("t"))
        .withColumn("bkt", pmod(phash64(concat(col("t"), lit(":dsir"))), lit(1024L)))
        .localCheckpoint()
      val tot = base.agg(count(lit(1)),
        sum(when(col("lang") === "en", 1L).otherwise(0L))).head()
      val (nRaw, nTgt) = (tot.getLong(0), tot.getLong(1))
      val raw = base.groupBy(col("bkt")).agg(count(lit(1)).as("cr"))
      val tgt = base.filter(col("lang") === "en")
        .groupBy(col("bkt")).agg(count(lit(1)).as("ct"))
      base.join(broadcast(raw), Seq("bkt"))
        .join(broadcast(tgt), Seq("bkt"), "left_outer")
        .withColumn("llr", log(
          ((coalesce(col("ct"), lit(0L)) + lit(1L)) * lit(nRaw + 1024L)).cast("double") /
            ((col("cr") + lit(1L)) * lit(nTgt + 1024L)).cast("double")))
        .groupBy(col("doc_id"), col("lang"))
        .agg(count(lit(1)).as("n_tokens"),
          graft.functions.Portable.detSum6(col("llr")).as("dsir_w"))
        .orderBy(col("dsir_w").desc, col("doc_id"))
        .limit(100)
    }),

    "dedup_exact" -> ((s, dir) =>
      Dedup.exact(docs(s, dir), col("doc_id"), col("text"))),

    // Survivorship / golden-record consolidation — what a curation
    // pipeline does AFTER dedup decides the clusters: keep the earliest
    // member of each MinHash near-dup cluster but MERGE the provenance
    // of all of them (member count, distinct sources as a sorted csv,
    // language spread), so dropping duplicates loses no lineage. The
    // member-level labels come from the same min-label fixpoint as
    // dedup_components ([[Dedup.componentLabels]]); the merge is one
    // groupBy on the label; collect_set stays bounded by the 20-source
    // universe (a production run caps or sketches it).
    "pipe_golden_record" -> ((s, dir) => {
      val d = docs(s, dir)
      Dedup.componentLabels(
          Dedup.minhashLsh(d, col("doc_id"), col("text")))
        .join(d.select(col("doc_id"), col("source"), col("lang")), Seq("doc_id"))
        .groupBy(col("label").as("cluster"))
        .agg(min(col("doc_id")).as("keep_id"),
          count(lit(1)).as("n_members"),
          countDistinct(col("source")).as("n_sources"),
          array_join(array_sort(collect_set(col("source"))), ",").as("sources"),
          countDistinct(col("lang")).as("n_langs"))
    }),

    // PII-scrub COMPLETENESS audit — the governance artifact a release
    // gate wants next to the scrub itself: per source, how much PII the
    // detectors find BEFORE the scrub, and a re-run of the SAME
    // detectors on the scrubbed text, which must read zero — an
    // incomplete scrub (or a replacement tag that itself matches a
    // detector) surfaces as a nonzero post column and hash-diverges.
    // One projection chain, codegen'd; the audit costs one extra
    // regexp_count pass over the already-scrubbed column.
    "text_pii_audit" -> ((s, dir) => {
      val dirty = concat(
        col("text"), lit(" contact u"), col("doc_id").cast("string"),
        lit("@example.com or +1-555-"),
        lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0"),
        lit(" at 10.0."), pmod(col("doc_id"), lit(256)).cast("string"),
        lit(".7 now"))
      def cnt(c: org.apache.spark.sql.Column, re: String) =
        regexp_count(c, lit(re)).cast("long")
      docs(s, dir)
        .withColumn("d", dirty)
        .withColumn("c", Text.piiScrub(col("d")))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(cnt(col("d"), Text.EmailRe)).as("pre_email"),
          sum(cnt(col("d"), Text.Ipv4Re)).as("pre_ip"),
          sum(cnt(col("d"), Text.PhoneRe)).as("pre_phone"),
          sum(cnt(col("c"), Text.EmailRe)).as("post_email"),
          sum(cnt(col("c"), Text.Ipv4Re)).as("post_ip"),
          sum(cnt(col("c"), Text.PhoneRe)).as("post_phone"))
    }),

    // Quality-gate ABLATION — the report that decides which filters a
    // curation pipeline actually runs: every document scored by all
    // three gates in ONE scan (quality score, language-id agreement,
    // Gopher rules — each rides the same tokenize), then a CUBE over the
    // three verdict flags gives doc/token budgets for every gate
    // combination and margin, so "what does adding the Gopher gate cost
    // on top of the quality gate" is one row lookup. The cube expands
    // 8 rows per input row but AFTER collapsing to the 8-flag-combo
    // aggregate — the expansion is over the aggregated set at scale.
    "pipe_gate_ablation" -> ((s, dir) => {
      val d = docs(s, dir)
      val flags = d.select(col("doc_id"), col("lang"),
          Text.tokenCount(col("text")).cast("long").as("n_tokens"),
          (Text.qualityScore(col("text")) >= 0.5).as("quality_ok"),
          (Text.langId(col("text")) === col("lang")).as("lang_ok"))
        .join(Text.gopherStats(d, col("doc_id"), col("text"))
          .select(col("doc_id"), col("keep").as("gopher_ok")), Seq("doc_id"))
      flags.cube(col("quality_ok"), col("lang_ok"), col("gopher_ok"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens"))
    }),

    // Incremental near-dup detection — what a CONTINUOUS ingest runs
    // instead of re-pairing the corpus: the new batch (every 5th doc)
    // probes the standing band index, so the exchange is |incr bands| ⋈
    // index rather than the index self-join, and already-known base-base
    // pairs never recompute. Output = exactly the pairs the ingestion
    // CREATES (incr-incr and incr-base), verified by exact Jaccard like
    // the batch path; the oracle is the full pair set restricted to
    // pairs touching the increment.
    "dedup_minhash_incr" -> ((s, dir) =>
      Dedup.minhashLshIncremental(docs(s, dir), col("doc_id"), col("text"),
        incrPred = col("doc_id") % 5 === 0)),

    // Leak-free train/val/test split — the assignment rule a pretraining
    // pipeline must use AFTER dedup finds near-dup clusters: hash the
    // CLUSTER label, not the document id, so every member of a near-dup
    // family lands in the same split (a doc-keyed split leaks train text
    // into eval through its near-duplicates — the contamination the split
    // exists to prevent). Clusters come from the same MinHash-LSH min-
    // label fixpoint as dedup_components; singletons keep their own id.
    // Per split: cluster/doc counts plus how many of its clusters the
    // naive doc-keyed rule WOULD have split across sets — the measured
    // leak the cluster keying closes. One extra groupBy over the label
    // join; the split hash itself is a codegen'd projection.
    "text_split_leakfree" -> ((s, dir) => {
      val d = docs(s, dir).select(col("doc_id"))
        .withColumn("naive_split", Text.splitAssign(col("doc_id")))
      val labels = Dedup.componentLabels(
        Dedup.minhashLsh(docs(s, dir), col("doc_id"), col("text")))
      d.join(labels, Seq("doc_id"), "left_outer")
        .withColumn("cluster", coalesce(col("label"), col("doc_id")))
        .groupBy(col("cluster"))
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("naive_split")).as("n_naive"))
        .withColumn("split", Text.splitAssign(col("cluster")))
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n_clusters"),
          sum(col("n_docs")).as("n_docs"),
          sum((col("n_naive") > 1).cast("long")).as("n_clusters_naive_leaky"))
    }),

    // Streaming incremental exact dedup: the corpus arrives as TWO files
    // (even doc_ids, then odd), each its own micro-batch
    // (maxFilesPerTrigger=1, mod-time order); the per-digest state ledger
    // must emit each digest exactly once — the even batch's smallest id
    // if any even doc carries it, else the smallest odd id. A later
    // duplicate "winning" (min over both phases) or a leak (digest
    // emitted twice) hash-diverges from the oracle.
    "dedup_stream_exact" -> ((s, dir) => StreamOps.scopedState(s) {
      val work = graft.Work.dir(s"dedup_stream_q")
      graft.streaming.IncrSync.deletePath(s, work)
      val d = docs(s, dir).select(col("doc_id"), md5(col("text")).as("digest"))
        .localCheckpoint()
      StreamOps.stageOrdered(s, s"$work/feed", Seq(
        d.filter(col("doc_id") % 2 === 0),
        d.filter(col("doc_id") % 2 === 1)))
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("digest",
          org.apache.spark.sql.types.StringType)))
      val stream = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(s"$work/feed")
      val q = Dedup.streamingFirstPerDigest(stream).writeStream
        .option("checkpointLocation", s"$work/ckpt")
        .option("path", s"$work/out")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .format("parquet").start()
      q.awaitTermination()
      s.read.parquet(s"$work/out").select(col("digest"), col("doc_id"))
    }),

    // Streaming NEAR-dup marking at ingest — the stateful sibling of
    // dedup_stream_exact and the continuous analogue of
    // dedup_minhash_incr: arriving docs' LSH bands probe a standing band
    // index in stream state (ONE long per bucket — the min doc_id seen),
    // three ordered id-range files prove cross-batch probing, and the
    // post-drain fold verifies exact Jaccard on each (doc, earliest
    // band-mate) hit. The oracle replays the ledger closed-form: min
    // earlier doc sharing any band.
    "dedup_stream_neardup" -> ((s, dir) => StreamOps.scopedState(s) {
      val work = graft.Work.dir("dedup_stream_neardup_q")
      graft.streaming.IncrSync.deletePath(s, work)
      val d = docs(s, dir).select(col("doc_id"), col("text")).localCheckpoint()
      val b = d.agg(min(col("doc_id")), max(col("doc_id"))).head()
      val (lo, hi) = (b.getLong(0), b.getLong(1))
      val (c1, c2) = (lo + (hi - lo) / 3, lo + 2 * (hi - lo) / 3)
      StreamOps.stageOrdered(s, s"$work/feed", Seq(
        d.filter(col("doc_id") <= c1),
        d.filter(col("doc_id") > c1 && col("doc_id") <= c2),
        d.filter(col("doc_id") > c2)))
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("text",
          org.apache.spark.sql.types.StringType)))
      val stream = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(s"$work/feed")
      val q = Dedup.streamingNearDupCandidates(stream).writeStream
        .option("checkpointLocation", s"$work/ckpt")
        .option("path", s"$work/out")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .format("parquet").start()
      q.awaitTermination()
      val dup = s.read.parquet(s"$work/out")
        .groupBy(col("doc_id")).agg(min(col("cand")).as("dup_of"))
      val sig = Dedup.minhashSignatures(d, col("doc_id"), col("text"))
        .select(col("doc_id"), col("s")).localCheckpoint()
      dup.join(sig.select(col("doc_id"), col("s").as("sa")), Seq("doc_id"))
        .join(sig.select(col("doc_id").as("dup_of"), col("s").as("sb")),
          Seq("dup_of"))
        .withColumn("n_inter",
          size(array_intersect(col("sa"), col("sb"))).cast("long"))
        .withColumn("n_union", size(col("sa")).cast("long") +
          size(col("sb")).cast("long") - col("n_inter"))
        .select(col("doc_id"), col("dup_of"), col("n_inter"), col("n_union"),
          (col("n_inter") * 2 >= col("n_union")).as("near_dup"))
    }),

    "dedup_minhash_lsh" -> ((s, dir) =>
      Dedup.minhashLsh(docs(s, dir), col("doc_id"), col("text"))),

    "dedup_ngram_jaccard" -> ((s, dir) =>
      Dedup.ngramJaccard(docs(s, dir), col("doc_id"), col("text"))),

    // COMPLETE edit-distance self-join via pigeonhole segment blocking
    // (the PassJoin principle — Li et al., VLDB'11): dedup on the
    // normalized fixed-width key (the 64-char '~'-padded text prefix —
    // fixed width makes the segment boundaries plan literals). If
    // ed(A, B) ≤ k, any partition of A into k+1 segments leaves at least
    // one segment UNTOUCHED by edits, so it occurs in B verbatim — and
    // by the MULTI-MATCH-AWARE substring selection (Li et al. §4, the
    // position-aware tightening the r15 verdict asked for): some
    // untouched segment i occurs with its start shifted by at most
    // min(i, k−i), because a shift of |d| needs ≥ |d| indel errors
    // BEFORE the segment (≤ i can fit there under pigeonhole choice)
    // and, at equal key widths, ≥ |d| errors AFTER it (≤ k−i fit).
    // Candidates are therefore an equi-join of A-side segments against
    // B-side position-windowed substrings — window sizes 1,3,5,5,3,1
    // per segment index = 18 thin rows per string instead of the naive
    // all-shifts 6 × ≤11 ≈ 60, cutting every degenerate bucket's join
    // mass ~3.3× on the window side BEFORE the cap matters (still no
    // recall knob, no df cutoff: the tighter window is provably
    // complete — PropertySpec's pigeonhole-blocking law fuzzes it and
    // a 64k-pair offline sweep incl. clustered-edit adversaries found
    // zero misses), then exact levenshtein ≤ k on the deduped id-pairs.
    // The oracle is the BRUTE all-pairs levenshtein — the gate proves
    // the blocking lost nothing, the same completeness contract as
    // dedup_prefix_filter. Catches the short-header/near-identical-
    // prefix duplication class that token-set methods dilute away.
    //
    // Degenerate-mass handling, three tiers (r17 verdict task 1 — the
    // edit_win cap audit measured 168,822 rows silently excluded from
    // candidate generation on the 100× replicated corpus; SCALE_r14 had
    // measured the raw hazard at 85k → 53.5M candidate pairs, 630×
    // quadratic, from one replica-invariant segment):
    //  1. REPLICA PRE-COLLAPSE: docs with an IDENTICAL normalized key
    //     collapse to one distinct key (rep = min doc_id) before any
    //     blocking. Replicated boilerplate — the exact corpus shape
    //     whose mass the caps were dropping — now verifies once per
    //     distinct pair; true doc pairs come back exactly through the
    //     membership expansion (same-key members are dist-0 pairs by
    //     definition). Verification cost falls by replication²; output
    //     work is linear in the true pair count, the floor for an
    //     all-pairs contract.
    //  2. SALT SPLIT: distinct-key buckets of (EditMaxSegBucket,
    //     EditHardSegBucket] — genuinely diverse low-entropy openings,
    //     not replicas — process COMPLETELY: the segment side chunks
    //     into ⌈n/cap⌉ hash slices, the window side replicates per
    //     slice (the sim_ivf_split disjoint-id move applied to
    //     blocking), so a hot bucket becomes m bounded join tasks
    //     instead of one straggler or a silent drop.
    //  3. HARD CAP: buckets past EditHardSegBucket distinct keys drop
    //     from candidate generation and are REPORTED by dedup_cap_audit
    //     (no silent caps); pigeonhole still gives such a pair k other
    //     segments to resurface through.
    // The oracle is the BRUTE all-pairs levenshtein — the sf0.01 gate
    // proves the whole collapse/salt/expand pipeline loses nothing.
    "dedup_edit_distance" -> ((s, dir) => editDistancePairs(docs(s, dir))),

    "dedup_simhash" -> ((s, dir) =>
      Dedup.simhashPairs(docs(s, dir), col("doc_id"), col("text"))),

    // The production dedup CASCADE with per-stage marginal accounting —
    // cheap filters first, each stage seeing only the previous stage's
    // survivors: exact (md5 canonical-first) → containment (drop the
    // contained side: smaller set, larger id on tie) → MinHash-LSH
    // near-dup components (keep the min-id member per cluster). The
    // accounting is the number each stage removes GIVEN what earlier
    // stages already removed — the marginal-value report that justifies
    // (or kills) a stage in a real pipeline — plus an order-insensitive
    // fingerprint of the final survivor set. Scale shape: every stage is
    // the already-audited operator run on a shrinking survivor set; the
    // cascade adds only the anti-joins between stages.
    "pipe_dedup_cascade" -> ((s, dir) => {
      import s.implicits._
      val d = docs(s, dir).select(col("doc_id"), col("text")).localCheckpoint()
      val n0 = d.count()
      val s1 = d.withColumn("h", md5(encode(col("text"), "UTF-8")))
        .groupBy(col("h")).agg(min(col("doc_id")).as("doc_id"))
        .select("doc_id")
      val d1 = d.join(s1, Seq("doc_id")).localCheckpoint()
      val n1 = d1.count()
      val contained = Dedup.containmentPairs(d1, col("doc_id"), col("text"))
        .select(when(col("n_a") < col("n_b"), col("doc_a"))
          .when(col("n_b") < col("n_a"), col("doc_b"))
          .otherwise(greatest(col("doc_a"), col("doc_b"))).as("doc_id"))
        .distinct()
      val d2 = d1.join(contained, Seq("doc_id"), "left_anti").localCheckpoint()
      val n2 = d2.count()
      val labels = Dedup.componentLabels(
        Dedup.minhashLsh(d2, col("doc_id"), col("text")))
      val removed3 = labels.filter(col("doc_id") =!= col("label"))
        .select("doc_id")
      val s3 = d2.join(removed3, Seq("doc_id"), "left_anti")
      val n3 = s3.count()
      val fp = s3.agg(md5(encode(concat_ws(",",
        array_sort(collect_list(col("doc_id").cast("string")))), "UTF-8")).as("f"))
        .head().getString(0)
      Seq(
        ("exact", n0, n0 - n1, n1, ""),
        ("containment", n1, n1 - n2, n2, ""),
        ("neardup", n2, n2 - n3, n3, ""),
        ("survivors", n3, 0L, n3, fp))
        .toDF("stage", "n_in", "n_removed", "n_out", "fp")
    }),

    // Containment dedup — the near-SUPERSET detector (quotes, wrapped
    // articles, boilerplate-plus-body): |A∩B| / min(|A|,|B|) ≥ 4/5 over
    // the same inverted shingle index as dedup_ngram_jaccard, with the
    // jaccard_low flag marking the pairs a resemblance-only pass (J ≥
    // 0.5) would have MISSED. Integer-exact end to end.
    "dedup_containment" -> ((s, dir) =>
      Dedup.containmentPairs(docs(s, dir), col("doc_id"), col("text"))),

    // NO-SILENT-CAPS audit (BASELINE.md's own rule — `log()` what was
    // dropped): every quadratic-blowup cap in the dedup/similarity
    // family emits its dropped-mass accounting as a first-class output —
    // one row per cap site: how many blocking buckets exceed the cap and
    // the row mass those buckets hold. On this corpus every counter is
    // ZERO (the gates' completeness claims really are complete below the
    // caps — proven, not asserted); on a corpus where a cap binds, the
    // report reads "N buckets / M rows dropped" instead of silently
    // complete (ScaleGuardSpec pins the firing path on an adversarial
    // corpus). Each site's bucket table is the SAME construction its
    // operator caps (shared builders / same keyed grouping), so audit
    // and cap cannot drift. Scale shape: six partial-aggregatable
    // groupBys over tables the operators already build — no new shuffle
    // class, output is six rows.
    "dedup_cap_audit" -> ((s, dir) => {
      val d = docs(s, dir).localCheckpoint()
      // edit sites audit the POST-COLLAPSE construction the operator
      // actually blocks on (distinct normalized keys, not raw docs) at
      // the HARD cap — the only tier that still drops mass; the salt
      // tier below it processes its buckets completely (r17 task 1:
      // replica mass no longer reaches these counters because it no
      // longer reaches the join)
      val keyRows = editKeys(editBase(d))
        .select(col("key_id").as("doc_id"), col("s")).localCheckpoint()
      val joined = d.join(Tables.load(s, dir, "embeddings"),
        d("doc_id") === col("vec_id")).localCheckpoint()
      // embed sites likewise audit distinct quantized vectors per block
      // (the collapsed keys thresholdPairs self-joins) at HardMaxBlock
      def embKeys(planes: Int) = joined.select(
          Similarity.quantize(col("embedding")).as("v"),
          Similarity.lshBucketCol(Similarity.quantize(col("embedding")),
            numPlanes = planes).as("blk"))
        .groupBy(col("blk"), col("v")).agg(count(lit(1)).as("n_mem"))
      // both embedding block geometries in use: the fixed 8-plane
      // blocking (dedup_embed_cosine/sim_ann_lsh) AND the corpus-derived
      // adaptive one (dedup_embed_adaptive) — a degenerate mass can bind
      // in the coarser adaptive space while splitting below cap at 8
      // planes, so auditing only one would re-open the silent-cap gap
      val planesA = Similarity.adaptivePlanes(joined.count())
      Dedup.capAuditRow(editSegRows(keyRows), Seq(col("i"), col("g")),
          EditHardSegBucket, "edit_seg")
        .unionByName(Dedup.capAuditRow(editWinRows(keyRows),
          Seq(col("i"), col("g")), EditHardSegBucket, "edit_win"))
        .unionByName(Dedup.minhashBandAudit(d, col("doc_id"), col("text")))
        .unionByName(Dedup.simhashBandAudit(d, col("doc_id"), col("text")))
        .unionByName(Dedup.shingleDfAudit(d, col("doc_id"), col("text")))
        .unionByName(Dedup.capAuditRow(embKeys(8), Seq(col("blk")),
          Similarity.HardMaxBlock.toLong, "embed_block"))
        .unionByName(Dedup.capAuditRow(embKeys(planesA), Seq(col("blk")),
          Similarity.HardMaxBlock.toLong, "embed_block_adaptive"))
    }),

    // COMPLETE threshold-Jaccard join via prefix filtering (AllPairs/
    // PPJoin): rarest-first global shingle order, index only each doc's
    // first n − ⌈n/2⌉ + 1 shingles, size-filter candidates, verify
    // exactly. The ORACLE is the brute-force all-pairs join — the gate
    // literally proves the prefix index loses no pair, the property LSH
    // (probabilistic) and df-cutoff (heuristic) cannot offer.
    "dedup_prefix_filter" -> ((s, dir) =>
      Dedup.prefixFilterJaccard(docs(s, dir), col("doc_id"), col("text"))),

    // Dedup-quality evaluation — the recall measurement a banding config
    // is tuned by (bands × rows trade candidate volume for recall, the
    // S-curve): exact 3-shingle Jaccard ≥ 0.5 over a bounded PROBE set
    // (doc_id < 50, probe = smaller pair id) is the ground truth; the
    // production MinHash-LSH pair stream restricted to the probes is the
    // candidate set. Output: three integer counters (true pairs, LSH
    // hits, LSH candidates) — recall and precision are the consumer's
    // quotients, the gate stays engine-exact. Scale shape: the truth is
    // one broadcast probe×corpus pass (the eval runs on a sampled probe
    // set, never all pairs), mirroring sim_ivf_recall's design.
    // SELF-TUNED banding: (bands, rows) derived from the corpus count at
    // plan time (Dedup.adaptiveBanding — rows bound sub-threshold bucket
    // occupancy, bands restore the 0.8-Jaccard catch rate; the fixed
    // config's bucket caps drop to fallback duty). Gated with the same
    // recall attestation as dedup_lsh_recall PLUS the derived (r, b) as
    // output rows, so the oracle pins the derivation formula itself —
    // the DuckDB side re-derives (r, b) from its own COUNT(*) and builds
    // the variable-width signature with list comprehensions.
    "dedup_minhash_adaptive" -> ((s, dir) => {
      import s.implicits._
      val d = docs(s, dir).localCheckpoint()
      val (bands, rows) = Dedup.adaptiveBanding(d.count())
      val sh = d.select(col("doc_id"),
        array_distinct(transform(Text.shingles(col("text"), 3),
          x => phash64(x) % lit(4294967296L))).as("s"))
        .localCheckpoint()
      val probes = sh.filter(col("doc_id") < 50)
        .select(col("doc_id").as("doc_a"), col("s").as("sa"))
      val corpus = sh.select(col("doc_id").as("doc_b"), col("s").as("sb"))
      val inter = size(array_intersect(col("sa"), col("sb"))).cast("double")
      val uni = (size(col("sa")) + size(col("sb"))).cast("double") - inter
      val truth = broadcast(probes).join(corpus, col("doc_a") < col("doc_b"))
        .filter(inter / uni >= 0.5)
        .select(col("doc_a"), col("doc_b"))
        .localCheckpoint()
      val lshPairs = Dedup.minhashLsh(d, col("doc_id"), col("text"),
          shingleN = 3, bands = bands, rowsPerBand = rows)
        .filter(col("doc_a") < 50).select(col("doc_a"), col("doc_b"))
        .localCheckpoint()
      val t2 = truth.join(lshPairs.withColumn("h", lit(1L)),
        Seq("doc_a", "doc_b"), "left_outer")
      t2.agg(count(lit(1)).as("v")).select(lit("n_true").as("metric"), col("v"))
        .unionByName(t2.agg(coalesce(sum(col("h")), lit(0L)).as("v"))
          .select(lit("n_hit").as("metric"), col("v")))
        .unionByName(lshPairs.agg(count(lit(1)).as("v"))
          .select(lit("n_cand").as("metric"), col("v")))
        .unionByName(Seq(("rows_r", rows.toLong), ("bands_b", bands.toLong))
          .toDF("metric", "v"))
    }),

    "dedup_lsh_recall" -> ((s, dir) => {
      val d = docs(s, dir)
      val sh = Dedup.minhashSignatures(d, col("doc_id"), col("text"), 3, 16)
        .select(col("doc_id"), col("s")).localCheckpoint()
      val probes = sh.filter(col("doc_id") < 50)
        .select(col("doc_id").as("doc_a"), col("s").as("sa"))
      val corpus = sh.select(col("doc_id").as("doc_b"), col("s").as("sb"))
      val inter = size(array_intersect(col("sa"), col("sb"))).cast("double")
      val uni = (size(col("sa")) + size(col("sb"))).cast("double") - inter
      val truth = broadcast(probes).join(corpus, col("doc_a") < col("doc_b"))
        .filter(inter / uni >= 0.5)
        .select(col("doc_a"), col("doc_b"))
        .localCheckpoint()
      val lshPairs = Dedup.minhashLsh(d, col("doc_id"), col("text"))
        .filter(col("doc_a") < 50).select(col("doc_a"), col("doc_b"))
        .localCheckpoint()
      val t2 = truth.join(lshPairs.withColumn("h", lit(1L)),
        Seq("doc_a", "doc_b"), "left_outer")
      t2.agg(count(lit(1)).as("v")).select(lit("n_true").as("metric"), col("v"))
        .unionByName(t2.agg(coalesce(sum(col("h")), lit(0L)).as("v"))
          .select(lit("n_hit").as("metric"), col("v")))
        .unionByName(lshPairs.agg(count(lit(1)).as("v"))
          .select(lit("n_cand").as("metric"), col("v")))
    }),

    // Cluster dedup: connected components over the MinHash-LSH pair graph
    // (a~b and b~c collapse to ONE survivor) — iterative min-label
    // propagation to fixpoint; oracle = recursive-CTE closure.
    "dedup_components" -> ((s, dir) =>
      Dedup.nearDupComponents(
        Dedup.minhashLsh(docs(s, dir), col("doc_id"), col("text")))),

    // INCREMENTAL component maintenance — the batch the corpus fixpoint
    // must NOT re-run for: the standing label table (built from the base
    // corpus) absorbs the increment's new pairs by contracting each
    // touched component to its label and running the min-label fixpoint
    // over that contracted graph only (O(increment), never O(corpus));
    // untouched components keep their labels verbatim. The oracle is the
    // FULL recursive fixpoint over base ∪ increment pairs — the gate
    // proves the contraction loses nothing.
    "dedup_components_incr" -> ((s, dir) => {
      val d = docs(s, dir)
      val isIncr = col("doc_id") % 5 === 0
      val standing = Dedup.componentLabels(
        Dedup.minhashLsh(d.filter(!isIncr), col("doc_id"), col("text")))
      val incrPairs = Dedup.minhashLshIncremental(d, col("doc_id"),
        col("text"), incrPred = isIncr)
      Dedup.componentsIncremental(standing, incrPairs)
        .groupBy(col("label").as("cluster"))
        .agg(count(lit(1)).as("n_members"), min(col("doc_id")).as("keep_id"))
    }),

    // Embedding-cosine near-dup over documents: each document joined to
    // its embedding vector (doc_id = vec_id), quantized cosine at
    // threshold 0.4 with the random-hyperplane LSH bucket as the blocking
    // key — the scale-true candidate generator (an equi-join on a derived
    // bucket id, like sim_ann_lsh), not a data label that could be absent
    // or degenerate at corpus scale. Then connected components pick ONE
    // survivor per near-dup cluster, carrying its language.
    "dedup_embed_cosine" -> ((s, dir) => embedCosineClusters(s, dir)),

    // SELF-TUNED embedding near-dup: the hyperplane count is derived from
    // the corpus count at plan time (planes = min p with 2^p ≥ ⌈n/16⌉,
    // floor 4) so expected bucket occupancy — and with it candidate-pair
    // volume per row — stays constant as the corpus grows. This turns the
    // occupancy counter-measure SCALE_r12.md measured BY HAND at 10×
    // (planes 8 → 12 cut the scaled wall-clock 1.8×) into something the
    // engine does itself: sf0.01 resolves to 5 planes, the 10× corpus to
    // 12, with zero config. The oracle derives the identical plane count
    // from its own COUNT(*) (integer min-power-of-two scan, no float
    // log2), so the gate proves the formula end to end.
    "dedup_embed_adaptive" -> ((s, dir) => {
      val d = docs(s, dir)
      // Lineage cut: the stats count AND the bucket/pair passes reuse one
      // materialized join — without it the count job and the main query
      // each scan and join both tables.
      val joined = d.join(Tables.load(s, dir, "embeddings"),
        d("doc_id") === col("vec_id")).localCheckpoint()
      // One count job at plan time — the stats read a production run gets
      // from catalog statistics instead of a scan.
      val planes = Similarity.adaptivePlanes(joined.count())
      val withBucket = joined.withColumn("bucket",
        Similarity.lshBucketCol(Similarity.quantize(col("embedding")),
          numPlanes = planes))
      val pairs = Similarity.thresholdPairs(withBucket,
          d("doc_id"), col("embedding"), col("bucket"), threshold = 0.4)
        .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"))
      Dedup.nearDupComponents(pairs)
        .select(lit(planes.toLong).as("planes"), col("cluster"),
          col("n_members"), col("keep_id"))
    })
  )

  /** `dedup_embed_cosine`'s dataflow with the LSH hyperplane count
    * exposed: the occupancy knob a growing corpus turns. Candidate pairs
    * inside a bucket grow quadratically with occupancy, so bucket bits
    * must grow ~log2 with the corpus to hold expected occupancy — and
    * therefore pair volume — constant per row ([[graft.tools.ScaleSmoke]]
    * measures exactly this at 10x; SCALE_r12.md records it).
    */
  def embedCosineClusters(s: SparkSession, dir: String,
      numPlanes: Int = 8): DataFrame = {
    val d = docs(s, dir)
    val joined = d.join(Tables.load(s, dir, "embeddings"),
        d("doc_id") === col("vec_id"))
      .withColumn("bucket",
        Similarity.lshBucketCol(Similarity.quantize(col("embedding")),
          numPlanes = numPlanes))
    val pairs = Similarity.thresholdPairs(joined,
        d("doc_id"), col("embedding"), col("bucket"), threshold = 0.4)
      .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"))
    Dedup.nearDupComponents(pairs)
      .join(d.select(col("doc_id"), col("lang")), col("keep_id") === col("doc_id"))
      .select(col("cluster"), col("n_members"), col("keep_id"),
        col("lang").as("keep_lang"))
  }

  /** Bloom-filter size in bits (2^14 — deliberately small so the sf0.01
    * corpus exercises the false-positive path) and the k = 3 affine
    * position derivations (odd multiplier, offset) applied to the 32-bit
    * shingle hash. Products stay below 2^52 — exact in any engine's
    * 64-bit integer arithmetic.
    */
  private[operators] val BloomBits = 16384L
  private[operators] val BloomSalts: Seq[(Long, Long)] =
    Seq((769L, 7L), (12289L, 99991L), (786433L, 524287L))

  /** Count-Min dimensions. The synthetic corpus draws from a ~31-term
    * vocabulary, so the width is set BELOW the collision-free point
    * (w = 64 would be collision-free only if all 3 rows separated all 31
    * terms — they don't) to make the sketch's one-sided error actually
    * appear in the output; production sizing is w = ⌈e/ε⌉, d = ⌈ln 1/δ⌉.
    */
  private[operators] val CmsDepth = 3
  private[operators] val CmsWidth = 64L

  /** (term, n) → the term's d Count-Min cells: (term, n, j, pos). */
  private[graft] def cmsHashed(counts: DataFrame): DataFrame =
    counts.select(col("term"), col("n"),
      explode(array((0 until CmsDepth).map(j => struct(lit(j).as("j"),
        pmod(phash64(concat(col("term"), lit(s":cms$j"))),
          lit(CmsWidth)).as("pos"))): _*)).as("h"))
      .select(col("term"), col("n"), col("h.j").as("j"), col("h.pos").as("pos"))

  /** The counter table (j, pos, c) — a plain SUM aggregate, which is the
    * point: CMS counters merge like any partial aggregate (CMS(A ∪ B) =
    * CMS(A) + CMS(B) cell-wise), so the sketch builds map-side at any
    * scale and unions across corpora without a rescan. Mergeability is
    * golden-pinned in TextDedupSpec.
    */
  private[graft] def cmsCounters(hashed: DataFrame): DataFrame =
    hashed.groupBy(col("j"), col("pos")).agg(sum(col("n")).as("c"))

  // ---- oracle SQL builders -------------------------------------------------

  /** DuckDB list of the k Bloom positions of hash expression `h`. */
  private def bloomPosSql(h: String): String =
    BloomSalts.map { case (a, b) => s"($h * $a + $b) % $BloomBits" }
      .mkString("[", ", ", "]")

  /** DuckDB list of distinct word n-gram shingles of `text`. */
  private def shingleSql(n: Int): String =
    s"""list_distinct([array_to_string(t[i:i+${n - 1}], ' ')
        for i in generate_series(1, len(t) - ${n - 1})])"""

  private val toks = "string_split(text, ' ')"

  // --- edit-distance blocking geometry -------------------------------------
  // Shared by `dedup_edit_distance` and `dedup_cap_audit` (and their
  // oracles), so the audited buckets are BY CONSTRUCTION the buckets the
  // query caps — the no-silent-caps counters cannot drift from the cap.
  private[operators] val EditK = 5
  private[operators] val EditW = 64
  private[operators] val EditNseg = EditK + 1
  private[operators] val EditMaxSegBucket = 500

  /** Hard abandonment bound for the salt tier: distinct-key buckets up to
    * this size process completely in ⌈n/EditMaxSegBucket⌉ bounded join
    * slices; past it they drop and `dedup_cap_audit` reports the mass.
    * Sizing: a bucket's candidate work is ≤ HardCap² ≈ 4×10⁸ id-pairs →
    * distinct → 64²-cell levenshteins, split across HardCap/Max = 40
    * slices of ≤ Max·HardCap = 10M candidates each — tens of seconds per
    * slice on one core, embarrassingly parallel across slices. The 100×
    * corpus' worst genuine low-entropy opening (the `customer_x` shared
    * segment, 14,652 distinct keys after the replica collapse) sits
    * UNDER this bound, so the whole measured corpus processes exactly;
    * a corpus whose openings degenerate past 20k keys trips the audit
    * instead of an O(B²) surprise.
    */
  private[operators] val EditHardSegBucket = 20000
  private[operators] val EditBnd: IndexedSeq[Int] =
    (0 to EditNseg).map(i => i * EditW / EditNseg) // 0,10,21,32,42,53,64

  /** (i, start0, len) of the k+1 disjoint segments. */
  private[operators] val EditSegs: Seq[(Int, Int, Int)] =
    (0 until EditNseg).map(i => (i, EditBnd(i), EditBnd(i + 1) - EditBnd(i)))

  /** (i, start0, len) of the multi-match-aware position windows (Li §4):
    * segment i may shift by at most min(i, k−i) — 18 windows total.
    */
  private[operators] val EditWins: Seq[(Int, Int, Int)] = for {
    i <- 0 until EditNseg
    w = math.min(i, EditK - i)
    d <- -w to w
    p = EditBnd(i) + d
    if p >= 0 && p + (EditBnd(i + 1) - EditBnd(i)) <= EditW
  } yield (i, p, EditBnd(i + 1) - EditBnd(i))

  /** The normalized fixed-width join key (64-char '~'-padded prefix). */
  private def editBase(d: DataFrame): DataFrame =
    d.select(col("doc_id"), rpad(substring(col("text"), 1, EditW), EditW, "~").as("s"))

  /** Piece rows preserve every input column (the edit-distance dataflow
    * rides the key string + histogram through the candidate join; the
    * audits just group on (i, g) and ignore the extras).
    */
  private def editPieceRows(base: DataFrame,
      pieces: Seq[(Int, Int, Int)]): DataFrame = {
    val cols = pieces.map { case (i, p, len) =>
      struct(lit(i).as("i"), substring(col("s"), p + 1, len).as("g"))
    }
    base.select(col("*"), explode(array(cols: _*)).as("x"))
      .select(base.columns.map(col) :+ col("x.i").as("i") :+ col("x.g").as("g"): _*)
  }

  /** A-side segment rows (doc_id, i, g). */
  private def editSegRows(base: DataFrame): DataFrame =
    editPieceRows(base, EditSegs)

  /** B-side windowed-substring rows (doc_id, i, g). */
  private def editWinRows(base: DataFrame): DataFrame =
    editPieceRows(base, EditWins)

  /** Distinct normalized keys of [[editBase]] rows — the replica
    * pre-collapse (rep = min doc_id carries the key through blocking;
    * n_mem drives the dist-0 within-key expansion). Shared by
    * `dedup_edit_distance` and `dedup_cap_audit` so the audited buckets
    * are BY CONSTRUCTION the buckets the query blocks on.
    */
  private[operators] def editKeys(base: DataFrame): DataFrame =
    base.groupBy(col("s"))
      .agg(min(col("doc_id")).as("key_id"), count(lit(1)).as("n_mem"))

  /** Candidate key pairs through the salt-split tier: seg-side buckets
    * chunk into ⌈bucket/maxSegBucket⌉ hash slices, win-side rows
    * replicate per slice (complete — every (a, b) in a surviving bucket
    * meets in exactly one slice), buckets past `hardSegBucket` on
    * EITHER side drop (audited). Inputs carry each key's string (`ks`)
    * and histogram (`h`); the output row holds both sides' payloads so
    * the caller verifies INSIDE the join stage — no post-join shuffle
    * ever sees an unverified candidate.
    */
  private def editSaltedCandidates(segRows: DataFrame, winRows: DataFrame,
      maxSegBucket: Int, hardSegBucket: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("i"), col("g"))
    val aB = segRows
      .withColumn("bn", count(lit(1)).over(w))
      .filter(col("bn") <= hardSegBucket)
      .withColumn("m", floor((col("bn") + lit(maxSegBucket - 1))
        / lit(maxSegBucket)).cast("long"))
    val mTab = aB.groupBy(col("i"), col("g")).agg(max(col("m")).as("m"))
    val aS = aB.select(col("doc_id").as("key_a"), col("i"), col("g"),
      col("s").as("sa"), col("h").as("ha"),
      pmod(xxhash64(col("doc_id")), col("m")).as("chunk"))
    val bS = winRows
      .withColumn("bn", count(lit(1)).over(w))
      .filter(col("bn") <= hardSegBucket)
      .drop("bn")
      .join(mTab, Seq("i", "g")) // inner: a win row with no seg partner is dead anyway
      .select(col("doc_id").as("key_b"), col("i"), col("g"),
        col("s").as("sb"), col("h").as("hb"),
        explode(sequence(lit(0L), col("m") - 1)).as("chunk"))
    aS.join(bS, Seq("i", "g", "chunk"))
      .filter(col("key_a") < col("key_b"))
      .select("key_a", "key_b", "sa", "sb", "ha", "hb")
  }

  /** `dedup_edit_distance`'s full dataflow with the two cap tiers
    * exposed (ScaleGuardSpec drives the salt and hard tiers on
    * adversarial corpora the sf gates cannot reach): replica
    * pre-collapse → salted pigeonhole blocking over distinct keys →
    * exact levenshtein ≤ k on candidate key pairs → membership
    * expansion back to doc pairs (within-key members are dist-0 pairs
    * by definition).
    */
  /** 16-bucket character histogram of the normalized key — the cheap
    * pre-verification filter: one edit operation changes at most one
    * character count on each string, so L1(hist_a, hist_b) ≤ 2·ed(a, b)
    * and candidates with L1 > 2k can be rejected for ~100 integer ops
    * instead of a 64²-cell levenshtein (PropertySpec fuzzes the bound).
    * On the 100× `customer_x` bucket this kills the digit-suffix cross
    * mass — replicas r vs r′ differ in ~6 suffix digits → L1 ≈ 24 —
    * leaving levenshtein only the few anagram-suffix survivors.
    */
  private def editHist(s: Column): Column =
    transform(sequence(lit(0), lit(15)), b =>
      aggregate(
        transform(split(s, ""), c => when(pmod(ascii(c), lit(16)) === b, 1)
          .otherwise(0)),
        lit(0), (acc, x) => acc + x))

  private[graft] def editDistancePairs(d: DataFrame,
      maxSegBucket: Int = EditMaxSegBucket,
      hardSegBucket: Int = EditHardSegBucket): DataFrame = {
    val base = editBase(d)
      .localCheckpoint() // one scan feeds the collapse + the expansion
    val keys = editKeys(base).localCheckpoint()
    val kbase = keys.select(col("key_id").as("doc_id"), col("s"))
    // candidate pieces CARRY the key string + its histogram so the
    // verification runs inside the join stage — the L1 reject and the
    // levenshtein both happen before any post-join shuffle; the old
    // shape shuffled the full candidate set twice to re-attach keys
    val kcarry = kbase.withColumn("h", editHist(col("s"))).localCheckpoint()
    val verified = editSaltedCandidates(
      editSegRows(kcarry), editWinRows(kcarry), maxSegBucket, hardSegBucket)
      .filter(aggregate(zip_with(col("ha"), col("hb"),
        (x, y) => abs(x - y)), lit(0), (acc, x) => acc + x) <= 2 * EditK)
      .withColumn("dist", levenshtein(col("sa"), col("sb")).cast("long"))
      .filter(col("dist") <= EditK)
      .select(col("key_a"), col("key_b"), col("dist"))
      .distinct()
    val within = keys.filter(col("n_mem") >= 2)
      .select(col("key_id").as("key_a"), col("key_id").as("key_b"),
        lit(0L).as("dist"))
    val members = base.join(keys.select(col("s"), col("key_id")), Seq("s"))
      .select(col("key_id"), col("doc_id"))
    verified.unionByName(within)
      .join(members.select(col("key_id").as("key_a"), col("doc_id").as("ia")), Seq("key_a"))
      .join(members.select(col("key_id").as("key_b"), col("doc_id").as("ib")), Seq("key_b"))
      .filter(col("key_a") =!= col("key_b") || col("ia") < col("ib"))
      .select(least(col("ia"), col("ib")).as("doc_a"),
        greatest(col("ia"), col("ib")).as("doc_b"), col("dist"))
  }

  /** The edit-side cap-audit constructions with the collapse applied —
    * exposed for ScaleGuardSpec's firing-path assertions.
    */
  private[graft] def editSegAudit(d: DataFrame, hardSegBucket: Int): DataFrame =
    Dedup.capAuditRow(
      editSegRows(editKeys(editBase(d)).select(col("key_id").as("doc_id"), col("s"))),
      Seq(col("i"), col("g")), hardSegBucket, "edit_seg")

  /** `(VALUES ...) AS alias(i, st, ln)` for a piece list — the oracle's
    * mirror of [[editPieceRows]].
    */
  private def piecesValuesSql(pieces: Seq[(Int, Int, Int)], alias: String): String =
    pieces.map { case (i, st, ln) => s"($i,$st,$ln)" }
      .mkString("(VALUES ", ",", s") AS $alias(i, st, ln)")

  /** Bigram-LM CTEs (mirror of [[lmScores]]): same smoothing arithmetic
    * and parenthesization as the Spark plan; the per-doc aggregate is
    * detSum6 (round 6dp → DECIMAL(28,6) sum).
    */
  private val lmCtes =
    """tk AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
       bg AS (SELECT doc_id,
           unnest(list_transform(generate_series(1, len(t) - 1),
             i -> [t[i], t[i + 1]])) AS b
         FROM tk WHERE len(t) >= 2),
       b AS (SELECT doc_id, b[1] AS w1, b[2] AS w2 FROM bg),
       cb AS (SELECT w1, w2, COUNT(*) AS cb FROM b GROUP BY 1, 2),
       cu AS (SELECT w1, SUM(cb) AS cu FROM cb GROUP BY 1),
       vv AS (SELECT COUNT(DISTINCT w1) AS v FROM cb),
       lmscore AS (
         SELECT b.doc_id, COUNT(*) AS n_bigrams,
           CAST(SUM(CAST(ROUND(-ln(CAST(cb.cb + 1 AS DOUBLE)
             / CAST(cu.cu + vv.v AS DOUBLE)), 6) AS DECIMAL(28,6))) AS DOUBLE) AS nll
         FROM b
         JOIN cb ON b.w1 = cb.w1 AND b.w2 = cb.w2
         JOIN cu ON b.w1 = cu.w1, vv
         GROUP BY 1)"""

  /** BM25 CTE chain ending in `lexall(doc_id, bm25)` — shared by the
    * `text_bm25` oracle and the hybrid-RRF fusion oracle.
    */
  private lazy val bm25Ctes: String = bm25CtesOver("documents")

  /** The BM25 CTE chain over an arbitrary (doc_id, text) relation —
    * shared by the corpus query and the CDC-maintained index's
    * folded-state rebuild oracle.
    */
  private def bm25CtesOver(src: String): String =
    s"""d AS (SELECT doc_id, $toks AS tk FROM $src),
        dl AS (SELECT doc_id, CAST(len(tk) AS DOUBLE) AS dl FROM d),
        stats AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs, AVG(dl) AS avgdl FROM dl),
        tf AS (
          SELECT doc_id, term, CAST(COUNT(*) AS DOUBLE) AS tf
          FROM (SELECT doc_id, unnest(tk) AS term FROM d)
          WHERE term IN ('spark','join','window','stream')
          GROUP BY 1, 2),
        dfreq AS (SELECT term, CAST(COUNT(*) AS DOUBLE) AS df FROM tf GROUP BY 1),
        lexall AS (
          SELECT doc_id, CAST(SUM(CAST(ROUND(
              ln(((n_docs - df) + 0.5) / (df + 0.5) + 1.0) *
              ((tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * (dl / avgdl)))), 6)
            AS DECIMAL(28,6))) AS DOUBLE) AS bm25
          FROM tf
          JOIN dfreq USING (term)
          JOIN dl USING (doc_id)
          CROSS JOIN stats
          GROUP BY doc_id)"""

  /** Marker occurrence count via the replace-length trick (see Text.occurrences). */
  private def occSql(m: String): String = {
    val e = m.replace("'", "''")
    s"CAST((length(' ' || text || ' ') - length(replace(' ' || text || ' ', '$e', ''))) / ${m.length} AS BIGINT)"
  }

  private def langScoreSql(lang: String): String =
    Text.langMarkers.toMap.apply(lang).map(occSql).mkString("(", " + ", ")")

  /** SimHash signature + band-bucket CTE chain ending in
    * `${pfx}banded(doc_id, simhash, band, bkt)` — shared by the
    * `dedup_simhash` oracle and the cap audit (`pfx` namespaces it
    * alongside the minhash chain in one query).
    */
  private def simhashBandedCtes(pfx: String = ""): String =
    s"""${pfx}sh AS (SELECT doc_id, unnest(s) AS shingle
          FROM (SELECT doc_id, ${shingleSql(3)} AS s
                FROM (SELECT doc_id, $toks AS t FROM documents))),
        ${pfx}hb AS (SELECT doc_id, ${phash64Sql("shingle")} AS h FROM ${pfx}sh),
        ${pfx}bits AS (
          SELECT doc_id, bit,
            SUM(CASE WHEN (h >> bit) % 2 = 1 THEN 1 ELSE -1 END) AS v
          FROM ${pfx}hb, (SELECT unnest(generate_series(0, ${Dedup.SimhashBits - 1})) AS bit)
          GROUP BY 1, 2),
        ${pfx}sig AS (
          SELECT doc_id,
            SUM(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << bit) ELSE CAST(0 AS BIGINT) END) AS simhash
          FROM ${pfx}bits GROUP BY 1),
        ${pfx}banded AS (
          SELECT doc_id, simhash, band,
            (simhash >> (band * ${Dedup.SimhashBandBits})) % ${1 << Dedup.SimhashBandBits} AS bkt
          FROM ${pfx}sig, (SELECT unnest(generate_series(0, ${Dedup.SimhashBands - 1})) AS band))"""

  /** Distinct 32-bit-hashed shingle set (mirrors minhashSignatures' `s`). */
  private def hashedShingleSql(n: Int, mod: String = " % 4294967296"): String =
    s"list_distinct([${phash64Sql("x")}$mod for x in ${shingleSql(n)}])"

  private val minhashExprs: Seq[String] =
    (0 until 16).map { j =>
      val (a, b) = Dedup.perm(j)
      s"list_min([($a * x + $b) % ${Dedup.MinhashPrime} for x in s]) AS mh_$j"
    }

  private def bandSigSql(band: Int): String =
    (0 until 4).map(r => s"CAST(mh_${band * 4 + r} AS VARCHAR)").mkString(" || '_' || ")

  /** MinHash-LSH candidate/verify CTE chain ending in `${pfx}j(doc_a,
    * doc_b, jaccard)` — shared by the pair query and the cluster-dedup
    * closure. `pfx` namespaces the chain so two independently-banded pair
    * tables (e.g. base-corpus-only vs full) coexist in one oracle query.
    */
  private[operators] def minhashPairCtes(src: String = "documents", pfx: String = ""): String =
    s"""${pfx}base AS (SELECT doc_id, ${hashedShingleSql(3)} AS s
          FROM (SELECT doc_id, $toks AS t, text FROM $src)),
        ${pfx}sig AS (SELECT doc_id, s, ${minhashExprs.mkString(", ")} FROM ${pfx}base),
        ${pfx}banded AS (
          SELECT doc_id, band,
            CASE band ${(0 until 4).map(b => s"WHEN $b THEN ${bandSigSql(b)}").mkString(" ")} END AS bsig
          FROM ${pfx}sig, (SELECT unnest(generate_series(0, 3)) AS band)),
        ${pfx}bounded AS (
          SELECT * FROM (
            SELECT doc_id, band, bsig, COUNT(*) OVER (PARTITION BY band, bsig) AS bkt_n
            FROM ${pfx}banded) WHERE bkt_n <= ${Dedup.MaxBandBucket}),
        ${pfx}pairs AS (
          SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
          FROM ${pfx}bounded a JOIN ${pfx}bounded b ON a.band = b.band AND a.bsig = b.bsig AND a.doc_id < b.doc_id),
        ${pfx}j AS (
          SELECT doc_a, doc_b,
            CAST(len(list_intersect(sa.s, sb.s)) AS DOUBLE) /
              (CAST(len(sa.s) + len(sb.s) AS DOUBLE) - CAST(len(list_intersect(sa.s, sb.s)) AS DOUBLE)) AS jaccard
          FROM ${pfx}pairs JOIN ${pfx}sig sa ON sa.doc_id = ${pfx}pairs.doc_a JOIN ${pfx}sig sb ON sb.doc_id = ${pfx}pairs.doc_b)"""

  /** BPE train-loop CTE chain mirroring `text_bpe_apply`: v0 = the
    * vocabulary in unit form (chars + '|' terminators, space-joined,
    * leading space), then per round the weighted pair counts (p), the
    * 1-row argmax merge (m), and the merged vocabulary (v) — the same
    * staged-iteration idiom as [[VectorOps.kmeansCtes]].
    */
  private def bpeCtes(iters: Int): String = {
    val v0 =
      s"""v0 AS (
            SELECT w, n,
              ' ' || array_to_string([substring(w, i, 1) || '|'
                for i in generate_series(1, length(w))], ' ') AS seq
            FROM (SELECT w, COUNT(*) AS n
                  FROM (SELECT unnest($toks) AS w FROM documents) GROUP BY 1))"""
    val steps = (1 to iters).map { t =>
      s"""p$t AS (
            SELECT pr.l AS l, pr.r AS r, CAST(SUM(n) AS BIGINT) AS c FROM (
              SELECT n, unnest([{'l': u[i], 'r': u[i+1]}
                for i in generate_series(1, len(u) - 1)]) AS pr
              FROM (SELECT n, string_split(trim(seq), ' ') AS u FROM v${t - 1}))
            GROUP BY 1, 2),
          m$t AS (SELECT l, r, c FROM p$t ORDER BY c DESC, l, r LIMIT 1),
          v$t AS (
            -- LEFT JOIN ON TRUE + coalesce: an exhausted pair table must
            -- pass the vocabulary through, not empty it (Spark mirrors
            -- with its top.nonEmpty guard)
            SELECT w, n, coalesce(replace(seq, ' ' || m.l || ' ' || m.r,
              ' ' || left(m.l, length(m.l) - 1) || m.r), seq) AS seq
            FROM v${t - 1} LEFT JOIN m$t m ON TRUE)"""
    }
    (v0 +: steps).mkString(", ")
  }

  def oracles: Map[String, String] = Map(
    "text_stats" ->
      s"""SELECT doc_id,
          CAST(len($toks) AS BIGINT) AS n_tokens,
          CAST(length(replace(text, ' ', '')) AS BIGINT) AS n_chars_nospace,
          CAST(length(replace(text, ' ', '')) AS DOUBLE) / CAST(len($toks) AS DOUBLE) AS avg_word_len,
          CAST(len(list_distinct($toks)) AS DOUBLE) / CAST(len($toks) AS DOUBLE) AS distinct_ratio
          FROM documents""",

    "text_langid" -> {
      val langs = Text.langMarkers.map(_._1)
      val scoreCols = langs.map(l => s"${langScoreSql(l)} AS s_$l").mkString(", ")
      val best = langs.map(l => s"s_$l").mkString("greatest(", ", ", ")")
      val cases = langs.map(l => s"WHEN best > 0 AND s_$l = best THEN '$l'").mkString(" ")
      s"""WITH scored AS (SELECT lang, $scoreCols FROM documents),
          b AS (SELECT lang, $best AS best, * FROM scored)
          SELECT lang, CASE $cases ELSE 'und' END AS lang_pred, COUNT(*) AS n
          FROM b GROUP BY 1, 2"""
    },

    "text_quality" ->
      s"""SELECT doc_id, quality FROM (
            SELECT doc_id,
              0.4 * least((CAST(length(replace(text, ' ', '')) AS DOUBLE) / CAST(len($toks) AS DOUBLE)) / 8.0, 1.0)
            + 0.3 * (CAST(len(list_distinct($toks)) AS DOUBLE) / CAST(len($toks) AS DOUBLE))
            + 0.3 * least(CAST(len($toks) AS DOUBLE) / 100.0, 1.0) AS quality
            FROM documents)
          WHERE quality >= 0.5""",

    "text_gopher_quality" -> {
      val stops = Text.gopherStops.map(w => s"'$w'").mkString("[", ", ", "]")
      s"""SELECT doc_id, n_words, mean_word_len, n_stops, alpha_frac,
            (n_words BETWEEN 50 AND 100000)
              AND (mean_word_len BETWEEN 3 AND 10)
              AND (n_stops >= 2) AND (alpha_frac > 0.8) AS keep
          FROM (
            SELECT doc_id,
              CAST(len($toks) AS BIGINT) AS n_words,
              CAST(length(replace(text, ' ', '')) AS DOUBLE)
                / CAST(len($toks) AS DOUBLE) AS mean_word_len,
              CAST(len(list_intersect(list_distinct($toks), $stops)) AS BIGINT) AS n_stops,
              CAST(len(list_filter($toks, w -> regexp_matches(w, '[a-z]'))) AS DOUBLE)
                / CAST(len($toks) AS DOUBLE) AS alpha_frac
            FROM documents)"""
    },

    "text_fingerprint" ->
      "SELECT doc_id, md5(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS fp FROM documents",

    "text_top_terms" ->
      s"""SELECT term, COUNT(*) AS n
          FROM (SELECT unnest($toks) AS term FROM documents)
          GROUP BY 1 ORDER BY n DESC, term LIMIT 20""",

    "text_dup_spans" ->
      s"""WITH tk AS (SELECT doc_id, $toks AS t FROM documents),
          g AS (
            SELECT doc_id,
              unnest([array_to_string(t[i:i+7], ' ')
                      for i in generate_series(1, len(t) - 7)]) AS gram
            FROM tk WHERE len(t) >= 8),
          counts AS (SELECT gram, COUNT(*) AS c FROM g GROUP BY 1)
          SELECT doc_id, COUNT(*) AS n_spans,
            CAST(SUM(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_spans,
            COUNT(DISTINCT CASE WHEN c > 1 THEN gram END) AS n_dup_grams
          FROM g JOIN counts USING (gram)
          GROUP BY doc_id""",

    "text_block_dedup" ->
      s"""WITH tk AS (SELECT doc_id, $toks AS t FROM documents),
          b AS (
            SELECT doc_id, u.pos AS pos,
              array_to_string(u.blk, ' ') AS blk,
              CAST(len(u.blk) AS BIGINT) AS blk_len
            FROM (
              SELECT doc_id,
                unnest([{'pos': CAST(i AS BIGINT),
                         'blk': t[(i-1)*16+1 : i*16]}
                        for i in generate_series(1,
                          CAST(ceil(len(t) / 16.0) AS BIGINT))]) AS u
              FROM tk)),
          counts AS (
            SELECT blk, COUNT(*) AS c,
              MIN(ROW(doc_id, pos)) AS mk
            FROM b GROUP BY 1),
          k AS (
            SELECT b.*, (c = 1 OR ROW(doc_id, pos) = mk) AS keep
            FROM b JOIN counts USING (blk))
          SELECT doc_id, COUNT(*) AS n_blocks,
            CAST(SUM(CASE WHEN keep THEN 0 ELSE 1 END) AS BIGINT) AS n_removed,
            CAST(SUM(CASE WHEN keep THEN blk_len ELSE 0 END) AS BIGINT) AS n_kept_tokens,
            md5(COALESCE(string_agg(CASE WHEN keep THEN blk END, ' '
              ORDER BY pos), '')) AS kept_fp
          FROM k GROUP BY doc_id""",

    "text_boilerplate" ->
      s"""WITH tk AS (SELECT doc_id, $toks AS t FROM documents),
          b AS (
            SELECT doc_id, u.pos AS pos,
              array_to_string(u.blk, ' ') AS blk,
              CAST(len(u.blk) AS BIGINT) AS blk_len
            FROM (
              SELECT doc_id,
                unnest([{'pos': CAST(i AS BIGINT),
                         'blk': t[(i-1)*8+1 : i*8]}
                        for i in generate_series(1,
                          CAST(ceil(len(t) / 8.0) AS BIGINT))]) AS u
              FROM tk)),
          dfreq AS (
            SELECT blk, COUNT(DISTINCT doc_id) AS df FROM b GROUP BY 1),
          k AS (
            SELECT b.*, (df < 3) AS keep
            FROM b JOIN dfreq USING (blk))
          SELECT doc_id, COUNT(*) AS n_blocks,
            CAST(SUM(CASE WHEN keep THEN 0 ELSE 1 END) AS BIGINT) AS n_boiler,
            CAST(SUM(CASE WHEN keep THEN blk_len ELSE 0 END) AS BIGINT) AS n_kept_tokens,
            md5(COALESCE(string_agg(CASE WHEN keep THEN blk END, ' '
              ORDER BY pos), '')) AS kept_fp
          FROM k GROUP BY doc_id""",

    "text_len_histogram" ->
      s"""WITH h AS (
            SELECT CAST(floor(n / 16.0) AS BIGINT) AS bucket,
              COUNT(*) AS n_docs, CAST(SUM(n) AS BIGINT) AS total_tokens,
              MIN(n) AS min_tokens, MAX(n) AS max_tokens
            FROM (SELECT CAST(len($toks) AS BIGINT) AS n FROM documents)
            GROUP BY 1)
          SELECT bucket, n_docs, total_tokens, min_tokens, max_tokens,
            CAST(SUM(total_tokens) OVER (ORDER BY bucket) AS BIGINT) AS cum_tokens
          FROM h""",

    "text_keywords" ->
      s"""WITH tf AS (
            SELECT doc_id, term, COUNT(*) AS tf
            FROM (SELECT doc_id, unnest($toks) AS term FROM documents)
            GROUP BY 1, 2),
          dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
          n AS (SELECT COUNT(*) AS n_docs FROM documents)
          SELECT doc_id, rank, term, tf, df FROM (
            SELECT tf.doc_id, tf.term, tf.tf, dfreq.df,
              ROW_NUMBER() OVER (PARTITION BY tf.doc_id
                ORDER BY tf.tf DESC, dfreq.df ASC, tf.term) AS rank
            FROM tf JOIN dfreq USING (term), n
            WHERE dfreq.df * 2 <= n.n_docs)
          WHERE rank <= 3""",

    "pipe_enrich" ->
      s"""WITH ${VectorOps.prepCte}, ${VectorOps.kmeansCtes(2)},
          assigned AS (
            SELECT vec_id, centroid_id FROM (
              SELECT p.vec_id, c.centroid_id,
                ROW_NUMBER() OVER (PARTITION BY p.vec_id
                  ORDER BY ${VectorOps.simSql("p.v", "p.nrm", "c.cv", "c.cn")} DESC,
                    c.centroid_id) AS rn
              FROM prep p, cents2 c) WHERE rn = 1),
          gated AS (
            SELECT doc_id,
              CASE WHEN ${phash64Sql("CAST(doc_id AS VARCHAR) || ':split'")} % 100 < 80
                     THEN 'train'
                   WHEN ${phash64Sql("CAST(doc_id AS VARCHAR) || ':split'")} % 100 < 90
                     THEN 'val'
                   ELSE 'test' END AS split,
              CAST(len($toks) AS BIGINT) AS n_tokens
            FROM documents
            WHERE 0.4 * least((CAST(length(replace(text, ' ', '')) AS DOUBLE)
                    / CAST(len($toks) AS DOUBLE)) / 8.0, 1.0)
                + 0.3 * (CAST(len(list_distinct($toks)) AS DOUBLE)
                    / CAST(len($toks) AS DOUBLE))
                + 0.3 * least(CAST(len($toks) AS DOUBLE) / 100.0, 1.0) >= 0.5)
          SELECT split, centroid_id, COUNT(*) AS n_docs,
            CAST(SUM(n_tokens) AS BIGINT) AS tok_sum, MIN(doc_id) AS min_doc
          FROM gated JOIN assigned ON gated.doc_id = assigned.vec_id
          GROUP BY 1, 2""",

    // Mirrors the Spark plan operation-for-operation: n/avgdl are exact
    // (integer-valued doubles sum exactly in any order), idf/weight use
    // the identical parenthesization, and the per-doc sum is the
    // Portable.detSum6 decimal aggregate.
    "text_bm25" -> s"WITH $bm25Ctes SELECT * FROM lexall",

    // Index REBUILT from the folded final state — what the maintained
    // postings + length artifacts must be indistinguishable from.
    "cdc_bm25_sync" ->
      s"""WITH fold AS (
            SELECT doc_id,
              CASE WHEN doc_id % 7 = 0 THEN text || ' v2' ELSE text END AS text
            FROM documents WHERE doc_id % 11 <> 0),
          ${bm25CtesOver("fold")}
          SELECT * FROM lexall""",

    // Same smoothing arithmetic and parenthesization as the Spark plan;
    // the per-doc aggregate is detSum6 (round 6dp → DECIMAL(28,6) sum).
    "text_lm_score" ->
      s"WITH $lmCtes SELECT doc_id, n_bigrams, nll FROM lmscore",

    "text_ccnet_bucket" ->
      s"""WITH $lmCtes
          SELECT s.doc_id, d.lang,
            NTILE(3) OVER (PARTITION BY d.lang
              ORDER BY s.nll / CAST(s.n_bigrams AS DOUBLE), s.doc_id) AS bucket
          FROM lmscore s JOIN documents d ON s.doc_id = d.doc_id""",

    "pipe_two_stage" ->
      s"""WITH $bm25Ctes,
          prep AS (
            SELECT vec_id,
              [CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT) for x in embedding] AS v
            FROM embeddings),
          pn AS (SELECT vec_id, v, list_sum([y*y for y in v]) AS nrm FROM prep),
          q0 AS (SELECT v AS qv, nrm AS qn FROM pn WHERE vec_id = 0),
          cand AS (
            SELECT doc_id, bm25,
              CAST(ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id) AS BIGINT) AS r_lex
            FROM lexall QUALIFY r_lex <= 50),
          scored AS (
            SELECT c.doc_id, c.r_lex, c.bm25,
              CAST(list_sum([p.v[i] * q0.qv[i]
                FOR i IN generate_series(1, len(p.v))]) AS DOUBLE)
                / sqrt(CAST(p.nrm * q0.qn AS DOUBLE)) AS sim
            FROM cand c JOIN pn p ON p.vec_id = c.doc_id, q0)
          SELECT doc_id, r_lex, bm25, sim,
            CAST(ROW_NUMBER() OVER (ORDER BY sim DESC, doc_id) AS BIGINT) AS r_final
          FROM scored QUALIFY r_final <= 10""",

    "pipe_hybrid_rrf" ->
      s"""WITH $bm25Ctes,
          prep AS (
            SELECT vec_id,
              [CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT) for x in embedding] AS v
            FROM embeddings),
          pn AS (SELECT vec_id, v, list_sum([y*y for y in v]) AS nrm FROM prep),
          q0 AS (SELECT v AS qv, nrm AS qn FROM pn WHERE vec_id = 0),
          vsim AS (
            SELECT vec_id AS doc_id,
              CAST(list_sum([p.v[i] * q0.qv[i]
                FOR i IN generate_series(1, len(p.v))]) AS DOUBLE)
                / sqrt(CAST(p.nrm * q0.qn AS DOUBLE)) AS sim
            FROM pn p, q0 WHERE vec_id <> 0),
          vtop AS (
            SELECT doc_id, ROW_NUMBER() OVER (ORDER BY sim DESC, doc_id) AS r_vec
            FROM vsim QUALIFY r_vec <= 50),
          ltop AS (
            SELECT doc_id, ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id) AS r_lex
            FROM lexall QUALIFY r_lex <= 50),
          fused AS (
            SELECT COALESCE(l.doc_id, v.doc_id) AS doc_id,
              CAST(l.r_lex AS BIGINT) AS r_lex, CAST(v.r_vec AS BIGINT) AS r_vec,
              COALESCE(1.0 / (60.0 + l.r_lex), 0.0)
                + COALESCE(1.0 / (60.0 + v.r_vec), 0.0) AS rrf
            FROM ltop l FULL OUTER JOIN vtop v ON l.doc_id = v.doc_id)
          SELECT doc_id, r_lex, r_vec, rrf
          FROM fused ORDER BY rrf DESC, doc_id LIMIT 10""",

    "text_bpe_tokens" ->
      s"""SELECT doc_id,
          CAST(len(regexp_extract_all(lower(text), '${Text.bpeRegex}')) AS BIGINT) AS n_bpe
          FROM documents""",

    "text_tokenizer_fertility" ->
      s"""SELECT lang, COUNT(*) AS n_docs,
          CAST(SUM(length(text)) AS BIGINT) AS n_chars,
          CAST(SUM(len($toks)) AS BIGINT) AS n_words,
          CAST(SUM(len(regexp_extract_all(lower(text), '${Text.bpeRegex}')))
            AS BIGINT) AS n_bpe
          FROM documents GROUP BY lang""",

    "text_repetition" ->
      s"""WITH toks AS (SELECT doc_id, $toks AS t FROM documents),
          grams AS (
            SELECT doc_id, 'w' AS kind, unnest(t) AS gram FROM toks
            UNION ALL
            SELECT doc_id, 'b' AS kind,
              unnest([t[i] || ' ' || t[i+1] for i in generate_series(1, len(t) - 1)]) AS gram
            FROM toks),
          counts AS (
            SELECT doc_id, kind, gram, COUNT(*) AS c FROM grams GROUP BY 1, 2, 3),
          stats AS (
            SELECT doc_id, kind, MAX(c) AS top_c,
              CAST(SUM(c) AS BIGINT) AS total, COUNT(*) AS n_distinct
            FROM counts GROUP BY 1, 2)
          SELECT doc_id,
            MAX(CASE WHEN kind = 'w' THEN total END) AS n_tokens,
            MAX(CASE WHEN kind = 'w' THEN CAST(top_c AS DOUBLE) / total END) AS top_word_frac,
            MAX(CASE WHEN kind = 'b' THEN CAST(top_c AS DOUBLE) / total END) AS top_bigram_frac,
            MAX(CASE WHEN kind = 'b' THEN 1.0 - CAST(n_distinct AS DOUBLE) / total END) AS dup_bigram_frac
          FROM stats GROUP BY 1""",

    "pipe_corpus_build" ->
      s"""WITH sh AS (SELECT doc_id, ${hashedShingleSql(3)} AS s
            FROM (SELECT doc_id, $toks AS t, text FROM documents)),
          bench AS (SELECT DISTINCT unnest(s) AS h FROM sh WHERE doc_id % 50 = 0),
          contaminated AS (
            SELECT DISTINCT doc_id FROM (
              SELECT doc_id, unnest(s) AS h FROM sh WHERE doc_id % 50 <> 0)
            JOIN bench USING (h)),
          q AS (
            SELECT doc_id, lang, text,
              0.4 * least((CAST(length(replace(text, ' ', '')) AS DOUBLE) / CAST(len($toks) AS DOUBLE)) / 8.0, 1.0)
            + 0.3 * (CAST(len(list_distinct($toks)) AS DOUBLE) / CAST(len($toks) AS DOUBLE))
            + 0.3 * least(CAST(len($toks) AS DOUBLE) / 100.0, 1.0) AS quality
            FROM documents WHERE doc_id % 50 <> 0),
          f AS (SELECT * FROM q WHERE quality >= 0.5),
          dd AS (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
            FROM f),
          k AS (SELECT * FROM dd WHERE rn = 1
            AND doc_id NOT IN (SELECT doc_id FROM contaminated)),
          sp AS (
            SELECT doc_id, lang,
              CASE WHEN h < 80 THEN 'train' WHEN h < 90 THEN 'val' ELSE 'test' END AS split,
              CAST(len($toks) AS BIGINT) AS n
            FROM (SELECT *, ${phash64Sql("CAST(doc_id AS VARCHAR) || ':split'")} % 100 AS h
                  FROM k)),
          packed AS (
            SELECT split, lang, n,
              SUM(n) OVER (PARTITION BY split, lang ORDER BY doc_id
                ROWS UNBOUNDED PRECEDING) AS cum
            FROM sp)
          SELECT split, lang, COUNT(*) AS n_docs, CAST(SUM(n) AS BIGINT) AS n_tokens,
            CAST(MAX((cum - n) // 2048) + 1 AS BIGINT) AS n_bins
          FROM packed GROUP BY 1, 2""",

    "pipe_curation" ->
      s"""WITH q AS (
            SELECT doc_id, lang, text,
              0.4 * least((CAST(length(replace(text, ' ', '')) AS DOUBLE) / CAST(len($toks) AS DOUBLE)) / 8.0, 1.0)
            + 0.3 * (CAST(len(list_distinct($toks)) AS DOUBLE) / CAST(len($toks) AS DOUBLE))
            + 0.3 * least(CAST(len($toks) AS DOUBLE) / 100.0, 1.0) AS quality
            FROM documents),
          f AS (SELECT * FROM q WHERE quality >= 0.5),
          d AS (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
            FROM f),
          k AS (SELECT * FROM d WHERE rn = 1),
          s AS (
            SELECT lang,
              CASE WHEN h < 80 THEN 'train' WHEN h < 90 THEN 'val' ELSE 'test' END AS split,
              CAST(len($toks) AS BIGINT) AS n
            FROM (SELECT *, ${phash64Sql("CAST(doc_id AS VARCHAR) || ':split'")} % 100 AS h
                  FROM k))
          SELECT lang, split, COUNT(*) AS n_docs, CAST(SUM(n) AS BIGINT) AS n_tokens
          FROM s GROUP BY 1, 2""",

    "dedup_incremental" ->
      """WITH corpus AS (
            SELECT md5(text) AS digest FROM documents WHERE doc_id % 2 = 0),
          incoming AS (
            SELECT * FROM documents WHERE doc_id % 2 = 1
            UNION ALL
            SELECT * FROM documents WHERE doc_id % 2 = 0 AND doc_id % 10 = 0)
          SELECT lang, COUNT(*) AS n_new,
            MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc,
            CAST(SUM(n_chars) AS BIGINT) AS sum_chars
          FROM incoming
          WHERE md5(text) NOT IN (SELECT digest FROM corpus)
          GROUP BY lang""",

    "pipe_shard" ->
      s"""WITH h AS (
            SELECT n_chars, ${phash64Sql("text")} AS hv FROM documents)
          SELECT hv % 16 AS shard, COUNT(*) AS n_docs,
            CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
            CAST(SUM(hv % 1000000007) AS BIGINT) AS fingerprint
          FROM h GROUP BY 1""",

    "text_pack" ->
      s"""WITH tk AS (
            SELECT doc_id, lang, CAST(len($toks) AS BIGINT) AS n FROM documents),
          c AS (
            SELECT doc_id, lang, n,
              SUM(n) OVER (PARTITION BY lang ORDER BY doc_id
                ROWS UNBOUNDED PRECEDING) AS cum
            FROM tk)
          SELECT lang, CAST((cum - n) // 2048 AS BIGINT) AS bin,
            COUNT(*) AS n_docs, CAST(SUM(n) AS BIGINT) AS bin_tokens
          FROM c GROUP BY 1, 2""",

    "pipe_epoch_shuffle" ->
      s"""WITH e AS (
            SELECT doc_id, epoch,
              ${phash64Sql("CAST(doc_id AS VARCHAR) || ':e' || CAST(epoch AS VARCHAR)")} AS skey
            FROM documents, (SELECT unnest([0, 1]) AS epoch))
          SELECT doc_id, CAST(epoch AS BIGINT) AS epoch, skey,
            CAST(ROW_NUMBER() OVER (PARTITION BY epoch
              ORDER BY skey, doc_id) AS BIGINT) AS pos
          FROM e""",

    "pipe_drift_monitor" ->
      s"""WITH b AS (SELECT MIN(doc_id) AS d0, MAX(doc_id) AS d1 FROM documents),
          rows_ AS (
            SELECT source, doc_id <= d0 + (d1 - d0) // 2 AS is_prev,
              'lang' AS dim, lang AS bucket
            FROM documents, b
            UNION ALL
            SELECT source, doc_id <= d0 + (d1 - d0) // 2,
              'len', CAST(n_chars // 256 AS VARCHAR)
            FROM documents, b),
          cells AS (
            SELECT source, dim, bucket,
              CAST(SUM(CASE WHEN is_prev THEN 1 ELSE 0 END) AS BIGINT) AS prev_n,
              CAST(SUM(CASE WHEN is_prev THEN 0 ELSE 1 END) AS BIGINT) AS curr_n
            FROM rows_ GROUP BY 1, 2, 3),
          p AS (
            SELECT source, dim, bucket, prev_n, curr_n,
              CAST((prev_n * 1000000) // nullif(SUM(prev_n) OVER w, 0) AS BIGINT) AS prev_ppm,
              CAST((curr_n * 1000000) // nullif(SUM(curr_n) OVER w, 0) AS BIGINT) AS curr_ppm
            FROM cells WINDOW w AS (PARTITION BY source, dim))
          SELECT source, dim, bucket, prev_n, curr_n, prev_ppm, curr_ppm,
            CAST(curr_ppm - prev_ppm AS BIGINT) AS delta_ppm,
            CAST((SUM(abs(curr_ppm - prev_ppm))
              OVER (PARTITION BY source, dim)) // 2 AS BIGINT) AS tvd_ppm
          FROM p""",

    "pipe_curriculum" ->
      s"""WITH t AS (
            SELECT doc_id,
              (CAST(length(replace(text, ' ', '')) AS BIGINT) * 1000)
                // CAST(len($toks) AS BIGINT) AS difficulty_milli
            FROM documents),
          r AS (
            SELECT doc_id, difficulty_milli,
              ROW_NUMBER() OVER (ORDER BY difficulty_milli, doc_id) AS rank,
              COUNT(*) OVER () AS total
            FROM t)
          SELECT doc_id, difficulty_milli, CAST(rank AS BIGINT) AS rank,
            CAST(((rank - 1) * 4) // total AS BIGINT) AS stage
          FROM r""",

    "text_quota_sample" ->
      s"""SELECT doc_id, lang FROM (
            SELECT doc_id, lang,
              ROW_NUMBER() OVER (PARTITION BY lang
                ORDER BY ${phash64Sql("CAST(doc_id AS VARCHAR) || ':q'")}, doc_id) AS rk
            FROM documents)
          WHERE rk <= 25""",

    "pipe_dataset_card" ->
      s"""SELECT source, lang, COUNT(*) AS n_docs,
            CAST(SUM(len($toks)) AS BIGINT) AS tok_sum,
            CAST(SUM(n_chars) AS BIGINT) AS char_sum,
            CAST(SUM(n_chars) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mean_chars,
            COUNT(DISTINCT md5(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS n_uniq,
            MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
          FROM documents GROUP BY 1, 2""",

    "pipe_mix_temperature" ->
      s"""WITH c AS (
            SELECT source, COUNT(*) AS n_docs,
              CAST(FLOOR(SQRT(COUNT(*)) * 1000) AS BIGINT) AS s_i
            FROM documents GROUP BY source),
          t AS (
            SELECT CAST(SUM(s_i) AS BIGINT) AS s_sum,
              CAST(SUM(n_docs) AS BIGINT) // 2 AS n_target
            FROM c),
          r AS (
            SELECT source,
              LEAST(1000000, s_i * n_target * 1000000 // (s_sum * n_docs))
                AS rate_ppm
            FROM c, t)
          SELECT d.source, COUNT(*) AS n_docs,
            CAST(MAX(r.rate_ppm) AS BIGINT) AS rate_ppm,
            CAST(SUM(CASE WHEN ${phash64Sql("doc_id")} % 1000000 < r.rate_ppm
              THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
          FROM documents d JOIN r ON d.source = r.source
          GROUP BY d.source""",

    "pipe_dataset_diff" ->
      """WITH a AS (
           SELECT doc_id, source, md5(text) AS ha
           FROM documents WHERE doc_id % 7 <> 0),
         b AS (
           SELECT doc_id, source, md5(CASE WHEN doc_id % 11 = 0
             THEN text || ' v2' ELSE text END) AS hb
           FROM documents WHERE doc_id % 5 <> 0)
         SELECT COALESCE(a.source, b.source) AS source,
           CASE WHEN ha IS NULL THEN 'added'
                WHEN hb IS NULL THEN 'removed'
                WHEN ha = hb THEN 'unchanged'
                ELSE 'changed' END AS status,
           COUNT(*) AS n_docs
         FROM a FULL OUTER JOIN b USING (doc_id)
         GROUP BY 1, 2""",

    "pipe_pref_pairs" ->
      s"""WITH scored AS (
            SELECT doc_id, lang, source,
              0.4 * least((CAST(length(replace(text, ' ', '')) AS DOUBLE) / CAST(len($toks) AS DOUBLE)) / 8.0, 1.0)
            + 0.3 * (CAST(len(list_distinct($toks)) AS DOUBLE) / CAST(len($toks) AS DOUBLE))
            + 0.3 * least(CAST(len($toks) AS DOUBLE) / 100.0, 1.0) AS q
            FROM documents),
          g AS (
            SELECT lang, source, COUNT(*) AS n_cands,
              MAX(struct_pack(q := q, doc_id := doc_id)) AS ch,
              MIN(struct_pack(q := q, doc_id := doc_id)) AS rj
            FROM scored GROUP BY 1, 2)
          SELECT lang, source, n_cands,
            ch.doc_id AS chosen_id, rj.doc_id AS rejected_id,
            ch.q - rj.q AS margin
          FROM g WHERE n_cands >= 2""",

    "text_winnow" ->
      s"""WITH base AS (SELECT doc_id, $toks AS l FROM documents),
          sh AS (
            SELECT doc_id,
              CASE WHEN len(l) >= 5 THEN
                list_transform(range(0, len(l) - 4), p ->
                  (${phash64Sql("array_to_string(l[p+1:p+5], ' ')")}
                    % 1099511627776) * 4096 + (4095 - (p % 4096)))
              ELSE [] END AS keys
            FROM base),
          wn AS (
            SELECT doc_id,
              CASE WHEN len(keys) >= 4 THEN
                list_distinct(list_transform(range(0, len(keys) - 3),
                  q -> list_min(keys[q+1:q+4])))
              ELSE [] END AS fps
            FROM sh)
          SELECT doc_id, CAST(len(fps) AS BIGINT) AS n_fp,
            CAST(COALESCE(list_sum(fps), 0) AS BIGINT) AS fp_sum
          FROM wn""",

    "text_pii_audit" ->
      s"""WITH dirty AS (
            SELECT source,
              text || ' contact u' || CAST(doc_id AS VARCHAR)
                || '@example.com or +1-555-'
                || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                || ' at 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.7 now' AS d
            FROM documents),
          scrubbed AS (
            SELECT source, d,
              regexp_replace(regexp_replace(regexp_replace(d,
                '${Text.EmailRe}', '<EMAIL>', 'g'),
                '${Text.Ipv4Re}', '<IP>', 'g'),
                '${Text.PhoneRe}', '<PHONE>', 'g') AS c
            FROM dirty)
          SELECT source, COUNT(*) AS n_docs,
            CAST(SUM(len(regexp_extract_all(d, '${Text.EmailRe}'))) AS BIGINT) AS pre_email,
            CAST(SUM(len(regexp_extract_all(d, '${Text.Ipv4Re}'))) AS BIGINT) AS pre_ip,
            CAST(SUM(len(regexp_extract_all(d, '${Text.PhoneRe}'))) AS BIGINT) AS pre_phone,
            CAST(SUM(len(regexp_extract_all(c, '${Text.EmailRe}'))) AS BIGINT) AS post_email,
            CAST(SUM(len(regexp_extract_all(c, '${Text.Ipv4Re}'))) AS BIGINT) AS post_ip,
            CAST(SUM(len(regexp_extract_all(c, '${Text.PhoneRe}'))) AS BIGINT) AS post_phone
          FROM scrubbed GROUP BY source""",

    "pipe_gate_ablation" -> {
      val langs = Text.langMarkers.map(_._1)
      val scoreCols = langs.map(l => s"${langScoreSql(l)} AS s_$l").mkString(", ")
      val best = langs.map(l => s"s_$l").mkString("greatest(", ", ", ")")
      val cases = langs.map(l => s"WHEN best > 0 AND s_$l = best THEN '$l'").mkString(" ")
      val stops = Text.gopherStops.map(w => s"'$w'").mkString("[", ", ", "]")
      s"""WITH base AS (
            SELECT doc_id, lang, CAST(len($toks) AS BIGINT) AS n_tokens,
              (0.4 * least((CAST(length(replace(text, ' ', '')) AS DOUBLE)
                  / CAST(len($toks) AS DOUBLE)) / 8.0, 1.0)
               + 0.3 * (CAST(len(list_distinct($toks)) AS DOUBLE)
                  / CAST(len($toks) AS DOUBLE))
               + 0.3 * least(CAST(len($toks) AS DOUBLE) / 100.0, 1.0)) >= 0.5
                AS quality_ok,
              $scoreCols,
              CAST(len($toks) AS BIGINT) AS n_words,
              CAST(length(replace(text, ' ', '')) AS DOUBLE)
                / CAST(len($toks) AS DOUBLE) AS mean_word_len,
              CAST(len(list_intersect(list_distinct($toks), $stops)) AS BIGINT)
                AS n_stops,
              CAST(len(list_filter($toks, w -> regexp_matches(w, '[a-z]')))
                AS DOUBLE) / CAST(len($toks) AS DOUBLE) AS alpha_frac
            FROM documents),
          b2 AS (SELECT *, $best AS best FROM base),
          f AS (
            SELECT doc_id, n_tokens, quality_ok,
              (CASE $cases ELSE 'und' END) = lang AS lang_ok,
              (n_words BETWEEN 50 AND 100000)
                AND (mean_word_len BETWEEN 3 AND 10)
                AND n_stops >= 2 AND alpha_frac > 0.8 AS gopher_ok
            FROM b2)
          SELECT quality_ok, lang_ok, gopher_ok, COUNT(*) AS n_docs,
            CAST(SUM(n_tokens) AS BIGINT) AS n_tokens
          FROM f GROUP BY CUBE (quality_ok, lang_ok, gopher_ok)"""
    },

    "text_split_leakfree" -> {
      def splitCase(key: String) = {
        val h = s"${phash64Sql(key)} % 100"
        s"CASE WHEN $h < 80 THEN 'train' WHEN $h < 90 THEN 'val' ELSE 'test' END"
      }
      s"""WITH ${minhashPairCtes()},
          good AS (SELECT doc_a, doc_b FROM j WHERE jaccard >= 0.5),
          edges AS (
            SELECT doc_a AS src, doc_b AS dst FROM good
            UNION SELECT doc_b, doc_a FROM good),
          verts AS (SELECT DISTINCT src AS doc_id FROM edges),
          lab AS (
            WITH RECURSIVE cc AS (
              SELECT doc_id, doc_id AS label FROM verts
              UNION
              SELECT e.dst AS doc_id, cc.label FROM cc JOIN edges e ON e.src = cc.doc_id)
            SELECT doc_id, MIN(label) AS label FROM cc GROUP BY 1),
          d AS (
            SELECT doc_id,
              ${splitCase("CAST(doc_id AS VARCHAR) || ':split'")} AS naive_split
            FROM documents),
          cl AS (
            SELECT d.doc_id, COALESCE(lab.label, d.doc_id) AS cluster, naive_split
            FROM d LEFT JOIN lab ON lab.doc_id = d.doc_id),
          g AS (
            SELECT cluster, COUNT(*) AS n_docs,
              COUNT(DISTINCT naive_split) AS n_naive
            FROM cl GROUP BY 1)
          SELECT ${splitCase("CAST(cluster AS VARCHAR) || ':split'")} AS split,
            COUNT(*) AS n_clusters, CAST(SUM(n_docs) AS BIGINT) AS n_docs,
            CAST(SUM(CASE WHEN n_naive > 1 THEN 1 ELSE 0 END) AS BIGINT)
              AS n_clusters_naive_leaky
          FROM g GROUP BY 1"""
    },

    "text_split_assign" ->
      s"""SELECT doc_id,
          CASE WHEN h < 80 THEN 'train' WHEN h < 90 THEN 'val' ELSE 'test' END AS split
          FROM (SELECT doc_id,
                  ${phash64Sql("CAST(doc_id AS VARCHAR) || ':split'")} % 100 AS h
                FROM documents)""",

    "text_chunk" ->
      s"""WITH tk AS (SELECT doc_id, $toks AS t FROM documents),
          st AS (
            SELECT doc_id, t, unnest(generate_series(1, len(t), 56)) AS s FROM tk),
          ch AS (
            SELECT doc_id, CAST((s - 1) // 56 AS BIGINT) AS chunk_idx,
              t[s : s + 63] AS w
            FROM st)
          SELECT doc_id, chunk_idx, CAST(len(w) AS BIGINT) AS n_tokens,
            md5(array_to_string(w, ' ')) AS chunk_md5
          FROM ch""",

    "text_chunk_dedup" ->
      s"""WITH tk AS (SELECT doc_id, $toks AS t FROM documents),
          st AS (
            SELECT doc_id, t, unnest(generate_series(1, len(t), 56)) AS s FROM tk),
          ch AS (
            SELECT doc_id, md5(array_to_string(t[s : s + 63], ' ')) AS chunk_md5
            FROM st)
          SELECT chunk_md5, COUNT(DISTINCT doc_id) AS n_docs,
            COUNT(*) AS n_occurrences, MIN(doc_id) AS keep_doc
          FROM ch GROUP BY 1 HAVING COUNT(DISTINCT doc_id) > 1""",

    "text_pii_scrub" ->
      s"""WITH dirty AS (
            SELECT doc_id,
              text || ' contact u' || CAST(doc_id AS VARCHAR)
                || '@example.com or +1-555-'
                || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                || ' at 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.7 now' AS d
            FROM documents),
          clean AS (
            SELECT doc_id,
              regexp_replace(regexp_replace(regexp_replace(d,
                '${Text.EmailRe}', '<EMAIL>', 'g'),
                '${Text.Ipv4Re}', '<IP>', 'g'),
                '${Text.PhoneRe}', '<PHONE>', 'g') AS c
            FROM dirty)
          SELECT doc_id, md5(c) AS clean_md5,
            CAST((length(c) - length(replace(c, '<EMAIL>', ''))) / 7 AS BIGINT) AS n_email,
            CAST((length(c) - length(replace(c, '<PHONE>', ''))) / 7 AS BIGINT) AS n_phone,
            CAST((length(c) - length(replace(c, '<IP>', ''))) / 4 AS BIGINT) AS n_ip
          FROM clean""",

    "text_quality_calibration" ->
      s"""WITH sc AS (
            SELECT lang,
              0.4 * least((CAST(length(replace(text, ' ', '')) AS DOUBLE) / CAST(len($toks) AS DOUBLE)) / 8.0, 1.0)
            + 0.3 * (CAST(len(list_distinct($toks)) AS DOUBLE) / CAST(len($toks) AS DOUBLE))
            + 0.3 * least(CAST(len($toks) AS DOUBLE) / 100.0, 1.0) AS q
            FROM documents),
          g AS (
            SELECT th_milli, lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
              CAST(SUM(CASE WHEN q >= CAST(th_milli AS DOUBLE) / 1000.0
                THEN 1 ELSE 0 END) AS BIGINT) AS n_pass
            FROM sc, (SELECT unnest([300, 400, 500, 600, 700]) AS th_milli)
            GROUP BY 1, 2)
          SELECT CAST(th_milli AS BIGINT) AS th_milli, lang, n_docs, n_pass,
            CAST(n_pass * 1000000 // n_docs AS BIGINT) AS pass_ppm
          FROM g""",

    "text_ngram_novelty" ->
      s"""WITH sh AS (
            SELECT doc_id, unnest(${hashedShingleSql(3)}) AS h
            FROM (SELECT doc_id, $toks AS t FROM documents)),
          f AS (SELECT h, MIN(doc_id) AS first_doc FROM sh GROUP BY 1)
          SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_shingles,
            CAST(SUM(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
            CAST((SUM(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END) * 1000000)
              // COUNT(*) AS BIGINT) AS novelty_ppm
          FROM sh JOIN f USING (h) GROUP BY doc_id""",

    "pipe_token_budget" ->
      s"""WITH t AS (
            SELECT doc_id,
              0.4 * least((CAST(length(replace(text, ' ', '')) AS DOUBLE) / CAST(len($toks) AS DOUBLE)) / 8.0, 1.0)
            + 0.3 * (CAST(len(list_distinct($toks)) AS DOUBLE) / CAST(len($toks) AS DOUBLE))
            + 0.3 * least(CAST(len($toks) AS DOUBLE) / 100.0, 1.0) AS q,
              CAST(len($toks) AS BIGINT) AS n_tokens
            FROM documents),
          b AS (SELECT CAST(SUM(n_tokens) // 2 AS BIGINT) AS budget FROM t),
          c AS (
            SELECT doc_id, q, n_tokens,
              CAST(SUM(n_tokens) OVER (ORDER BY q DESC, doc_id)
                AS BIGINT) AS cum
            FROM t)
          SELECT doc_id, q, n_tokens, cum FROM c, b
          WHERE cum - n_tokens < budget""",

    "text_contamination" ->
      s"""WITH sh AS (SELECT doc_id, ${hashedShingleSql(3)} AS s
            FROM (SELECT doc_id, $toks AS t, text FROM documents)),
          bench AS (SELECT DISTINCT unnest(s) AS h FROM sh WHERE doc_id % 50 = 0),
          corpus AS (
            SELECT doc_id, len(s) AS n_shingles, unnest(s) AS h
            FROM sh WHERE doc_id % 50 <> 0)
          SELECT doc_id, COUNT(*) AS n_hits,
            CAST(COUNT(*) AS DOUBLE) / n_shingles AS contamination
          FROM corpus JOIN bench USING (h)
          GROUP BY doc_id, n_shingles""",

    "text_cms_heavy" -> {
      val posSql = s"${phash64Sql("term || ':cms' || j")} % $CmsWidth"
      s"""WITH tok AS (SELECT unnest($toks) AS term FROM documents),
          counts AS (SELECT term, COUNT(*) AS n FROM tok GROUP BY 1),
          hashed AS (SELECT term, n, j, $posSql AS pos
            FROM counts, (SELECT unnest(generate_series(0, ${CmsDepth - 1})) AS j)),
          cms AS (SELECT j, pos, CAST(SUM(n) AS BIGINT) AS c
            FROM hashed GROUP BY 1, 2),
          est AS (SELECT term, n, MIN(c) AS est
            FROM hashed JOIN cms USING (j, pos) GROUP BY 1, 2)
          SELECT term, est, n AS true_n, est - n AS overestimate
          FROM est ORDER BY est DESC, term LIMIT 20"""
    },

    "text_bpe_merges" ->
      s"""WITH words AS (
            SELECT w, COUNT(*) AS n
            FROM (SELECT unnest($toks) AS w FROM documents) GROUP BY 1),
          pairs AS (
            SELECT n, unnest([w[i:i+1]
              for i in generate_series(1, length(w) - 1)]) AS pair
            FROM words WHERE length(w) >= 2)
          SELECT pair, CAST(SUM(n) AS BIGINT) AS n_pairs
          FROM pairs GROUP BY 1
          ORDER BY n_pairs DESC, pair LIMIT 20""",

    "text_bpe_apply" -> {
      val mergeSel = (1 to 5).map(t =>
        s"SELECT 'merge' AS section, CAST($t AS BIGINT) AS rank, l, r, c AS n FROM m$t")
        .mkString("\nUNION ALL\n")
      s"""WITH ${bpeCtes(5)}
          $mergeSel
          UNION ALL
          SELECT 'tokens', 0, '', '',
            CAST(SUM(n * len(string_split(trim(seq), ' '))) AS BIGINT) FROM v5
          UNION ALL
          SELECT 'chars', 0, '', '', CAST(SUM(n * length(w)) AS BIGINT) FROM v0"""
    },

    "text_weighted_sample" ->
      s"""WITH base AS (SELECT doc_id,
              CAST(len($toks) AS BIGINT) AS n_tokens FROM documents)
          SELECT doc_id, n_tokens,
            ROUND(ln(CAST((${phash64Sql("CAST(doc_id AS VARCHAR) || ':es'")}
                % 1000000) + 1 AS DOUBLE) / 1000001.0)
              / CAST(n_tokens AS DOUBLE), 6) AS wkey
          FROM base ORDER BY wkey DESC, doc_id LIMIT 20""",

    "text_bloom_contaminate" ->
      s"""WITH sh AS (SELECT doc_id, doc_id % 50 = 0 AS is_bench,
              ${hashedShingleSql(3)} AS s
            FROM (SELECT doc_id, $toks AS t, text FROM documents)),
          bench AS (SELECT DISTINCT unnest(s) AS h FROM sh WHERE is_bench),
          bits AS (SELECT DISTINCT unnest(${bloomPosSql("h")}) AS pos FROM bench),
          corpus AS (SELECT doc_id, len(s) AS n_shingles, unnest(s) AS h
            FROM sh WHERE NOT is_bench),
          cpos AS (SELECT doc_id, n_shingles, h, unnest(${bloomPosSql("h")}) AS pos
            FROM corpus),
          bh AS (SELECT doc_id, n_shingles, h FROM cpos JOIN bits USING (pos)
            GROUP BY 1, 2, 3 HAVING COUNT(*) = ${BloomSalts.length}),
          tr AS (SELECT c.doc_id, c.h FROM corpus c JOIN bench b USING (h))
          SELECT bh.doc_id, bh.n_shingles, COUNT(*) AS n_bloom_hits,
            COUNT(tr.h) AS n_true_hits,
            COUNT(*) - COUNT(tr.h) AS n_false_pos
          FROM bh LEFT JOIN tr ON tr.doc_id = bh.doc_id AND tr.h = bh.h
          GROUP BY 1, 2""",

    "text_dsir_select" ->
      s"""WITH tok AS (SELECT doc_id, lang, unnest($toks) AS t FROM documents),
          hb AS (SELECT doc_id, lang,
              ${phash64Sql("t || ':dsir'")} % 1024 AS bkt FROM tok),
          tot AS (SELECT COUNT(*) AS nraw,
              COUNT(*) FILTER (WHERE lang = 'en') AS ntgt FROM hb),
          raw AS (SELECT bkt, COUNT(*) AS cr FROM hb GROUP BY 1),
          tgt AS (SELECT bkt, COUNT(*) AS ct FROM hb WHERE lang = 'en' GROUP BY 1)
          SELECT doc_id, lang, COUNT(*) AS n_tokens,
            CAST(SUM(CAST(ROUND(ln(
              CAST((COALESCE(ct, 0) + 1) * (nraw + 1024) AS DOUBLE)
              / CAST((cr + 1) * (ntgt + 1024) AS DOUBLE)), 6)
              AS DECIMAL(28,6))) AS DOUBLE) AS dsir_w
          FROM hb JOIN raw USING (bkt) LEFT JOIN tgt USING (bkt), tot
          GROUP BY doc_id, lang
          ORDER BY dsir_w DESC, doc_id
          LIMIT 100""",

    "dedup_exact" ->
      """SELECT md5(text) AS content_hash, MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
         FROM documents GROUP BY 1""",

    "pipe_golden_record" ->
      s"""WITH ${minhashPairCtes()},
          good AS (SELECT doc_a, doc_b FROM j WHERE jaccard >= 0.5),
          edges AS (
            SELECT doc_a AS src, doc_b AS dst FROM good
            UNION SELECT doc_b, doc_a FROM good),
          verts AS (SELECT DISTINCT src AS doc_id FROM edges),
          lab AS (
            WITH RECURSIVE cc AS (
              SELECT doc_id, doc_id AS label FROM verts
              UNION
              SELECT e.dst AS doc_id, cc.label FROM cc JOIN edges e ON e.src = cc.doc_id)
            SELECT doc_id, MIN(label) AS label FROM cc GROUP BY 1)
          SELECT label AS cluster, MIN(d.doc_id) AS keep_id,
            COUNT(*) AS n_members,
            COUNT(DISTINCT d.source) AS n_sources,
            string_agg(DISTINCT d.source, ',' ORDER BY d.source) AS sources,
            COUNT(DISTINCT d.lang) AS n_langs
          FROM lab JOIN documents d USING (doc_id)
          GROUP BY 1""",

    // per-digest winner under phased delivery: even batch first
    "dedup_stream_exact" ->
      """WITH dg AS (SELECT doc_id, md5(text) AS digest FROM documents)
         SELECT digest,
           CASE WHEN COUNT(*) FILTER (WHERE doc_id % 2 = 0) > 0
                THEN MIN(doc_id) FILTER (WHERE doc_id % 2 = 0)
                ELSE MIN(doc_id) END AS doc_id
         FROM dg GROUP BY digest""",

    "dedup_stream_neardup" ->
      s"""WITH base AS (SELECT doc_id, ${hashedShingleSql(3)} AS s
            FROM (SELECT doc_id, $toks AS t, text FROM documents)),
          sig AS (SELECT doc_id, s, ${minhashExprs.mkString(", ")} FROM base),
          banded AS (
            SELECT doc_id, band,
              CASE band ${(0 until 4).map(b => s"WHEN $b THEN ${bandSigSql(b)}").mkString(" ")} END AS bsig
            FROM sig, (SELECT unnest(generate_series(0, 3)) AS band)),
          cand AS (
            SELECT late.doc_id AS doc_id, MIN(early.doc_id) AS dup_of
            FROM banded early JOIN banded late
              ON early.band = late.band AND early.bsig = late.bsig
                AND early.doc_id < late.doc_id
            GROUP BY late.doc_id)
          SELECT c.doc_id, c.dup_of,
            CAST(len(list_intersect(a.s, b.s)) AS BIGINT) AS n_inter,
            CAST(len(a.s) AS BIGINT) + CAST(len(b.s) AS BIGINT)
              - CAST(len(list_intersect(a.s, b.s)) AS BIGINT) AS n_union,
            2 * CAST(len(list_intersect(a.s, b.s)) AS BIGINT) >=
              CAST(len(a.s) AS BIGINT) + CAST(len(b.s) AS BIGINT)
              - CAST(len(list_intersect(a.s, b.s)) AS BIGINT) AS near_dup
          FROM cand c JOIN sig a ON a.doc_id = c.doc_id
            JOIN sig b ON b.doc_id = c.dup_of""",

    "dedup_minhash_lsh" ->
      s"WITH ${minhashPairCtes()} SELECT doc_a, doc_b, jaccard FROM j WHERE jaccard >= 0.5",

    "dedup_minhash_incr" ->
      s"""WITH ${minhashPairCtes()}
          SELECT doc_a, doc_b, jaccard FROM j
          WHERE jaccard >= 0.5 AND (doc_a % 5 = 0 OR doc_b % 5 = 0)""",

    // The adaptive derivation re-done natively: r0 = smallest in [4,22]
    // with 2^r·16 ≥ COUNT(*), then r = largest in [4,r0] whose perm
    // budget b(r)·r ≤ 128 (b(r) = ⌈3·5^r/4^r⌉ — integer-exact:
    // power(5,r) is a double but exact below 2^53, r ≤ 22), then the
    // variable-width signature via list comprehensions over j <
    // b·r and 1-based band slices mh[k·r+1 : (k+1)·r].
    "dedup_minhash_adaptive" ->
      s"""WITH nr AS (SELECT COUNT(*) AS n FROM documents),
          par0 AS (
            SELECT COALESCE(MIN(r), 22) AS r0
            FROM generate_series(4, 22) AS g(r), nr
            WHERE (CAST(1 AS BIGINT) << r) * 16 >= n),
          par AS (
            SELECT COALESCE(MAX(r), 4) AS r
            FROM generate_series(4, 22) AS g(r)
            WHERE r <= (SELECT r0 FROM par0)
              AND ((3 * CAST(round(power(5, r)) AS BIGINT)
                     + CAST(round(power(4, r)) AS BIGINT) - 1)
                   // CAST(round(power(4, r)) AS BIGINT)) * r <= 128),
          bpar AS (
            SELECT r,
              (3 * CAST(round(power(5, r)) AS BIGINT)
                 + CAST(round(power(4, r)) AS BIGINT) - 1)
                // CAST(round(power(4, r)) AS BIGINT) AS b
            FROM par),
          abase AS (SELECT doc_id, ${hashedShingleSql(3)} AS s
            FROM (SELECT doc_id, $toks AS t, text FROM documents)),
          msig AS (
            SELECT doc_id, s,
              [list_min([((2*j+1) * x + (101*j+17)) % ${Dedup.MinhashPrime}
                for x in s])
               for j in generate_series(0, (SELECT b*r FROM bpar) - 1)] AS mh
            FROM abase),
          abanded AS (
            SELECT doc_id,
              array_to_string(
                mh[k*(SELECT r FROM bpar)+1 : (k+1)*(SELECT r FROM bpar)],
                '_') AS bsig, k AS band
            FROM msig,
              (SELECT unnest(generate_series(0, (SELECT b FROM bpar) - 1)) AS k)),
          abounded AS (
            SELECT * FROM (
              SELECT doc_id, band, bsig,
                COUNT(*) OVER (PARTITION BY band, bsig) AS bkt_n
              FROM abanded) WHERE bkt_n <= ${Dedup.MaxBandBucket}),
          apairs AS (
            SELECT DISTINCT a.doc_id AS doc_a, b2.doc_id AS doc_b
            FROM abounded a JOIN abounded b2
              ON a.band = b2.band AND a.bsig = b2.bsig AND a.doc_id < b2.doc_id),
          av AS (
            SELECT doc_a, doc_b,
              CAST(len(list_intersect(sa.s, sb.s)) AS DOUBLE) /
                (CAST(len(sa.s) + len(sb.s) AS DOUBLE)
                  - CAST(len(list_intersect(sa.s, sb.s)) AS DOUBLE)) AS jaccard
            FROM apairs
            JOIN abase sa ON sa.doc_id = apairs.doc_a
            JOIN abase sb ON sb.doc_id = apairs.doc_b),
          lsh AS (
            SELECT doc_a, doc_b FROM av WHERE jaccard >= 0.5 AND doc_a < 50),
          truth AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM abase a JOIN abase b ON a.doc_id < 50 AND a.doc_id < b.doc_id
            WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) /
              (CAST(len(a.s) + len(b.s) AS DOUBLE)
                - CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)) >= 0.5)
          SELECT 'n_true' AS metric, COUNT(*) AS v FROM truth
          UNION ALL
          SELECT 'n_hit', COUNT(*) FROM truth JOIN lsh USING (doc_a, doc_b)
          UNION ALL
          SELECT 'n_cand', COUNT(*) FROM lsh
          UNION ALL SELECT 'rows_r', CAST(r AS BIGINT) FROM bpar
          UNION ALL SELECT 'bands_b', CAST(b AS BIGINT) FROM bpar""",

    "dedup_lsh_recall" ->
      s"""WITH ${minhashPairCtes()},
          lsh AS (
            SELECT doc_a, doc_b FROM j WHERE jaccard >= 0.5 AND doc_a < 50),
          truth AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM sig a JOIN sig b ON a.doc_id < 50 AND a.doc_id < b.doc_id
            WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) /
              (CAST(len(a.s) + len(b.s) AS DOUBLE)
                - CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)) >= 0.5)
          SELECT 'n_true' AS metric, COUNT(*) AS v FROM truth
          UNION ALL
          SELECT 'n_hit', COUNT(*) FROM truth JOIN lsh USING (doc_a, doc_b)
          UNION ALL
          SELECT 'n_cand', COUNT(*) FROM lsh""",

    "dedup_components" ->
      s"""WITH ${minhashPairCtes()},
          good AS (SELECT doc_a, doc_b FROM j WHERE jaccard >= 0.5),
          edges AS (
            SELECT doc_a AS src, doc_b AS dst FROM good
            UNION SELECT doc_b, doc_a FROM good),
          verts AS (SELECT DISTINCT src AS doc_id FROM edges)
          SELECT label AS cluster, COUNT(*) AS n_members, MIN(doc_id) AS keep_id
          FROM (
            WITH RECURSIVE cc AS (
              SELECT doc_id, doc_id AS label FROM verts
              UNION
              SELECT e.dst AS doc_id, cc.label FROM cc JOIN edges e ON e.src = cc.doc_id)
            SELECT doc_id, MIN(label) AS label FROM cc GROUP BY 1) t
          GROUP BY 1""",

    // The FULL fixpoint over base ∪ increment pairs — what the
    // incremental maintenance must equal without ever running it.
    "dedup_components_incr" ->
      s"""WITH ${minhashPairCtes("(SELECT * FROM documents WHERE doc_id % 5 <> 0)", "b")},
          ${minhashPairCtes()},
          bgood AS (SELECT doc_a, doc_b FROM bj WHERE jaccard >= 0.5),
          igood AS (SELECT doc_a, doc_b FROM j
            WHERE jaccard >= 0.5 AND (doc_a % 5 = 0 OR doc_b % 5 = 0)),
          allg AS (SELECT * FROM bgood UNION SELECT * FROM igood),
          edges AS (
            SELECT doc_a AS src, doc_b AS dst FROM allg
            UNION SELECT doc_b, doc_a FROM allg),
          verts AS (SELECT DISTINCT src AS doc_id FROM edges)
          SELECT label AS cluster, COUNT(*) AS n_members, MIN(doc_id) AS keep_id
          FROM (
            WITH RECURSIVE cc AS (
              SELECT doc_id, doc_id AS label FROM verts
              UNION
              SELECT e.dst AS doc_id, cc.label FROM cc JOIN edges e ON e.src = cc.doc_id)
            SELECT doc_id, MIN(label) AS label FROM cc GROUP BY 1) t
          GROUP BY 1""",

    // BRUTE all-pairs ground truth: the engine's pigeonhole blocking must
    // lose nothing (completeness, not recall).
    "dedup_edit_distance" ->
      """WITH p AS (
           SELECT doc_id, rpad(substring(text, 1, 64), 64, '~') AS s
           FROM documents)
         SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(levenshtein(a.s, b.s) AS BIGINT) AS dist
         FROM p a JOIN p b ON a.doc_id < b.doc_id
         WHERE levenshtein(a.s, b.s) <= 5""",

    "dedup_ngram_jaccard" ->
      s"""WITH sh AS (SELECT doc_id, ${hashedShingleSql(4, mod = "")} AS s
            FROM (SELECT doc_id, $toks AS t FROM documents)),
          ex AS (SELECT doc_id, unnest(s) AS shingle FROM sh),
          rare AS (
            SELECT * FROM (
              SELECT doc_id, shingle, COUNT(*) OVER (PARTITION BY shingle) AS df
              FROM ex) WHERE df <= ${Dedup.MaxDf}),
          pairs AS (
            SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM rare a JOIN rare b ON a.shingle = b.shingle AND a.doc_id < b.doc_id),
          j AS (
            SELECT doc_a, doc_b,
              CAST(len(list_intersect(sa.s, sb.s)) AS DOUBLE) /
                (CAST(len(sa.s) + len(sb.s) AS DOUBLE) - CAST(len(list_intersect(sa.s, sb.s)) AS DOUBLE)) AS jaccard
            FROM pairs JOIN sh sa ON sa.doc_id = pairs.doc_a JOIN sh sb ON sb.doc_id = pairs.doc_b)
          SELECT doc_a, doc_b, jaccard FROM j WHERE jaccard >= 0.5""",

    "pipe_dedup_cascade" ->
      s"""WITH d0 AS (SELECT doc_id, text FROM documents),
          s1 AS (
            SELECT MIN(doc_id) AS doc_id FROM (
              SELECT doc_id, md5(text) AS h FROM d0) GROUP BY h),
          d1 AS (SELECT d0.* FROM d0 JOIN s1 USING (doc_id)),
          shc AS (SELECT doc_id, ${hashedShingleSql(4, mod = "")} AS s
            FROM (SELECT doc_id, $toks AS t FROM d1)),
          exc AS (SELECT doc_id, unnest(s) AS shingle FROM shc),
          rarec AS (
            SELECT * FROM (
              SELECT doc_id, shingle, COUNT(*) OVER (PARTITION BY shingle) AS df
              FROM exc) WHERE df <= ${Dedup.MaxDf}),
          pairsc AS (
            SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM rarec a JOIN rarec b
              ON a.shingle = b.shingle AND a.doc_id < b.doc_id),
          cverd AS (
            SELECT doc_a, doc_b,
              CAST(len(sa.s) AS BIGINT) AS n_a, CAST(len(sb.s) AS BIGINT) AS n_b,
              CAST(len(list_intersect(sa.s, sb.s)) AS BIGINT) AS n_inter
            FROM pairsc JOIN shc sa ON sa.doc_id = pairsc.doc_a
              JOIN shc sb ON sb.doc_id = pairsc.doc_b),
          contained AS (
            SELECT DISTINCT CASE WHEN n_a < n_b THEN doc_a
              WHEN n_b < n_a THEN doc_b
              ELSE greatest(doc_a, doc_b) END AS doc_id
            FROM cverd WHERE n_inter * 5 >= least(n_a, n_b) * 4),
          d2 AS (SELECT d1.* FROM d1
            WHERE doc_id NOT IN (SELECT doc_id FROM contained)),
          ${minhashPairCtes("d2")},
          good AS (SELECT doc_a, doc_b FROM j WHERE jaccard >= 0.5),
          edges AS (
            SELECT doc_a AS src, doc_b AS dst FROM good
            UNION SELECT doc_b, doc_a FROM good),
          verts AS (SELECT DISTINCT src AS doc_id FROM edges),
          lab AS (
            SELECT doc_id, label FROM (
              WITH RECURSIVE cc AS (
                SELECT doc_id, doc_id AS label FROM verts
                UNION
                SELECT e.dst AS doc_id, cc.label FROM cc
                  JOIN edges e ON e.src = cc.doc_id)
              SELECT doc_id, MIN(label) AS label FROM cc GROUP BY 1) t),
          s3 AS (SELECT doc_id FROM d2 WHERE doc_id NOT IN (
            SELECT doc_id FROM lab WHERE doc_id <> label)),
          n AS (
            SELECT (SELECT COUNT(*) FROM d0) AS n0,
              (SELECT COUNT(*) FROM d1) AS n1,
              (SELECT COUNT(*) FROM d2) AS n2,
              (SELECT COUNT(*) FROM s3) AS n3)
          SELECT 'exact' AS stage, n0 AS n_in, n0 - n1 AS n_removed,
            n1 AS n_out, '' AS fp FROM n
          UNION ALL
          SELECT 'containment', n1, n1 - n2, n2, '' FROM n
          UNION ALL
          SELECT 'neardup', n2, n2 - n3, n3, '' FROM n
          UNION ALL
          SELECT 'survivors', n3, CAST(0 AS BIGINT), n3,
            (SELECT md5(string_agg(CAST(doc_id AS VARCHAR), ','
              ORDER BY CAST(doc_id AS VARCHAR))) FROM s3)
          FROM n""",

    "dedup_containment" ->
      s"""WITH sh AS (SELECT doc_id, ${hashedShingleSql(4, mod = "")} AS s
            FROM (SELECT doc_id, $toks AS t FROM documents)),
          ex AS (SELECT doc_id, unnest(s) AS shingle FROM sh),
          rare AS (
            SELECT * FROM (
              SELECT doc_id, shingle, COUNT(*) OVER (PARTITION BY shingle) AS df
              FROM ex) WHERE df <= ${Dedup.MaxDf}),
          pairs AS (
            SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM rare a JOIN rare b ON a.shingle = b.shingle AND a.doc_id < b.doc_id),
          c AS (
            SELECT doc_a, doc_b,
              CAST(len(sa.s) AS BIGINT) AS n_a, CAST(len(sb.s) AS BIGINT) AS n_b,
              CAST(len(list_intersect(sa.s, sb.s)) AS BIGINT) AS n_inter
            FROM pairs JOIN sh sa ON sa.doc_id = pairs.doc_a
              JOIN sh sb ON sb.doc_id = pairs.doc_b)
          SELECT doc_a, doc_b, n_a, n_b, n_inter,
            n_inter * 3 < n_a + n_b AS jaccard_low
          FROM c WHERE n_inter * 5 >= least(n_a, n_b) * 4""",

    // Each site's bucket table re-derived from scratch, grouped on the
    // operator's own blocking keys; counters are COUNTED, never literal
    // zeros — a corpus where a cap binds fails the gate loudly.
    "dedup_cap_audit" ->
      s"""WITH rawp AS (
            SELECT doc_id, rpad(substring(text, 1, $EditW), $EditW, '~') AS s
            FROM documents),
          p AS ( -- replica pre-collapse: the operator blocks DISTINCT keys
            SELECT MIN(doc_id) AS doc_id, s FROM rawp GROUP BY s),
          segs AS (SELECT doc_id, i, substring(s, st + 1, ln) AS g
            FROM p, ${piecesValuesSql(EditSegs, "seg")}),
          wins AS (SELECT doc_id, i, substring(s, st + 1, ln) AS g
            FROM p, ${piecesValuesSql(EditWins, "win")}),
          ${minhashPairCtes(pfx = "m")},
          ${simhashBandedCtes("sm")},
          sh4 AS (SELECT doc_id, ${hashedShingleSql(4, mod = "")} AS s
            FROM (SELECT doc_id, $toks AS t FROM documents)),
          ex4 AS (SELECT doc_id, unnest(s) AS shingle FROM sh4),
          rawprep AS (
            SELECT vec_id,
              [CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT) for x in embedding] AS v
            FROM embeddings JOIN documents ON doc_id = vec_id),
          prep AS ( -- same collapse on the embed side: distinct vectors
            SELECT MIN(vec_id) AS vec_id, v FROM rawprep GROUP BY v),
          ${VectorOps.bucketCte},
          ${VectorOps.adaptiveBucketCte(4, 16, "a", countSrc = "rawprep")}
          SELECT 'edit_seg' AS site, CAST($EditHardSegBucket AS BIGINT) AS cap,
            COUNT(*) AS n_buckets_capped,
            CAST(COALESCE(SUM(n), 0) AS BIGINT) AS n_rows_dropped
          FROM (SELECT COUNT(*) AS n FROM segs GROUP BY i, g)
          WHERE n > $EditHardSegBucket
          UNION ALL
          SELECT 'edit_win', CAST($EditHardSegBucket AS BIGINT), COUNT(*),
            CAST(COALESCE(SUM(n), 0) AS BIGINT)
          FROM (SELECT COUNT(*) AS n FROM wins GROUP BY i, g)
          WHERE n > $EditHardSegBucket
          UNION ALL
          SELECT 'minhash_band', CAST(${Dedup.MaxBandBucket} AS BIGINT), COUNT(*),
            CAST(COALESCE(SUM(n), 0) AS BIGINT)
          FROM (SELECT COUNT(*) AS n FROM mbanded GROUP BY band, bsig)
          WHERE n > ${Dedup.MaxBandBucket}
          UNION ALL
          SELECT 'simhash_band', CAST(${Dedup.MaxBandBucket} AS BIGINT), COUNT(*),
            CAST(COALESCE(SUM(n), 0) AS BIGINT)
          FROM (SELECT COUNT(*) AS n FROM smbanded GROUP BY band, bkt)
          WHERE n > ${Dedup.MaxBandBucket}
          UNION ALL
          SELECT 'shingle_df', CAST(${Dedup.MaxDf} AS BIGINT), COUNT(*),
            CAST(COALESCE(SUM(n), 0) AS BIGINT)
          FROM (SELECT COUNT(*) AS n FROM ex4 GROUP BY shingle)
          WHERE n > ${Dedup.MaxDf}
          UNION ALL
          SELECT 'embed_block', CAST(${Similarity.HardMaxBlock} AS BIGINT), COUNT(*),
            CAST(COALESCE(SUM(n), 0) AS BIGINT)
          FROM (SELECT COUNT(*) AS n FROM buck GROUP BY bucket)
          WHERE n > ${Similarity.HardMaxBlock}
          UNION ALL
          SELECT 'embed_block_adaptive', CAST(${Similarity.HardMaxBlock} AS BIGINT),
            COUNT(*), CAST(COALESCE(SUM(n), 0) AS BIGINT)
          FROM (SELECT COUNT(*) AS n FROM abuck GROUP BY bucket)
          WHERE n > ${Similarity.HardMaxBlock}""",

    "dedup_prefix_filter" ->
      s"""WITH sh AS (SELECT doc_id, ${hashedShingleSql(4, mod = "")} AS s
            FROM (SELECT doc_id, $toks AS t FROM documents)),
          c AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
              CAST(len(list_intersect(a.s, b.s)) AS BIGINT) AS n_inter,
              CAST(len(a.s) AS BIGINT) + CAST(len(b.s) AS BIGINT)
                - CAST(len(list_intersect(a.s, b.s)) AS BIGINT) AS n_union
            FROM sh a JOIN sh b ON a.doc_id < b.doc_id
            WHERE len(a.s) > 0 AND len(b.s) > 0)
          SELECT doc_a, doc_b, n_inter, n_union
          FROM c WHERE n_inter * 2 >= n_union * 1""",

    "dedup_simhash" ->
      s"""WITH ${simhashBandedCtes()},
          bounded AS (
            SELECT * FROM (
              SELECT doc_id, simhash, band, bkt,
                COUNT(*) OVER (PARTITION BY band, bkt) AS bkt_n
              FROM banded) WHERE bkt_n <= ${Dedup.MaxBandBucket}),
          pairs AS (
            SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
              CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
            FROM bounded a JOIN bounded b ON a.band = b.band AND a.bkt = b.bkt AND a.doc_id < b.doc_id)
          SELECT doc_a, doc_b, hamming FROM pairs WHERE hamming <= 4""",

    "dedup_embed_cosine" ->
      s"""WITH prep AS (
            SELECT vec_id, v, list_sum([y*y for y in v]) AS nrm
            FROM (SELECT vec_id,
                    [CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT) for x in embedding] AS v
                  FROM embeddings JOIN documents ON doc_id = vec_id)),
          ${VectorOps.bucketCte},
          trows AS (
            SELECT p.vec_id, b.bucket AS blk, p.v, p.nrm
            FROM prep p JOIN buck b USING (vec_id)),
          ${VectorOps.threeTierPairCtes("0.4")},
          good AS (SELECT id_a AS doc_a, id_b AS doc_b FROM tpairs),
          edges AS (
            SELECT doc_a AS src, doc_b AS dst FROM good
            UNION SELECT doc_b, doc_a FROM good),
          verts AS (SELECT DISTINCT src AS doc_id FROM edges),
          cls AS (
            SELECT label AS cluster, COUNT(*) AS n_members, MIN(doc_id) AS keep_id
            FROM (
              WITH RECURSIVE cc AS (
                SELECT doc_id, doc_id AS label FROM verts
                UNION
                SELECT e.dst AS doc_id, cc.label FROM cc JOIN edges e ON e.src = cc.doc_id)
              SELECT doc_id, MIN(label) AS label FROM cc GROUP BY 1) t
            GROUP BY 1)
          SELECT cluster, n_members, keep_id, d.lang AS keep_lang
          FROM cls JOIN documents d ON d.doc_id = keep_id""",

    "dedup_embed_adaptive" ->
      s"""WITH prep AS (
            SELECT vec_id, v, list_sum([y*y for y in v]) AS nrm
            FROM (SELECT vec_id,
                    [CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT) for x in embedding] AS v
                  FROM embeddings JOIN documents ON doc_id = vec_id)),
          ${VectorOps.adaptiveBucketCte(4, 16)},
          trows AS (
            SELECT p.vec_id, b.bucket AS blk, p.v, p.nrm
            FROM prep p JOIN buck b USING (vec_id)),
          ${VectorOps.threeTierPairCtes("0.4")},
          good AS (SELECT id_a AS doc_a, id_b AS doc_b FROM tpairs),
          edges AS (
            SELECT doc_a AS src, doc_b AS dst FROM good
            UNION SELECT doc_b, doc_a FROM good),
          verts AS (SELECT DISTINCT src AS doc_id FROM edges),
          cls AS (
            SELECT label AS cluster, COUNT(*) AS n_members, MIN(doc_id) AS keep_id
            FROM (
              WITH RECURSIVE cc AS (
                SELECT doc_id, doc_id AS label FROM verts
                UNION
                SELECT e.dst AS doc_id, cc.label FROM cc JOIN edges e ON e.src = cc.doc_id)
              SELECT doc_id, MIN(label) AS label FROM cc GROUP BY 1) t
            GROUP BY 1)
          SELECT (SELECT planes FROM planecnt) AS planes, cluster, n_members, keep_id
          FROM cls"""
  )
}
