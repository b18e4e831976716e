package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Golden + property gates for the corpus-diagnostic operators
  * (`text_dup_spans`, `text_len_histogram`, `text_keywords`,
  * `sim_kmeans_quality`, `dedup_lsh_recall`) — exact results on planted
  * inputs staged as a documents.parquet dir, plus corpus-level
  * invariants at sf0.001 that a refactor cannot silently break.
  */
class CorpusDiagnosticsSpec extends AnyFunSuite {
  lazy val spark = SparkTest.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  /** Stage (doc_id, text) rows as a documents.parquet dir the TextOps
    * queries can read (same 5-column schema as the driver's corpus).
    */
  private def stageDocs(rows: Seq[(Long, String)]): String = {
    val dir = Files.createTempDirectory("graft_diag_docs").toFile.getAbsolutePath
    rows.toDF("doc_id", "text")
      .select(col("doc_id"), col("text"), lit("en").as("lang"),
        lit("src0").as("source"), length(col("text")).cast("long").as("n_chars"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("text_dup_spans: planted cross-doc and intra-doc duplicated 8-grams, exact") {
    val span = (1 to 8).map(i => s"w$i").mkString(" ") // one shared 8-gram
    val uniqueA = (101 to 104).map(i => s"a$i").mkString(" ")
    val uniqueB = (201 to 204).map(i => s"b$i").mkString(" ")
    val dir = stageDocs(Seq(
      // doc 1: 12 tokens -> 5 spans; spans starting at 1 matches doc 2's
      (1L, s"$span $uniqueA"),
      // doc 2: same leading 8-gram, different tail -> its span 1 dups doc 1
      (2L, s"$span $uniqueB"),
      // doc 3: internal repetition -> every 8-gram of "x .. x" repeats
      (3L, (1 to 8).map(i => s"x$i").mkString(" ") + " " +
        (1 to 8).map(i => s"x$i").mkString(" ")),
      // doc 4: too short for any 8-gram -> absent from the output
      (4L, "only four tokens here")))
    val byDoc = graft.operators.TextOps.queries("text_dup_spans")(spark, dir)
      .select("doc_id", "n_spans", "n_dup_spans", "n_dup_grams")
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    // doc 1/2: 12 tokens -> 5 spans, exactly the leading span duplicated
    assert(byDoc(1L) == ((5L, 1L, 1L)), s"doc1: ${byDoc(1L)}")
    assert(byDoc(2L) == ((5L, 1L, 1L)), s"doc2: ${byDoc(2L)}")
    // doc 3: 16 tokens -> 9 spans; gram(i) == gram(i+8) for i=1 -> the
    // wrap grams x2..x8-prefixed are unique, only gram 1 == gram 9 dups
    assert(byDoc(3L)._1 == 9L)
    assert(byDoc(3L)._2 == 2L, s"doc3 dup spans: ${byDoc(3L)}") // positions 1 and 9
    assert(byDoc(3L)._3 == 1L) // one distinct duplicated gram
    assert(!byDoc.contains(4L), "short doc must produce no spans")
  }

  test("text_dup_spans invariants at sf0.001: span math ties to token counts") {
    val out = graft.operators.TextOps.queries("text_dup_spans")(spark, sf)
      .select("doc_id", "n_spans", "n_dup_spans", "n_dup_grams")
      .as[(Long, Long, Long, Long)].collect()
    assert(out.nonEmpty)
    assert(out.forall { case (_, s, d, g) => d >= 0 && d <= s && g <= d })
    val nTokens = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n"))
      .as[(Long, Long)].collect().toMap
    assert(out.forall { case (id, s, _, _) => s == nTokens(id) - 7 })
  }

  test("text_len_histogram: bucket edges, totals, and the running budget") {
    val dir = stageDocs(Seq(
      (1L, (1 to 15).map(_ => "t").mkString(" ")), // 15 tokens -> bucket 0
      (2L, (1 to 16).map(_ => "t").mkString(" ")), // 16 tokens -> bucket 1 (edge)
      (3L, (1 to 17).map(_ => "t").mkString(" ")), // 17 tokens -> bucket 1
      (4L, (1 to 48).map(_ => "t").mkString(" ")))) // 48 -> bucket 3
    val got = graft.operators.TextOps.queries("text_len_histogram")(spark, dir)
      .select("bucket", "n_docs", "total_tokens", "min_tokens", "max_tokens", "cum_tokens")
      .as[(Long, Long, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq(
      (0L, 1L, 15L, 15L, 15L, 15L),
      (1L, 2L, 33L, 16L, 17L, 48L),
      (3L, 1L, 48L, 48L, 48L, 96L)))
  }

  test("text_keywords: stoplist by df, rank law, and the planted rare term") {
    // 4 docs: "common" is in all (stoplisted: df*2 > nDocs); "rare" only in
    // doc 1 with tf 3 -> its top keyword
    val dir = stageDocs(Seq(
      (1L, "common rare rare rare mid"),
      (2L, "common mid other1 other1"),
      (3L, "common other2"),
      (4L, "common other3")))
    val got = graft.operators.TextOps.queries("text_keywords")(spark, dir)
      .select("doc_id", "rank", "term", "tf", "df")
      .as[(Long, Long, String, Long, Long)].collect()
    assert(got.forall(_._3 != "common"), "df-majority term must be stoplisted")
    val doc1 = got.filter(_._1 == 1L).sortBy(_._2)
    assert(doc1.head._3 == "rare" && doc1.head._4 == 3L)
    // rank law within every doc: (tf desc, df asc, term asc)
    got.groupBy(_._1).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_._2).toSeq
      val resorted = sorted.sortBy(r => (-r._4, r._5, r._3))
      assert(sorted == resorted, s"rank order violated: $sorted")
    }
  }

  test("text_bpe_apply: hand-computable merges, tie-break, early exhaustion") {
    // vocab: ab x3, cd x3 — round 1 ties (a|,b|)=3 vs (c|,d|)=3, the
    // l-then-r tie-break picks (a|,b|); round 2 merges (c|,d|); rounds
    // 3-5 find no pairs and must pass the vocabulary through unchanged
    val dir = stageDocs(Seq((1L, "ab ab cd"), (2L, "ab cd cd")))
    val out = graft.operators.TextOps.queries("text_bpe_apply")(spark, dir)
      .as[(String, Long, String, String, Long)].collect()
    val merges = out.filter(_._1 == "merge").sortBy(_._2).toSeq
    assert(merges == Seq(
      ("merge", 1L, "a|", "b|", 3L),
      ("merge", 2L, "c|", "d|", 3L)))
    val m = out.filter(_._1 != "merge").map(r => r._1 -> r._5).toMap
    assert(m("chars") == 12L) // 6 words x 2 chars
    assert(m("tokens") == 6L) // every word fully merged to one unit
  }

  test("sim_kmeans_quality at sf0.001: members partition the corpus, inertia >= 0") {
    val out = graft.operators.VectorOps.queries("sim_kmeans_quality")(spark, sf)
      .select("centroid_id", "n_members", "inertia")
      .as[(Long, Long, Long)].collect()
    assert(out.nonEmpty && out.length <= 8) // k seeds, shrink-only
    val nVec = spark.read.parquet(s"$sf/embeddings.parquet").count()
    assert(out.map(_._2).sum == nVec, "every vector assigned exactly once")
    assert(out.forall(_._3 >= 0L), "squared distance cannot be negative")
  }

  test("dedup_lsh_recall at sf0.001: hit/candidate/truth counter laws") {
    val m = graft.operators.TextOps.queries("dedup_lsh_recall")(spark, sf)
      .as[(String, Long)].collect().toMap
    assert(m.keySet == Set("n_true", "n_hit", "n_cand"))
    assert(m("n_hit") <= m("n_true"), "can't hit more pairs than exist")
    assert(m("n_hit") <= m("n_cand"), "hits are a subset of candidates")
    assert(m.values.forall(_ >= 0L))
  }
}
