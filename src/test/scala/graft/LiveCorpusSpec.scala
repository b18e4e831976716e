package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** O(batch)-per-trigger proof for the `pipe_live_corpus` maintainer (the
  * file-state analogue of `StreamingStateScaleSpec`): a trigger's WRITE
  * work must be bounded by the batch, never the corpus.
  *
  *  - Corpus state: a batch whose keys all hash into one bucket rewrites
  *    exactly that bucket directory — every other bucket's files are
  *    untouched on disk (same names, same mtimes). Drop the dynamic
  *    partition overwrite (or the touched-bucket pruning) and this fails.
  *  - Versioned ledgers (sigs/bands/lists/edges): the per-batch append is
  *    sized by the batch, not the standing corpus.
  *  - Label maintenance: delete/update of a clustered doc re-labels only
  *    its component — including the relabel-on-min-delete and the
  *    retire-on-update paths the CORRECTNESS gate's corpus may not
  *    exercise adversarially.
  */
class LiveCorpusSpec extends AnyFunSuite {
  lazy val spark = SparkTest.spark
  import spark.implicits._

  private def work(tag: String): String = {
    val w = s"${System.getProperty("java.io.tmpdir")}/graft_livecorpus_$tag"
    graft.streaming.IncrSync.deletePath(spark, w)
    w
  }

  /** (op, doc_id, text) rows in the maintainer's feed shape; deletes get
    * null payloads, upserts a deterministic 64-dim embedding.
    */
  private def batchDf(rows: Seq[(String, Long, String)]): DataFrame =
    rows.map { case (op, id, text) =>
      if (op == "d") (op, id, Option.empty[String], Option.empty[String],
        Option.empty[String], Option.empty[Seq[Float]])
      else (op, id, Option(text), Option("en"), Option("src"),
        Option((0 until 64).map(j => (((id + j) % 7) + 1).toFloat)))
    }.toDF("op", "doc_id", "text", "lang", "source", "embedding")

  /** (file name → mtime) snapshot of every corpus bucket directory. */
  private def bucketFiles(w: String): Map[String, Long] = {
    val base = new Path(s"$w/corpus")
    val fs = base.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(base)) Map.empty
    else fs.listStatus(base).filter(_.getPath.getName.startsWith("bucket=")).flatMap { d =>
      fs.listStatus(d.getPath).filterNot(_.getPath.getName.startsWith("_")).map { f =>
        s"${d.getPath.getName}/${f.getPath.getName}" -> f.getModificationTime
      }
    }.toMap
  }

  private def labels(w: String, batch: Long): Seq[(Long, Long)] =
    spark.read.option("basePath", s"$w/labels").parquet(s"$w/labels")
      .filter(col("batch") === batch)
      .select(col("doc_id"), col("label")).as[(Long, Long)].collect().toSeq.sorted

  // Distinct filler words keep base docs far apart (no accidental pairs).
  private def filler(id: Long): String =
    (0 until 12).map(j => s"w${id}_$j").mkString(" ")

  test("a one-bucket batch rewrites exactly that bucket; ledger appends are batch-sized") {
    val w = work("obatch")
    val m = new graft.operators.LiveCorpus.Maintainer(w)
    m.apply(batchDf((0L until 200L).map(i => ("i", i, filler(i)))), 0L)
    val before = bucketFiles(w)
    assert(before.keys.map(_.split("/")(0)).toSet.size == 16, "all 16 buckets populated")

    // insert 208, update 16, delete 48 — all ≡ 0 (mod 16): bucket 0 only
    m.apply(batchDf(Seq(("i", 208L, filler(208L)), ("u", 16L, filler(16L) + " v2"),
      ("d", 48L, null))), 1L)
    val after = bucketFiles(w)
    val changed = (after.keySet ++ before.keySet).filter(k =>
      before.get(k) != after.get(k)).map(_.split("/")(0)).toSet
    assert(changed == Set("bucket=0"),
      s"batch touching only bucket 0 must rewrite only bucket 0, got $changed")

    // versioned ledger appends sized by the batch (2 upserts), not the corpus
    def rows(sub: String) = spark.read.parquet(s"$w/$sub/batch=1").count()
    assert(rows("sigs") == 2L)
    assert(rows("bands") == 8L) // 2 upserts × 4 bands
    assert(rows("lists") == 2L)
    // corpus fold: 200 + 1 insert − 1 delete
    val st = spark.read.option("basePath", s"$w/corpus").parquet(s"$w/corpus")
    assert(st.count() == 200L)
    assert(st.filter(col("doc_id") === 48L).isEmpty)
    assert(st.filter(col("doc_id") === 16L).select("ver").as[Long].head() == 1L)
  }

  test("deleting a cluster's min relabels only that component; updating a member retires its edges") {
    val w = work("labels")
    val m = new graft.operators.LiveCorpus.Maintainer(w)
    val dup = "alpha beta gamma delta epsilon zeta eta theta"
    val other = "iota kappa lambda mu nu xi omicron pi"
    // two exact-dup clusters {1,2,3} and {10,11}, plus isolated filler
    val b0 = (20L until 40L).map(i => ("i", i, filler(i))) ++
      Seq(("i", 1L, dup), ("i", 2L, dup), ("i", 3L, dup),
        ("i", 10L, other), ("i", 11L, other))
    m.apply(batchDf(b0), 0L)
    assert(labels(w, 0L) == Seq((1L, 1L), (2L, 1L), (3L, 1L), (10L, 10L), (11L, 10L)))

    // delete the {1,2,3} min: ONLY that component relabels (min 1 → 2);
    // {10,11} passes through verbatim
    m.apply(batchDf(Seq(("d", 1L, null))), 1L)
    assert(labels(w, 1L) == Seq((2L, 2L), (3L, 2L), (10L, 10L), (11L, 10L)))

    // update 3 to unrelated text: its old edges retire, {2} becomes a
    // singleton and exits; nothing else moves
    m.apply(batchDf(Seq(("u", 3L, filler(99L)))), 2L)
    assert(labels(w, 2L) == Seq((10L, 10L), (11L, 10L)))

    // new arrival duplicating the updated text re-clusters with doc 3
    m.apply(batchDf(Seq(("i", 50L, filler(99L)))), 3L)
    assert(labels(w, 3L) == Seq((3L, 3L), (10L, 10L), (11L, 10L), (50L, 3L)))
  }
}
