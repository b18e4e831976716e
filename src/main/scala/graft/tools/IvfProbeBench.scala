package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.Similarity

/** Measures the two sides of the IVF nlist trade separately — the number
  * `Similarity.adaptiveLists`' Scaladoc cites: index BUILD cost grows
  * O(n · nlist) per k-means iteration, per-query SEARCH cost is
  * `nlist + nProbe · n / nlist` scored vectors. The end-to-end bench
  * harness (10 eval queries) is build-dominated, so the fixed-8 arm
  * looks faster there; a production index amortizes ONE build over a
  * query stream, and this tool times that regime: build once per arm
  * (timed), then search a 2000-query batch over the PREBUILT lists
  * (timed separately, two runs, min = steady state).
  *
  * r17 addition — the RECALL column the r16 verdict demanded next to
  * the speedup: for the adaptive-nlist index, sweep nProbe and report
  * recall@3 and recall@10 against one brute-force ground-truth pass
  * over a query sample, alongside the same sweep's search walls. The
  * fixed-8/nProbe=2 arm (the geometry the sf-gates attest) anchors the
  * recall bar the adaptive geometry must match.
  *
  * Usage: `graft.tools.IvfProbeBench [nQueries [nRecallQueries]]`, env
  * GRAFT_SCALE_OUT (corpus dir, default /tmp/graft_scale100),
  * SPARK_GRAFT_CPUS. Prints one JSON line per arm.
  */
object IvfProbeBench {
  def main(args: Array[String]): Unit = {
    val nQueries = args.headOption.map(_.toLong).getOrElse(2000L)
    val nRecallQ = args.drop(1).headOption.map(_.toLong).getOrElse(500L)
    val dir = sys.env.getOrElse("GRAFT_SCALE_OUT", "/tmp/graft_scale100")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val e = spark.read.parquet(s"$dir/embeddings.parquet").localCheckpoint()
    val n = e.count()

    // ONE brute ground-truth pass (k=10) over the recall sample — every
    // arm below is graded against this table.
    val exact = Similarity.knnBrute(e, col("vec_id"), col("embedding"),
        col("vec_id") < nRecallQ, k = 10)
      .select(col("query_id"), col("neighbor_id"), col("rank").as("erank"))
      .localCheckpoint()
    val nExact3 = exact.filter(col("erank") <= 3).count()
    val nExact10 = exact.count()

    def recallOf(ivf: org.apache.spark.sql.DataFrame): (Double, Double) = {
      val hits = exact.join(
        ivf.select(col("query_id"), col("neighbor_id"), col("rank").as("irank")),
        Seq("query_id", "neighbor_id"))
        .agg(
          coalesce(sum(when(col("erank") <= 3 && col("irank") <= 3, 1L)
            .otherwise(0L)), lit(0L)),
          count(lit(1))).head()
      (hits.getLong(0).toDouble / math.max(1L, nExact3),
        hits.getLong(1).toDouble / math.max(1L, nExact10))
    }

    val nlistA = Similarity.adaptiveLists(n)
    val arms = Seq(("fixed", 8, Seq(2)),
      ("adaptive", nlistA, Seq(2, 4, 8, 16, 32, 64)))
    arms.foreach { case (tag, nlist, probeArms) =>
      val t0 = System.nanoTime()
      val cents = Similarity.kmeansTrain(e, col("vec_id"), col("embedding"),
        col("vec_id") < nlist, iters = 2).localCheckpoint()
      val lists = Similarity.ivfLists(e, col("vec_id"), col("embedding"), cents)
        .localCheckpoint() // the persisted index artifact a deployment stores
      val buildS = (System.nanoTime() - t0) / 1e9
      probeArms.foreach { nProbe =>
        def searchOnce(): Double = {
          val t1 = System.nanoTime()
          Similarity.ivfSearchOnLists(e, col("vec_id"), col("embedding"),
            cents, queryPred = col("vec_id") < nQueries, lists,
            nProbe = nProbe).count()
          (System.nanoTime() - t1) / 1e9
        }
        val s1 = searchOnce(); val s2 = searchOnce()
        val (r3, r10) = recallOf(Similarity.ivfSearchOnLists(e, col("vec_id"),
          col("embedding"), cents, queryPred = col("vec_id") < nRecallQ, lists,
          nProbe = nProbe, k = 10))
        println(f"""{"arm":"$tag","nlist":$nlist,"n_probe":$nProbe,"n":$n,""" +
          f""""n_queries":$nQueries,"build_s":$buildS%.2f,""" +
          f""""search_s":[$s1%.2f,$s2%.2f],""" +
          f""""recall_at3":$r3%.4f,"recall_at10":$r10%.4f,""" +
          f""""n_recall_queries":$nRecallQ,""" +
          f""""scored_per_query":${nlist + nProbe.toLong * n / nlist}}""")
      }
    }
    spark.stop()
  }
}
