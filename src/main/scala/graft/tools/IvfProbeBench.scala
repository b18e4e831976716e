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
  * Usage: `graft.tools.IvfProbeBench [nQueries]`, env GRAFT_SCALE_OUT
  * (corpus dir, default /tmp/graft_scale100), SPARK_GRAFT_CPUS. Prints
  * one JSON line per arm.
  */
object IvfProbeBench {
  def main(args: Array[String]): Unit = {
    val nQueries = args.headOption.map(_.toLong).getOrElse(2000L)
    val dir = sys.env.getOrElse("GRAFT_SCALE_OUT", "/tmp/graft_scale100")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val e = spark.read.parquet(s"$dir/embeddings.parquet").localCheckpoint()
    val n = e.count()
    val arms = Seq("fixed" -> 8, "adaptive" -> Similarity.adaptiveLists(n))
    arms.foreach { case (tag, nlist) =>
      val t0 = System.nanoTime()
      val cents = Similarity.kmeansTrain(e, col("vec_id"), col("embedding"),
        col("vec_id") < nlist, iters = 2).localCheckpoint()
      val lists = Similarity.ivfLists(e, col("vec_id"), col("embedding"), cents)
        .localCheckpoint() // the persisted index artifact a deployment stores
      val buildS = (System.nanoTime() - t0) / 1e9
      def searchOnce(): Double = {
        val t1 = System.nanoTime()
        Similarity.ivfSearchOnLists(e, col("vec_id"), col("embedding"),
          cents, queryPred = col("vec_id") < nQueries, lists).count()
        (System.nanoTime() - t1) / 1e9
      }
      val s1 = searchOnce(); val s2 = searchOnce()
      println(f"""{"arm":"$tag","nlist":$nlist,"n":$n,"n_queries":$nQueries,""" +
        f""""build_s":$buildS%.2f,"search_s":[$s1%.2f,$s2%.2f],""" +
        f""""scored_per_query":${nlist + 2L * n / nlist}}""")
    }
    spark.stop()
  }
}
