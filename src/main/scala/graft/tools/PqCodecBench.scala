package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.Similarity

/** PQ codec sweep — the measurement behind the codec constants (r17
  * verdict task 2): `sim_ivfpq_adaptive_recall` read 9/30 where the
  * coarse index alone reads 27/30, i.e. the 4-subspace × 8-codeword
  * codebook's ADC ranking error ate 18 of 30 hits. This tool prices the
  * codebook-size / subspace-count trade at corpus scale: for each
  * (nSub, codewords) arm it trains the codebook, runs the IVF-PQ
  * composition at the ADAPTIVE coarse geometry (nlist = √n rule,
  * nProbe = nlist^(1/3) rule — the geometry that ships), and reports
  * recall@3 against one brute ground-truth pass, plus code bytes per
  * vector and train/search walls.
  *
  * Usage: `graft.tools.PqCodecBench [nRecallQueries]`, env
  * GRAFT_SCALE_OUT (corpus dir, default /tmp/graft_scale100),
  * SPARK_GRAFT_CPUS. Prints one JSON line per arm.
  */
object PqCodecBench {
  def main(args: Array[String]): Unit = {
    val nRecallQ = args.headOption.map(_.toLong).getOrElse(100L)
    val dir = sys.env.getOrElse("GRAFT_SCALE_OUT", "/tmp/graft_scale100")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val e = spark.read.parquet(s"$dir/embeddings.parquet").localCheckpoint()
    val n = e.count()
    val nlist = Similarity.adaptiveLists(n)
    val nProbe = Similarity.adaptiveProbes(nlist)

    // brute top-3 ground truth over the query sample
    val exact = Similarity.knnBrute(e, col("vec_id"), col("embedding"),
        col("vec_id") < nRecallQ, k = 3)
      .select(col("query_id"), col("neighbor_id")).localCheckpoint()
    val nExact = exact.count()

    // the adaptive coarse index, trained ONCE (shared by every codec arm)
    val cents = Similarity.kmeansTrain(e, col("vec_id"), col("embedding"),
      col("vec_id") < nlist, iters = 2).localCheckpoint()

    // coarse-only reference: recall of the same probes with EXACT ranking
    val coarseHits = exact.join(
      Similarity.ivfSearch(e, col("vec_id"), col("embedding"), cents,
          queryPred = col("vec_id") < nRecallQ, nProbe = nProbe, k = 3)
        .select(col("query_id"), col("neighbor_id")),
      Seq("query_id", "neighbor_id")).count()
    println(s"""{"arm":"coarse_exact","nlist":$nlist,"n_probe":$nProbe,""" +
      s""""recall3":${coarseHits.toDouble / nExact},"n":$n}""")

    // grid override: GRAFT_PQ_SUBS / GRAFT_PQ_CWS as comma lists
    val subs = sys.env.getOrElse("GRAFT_PQ_SUBS", "4,8,16").split(",").map(_.toInt).toSeq
    val cws = sys.env.getOrElse("GRAFT_PQ_CWS", "8,32,64,256").split(",").map(_.toInt).toSeq
    for {
      nSub <- subs
      cw <- cws
    } {
      val subDim = 64 / nSub
      val t0 = System.nanoTime()
      val cb = Similarity.pqTrain(e, col("vec_id"), col("embedding"),
        col("vec_id") < cw, nSub = nSub, subDim = subDim).localCheckpoint()
      val trainS = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val adc = Similarity.ivfPqSearch(e, col("vec_id"), col("embedding"),
          cents, cb, queryPred = col("vec_id") < nRecallQ,
          nProbe = nProbe, k = 3, nSub = nSub, subDim = subDim)
        .select(col("query_id"), col("neighbor_id")).localCheckpoint()
      val searchS = (System.nanoTime() - t1) / 1e9
      val hits = exact.join(adc, Seq("query_id", "neighbor_id")).count()
      // code bytes: nSub codes at ⌈log2(cw)⌉ bits, byte-aligned total
      val bits = nSub * (64 - java.lang.Long.numberOfLeadingZeros(cw - 1L))
      println(f"""{"arm":"pq","n_sub":$nSub,"codewords":$cw,""" +
        f""""bytes_per_vec":${(bits + 7) / 8},""" +
        f""""recall3":${hits.toDouble / nExact}%.4f,""" +
        f""""train_s":$trainS%.2f,"search_s":$searchS%.2f}""")
      // the REFINE arms: ADC shortlist → exact rerank of the shortlist
      val lists = sys.env.getOrElse("GRAFT_PQ_REFINE", "10,25,50")
        .split(",").map(_.toInt).toSeq
      for (r <- lists) {
        val t2 = System.nanoTime()
        val ref = Similarity.ivfPqSearchRefined(e, col("vec_id"), col("embedding"),
            cents, cb, queryPred = col("vec_id") < nRecallQ,
            nProbe = nProbe, k = 3, nSub = nSub, subDim = subDim, shortlist = r)
          .select(col("query_id"), col("neighbor_id")).localCheckpoint()
        val refS = (System.nanoTime() - t2) / 1e9
        val rHits = exact.join(ref, Seq("query_id", "neighbor_id")).count()
        println(f"""{"arm":"pq_refined","n_sub":$nSub,"codewords":$cw,""" +
          f""""shortlist":$r,"recall3":${rHits.toDouble / nExact}%.4f,""" +
          f""""search_s":$refS%.2f}""")
      }
    }
    spark.stop()
  }
}
