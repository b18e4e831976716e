package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measured scale smoke: derive a deterministic ~10x corpus from a base
  * scale-factor directory and time the heaviest operators at BOTH
  * scales, so "would survive 10x" is observed wall-clock, not only a
  * plan audit (SCALE_r12.md records the results).
  *
  * The derivation preserves each table's STRUCTURE per replica instead
  * of naively duplicating rows — naive duplication would multiply
  * duplicate-cluster sizes by the replica count and inflate pair
  * generation quadratically, turning an honest linear operator into a
  * fake super-linear one:
  *  - documents: ids lift by a multiple of 50 (the benchmark-set and
  *    split conventions survive), and every token gets a per-replica
  *    suffix, so shingle/minhash/cluster structure repeats per replica
  *    but never collides across replicas;
  *  - embeddings: ids lift in lockstep with documents (the
  *    doc_id = vec_id join alignment survives); vectors cyclically
  *    rotate by the replica index, preserving within-replica cosine
  *    structure while decorrelating replicas;
  *  - events: user and event ids lift by multiples of the corpus'
  *    modular conventions (user_id % 4 / % 50, event_id % 97 ...), so
  *    per-replica op/ns/gid proportions match the base corpus; the time
  *    range is shared (10x traffic over the same wall-clock, as a 10x
  *    deployment would see);
  *  - orders/lineitem: order keys lift jointly so the join degree per
  *    key is unchanged.
  *
  * Usage: `graft.tools.ScaleSmoke [queryName ...]` with env
  * GRAFT_SCALE_BASE (default /root/testdata/sf0.1), GRAFT_SCALE_OUT
  * (default /tmp/graft_scale10), GRAFT_SCALE_REPS (default 10). Prints
  * one JSON line per query: base/scaled wall-clocks (two runs each, min
  * is the steady-state number) and the growth ratio.
  */
object ScaleSmoke {

  val DefaultQueries: Seq[String] = Seq(
    "dedup_minhash_lsh", "dedup_components", "dedup_embed_cosine",
    "text_contamination", "text_split_leakfree", "pipe_corpus_build",
    "q12_bucketed_join", "q21_funnel", "cdc_apply", "stream_join")

  private def lift(maxVal: Long, multipleOf: Long): Long =
    ((maxVal / multipleOf) + 1L) * multipleOf

  def stage(spark: SparkSession, base: String, out: String, reps: Int): Unit = {
    val fs = new org.apache.hadoop.fs.Path(out)
      .getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(new org.apache.hadoop.fs.Path(s"$out/_STAGED"))) return
    val rCol = explode(sequence(lit(0L), lit(reps - 1L))).as("r")

    val docs = spark.read.parquet(s"$base/documents.parquet")
    val docLift = lift(docs.agg(max("doc_id")).head().getLong(0), 50L)
    docs.select(col("*"), rCol)
      .select((col("doc_id") + col("r") * docLift).as("doc_id"),
        when(col("r") === 0, col("text"))
          .otherwise(array_join(transform(split(col("text"), " "),
            w => concat(w, lit("_x"), col("r"))), " ")).as("text"),
        col("lang"), col("source"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .repartition(32).write.mode("overwrite").parquet(s"$out/documents.parquet")

    val emb = spark.read.parquet(s"$base/embeddings.parquet")
    // rotation index mod dim: replicas past r = dim wrap (slice with a
    // start beyond the array, or a negative length, breaks at reps > 64)
    emb.select(col("*"), rCol)
      .withColumn("rr", pmod(col("r"), size(col("embedding"))))
      .select((col("vec_id") + col("r") * docLift).as("vec_id"),
        concat(
          slice(col("embedding"), col("rr") + 1,
            size(col("embedding")) - col("rr")),
          slice(col("embedding"), lit(1), col("rr"))).as("embedding"),
        col("label"))
      .repartition(32).write.mode("overwrite").parquet(s"$out/embeddings.parquet")

    val ev = spark.read.parquet(s"$base/events.parquet")
    val evLift = lift(ev.agg(max("event_id")).head().getLong(0),
      97L * 5 * 7 * 3 * 4 * 101) // the corpus' event_id modular conventions
    val userLift = lift(ev.agg(max("user_id")).head().getLong(0), 200L) // % 4, % 50
    ev.select(col("*"), rCol)
      .select((col("event_id") + col("r") * evLift).as("event_id"),
        col("ts"), (col("user_id") + col("r") * userLift).as("user_id"),
        col("event_type"), col("value"), col("props"))
      .repartition(32).write.mode("overwrite").parquet(s"$out/events.parquet")

    val ord = spark.read.parquet(s"$base/orders.parquet")
    val okLift = lift(ord.agg(max("o_orderkey")).head().getLong(0), 32L)
    ord.select(col("*"), rCol)
      .withColumn("o_orderkey", col("o_orderkey") + col("r") * okLift)
      .drop("r")
      .repartition(32).write.mode("overwrite").parquet(s"$out/orders.parquet")
    spark.read.parquet(s"$base/lineitem.parquet")
      .select(col("*"), rCol)
      .withColumn("l_orderkey", col("l_orderkey") + col("r") * okLift)
      .drop("r")
      .repartition(32).write.mode("overwrite").parquet(s"$out/lineitem.parquet")

    // small dims copied verbatim (q12 and friends only need the big five,
    // but a verbatim copy keeps the directory a complete sf layout)
    Seq("region", "nation", "customer", "supplier", "part").foreach { t =>
      spark.read.parquet(s"$base/$t.parquet")
        .write.mode("overwrite").parquet(s"$out/$t.parquet")
    }
    fs.create(new org.apache.hadoop.fs.Path(s"$out/_STAGED")).close()
  }

  private def clearDebris(spark: SparkSession): Unit =
    try {
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      spark.streams.resetTerminated()
      org.apache.spark.sql.execution.streaming.state.StateStore.stop()
    } catch { case _: Throwable => () }

  def main(args: Array[String]): Unit = {
    val base = sys.env.getOrElse("GRAFT_SCALE_BASE", "/root/testdata/sf0.1")
    val out = sys.env.getOrElse("GRAFT_SCALE_OUT", "/tmp/graft_scale10")
    val reps = sys.env.getOrElse("GRAFT_SCALE_REPS", "10").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    stage(spark, base, out, reps)

    val queries = if (args.nonEmpty) args.toSeq else DefaultQueries
    // warm the JVM the same way Bench does
    try {
      spark.range(1000000).selectExpr("sum(id)").collect()
      graft.SparkEntry.queries("q7_distinct")(spark, base).count()
    } catch { case _: Throwable => () }

    def time(name: String, dir: String): Double = {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, dir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      clearDebris(spark)
      dt
    }
    // GRAFT_SCALE_ONLY=1 skips the base-scale runs (A/B sweeps over a
    // knob at ONE scale don't need the ratio denominator re-measured per
    // arm; ratio reports -1 so a reader can't mistake it for a growth)
    val scaledOnly = sys.env.get("GRAFT_SCALE_ONLY").contains("1")
    val rows = queries.map { name =>
      val b = if (scaledOnly) Seq(-1.0) else Seq(time(name, base), time(name, base))
      val s = Seq(time(name, out), time(name, out))
      val ratio = if (scaledOnly) -1.0 else s.min / math.max(b.min, 1e-9)
      val j = f"""{"query":"$name","base_s":[${b.map(x => f"$x%.2f").mkString(",")}],""" +
        f""""scaled_s":[${s.map(x => f"$x%.2f").mkString(",")}],""" +
        f""""ratio":$ratio%.2f,"reps":$reps}"""
      println(j)
      j
    }
    // The occupancy counter-measure, measured: dedup_embed_cosine's LSH
    // bucket bits grown by ~log2(reps) at the scaled corpus, restoring
    // base occupancy (and so pair volume per row). Timed like the rest.
    val tuned = if (queries.contains("dedup_embed_cosine")) {
      val extraBits = (math.log(reps.toDouble) / math.log(2.0)).ceil.toInt
      def timeTuned(): Double = {
        val t0 = System.nanoTime()
        graft.operators.TextOps.embedCosineClusters(spark, out,
          numPlanes = 8 + extraBits).count()
        val dt = (System.nanoTime() - t0) / 1e9
        clearDebris(spark)
        dt
      }
      val t = Seq(timeTuned(), timeTuned())
      val j = f"""{"query":"dedup_embed_cosine#planes=${8 + extraBits}",""" +
        f""""scaled_s":[${t.map(x => f"$x%.2f").mkString(",")}],"reps":$reps}"""
      println(j)
      Seq(j)
    } else Nil
    val outFile = sys.env.getOrElse("GRAFT_SCALE_REPORT", "/tmp/graft_scale_report.jsonl")
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(outFile),
      (rows ++ tuned).mkString("", "\n", "\n"))
    catch { case e: Throwable => System.err.println(s"[scale] write failed: ${e.getMessage}") }
    spark.stop()
  }
}
