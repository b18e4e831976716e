package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`array<float>`).
  *
  * Cosine is computed over 1e-3-quantized integer components: integer dot
  * products and norms (order-free, exact), then a single sqrt + division.
  * This makes every similarity value bit-identical across engines and
  * partitionings — float summation order can never flip a threshold or a
  * rank — at a negligible quantization cost (~1e-3 relative).
  *
  * Scale shapes (100 TB): brute-force kNN broadcasts the (small) query set
  * over a scan; pair search uses blocking keys; the ANN path buckets by
  * random-hyperplane LSH so candidate generation is an equi-join on the
  * bucket id. IVF assignment is a broadcast argmax over a centroid table.
  */
object Similarity {

  /** Quantized vector (array<long>) and its squared norm. */
  def quantize(emb: Column): Column =
    transform(emb, x => round(x.cast("double") * 1000).cast("long"))

  def sqNorm(qv: Column): Column =
    aggregate(transform(qv, x => x * x), lit(0L), (acc, v) => acc + v)

  /** Exact integer dot product of two quantized vectors. */
  def dotQ(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, v) => acc + v)

  /** Deterministic cosine from quantized vectors + precomputed sq-norms. */
  def cosineQ(a: Column, na: Column, b: Column, nb: Column): Column =
    dotQ(a, b).cast("double") / sqrt((na * nb).cast("double"))

  /** Embeddings table → (id, v, nrm) with quantized vectors. */
  def prepared(embs: DataFrame, id: Column, emb: Column): DataFrame =
    embs.select(id.as("vec_id"), quantize(emb).as("v"))
      .withColumn("nrm", sqNorm(col("v")))

  /** Brute-force cosine top-k: the exact baseline. The query set is
    * broadcast (nested-loop join); every executor scans its partition of
    * the corpus once; per-query heaps via window rank.
    */
  def knnBrute(embs: DataFrame, id: Column, emb: Column,
      queryPred: Column, k: Int = 5): DataFrame = {
    val p = prepared(embs, id, emb)
    val q = broadcast(embs.filter(queryPred).select(id.as("query_id"), quantize(emb).as("qv"))
      .withColumn("qn", sqNorm(col("qv"))))
    val scored = q.join(p, col("query_id") =!= col("vec_id"))
      .withColumn("sim", cosineQ(col("qv"), col("qn"), col("v"), col("nrm")))
    val w = Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        col("rank").cast("long").as("rank"), col("sim"))
  }

  /** All pairs above a similarity threshold within a blocking key (the
    * embedding-cosine near-dup operator). Blocking bounds the join size;
    * at scale the block key is a coarse cluster / LSH bucket.
    */
  def thresholdPairs(embs: DataFrame, id: Column, emb: Column,
      block: Column, threshold: Double): DataFrame = {
    val p = embs.select(id.as("vec_id"), block.as("blk"), quantize(emb).as("v"))
      .withColumn("nrm", sqNorm(col("v")))
    val a = p.select(col("blk"), col("vec_id").as("id_a"), col("v").as("va"), col("nrm").as("na"))
    val b = p.select(col("blk"), col("vec_id").as("id_b"), col("v").as("vb"), col("nrm").as("nb"))
    a.join(b, Seq("blk")).filter(col("id_a") < col("id_b"))
      .withColumn("sim", cosineQ(col("va"), col("na"), col("vb"), col("nb")))
      .filter(col("sim") >= threshold)
      .select(col("id_a"), col("id_b"), col("sim"))
  }

  /** Random-hyperplane LSH bucket id (numPlanes bits). Hyperplane
    * components are ±1 from an LCG over (plane, component) — deterministic
    * and engine-portable. dot(v, plane) is an exact integer sum.
    */
  def lshBuckets(p: DataFrame, numPlanes: Int = 8, dim: Int = 64): DataFrame = {
    val pe = p.select(col("vec_id"), posexplode(col("v")).as(Seq("pos", "q")))
      .select(col("vec_id"), col("pos"), col("q"),
        explode(sequence(lit(0), lit(numPlanes - 1))).as("j"))
      .withColumn("sign",
        when(expr(s"((1664525 * (j * $dim + pos) + 1013904223) >> 15) % 2") === 0, 1L)
          .otherwise(-1L))
    pe.groupBy(col("vec_id"), col("j"))
      .agg(sum(col("sign") * col("q")).as("d"))
      .groupBy(col("vec_id"))
      .agg(sum(when(col("d") > 0, expr("shiftleft(cast(1 as bigint), j)"))
        .otherwise(0L)).as("bucket"))
  }

  /** ANN top-1 neighbor within the LSH bucket (the scale path: candidate
    * generation is an equi-join on `bucket`, never all-pairs).
    */
  def annLshTop1(embs: DataFrame, id: Column, emb: Column, numPlanes: Int = 8): DataFrame = {
    val p = prepared(embs, id, emb)
    val withBucket = p.join(lshBuckets(p, numPlanes), Seq("vec_id"))
    val a = withBucket.select(col("bucket"), col("vec_id"), col("v"), col("nrm"))
    val b = withBucket.select(col("bucket"), col("vec_id").as("cand_id"),
      col("v").as("vb"), col("nrm").as("nb"))
    val w = Window.partitionBy(col("vec_id")).orderBy(col("sim").desc, col("cand_id"))
    a.join(b, Seq("bucket")).filter(col("vec_id") =!= col("cand_id"))
      .withColumn("sim", cosineQ(col("v"), col("nrm"), col("vb"), col("nb")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("cand_id").as("ann_id"), col("sim"))
  }

  /** IVF coarse assignment: nearest centroid (broadcast argmax). */
  def ivfAssign(embs: DataFrame, id: Column, emb: Column, centroidPred: Column): DataFrame = {
    val p = prepared(embs, id, emb)
    val cents = broadcast(embs.filter(centroidPred)
      .select(id.as("centroid_id"), quantize(emb).as("cv"))
      .withColumn("cn", sqNorm(col("cv"))))
    val w = Window.partitionBy(col("vec_id")).orderBy(col("sim").desc, col("centroid_id"))
    p.crossJoin(cents)
      .withColumn("sim", cosineQ(col("v"), col("nrm"), col("cv"), col("cn")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("centroid_id"), col("sim"))
  }
}
