package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Micro-benchmark for scalar-expression variants, isolated from
  * query-level noise: one in-memory column, alternating timed sweeps of
  * each variant in the SAME JVM (so JIT/codegen warmup amortizes
  * equally). Used to justify (or reject) native-Expression rewrites of
  * hot scalars — first subject: `Portable.phash64` native digest-bytes
  * expression vs the builtin composition `conv(substr(md5(x),1,15),16,10)`.
  *
  * Usage: `graft.tools.ExprBench [nRows]` — prints one line per sweep.
  */
object ExprBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(3000000L)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = spark.range(n)
      .select(concat(lit("shingle token body "), col("id")).as("s"))
      .localCheckpoint()
    def time(tag: String, c: org.apache.spark.sql.Column): Unit = {
      val t0 = System.nanoTime()
      val r = df.select(sum(pmod(c, lit(1000003L)))).head().getLong(0)
      println(f"$tag%8s ${(System.nanoTime() - t0) / 1e9}%6.3f s  sum=$r")
    }
    // array path: the HOF-lambda regime every shingle array runs through
    val arr = spark.range(n / 16)
      .select(transform(sequence(lit(0), lit(15)),
        i => concat(lit("tok "), col("id"), lit("_"), i)).as("a"))
      .localCheckpoint()
    def timeArr(tag: String, f: org.apache.spark.sql.Column => org.apache.spark.sql.Column): Unit = {
      val t0 = System.nanoTime()
      val r = arr.select(sum(aggregate(transform(col("a"), f),
        lit(0L), (acc, x) => acc + pmod(x, lit(1000003L))))).head().getLong(0)
      println(f"$tag%8s ${(System.nanoTime() - t0) / 1e9}%6.3f s  sum=$r (array path)")
    }
    for (_ <- 1 to 3) {
      time("native", graft.functions.Portable.phash64(col("s")))
      time("legacy", graft.functions.Portable.phash64Legacy(col("s")))
    }
    for (_ <- 1 to 3) {
      timeArr("native", x => graft.functions.Portable.phash64(x))
      timeArr("legacy", x => graft.functions.Portable.phash64Legacy(x))
    }
    // dot-product path: two quantized 64-dim vectors per row, the scored-
    // join kernel of every vector operator
    val vecs = spark.range(n / 4)
      .select(transform(sequence(lit(0), lit(63)),
          i => pmod(col("id") * (i + lit(7)), lit(2001L)) - lit(1000L)).as("a"),
        transform(sequence(lit(0), lit(63)),
          i => pmod(col("id") * (i + lit(13)), lit(2001L)) - lit(1000L)).as("b"))
      .localCheckpoint()
    def timeDot(tag: String, f: (org.apache.spark.sql.Column, org.apache.spark.sql.Column) => org.apache.spark.sql.Column): Unit = {
      val t0 = System.nanoTime()
      val r = vecs.select(sum(pmod(f(col("a"), col("b")), lit(1000003L))))
        .head().getLong(0)
      println(f"$tag%8s ${(System.nanoTime() - t0) / 1e9}%6.3f s  sum=$r (dot path)")
    }
    for (_ <- 1 to 3) {
      timeDot("native", (a, b) => graft.functions.Similarity.dotQ(a, b))
      timeDot("legacy", (a, b) => graft.functions.Similarity.dotQLegacy(a, b))
    }
    // minhash-signature path: 16 permutation minima over a 32-shingle
    // array per row — fused single pass vs 16 transform+array_min sweeps
    val sarr = spark.range(n / 8)
      .select(transform(sequence(lit(0), lit(31)),
        i => pmod(col("id") * (i + lit(3)), lit(4294967296L))).as("s"))
      .localCheckpoint()
    def timeSig(tag: String, c: org.apache.spark.sql.Column): Unit = {
      val t0 = System.nanoTime()
      val r = sarr.select(sum(pmod(c, lit(1000003L)))).head().getLong(0)
      println(f"$tag%8s ${(System.nanoTime() - t0) / 1e9}%6.3f s  sum=$r (minhash path)")
    }
    val fusedSum = aggregate(graft.plans.MinhashSig(col("s"), 16),
      lit(0L), (acc, x) => acc + x)
    val legacySum = (0 until 16).map { j =>
      val (a, b) = graft.functions.Dedup.perm(j)
      array_min(transform(col("s"),
        h => (lit(a) * h + lit(b)) % lit(graft.functions.Dedup.MinhashPrime)))
    }.reduce(_ + _)
    for (_ <- 1 to 3) {
      timeSig("native", fusedSum)
      timeSig("legacy", legacySum)
    }
    // lsh-bucket path: all plane sign bits from one 64-dim quantized
    // vector per row — fused single pass vs numPlanes aggregate(zip_with)
    // sweeps (8 planes so the two forms are value-identical; the fused
    // win grows with the plane count the adaptive sizing turns up)
    def timeBkt(tag: String, c: org.apache.spark.sql.Column): Unit = {
      val t0 = System.nanoTime()
      val r = vecs.select(sum(pmod(c, lit(1000003L)))).head().getLong(0)
      println(f"$tag%8s ${(System.nanoTime() - t0) / 1e9}%6.3f s  sum=$r (lsh-bucket path)")
    }
    for (_ <- 1 to 3) {
      timeBkt("native", graft.functions.Similarity.lshBucketCol(col("a"), 8))
      timeBkt("legacy", graft.functions.Similarity.lshBucketColComposed(col("a"), 8))
    }
    // audio-energy path: every 16-byte window's Σ sample² from one
    // ~256-char payload per row — fused single byte pass vs the scalar
    // composition (per-window transform + per-sample aggregate; the
    // QUERY-level composition additionally explodes rows through two
    // exchanges, so this scalar-vs-scalar ratio is its lower bound)
    val pays = spark.range(n / 16)
      .select(concat(lit("audio payload 0123456789 "),
        lpad(col("id").cast("string"), 230, "x7 ")).as("s"))
      .localCheckpoint()
    def timeAud(tag: String, c: org.apache.spark.sql.Column): Unit = {
      val t0 = System.nanoTime()
      val r = pays.select(sum(pmod(aggregate(c, lit(0L), (acc, x) => acc + x),
        lit(1000003L)))).head().getLong(0)
      println(f"$tag%8s ${(System.nanoTime() - t0) / 1e9}%6.3f s  sum=$r (audio path)")
    }
    def winChunk(w: org.apache.spark.sql.Column) =
      substr(col("s"), (w * 16 + 1).cast("int"), lit(16))
    val composedEnergies = transform(
      sequence(lit(0L), ((length(col("s")) - 1) / 16).cast("long")),
      w => aggregate(
        transform(sequence(lit(1), length(winChunk(w))),
          p => ascii(substr(winChunk(w), p, lit(1))) - 110),
        lit(0L), (acc, d) => acc + d.cast("long") * d.cast("long")))
    for (_ <- 1 to 3) {
      timeAud("native", graft.plans.AudioEnergies(col("s"), 16))
      timeAud("legacy", composedEnergies)
    }
    spark.stop()
  }
}
