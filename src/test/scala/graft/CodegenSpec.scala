package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.CatalystBridge
import org.scalatest.funsuite.AnyFunSuite

/** Whole-stage-codegen COMPILATION lock for the native kernels.
  *
  * Correctness gates cannot catch a broken `doGenCode`: Spark swallows
  * the Janino CompileException at execution time and silently falls back
  * to interpreted eval — values stay right, whole-stage codegen silently
  * dies for the whole stage. Round 13 found exactly that had happened to
  * `MinhashSig` (no static forwarder for a companion method named
  * `eval`). This spec force-compiles the generated source for a plan
  * containing each native kernel, so the regression class fails loudly.
  */
class CodegenSpec extends AnyFunSuite {
  lazy val spark = SparkTest.spark

  private def assertCompiles(df: org.apache.spark.sql.DataFrame,
      tag: String): Unit = {
    val n = CatalystBridge.compileWholeStage(df)
    assert(n >= 1, s"$tag: no WholeStageCodegen subtree in the plan — " +
      "the kernel fell out of codegen entirely:\n" +
      df.queryExecution.executedPlan.toString)
  }

  test("every native kernel compiles inside whole-stage codegen") {
    // range scans, not local Seqs — ConvertToLocalRelation would fold a
    // LocalRelation projection away and leave no codegen subtree to prove
    val r = spark.range(8)
    assertCompiles(r.select(
      graft.functions.Portable.phash64(concat(lit("tok "), col("id"))).as("h"),
      graft.plans.JavaStringHash(col("id").cast("string")).as("jh")),
      "phash64+java_string_hash")

    val vecs = r.select(
      transform(sequence(lit(0L), lit(63L)), j => col("id") * j).as("a"),
      transform(sequence(lit(0L), lit(63L)), j => col("id") + j).as("b"))
    assertCompiles(vecs.select(
      graft.functions.Similarity.dotQ(col("a"), col("b")).as("d"),
      graft.functions.Similarity.lshBucketCol(col("a"), 12).as("bkt")),
      "dot_q+lsh_bucket")

    val sigs = r.select(
      transform(sequence(lit(0L), lit(31L)), j => col("id") * 31 + j).as("s"))
    assertCompiles(sigs.select(
      graft.plans.MinhashSig(col("s"), 16).as("sig")), "minhash_sig")

    assertCompiles(r.select(
      graft.plans.MongoComputeHash(col("id")).as("mh")), "mongo_hash")

    val pays = r.select(
      concat(lit("audio payload 0123 "), col("id").cast("string")).as("s"))
    assertCompiles(pays.select(
      graft.plans.AudioEnergies(col("s"), 16).as("e"),
      graft.plans.AudioTrimStats(
        graft.plans.AudioEnergies(col("s"), 16), 3000L).as("st"),
      graft.plans.AsciiNormalize(col("s")).as("norm"),
      graft.plans.AudioVadSegments(
        graft.plans.AudioEnergies(col("s"), 16), 3000L).as("vad")),
      "audio_energies+audio_trim_stats+ascii_normalize+vad_segments")
  }

  test("the lock has teeth: an expression whose doGenCode references a " +
      "missing method fails the compile check loudly") {
    val bad = CatalystBridge.column(BrokenCodegen(
      CatalystBridge.expression(col("id"))))
    val df = spark.range(4).select(bad.as("x"))
    val e = intercept[Exception] {
      CatalystBridge.compileWholeStage(df)
    }
    def causes(t: Throwable): Seq[Throwable] =
      Option(t).toSeq.flatMap(x => x +: causes(x.getCause))
    assert(causes(e).exists(
      _.getClass.getName.contains("CompileException")),
      s"expected a Janino CompileException in the cause chain, got $e")
  }

  test("lsh_bucket on the SQL surface matches the Column API") {
    graft.plans.GraftExtensions.register(spark)
    val df = spark.range(8).select(
      transform(sequence(lit(0L), lit(63L)), j => col("id") * j - 32).as("v"))
    df.createOrReplaceTempView("lshb_v")
    val viaSql = spark.sql(
      "SELECT lsh_bucket(v, 12, 64) AS b FROM lshb_v").collect().map(_.getLong(0))
    val viaCol = df.select(
      graft.functions.Similarity.lshBucketCol(col("v"), 12).as("b"))
      .collect().map(_.getLong(0))
    assert(viaSql.toSeq == viaCol.toSeq)
  }
}

/** Deliberately-broken codegen (test-only): the generated call targets a
  * method that does not exist, reproducing the missing-static-forwarder
  * failure class CodegenSpec exists to catch.
  */
case class BrokenCodegen(child: org.apache.spark.sql.catalyst.expressions.Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: org.apache.spark.sql.types.DataType =
    org.apache.spark.sql.types.LongType
  override protected def nullSafeEval(input: Any): Any = 0L
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.CodegenSpecNoSuchObject.noSuchMethod($c);")
  override protected def withNewChildInternal(
      newChild: org.apache.spark.sql.catalyst.expressions.Expression): BrokenCodegen =
    copy(child = newChild)
}
