package graft.plans

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.CatalystBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** All `numPlanes` random-hyperplane sign bits in ONE pass over the
  * quantized vector — the bucket-id kernel of the embedding-LSH family
  * (`Similarity.lshBucketCol` runs it once per corpus row in
  * `dedup_embed_cosine` / `dedup_embed_adaptive` / `sim_ann_lsh` /
  * `mm_near_dup`).
  *
  * The composition form runs `numPlanes` separate
  * `aggregate(zip_with(v, signs_j, _*_), 0L, _+_)` sweeps — one array
  * traversal plus one intermediate product array per plane per row. This
  * expression is a single fused loop keeping the plane dot products in a
  * local long array (±1 signs become add/subtract — no multiply, no
  * allocation beyond the dots array).
  *
  * Sign family: the engine's fixed public LCG over the flattened
  * (plane, position) index — `sign(j, pos) = +1` iff
  * `((1664525·(j·dim+pos) + 1013904223) >> 15) % 2 == 0`, evaluated in
  * 64-bit arithmetic. For `j·dim+pos ≤ 511` (any `numPlanes ≤ 8` at
  * dim 64) this is bit-identical to [[graft.functions.Similarity.planeSign]]'s
  * 32-bit form (the products stay below 2^31), which is what the existing
  * 8-plane oracles pin; beyond 512 the 64-bit form IS the definition
  * (adaptive plane counts), matching the DuckDB oracle's native BIGINT
  * arithmetic with no wrap emulation. Pinned against the composed form by
  * a PropertySpec law and the full oracle gate.
  *
  * Null semantics mirror the composition exactly: a NULL input vector, a
  * vector whose length ≠ `dim`, or any NULL element makes every plane's
  * zip_with/aggregate sum NULL, and `when(d > 0, bit).otherwise(0)` then
  * contributes 0 for every plane — bucket 0, never NULL (the expression is
  * non-nullable, so null-vector rows still land in a bucket equi-join
  * exactly as the composed form groups them). Input type is checked at
  * analysis (`array<bigint>` only): a wrong-typed SQL call to
  * `lsh_bucket(v, p, d)` fails analysis instead of reading garbage bytes
  * off the unsafe array.
  */
case class LshBucket(child: Expression, numPlanes: Int, dim: Int)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = false

  // Analysis-time input validation (ExpectsInputTypes' AbstractDataType is
  // private[sql] in Spark 4): anything but array<bigint> would reach
  // ArrayData.getLong and silently read wrong bytes off an unsafe array.
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint> input, got ${other.simpleString}")
  }
  override def prettyName: String = "lsh_bucket"

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) 0L
    else LshBucket.compute(v.asInstanceOf[ArrayData], numPlanes, dim)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val nullGuard =
      if (child.nullable) s"${childGen.isNull} ? 0L : " else ""
    ev.copy(
      code = code"""
        ${childGen.code}
        long ${ev.value} = $nullGuard
          graft.plans.LshBucket.compute(${childGen.value}, $numPlanes, $dim);
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): LshBucket =
    copy(child = newChild)
}

object LshBucket {
  /** Flattened ±1 sign matrix for (numPlanes, dim), row-major by plane —
    * built once per shape and shared across partitions/codegen instances.
    */
  private val signCache = new ConcurrentHashMap[(Int, Int), Array[Byte]]()

  private def signs(numPlanes: Int, dim: Int): Array[Byte] =
    signCache.computeIfAbsent((numPlanes, dim), { case (p, d) =>
      val out = new Array[Byte](p * d)
      var idx = 0
      while (idx < out.length) {
        out(idx) =
          if ((((1664525L * idx + 1013904223L) >> 15) % 2) == 0) 1 else -1
        idx += 1
      }
      out
    })

  def compute(v: ArrayData, numPlanes: Int, dim: Int): Long = {
    val n = v.numElements()
    if (n != dim) return 0L
    var i = 0
    while (i < n) { // any null element ⇒ every plane sum is null ⇒ bucket 0
      if (v.isNullAt(i)) return 0L
      i += 1
    }
    val sg = signs(numPlanes, dim)
    val dots = new Array[Long](numPlanes)
    i = 0
    while (i < n) {
      val x = v.getLong(i)
      var j = 0
      while (j < numPlanes) {
        if (sg(j * dim + i) == 1) dots(j) += x else dots(j) -= x
        j += 1
      }
      i += 1
    }
    var bucket = 0L
    var j = 0
    while (j < numPlanes) {
      if (dots(j) > 0) bucket |= (1L << j)
      j += 1
    }
    bucket
  }

  def apply(c: Column, numPlanes: Int, dim: Int): Column =
    CatalystBridge.column(LshBucket(CatalystBridge.expression(c), numPlanes, dim))
}
