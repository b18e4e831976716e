package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.CatalystBridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** graft's portable 60-bit string hash (first 15 hex chars of MD5 — see
  * `Portable.phash64`) as ONE native codegen'd Catalyst expression.
  *
  * The function-composition form (`conv(substr(md5(x),1,15),16,10)` cast
  * long) is correct but pays three string materializations per value on
  * top of the digest: the 32-char hex encoding, the 15-char substring,
  * and `conv`'s DECIMAL-STRING intermediate that the final cast re-parses.
  * This expression computes the identical value straight from the digest
  * bytes — the first 8 bytes read big-endian, unsigned-shifted right one
  * nibble to drop the 16th hex char — with a thread-local MessageDigest,
  * and stays inside whole-stage codegen via `doGenCode`.
  *
  * It is the hottest scalar in the engine: every shingle of every document
  * passes through it in the dedup/text family (MinHash, SimHash,
  * n-gram-Jaccard, prefix filtering, winnowing, contamination, novelty),
  * so at corpus scale this is the difference between one digest pass and
  * a digest pass plus three per-shingle string round-trips.
  *
  * Value-identical to the legacy composition by construction; the
  * equivalence is law-tested in PropertySpec on arbitrary strings and
  * every oracle-gated query that hashes shingles re-proves it end-to-end.
  */
case class Phash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "phash64"

  override protected def nullSafeEval(input: Any): Any =
    Phash64.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.Phash64.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): Phash64 =
    copy(child = newChild)
}

object Phash64 {
  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 15 hex chars of md5(bytes) as a long ≡ (big-endian first 8
    * digest bytes) >>> 4 — 60 bits, always non-negative.
    */
  def hash(s: UTF8String): Long = {
    val d = digest.get()
    d.reset()
    val b = d.digest(s.getBytes)
    (((b(0) & 0xffL) << 56) | ((b(1) & 0xffL) << 48) |
      ((b(2) & 0xffL) << 40) | ((b(3) & 0xffL) << 32) |
      ((b(4) & 0xffL) << 24) | ((b(5) & 0xffL) << 16) |
      ((b(6) & 0xffL) << 8) | (b(7) & 0xffL)) >>> 4
  }

  def apply(c: Column): Column =
    CatalystBridge.column(Phash64(CatalystBridge.expression(c.cast("string"))))
}
