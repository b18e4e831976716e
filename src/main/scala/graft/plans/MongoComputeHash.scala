package graft.plans

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.CatalystBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** MongoDB hashed-shard-key hash (`convert(x, 'hashed')`) as a Catalyst
  * expression — required for orphan filtering parity on hashed shard types
  * (SURVEY.md §2.4 F8; reference `collector/filter/orphan_filter.go:93-135`,
  * which mirrors mongo/db/hasher.cpp).
  *
  * Algorithm for an int64 key: md5 over
  *   [seed: uint32 LE = 0][BSON type tag "number" = 10: uint32 LE]
  *   [value: uint64 LE]
  * then the first 8 digest bytes read little-endian as a signed int64.
  *
  * Deterministic and stateless; evaluated via interpreted path (md5 per
  * row — used only in the sharded-orphan planning step, not hot scans).
  */
case class MongoComputeHash(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "mongo_compute_hash"

  override protected def nullSafeEval(input: Any): Any =
    MongoComputeHash.hashLong(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.plans.MongoComputeHash.hashLong($c)")

  override protected def withNewChildInternal(newChild: Expression): MongoComputeHash =
    copy(child = newChild)
}

object MongoComputeHash {
  private val BsonTypeNumber = 10

  def hashLong(v: Long): Long = {
    val md = MessageDigest.getInstance("MD5")
    val buf = java.nio.ByteBuffer.allocate(16).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.putInt(0)              // seed
    buf.putInt(BsonTypeNumber) // bson type tag
    buf.putLong(v)             // uint64 LE payload
    val digest = md.digest(buf.array())
    java.nio.ByteBuffer.wrap(digest, 0, 8).order(java.nio.ByteOrder.LITTLE_ENDIAN).getLong
  }

  def apply(c: Column): Column =
    CatalystBridge.column(MongoComputeHash(CatalystBridge.expression(c.cast("long"))))
}
