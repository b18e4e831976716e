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
  // BSON canonical-type tags as the reference uses them
  // (`orphan_filter.go:19-23`).
  private val BsonTypeNumber = 10
  private val BsonTypeString = 15
  private val BsonTypeOid = 35

  private def digestLe(bytes: Array[Byte]): Long = {
    val md = MessageDigest.getInstance("MD5")
    val digest = md.digest(bytes)
    java.nio.ByteBuffer.wrap(digest, 0, 8).order(java.nio.ByteOrder.LITTLE_ENDIAN).getLong
  }

  def hashLong(v: Long): Long = {
    val buf = java.nio.ByteBuffer.allocate(16).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.putInt(0)              // seed
    buf.putInt(BsonTypeNumber) // bson type tag
    buf.putLong(v)             // uint64 LE payload
    digestLe(buf.array())
  }

  /** String shard key (`orphan_filter.go:101-108`): seed, string tag,
    * LE length incl. NUL, the bytes, a NUL terminator.
    */
  def hashString(s: org.apache.spark.unsafe.types.UTF8String): Long = {
    val bytes = s.getBytes
    val buf = java.nio.ByteBuffer.allocate(12 + bytes.length + 1)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.putInt(0)
    buf.putInt(BsonTypeString)
    buf.putInt(bytes.length + 1)
    buf.put(bytes)
    buf.put(0.toByte)
    digestLe(buf.array())
  }

  /** ObjectId shard key (`orphan_filter.go:124-128`): seed, oid tag, the
    * 12 raw oid bytes (input is the 24-char hex form).
    */
  def hashObjectId(hex: org.apache.spark.unsafe.types.UTF8String): Long = {
    val h = hex.toString
    require(h.length == 24, s"ObjectId hex must be 24 chars: $h")
    val buf = java.nio.ByteBuffer.allocate(20).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.putInt(0)
    buf.putInt(BsonTypeOid)
    var i = 0
    while (i < 24) {
      buf.put(((Character.digit(h.charAt(i), 16) << 4) |
        Character.digit(h.charAt(i + 1), 16)).toByte)
      i += 2
    }
    digestLe(buf.array())
  }

  def apply(c: Column): Column =
    CatalystBridge.column(MongoComputeHash(CatalystBridge.expression(c.cast("long"))))

  /** Hash a string-typed shard key (wire parity with mongo's hasher). */
  def ofString(c: Column): Column =
    CatalystBridge.column(MongoComputeHashString(CatalystBridge.expression(c.cast("string"))))

  /** Hash an ObjectId shard key given as its 24-char hex string. */
  def ofObjectId(c: Column): Column =
    CatalystBridge.column(MongoComputeHashOid(CatalystBridge.expression(c.cast("string"))))
}

/** String-key variant of [[MongoComputeHash]]. */
case class MongoComputeHashString(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "mongo_compute_hash_string"

  override protected def nullSafeEval(input: Any): Any =
    MongoComputeHash.hashString(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.MongoComputeHash.hashString($c)")

  override protected def withNewChildInternal(newChild: Expression): MongoComputeHashString =
    copy(child = newChild)
}

/** ObjectId-key variant of [[MongoComputeHash]] (24-char hex input). */
case class MongoComputeHashOid(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "mongo_compute_hash_oid"

  override protected def nullSafeEval(input: Any): Any =
    MongoComputeHash.hashObjectId(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.MongoComputeHash.hashObjectId($c)")

  override protected def withNewChildInternal(newChild: Expression): MongoComputeHashOid =
    copy(child = newChild)
}
