package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Engine SQL surface: the custom Catalyst expressions registered as SQL
  * functions (SURVEY.md §4 "custom Catalyst work") so `spark.sql` users
  * — and the `queries` written as SQL strings — can call them directly.
  *
  * Two entry points:
  *   - `spark.sql.extensions=graft.plans.GraftExtensions` at session build
  *     (the standard `SparkSessionExtensions` injection path), or
  *   - [[GraftExtensions.register]] on a live session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach { case (ident, info, builder) =>
      ext.injectFunction((ident, info, builder))
    }
}

object GraftExtensions {

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft.plans.GraftExtensions", null, name, usage, "")

  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("mongo_hash"),
      info("mongo_hash", "mongo_hash(x) - MongoDB hashed-shard hash of an int64 key"),
      (es: Seq[Expression]) => MongoComputeHash(es.head)),
    (FunctionIdentifier("mongo_hash_string"),
      info("mongo_hash_string", "mongo_hash_string(s) - MongoDB hashed-shard hash of a string key"),
      (es: Seq[Expression]) => MongoComputeHashString(es.head)),
    (FunctionIdentifier("mongo_hash_oid"),
      info("mongo_hash_oid", "mongo_hash_oid(hex24) - MongoDB hashed-shard hash of an ObjectId"),
      (es: Seq[Expression]) => MongoComputeHashOid(es.head)),
    (FunctionIdentifier("java_string_hash"),
      info("java_string_hash", "java_string_hash(s) - java.lang.String.hashCode (wire-parity routing)"),
      (es: Seq[Expression]) => JavaStringHash(es.head)),
    (FunctionIdentifier("phash64"),
      info("phash64", "phash64(s) - graft's portable 60-bit MD5-prefix hash (shingle hashing)"),
      (es: Seq[Expression]) => Phash64(es.head)),
    (FunctionIdentifier("dot_q"),
      info("dot_q", "dot_q(a, b) - exact integer dot product of two quantized long-array vectors"),
      (es: Seq[Expression]) => DotQ(es.head, es(1))),
    (FunctionIdentifier("lsh_bucket"),
      info("lsh_bucket", "lsh_bucket(v, planes, dim) - random-hyperplane LSH bucket id of a quantized vector"),
      (es: Seq[Expression]) => LshBucket(es.head, intLit(es(1)), intLit(es(2)))))

  private def intLit(e: Expression): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Long, _) => v.toInt
    case other =>
      throw new IllegalArgumentException(
        s"lsh_bucket expects integer literals for planes/dim, got $other")
  }

  /** Register on an already-built session (tests, REPL). */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (ident, inf, builder) =>
      spark.sessionState.functionRegistry.registerFunction(ident, inf, builder)
    }
}
