package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.CatalystBridge
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** `java.lang.String.hashCode` as a native Catalyst expression.
  *
  * The reference routes records to workers with Java-String-hash semantics
  * (`oplog/hasher.go:141-152` reimplements `s[0]*31^(n-1) + ...` so Go and
  * Java agree on Kafka partition ids). Exposing the same function keeps
  * wire-level partition parity available when the engine feeds a sink that
  * downstream consumers co-partition on (SURVEY.md §2.5 X1/X2).
  *
  * Implemented with `doGenCode` so it stays inside whole-stage codegen —
  * routing runs on every record of the stream, so this is a hot path.
  */
case class JavaStringHash(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "java_string_hash"

  override protected def nullSafeEval(input: Any): Any =
    input.asInstanceOf[UTF8String].toString.hashCode

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"$c.toString().hashCode()")

  override protected def withNewChildInternal(newChild: Expression): JavaStringHash =
    copy(child = newChild)
}

object JavaStringHash {
  def apply(c: Column): Column =
    CatalystBridge.column(JavaStringHash(CatalystBridge.expression(c.cast("string"))))
}
