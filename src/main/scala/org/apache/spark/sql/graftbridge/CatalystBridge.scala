/* Bridge into Spark's private[sql] Column ↔ Expression conversions.
 * Spark 4 hides `Column.expr` behind the connect-compatible ColumnNode
 * API; extensions that define native Catalyst expressions need this
 * one-file shim in the sql package (the documented pattern for
 * SparkSessionExtensions-style libraries).
 */
package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

object CatalystBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Force-compile every WholeStageCodegen subtree of a Dataset's executed
    * plan through Janino, returning how many subtrees compiled. Spark
    * swallows a CompileException at execution time (it logs and falls
    * back to interpreted eval, results stay correct) — so ONLY an
    * explicit compile proves a native expression really runs inside
    * generated code. CodegenSpec locks the graft kernels with this after
    * round 13 found `MinhashSig`'s generated calls had never compiled
    * (scalac emits no static forwarder for a companion method named
    * `eval` — it collides with `Expression.eval` — so the emitted
    * `graft.plans.MinhashSig.eval(...)` reference did not exist).
    */
  def compileWholeStage(df: org.apache.spark.sql.DataFrame): Int = {
    import org.apache.spark.sql.execution.WholeStageCodegenExec
    val subtrees = df.queryExecution.executedPlan.collect {
      case w: WholeStageCodegenExec => w
    }
    subtrees.foreach { w =>
      val (_, source) = w.doCodeGen()
      // throws CompileException if the generated source is broken
      org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator
        .compile(source)
    }
    subtrees.size
  }
}
