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
}
