package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark 4's `private[sql]` classic column API so the engine
  * can wrap custom catalyst `Expression`s as user-facing `Column`s
  * (the public Expression constructor was removed in Spark 4's
  * ColumnNode refactor). Lives under `org.apache.spark.sql` purely for
  * access; contains no Spark code.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
