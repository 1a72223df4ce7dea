package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the `private[sql]` Column↔Expression converters (Spark 4 split
  * Column from catalyst Expressions; `classic.ExpressionUtils` is the
  * sanctioned path for classic-session extensions like graft's native
  * expressions). Lives in the spark.sql package solely for access.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
