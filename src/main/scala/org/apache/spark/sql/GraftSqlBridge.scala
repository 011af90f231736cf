package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into `private[sql]` Column↔Expression conversion (Spark 4
  * moved Column onto ColumnNode; `classic.ExpressionUtils` is the
  * sanctioned converter but is sql-private). Lives in the spark.sql
  * package purely for access; no Spark internals are modified. */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
