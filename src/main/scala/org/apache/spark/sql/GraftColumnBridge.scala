package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark's `private[sql]` Column <-> catalyst Expression
  * conversions, for registering custom expressions (the supported
  * extension-point pattern: live in the sql package, delegate to
  * classic.ExpressionUtils). */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
