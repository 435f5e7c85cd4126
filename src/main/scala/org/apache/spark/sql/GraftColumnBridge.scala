package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/**
 * Bridge to the `private[sql]` Column <-> Expression converters — the
 * established pattern for libraries that ship custom Catalyst expressions
 * (Spark 4 moved `Column.expr` behind the ColumnNode abstraction; the
 * classic converters are the supported internal API for it).
 */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
