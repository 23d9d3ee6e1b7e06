package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 made Column expression-agnostic; the Column↔Expression bridge
  * (`classic.ExpressionUtils`) is private[sql]. This is the minimal,
  * conventional escape hatch for libraries that define custom Catalyst
  * expressions (see pipeline.expr). */
object GraftColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
