package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark 4's `private[sql]` Column↔Expression conversions.
  *
  * Spark 4 made `Column` implementation-agnostic (Connect unification);
  * building a `Column` from a custom Catalyst `Expression` is still the
  * supported extension path but the converters live behind
  * `private[sql]`. This is the one sanctioned-pattern shim the engine
  * uses to expose native expressions (e.g. `debezium_decimal`) as
  * Columns; nothing else reaches into Spark internals.
  */
object GraftBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
