package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into the `private[sql]` Column <-> Expression converters, the same
  * shim pattern every Spark-native library (Delta, Sedona, frameless, ...)
  * uses to expose custom Catalyst expressions as `Column`s on the classic
  * runtime. Kept to exactly two forwarders. */
object GraftShims {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
