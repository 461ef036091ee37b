package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's `private[sql]` Column ↔ Catalyst Expression
  * converters (Spark 4 moved these behind org.apache.spark.sql.classic).
  * Needed to build Columns from custom Catalyst expressions — e.g. seeded
  * XxHash64 — without a UDF.
  */
object CatalystBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
