package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal visibility bridge: Column <-> Expression converters are
  * private[sql] in Spark 4, so third-party expression libraries expose
  * them through a shim in the org.apache.spark.sql namespace (the same
  * pattern Spark connectors use). No Spark internals are modified.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
