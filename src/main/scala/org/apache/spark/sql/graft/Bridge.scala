package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge. Spark 4 made the Column(Expression)
  * constructor `private[sql]`; extensions that define native Catalyst
  * expressions conventionally expose it through a shim in the
  * org.apache.spark.sql namespace (same pattern third-party connectors
  * use). Only [[graft.functions]] depends on this. */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
