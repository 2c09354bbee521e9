package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression conversions. Spark 4 made these `private[sql]`
  * (`org.apache.spark.sql.classic.ExpressionUtils`), so graft exposes them
  * from a subpackage of `org.apache.spark.sql` — the standard extension
  * point for libraries that add native Catalyst expressions.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
