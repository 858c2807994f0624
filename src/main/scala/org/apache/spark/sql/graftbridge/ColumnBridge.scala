package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 removed public Column <-> Expression conversion; the supported
  * helpers (`org.apache.spark.sql.classic.ExpressionUtils`) are
  * `private[sql]`. Extension libraries bridge from an `org.apache.spark.sql`
  * subpackage — the standard pattern used by Spark connector projects.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
