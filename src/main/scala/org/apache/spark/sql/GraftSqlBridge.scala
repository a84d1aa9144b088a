package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column <-> catalyst Expression bridge. Spark 4's unified Column API
  * hides the classic conversions behind private[sql]; custom
  * expressions (graft.functions) need this two-line door into the sql
  * package — the standard pattern for Spark extension libraries.
  */
object GraftSqlBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
