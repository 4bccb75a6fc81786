package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ catalyst-Expression bridge. `ExpressionUtils` is `private[sql]`
  * in Spark 4's classic module, so the (two-line) crossing lives in an
  * `org.apache.spark.sql` sub-package — the standard technique third-party
  * expression libraries use; everything else in this repo stays in `graft`. */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
