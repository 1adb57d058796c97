package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge. Spark 4 made these converters
  * `private[sql]` (org.apache.spark.sql.classic.ExpressionUtils), so custom
  * Catalyst expressions built outside the Spark tree need this one-hop
  * re-export from a `sql` subpackage. No behavior — just visibility. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
