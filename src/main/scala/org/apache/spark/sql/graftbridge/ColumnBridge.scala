package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ Expression bridge. Spark 4 made the conversion
  * `private[sql]` (`org.apache.spark.sql.classic.ExpressionUtils`);
  * extension libraries shipping custom Catalyst expressions reach it
  * through a subpackage bridge like this one — the same visibility the
  * built-in `functions._` implementations use. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
