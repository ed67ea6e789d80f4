package org.apache.spark.sql.graftx

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Catalyst Expression bridge. `ExpressionUtils` is
  * `private[sql]` in Spark 4.x, so custom expressions (e.g. the Tokenize
  * Generator) need this one-hop re-export from inside the sql package
  * namespace — the standard extension-library technique.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
