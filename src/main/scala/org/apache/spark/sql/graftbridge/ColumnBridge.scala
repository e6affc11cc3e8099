package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge.
  *
  * Spark 4 split the public `Column` API from Catalyst; the supported
  * conversion (`org.apache.spark.sql.classic.ExpressionUtils`) is
  * `private[sql]`, so this one-file shim lives under the sql package
  * namespace to re-export exactly the two conversions the engine's
  * custom expressions need.  No Spark internals are reimplemented.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
