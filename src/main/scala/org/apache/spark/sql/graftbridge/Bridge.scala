package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column <-> catalyst Expression bridge. ExpressionUtils is
  * private[sql]; exposing it from an org.apache.spark.sql subpackage is
  * the standard pattern for Spark extension libraries that define native
  * expressions (the alternative — FunctionRegistry + call_function —
  * additionally exists via GraftExtensions; this path works on sessions
  * without the extension installed). */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
