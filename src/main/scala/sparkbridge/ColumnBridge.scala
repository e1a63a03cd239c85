/** Bridge into Spark's package-private Column↔Expression converters.
  *
  * Spark 4 moved the classic Column's expression plumbing behind
  * `private[sql]` (`org.apache.spark.sql.classic.ExpressionUtils`). Custom
  * Catalyst expressions still need to surface as `Column`s; the supported
  * pattern for libraries is a one-file bridge declared inside the
  * `org.apache.spark.sql` package. Nothing else in this repo lives outside
  * the `graft` namespace.
  */
package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
