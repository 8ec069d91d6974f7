package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Package-injection accessor for `private[sql]`
  * [[classic.ExpressionUtils.column]] — wraps a catalyst Expression as
  * a user-facing Column (the hook graft's parameterized native
  * expressions need: their model state — centroid/codebook matrices —
  * lives in constructor fields, so they cannot ride the string-named
  * FunctionRegistry route `dotp` uses). Version-pinned to the bundled
  * Spark; a signature change fails loudly at compile time.
  */
object GraftColumnAccess {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
