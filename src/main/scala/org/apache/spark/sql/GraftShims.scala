package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal package-private bridge: Spark 4 made Column <-> Expression
  * conversion private[sql]; third-party Catalyst extensions reach it by
  * declaring a shim inside the org.apache.spark.sql namespace (the same
  * pattern Spark-adjacent OSS libraries use).
  */
object GraftShims {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
