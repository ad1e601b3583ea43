package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionColumnNode

/** Minimal bridge into `private[sql]` surface: wrap a Catalyst Expression
  * as a user-facing Column (the classic-session column node). Lives in an
  * `org.apache.spark.sql` subpackage solely for access; no Spark internals
  * are modified. */
object bridge {
  def column(e: Expression): Column = new Column(ExpressionColumnNode(e))

  /** Inverse direction: unwrap a Column (including lambda variables inside
    * higher-order-function bodies) back to its Catalyst Expression. */
  def expression(c: Column): Expression =
    org.apache.spark.sql.classic.ExpressionUtils.expression(c)
}
