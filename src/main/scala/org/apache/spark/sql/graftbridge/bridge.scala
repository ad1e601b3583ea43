package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionColumnNode
import org.apache.spark.sql.classic.{Dataset => CDataset, SparkSession => CSparkSession}

/** Minimal bridge into `private[sql]` surface: wrap a Catalyst Expression
  * as a user-facing Column (the classic-session column node), and clone a
  * session so a conf override can be scoped to ONE query instead of
  * mutated session-wide. Lives in an `org.apache.spark.sql` subpackage
  * solely for access; no Spark internals are modified. */
object bridge {
  def column(e: Expression): Column = new Column(ExpressionColumnNode(e))

  /** Inverse direction: unwrap a Column (including lambda variables inside
    * higher-order-function bodies) back to its Catalyst Expression. */
  def expression(c: Column): Expression =
    org.apache.spark.sql.classic.ExpressionUtils.expression(c)

  /** Clone `spark` (same SparkContext and shared state; conf, temp views
    * and registered functions copied at clone time) and apply `overrides`
    * to the CLONE only. The caller's session conf is untouched — this is
    * how an operator scopes a conf exemption to the plans it builds. */
  def sessionWithConf(spark: SparkSession,
      overrides: (String, String)*): SparkSession = {
    val c = spark.asInstanceOf[CSparkSession].cloneSession()
    overrides.foreach { case (k, v) => c.conf.set(k, v) }
    c
  }

  /** Rebind a DataFrame's logical plan to another session of the same
    * SparkContext (re-analyzed there, so `to`'s conf governs it). */
  def rebind(df: DataFrame, to: SparkSession): DataFrame =
    CDataset.ofRows(to.asInstanceOf[CSparkSession],
      df.queryExecution.logical)
}
