package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge into `private[sql]` plan constructors for graft's custom
 * operator (graft.plans.BodySpans). */
object GraftPlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  def logical(df: DataFrame): LogicalPlan =
    df.asInstanceOf[classic.Dataset[Row]].queryExecution.analyzed

  /** Lazy PLAN barrier: re-roots `df` on its (lazily planned) execution RDD
   * via `LogicalRDD`, so downstream logical plans see a LEAF instead of the
   * whole upstream tree. No data is materialized (unlike localCheckpoint):
   * the RDD graph executes normally at action time, and repeated actions
   * over the same barrier reuse its shuffle stages (skipped-stage reuse).
   * This is the mitigation for Catalyst's per-Dataset clone/analyze walking
   * plan DAGs as TREES — a chain of two-level chunk aggregations each
   * referencing its input 2-3× otherwise makes the expanded tree (and so
   * every Dataset operation on it) exponentially large in the chain depth.
   * Cost: no optimizer pushdown across the barrier (pre-prune columns
   * first) and plan-time stats degrade to the defaultSizeInBytes sentinel
   * (see `graft.ops.Par.spread`'s sentinel handling). */
  def planBarrier(df: DataFrame): DataFrame = {
    val ds = df.asInstanceOf[classic.Dataset[Row]]
    ofRows(df.sparkSession, execution.LogicalRDD.fromDataset(
      ds.queryExecution.toRdd, ds, isStreaming = false))
  }
}
