package graft.ops

import org.apache.spark.sql.DataFrame

/** Input-parallelism guard shared by the compute-heavy operators. */
object Par {

  /** Ensure at least `defaultParallelism` partitions before heavy per-row
   * compute: a single-split input (tiny local file, coalesced upstream)
   * would otherwise serialize the work onto one task. No-op when the scan
   * already provides enough splits — at 100 TB the file splits give full
   * parallelism and no shuffle is added.
   *
   * Split count is estimated from the optimizer's size statistics
   * (`optimizedPlan.stats.sizeInBytes / files.maxPartitionBytes`) instead of
   * `df.rdd.getNumPartitions`, which would force full physical planning of
   * the frame once per call site. The estimate only has to be directionally
   * right: any multi-split input clears the threshold and is left alone. */
  def spread(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val target = spark.sparkContext.defaultParallelism
    val maxSplit = spark.sessionState.conf.filesMaxPartitionBytes
    val estSplits = df.queryExecution.optimizedPlan.stats.sizeInBytes / maxSplit
    if (estSplits < target) df.repartition(target) else df
  }
}
