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
   * right: any multi-split input clears the threshold and is left alone.
   * When the stats are the UNKNOWN sentinel (`defaultSizeInBytes`, e.g. an
   * RDD-backed frame from `localCheckpoint`/`createDataFrame`), the
   * estimate would silently report "huge" and never spread a
   * single-partition input — only there fall back to the physical
   * partition count (cheap for those plans: the RDD already exists). */
  def spread(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val target = spark.sparkContext.defaultParallelism
    val maxSplit = spark.sessionState.conf.filesMaxPartitionBytes
    val size = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val estSplits =
      if (size == spark.sessionState.conf.defaultSizeInBytes)
        BigInt(df.rdd.getNumPartitions)
      else size / maxSplit
    if (estSplits < target) df.repartition(target) else df
  }
}
