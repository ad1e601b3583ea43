package graft.ops

import org.apache.spark.sql.DataFrame

/** Input-parallelism guard shared by the compute-heavy operators. */
object Par {

  /** Ensure at least `defaultParallelism` partitions before heavy per-row
   * compute: a single-split input (tiny local file, coalesced upstream)
   * would otherwise serialize the work onto one task. No-op when the scan
   * already provides enough splits — at 100 TB the file splits give full
   * parallelism and no shuffle is added. */
  def spread(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}
