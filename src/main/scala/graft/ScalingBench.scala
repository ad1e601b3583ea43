package graft

/**
 * Two-cluster-size scaling evidence (north rule: throughput scaling
 * efficiency ≥ 0.8 from N to 4N executors). In this sandbox the two
 * "cluster sizes" are local[8] and local[32] on the same input; efficiency
 * = (T_8 / T_32) / 4.
 *
 * Each size MUST run in its own JVM (a restarted SparkSession in the same
 * JVM measures ~7x slower — stale codegen/memory-manager state), so:
 *
 *   sbt "runMain graft.ScalingBench 8"    # prints one JSON line
 *   sbt "runMain graft.ScalingBench 32"   # prints one JSON line
 *
 * and compute efficiency from the two `sec` values.
 */
object ScalingBench {
  def main(args: Array[String]): Unit = {
    val cpus = args.headOption.getOrElse("32")
    val nConvs = sys.env.getOrElse("SPARK_GRAFT_BENCH_CONVS", "50000").toLong
    Bench.pinCpus(cpus) // a true cpus-core machine, not cpus task slots on 32 cores
    val spark = Bench.mkSpark(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    // deep JIT/codegen warmup: short runs alone leave C2 cold and measure 3x slow
    Seq(1000L, 10000L, 20000L).foreach(Bench.e2e(spark, _))
    val calMs = Bench.calibrationMs()
    var turns = 0L
    val budget = sys.env.getOrElse("SPARK_GRAFT_BENCH_WALL_SEC", "600").toDouble
    val (allReps, bestWindow, stable) = Bench.stableReps(
      () => { val (t, s) = Bench.e2e(spark, nConvs); turns = t; s },
      maxWallSec = budget)
    val sec = bestWindow.min
    val repsJson = allReps.map(r => f"$r%.3f").mkString("[", ",", "]")
    println(f"""{"metric":"e2e_extract","cpus":$cpus,"sec":$sec%.2f,"turns":$turns,"turns_per_sec":${turns / sec}%.1f,"reps_sec":$repsJson,"total_reps":${allReps.size},"stable":$stable,"calibration_ms":$calMs%.1f}""")
    spark.stop()
  }
}
