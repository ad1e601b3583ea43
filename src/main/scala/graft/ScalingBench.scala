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
 * and compute efficiency from the two `sec` values. A second argument
 * picks the job: `e2e` (default, flagship extraction) or `convdedup`
 * (conversation-prefix dedup — the round-4 conversation-grain path).
 */
object ScalingBench {
  def main(args: Array[String]): Unit = {
    val cpus = args.headOption.getOrElse("32")
    val job = if (args.length > 1) args(1) else "e2e"
    val nConvs = sys.env.getOrElse("SPARK_GRAFT_BENCH_CONVS", "50000").toLong
    Bench.pinCpus(cpus) // a true cpus-core machine, not cpus task slots on 32 cores
    val spark = Bench.mkSpark(cpus)
    spark.sparkContext.setLogLevel("ERROR")

    def convDedup(n: Long): (Long, Double) = {
      val turns = graft.extract.Synthetic.transcripts(spark, n)
      val nTurns = (0L until n).map(graft.extract.Synthetic.turnsPerConv(_).toLong).sum
      val (_, sec) = Bench.time {
        graft.ops.Agent.prefixDedup(turns).write.mode("overwrite")
          .parquet("/tmp/graft-bench-out/prefixdedup")
      }
      (nTurns, sec)
    }
    def convDedupScan(n: Long): (Long, Double) = {
      // the corpus-scan stage alone (hash + conv-window signatures) — the
      // leg that must scale; full-op minus this is the small-join fixed cost
      val turns = graft.extract.Synthetic.transcripts(spark, n)
      val nTurns = (0L until n).map(graft.extract.Synthetic.turnsPerConv(_).toLong).sum
      val (_, sec) = Bench.time {
        graft.ops.Agent.prefixSlimOnly(turns).write.mode("overwrite")
          .parquet("/tmp/graft-bench-out/prefixslim")
      }
      (nTurns, sec)
    }
    val run: Long => (Long, Double) =
      if (job == "convdedup") convDedup
      else if (job == "convdedup_scan") convDedupScan
      else Bench.e2e(spark, _)

    // deep JIT/codegen warmup: short runs alone leave C2 cold and measure 3x slow
    Seq(1000L, 10000L, 20000L).foreach(run)
    val calMs = Bench.calibrationMs()
    var turns = 0L
    val budget = sys.env.getOrElse("SPARK_GRAFT_BENCH_WALL_SEC", "600").toDouble
    val (allReps, bestWindow, stable) = Bench.stableReps(
      () => { val (t, s) = run(nConvs); turns = t; s },
      maxWallSec = budget)
    val sec = bestWindow.min
    val repsJson = allReps.map(r => f"$r%.3f").mkString("[", ",", "]")
    println(f"""{"metric":"$job%s","cpus":$cpus,"sec":$sec%.2f,"turns":$turns,"turns_per_sec":${turns / sec}%.1f,"reps_sec":$repsJson,"total_reps":${allReps.size},"stable":$stable,"calibration_ms":$calMs%.1f}""")
    spark.stop()
  }
}
