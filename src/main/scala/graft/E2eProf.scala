package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import graft.extract.{Pipeline, Synthetic}

/** Dev tool: per-stage wall + task-time breakdown of the flagship e2e
 * (synthetic corpus → Pipeline.extract → parquet, the Bench.e2e shape).
 * Usage: runMain graft.E2eProf [nConvs] [cpus] [reps] */
object E2eProf {
  def main(args: Array[String]): Unit = {
    val nConvs = args.lift(0).map(_.toLong).getOrElse(30000L)
    val cpus = args.lift(1).getOrElse("32")
    val reps = args.lift(2).map(_.toInt).getOrElse(5)
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val lines = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val wall = (for (a <- si.submissionTime; b <- si.completionTime)
          yield (b - a) / 1e3).getOrElse(-1.0)
        val m = si.taskMetrics
        lines.add(f"  stage${si.stageId}%3d wall $wall%6.2f s  " +
          f"task ${m.executorRunTime / 1e3}%7.2f s  " +
          f"cpu ${m.executorCpuTime / 1e9}%7.2f s  " +
          f"gc ${m.jvmGCTime / 1e3}%5.2f s  " +
          f"shufW ${m.shuffleWriteMetrics.bytesWritten / 1e6}%7.1f MB  " +
          f"shufRwait ${m.shuffleReadMetrics.fetchWaitTime / 1e3}%5.2f s  " +
          f"${si.numTasks}%3d tasks  ${si.name.take(60)}")
      }
    })
    val turns = Synthetic.transcripts(spark, nConvs)
    (1 to reps).foreach { i =>
      lines.clear()
      val t0 = System.nanoTime()
      Pipeline.extract(turns).write.mode("overwrite")
        .parquet("/tmp/graft-e2eprof-out")
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      println(f"[e2eprof] rep$i: $sec%.2f s")
      if (i == reps) lines.forEach(println)
    }
    spark.stop()
  }
}
