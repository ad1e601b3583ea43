package graft

import org.apache.spark.sql.SparkSession
import graft.extract.{Pipeline, Synthetic}

/**
 * Driver benchmark: one JSON line with the headline end-to-end extraction
 * throughput (turns/sec over a deterministic synthetic transcript corpus +
 * the sf documents-derived transcripts) and per-query timings.
 */
object Bench {

  def mkSpark(cpus: String): SparkSession = SparkSession.builder()
    .master(s"local[$cpus]")
    .appName("graft-bench")
    .config("spark.sql.shuffle.partitions", cpus)
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  def time[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  /** End-to-end extraction over nConvs synthetic conversations; returns
   * (turns, seconds). */
  def e2e(spark: SparkSession, nConvs: Long): (Long, Double) = {
    val turns = Synthetic.transcripts(spark, nConvs)
    val nTurns = (0L until nConvs).map(Synthetic.turnsPerConv(_).toLong).sum
    val (_, sec) = time {
      Pipeline.extract(turns).write.mode("overwrite")
        .parquet(s"/tmp/graft-bench-out/spans")
    }
    (nTurns, sec)
  }

  // headline per-query subset (the heavier operators)
  val benchQueries = Seq(
    "q1_agg", "q2_join_agg", "q3_window_topk", "q4_sessions",
    "s2_tokenize", "w2_statuses", "a7_zone_segments", "k2_zone_spans",
    "dedup_minhash_pairs", "dedup_simhash", "dedup_jaccard",
    "sim_topk_brute", "sim_topk_lsh",
    "text_quality", "text_lang_id", "w11_zones_content", "pipeline_doc_spans")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val nConvs = sys.env.getOrElse("SPARK_GRAFT_BENCH_CONVS", "30000").toLong
    val spark = mkSpark(cpus)
    spark.sparkContext.setLogLevel("WARN")

    // steady-state measurement: deep JIT/codegen warmup first (the cold-start
    // cost is fixed and irrelevant at the 10^12-turn design scale; short
    // warmups leave C2 cold and measure ~3x slow), then best-of-3 — this
    // sandbox VM's effective-CPU cap gives ±30% run-to-run variance at high
    // thread counts, and the steady-state (minimum) is the honest number
    // for a dedicated executor
    Seq(1000L, 10000L, nConvs / 2).foreach(e2e(spark, _))
    val reps = (1 to 3).map(_ => e2e(spark, nConvs))
    val nTurns = reps.head._1
    val e2eSec = reps.map(_._2).min
    val tps = nTurns / e2eSec
    val repsJson = reps.map(r => f"${r._2}%.3f").mkString("[", ",", "]")

    val qTimes = benchQueries.map { name =>
      val fn = SparkEntry.queries(name)
      val (_, sec) = time { fn(spark, sfDir).count() }
      name -> sec
    }
    val qs = (qTimes :+ ("e2e_extract" -> e2eSec))
      .map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }.mkString("{", ",", "}")
    val total = qTimes.map(_._2).sum + e2eSec
    val json =
      s"""{"metric":"total","value":${f"$total%.3f"},"unit":"sec","queries":$qs,""" +
        s""""sf":"$sfDir","turns":$nTurns,"turns_per_sec":${f"$tps%.1f"},""" +
        s""""e2e_reps_sec":$repsJson,"cpus":"$cpus"}"""
    // bare stdout (run/outputStrategy strips the sbt prefix) + a file copy,
    // so the metrics survive any log-capture the driver applies
    println(json)
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_LOCAL.json")
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      (json + "\n").getBytes("UTF-8"))
    spark.stop()
  }
}
