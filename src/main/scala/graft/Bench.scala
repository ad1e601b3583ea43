package graft

import org.apache.spark.sql.SparkSession
import graft.extract.{Pipeline, Synthetic}

/**
 * Driver benchmark: one JSON line with the headline end-to-end extraction
 * throughput (turns/sec over a deterministic synthetic transcript corpus +
 * the sf documents-derived transcripts) and per-query timings.
 */
object Bench {

  /** Pin this (forked, `run / fork := true`) JVM to exactly `cpus` cores so
   * `local[cpus]` measures a true cpus-core machine: without pinning, GC /
   * netty / codegen threads of a local[8] session spill onto the other 24
   * cores, flattering the small leg of the N-vs-4N scaling comparison and
   * adding scheduler-migration noise at high thread counts. No-op when
   * cpus >= machine cores, taskset is absent, or SPARK_GRAFT_PIN=0. */
  def pinCpus(cpus: String): Unit = {
    val n = cpus.toIntOption.getOrElse(return)
    val avail = Runtime.getRuntime.availableProcessors
    if (n >= avail || sys.env.get("SPARK_GRAFT_PIN").contains("0")) return
    val pid = ProcessHandle.current().pid()
    try {
      val p = new ProcessBuilder("taskset", "-acp", s"0-${n - 1}", pid.toString)
        .redirectErrorStream(true).start()
      p.waitFor()
      if (p.exitValue() == 0) System.err.println(s"[bench] pinned pid $pid to cores 0-${n - 1}")
    } catch { case _: java.io.IOException => () } // taskset not installed
  }

  /** Measured-rep protocol: keep running full-size reps until the last
   * `window` are within `tol` relative spread ((max-min)/min), so the
   * reported window is steady-state rather than tail-of-warmup; capped at
   * `maxReps` with the honest (possibly wider) final window reported. */
  def stableReps(run: () => Double, window: Int = 3, tol: Double = 0.10,
                 maxReps: Int = 8): Vector[Double] = {
    var runs = Vector.empty[Double]
    def spread(w: Seq[Double]): Double = (w.max - w.min) / w.min
    while (runs.size < window ||
           (spread(runs.takeRight(window)) > tol && runs.size < maxReps)) {
      runs :+= run()
    }
    runs
  }

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
    "text_quality", "text_lang_id", "decon_overlap", "clean_boiler_strip",
    "mc_main_content", "w11_zones_content", "pipeline_doc_spans",
    "bpe_roundtrip_diff", "search_bm25", "sem_dedup_keep", "url_quota_sample",
    "passage_strip", "kmeans_centroids", "gopher_keep", "chunk_text")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val nConvs = sys.env.getOrElse("SPARK_GRAFT_BENCH_CONVS", "30000").toLong
    pinCpus(cpus)
    val spark = mkSpark(cpus)
    spark.sparkContext.setLogLevel("WARN")

    // steady-state measurement: deep JIT/codegen warmup first (the cold-start
    // cost is fixed and irrelevant at the 10^12-turn design scale; short
    // warmups leave C2 cold and measure ~3x slow), then run full-size reps
    // until the trailing 3 are within 10% of each other (stableReps) — this
    // sandbox VM's effective-CPU cap gives ±30% run-to-run variance at high
    // thread counts, and the steady-state window (its minimum as headline)
    // is the honest number for a dedicated executor
    Seq(1000L, 10000L, nConvs / 2).foreach(e2e(spark, _))
    var nTurns = 0L
    val allReps = stableReps(() => { val (t, s) = e2e(spark, nConvs); nTurns = t; s })
    val reps = allReps.takeRight(3)
    val e2eSec = reps.min
    val tps = nTurns / e2eSec
    val repsJson = reps.map(r => f"$r%.3f").mkString("[", ",", "]")

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
        s""""e2e_reps_sec":$repsJson,"e2e_total_reps":${allReps.size},"cpus":"$cpus"}"""
    // bare stdout (run/outputStrategy strips the sbt prefix) + a file copy,
    // so the metrics survive any log-capture the driver applies
    println(json)
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_LOCAL.json")
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      (json + "\n").getBytes("UTF-8"))
    spark.stop()
  }
}
