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

  /** Measured-rep protocol, round-4 form: the budget is WALL-CLOCK, not a
   * rep count — a throttled VM whose reps are still falling (199→131→24 s
   * happened in round 3) gets as many reps as the budget allows instead of
   * stopping at an arbitrary rep cap with an unconverged series. Returns
   * (all reps, best window, stable): `best window` is the lowest-MEAN
   * consecutive `window`-rep slice whose relative spread ((max-min)/min)
   * is within `tol` — the fastest steady state observed — falling back to
   * the lowest-spread slice if none converged; `stable` says whether any
   * slice converged. Headline = best window's min; a reader combines
   * `stable` with the calibration probes to normalize any run. */
  def stableReps(run: () => Double, window: Int = 3, tol: Double = 0.10,
                 maxWallSec: Double = 900.0): (Vector[Double], Vector[Double], Boolean) = {
    var runs = Vector.empty[Double]
    def spread(w: Seq[Double]): Double = (w.max - w.min) / w.min
    val t0 = System.nanoTime()
    def elapsed = (System.nanoTime() - t0) / 1e9
    var done = false
    while (!done) {
      runs :+= run()
      val converged = runs.size >= window && spread(runs.takeRight(window)) <= tol
      done = converged || elapsed > maxWallSec
    }
    val slices = runs.sliding(window).toVector.filter(_.size == window)
    val good = slices.filter(spread(_) <= tol)
    val best =
      if (good.nonEmpty) good.minBy(_.sum)
      else if (slices.nonEmpty) slices.minBy(spread)
      else runs
    (runs, best, good.nonEmpty)
  }

  /** Single-thread CPU calibration probe: a fixed 2*10^8-step LCG whose
   * healthy-VM time on this class of hardware is ~150-250 ms. Emitted with
   * every bench line so a reader can normalize a throttled run (round-3's
   * driver bench was 6x-inflated by the VM with no way to tell from the
   * JSON). Min of 3 after one warmup. */
  @volatile private var calSink = 0L
  def calibrationMs(): Double = {
    def once(): Double = {
      val t0 = System.nanoTime()
      var x = 1234567891L
      var i = 0
      while (i < 200000000) {
        x = x * 6364136223846793005L + 1442695040888963407L
        i += 1
      }
      calSink = x // defeat dead-code elimination
      (System.nanoTime() - t0) / 1e6
    }
    once()
    (1 to 3).map(_ => once()).min
  }

  /** Tiny fixed Spark job (a 5*10^7-row range sum, no shuffle): the
   * cluster-side half of the calibration pair — scheduler + codegen +
   * multi-core health in one number. Min of 3 after one warmup. */
  def sparkProbeMs(spark: SparkSession): Double = {
    def once(): Double = {
      val t0 = System.nanoTime()
      spark.range(50000000L).selectExpr("bit_xor(id * 2654435761)").collect()
      (System.nanoTime() - t0) / 1e6
    }
    once()
    (1 to 3).map(_ => once()).min
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
    "passage_strip", "kmeans_centroids", "gopher_keep", "chunk_text",
    "gopher_rep_keep", "c4_span_dedup", "dsir_resample", "web_curation",
    "sft_render", "lm_ppx_buckets",
    "agent_repair", "agent_prefix_dedup", "dedup_incremental",
    "agent_corpus", "emb_mean_pool")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val nConvs = sys.env.getOrElse("SPARK_GRAFT_BENCH_CONVS", "30000").toLong
    pinCpus(cpus)
    val spark = mkSpark(cpus)
    spark.sparkContext.setLogLevel("WARN")

    // steady-state measurement: calibration probes first (so any reader can
    // normalize a throttled run), deep JIT/codegen warmup (the cold-start
    // cost is fixed and irrelevant at the 10^12-turn design scale; short
    // warmups leave C2 cold and measure ~3x slow), then full-size reps on a
    // wall-clock budget until a 3-rep window converges within 10% — this
    // sandbox VM's effective-CPU cap gives ±30%-to-10x run-to-run variance
    // at high thread counts; the headline is the best converged window's
    // minimum, and `stable:false` flags a run that never converged
    val calMs = calibrationMs()
    val probeMs = sparkProbeMs(spark)
    Seq(1000L, 10000L, nConvs / 2).foreach(e2e(spark, _))
    var nTurns = 0L
    val budget = sys.env.getOrElse("SPARK_GRAFT_BENCH_WALL_SEC", "600").toDouble
    val (allReps, bestWindow, stable) = stableReps(
      () => { val (t, s) = e2e(spark, nConvs); nTurns = t; s },
      maxWallSec = budget)
    val e2eSec = bestWindow.min
    val tps = nTurns / e2eSec
    def vec(v: Seq[Double]) = v.map(r => f"$r%.3f").mkString("[", ",", "]")

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
        s""""e2e_reps_sec":${vec(allReps)},"e2e_total_reps":${allReps.size},""" +
        s""""best_window":${vec(bestWindow)},"stable":$stable,""" +
        s""""calibration_ms":${f"$calMs%.1f"},"spark_probe_ms":${f"$probeMs%.1f"},""" +
        s""""cpus":"$cpus"}"""
    // bare stdout (run/outputStrategy strips the sbt prefix) + a file copy,
    // so the metrics survive any log-capture the driver applies
    println(json)
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_LOCAL.json")
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      (json + "\n").getBytes("UTF-8"))
    spark.stop()
  }
}
