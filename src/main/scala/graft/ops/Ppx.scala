package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Perplexity bucketing (the CCNet head/middle/tail split): partition a
 * corpus by language-model cross-entropy so downstream mixing can
 * up-weight fluent text and quarantine the tail. Composes over
 * [[LangModel.xent]]'s output.
 *
 * Numerics: buckets cut on `xent_fp` — the mean per-bigram cost in
 * nano-nats as an INTEGER (`(-sum_fp) * 1000 div n_bigrams`, exact
 * integer arithmetic over the micro-nat fixed-point sums) — so bucket
 * assignment is immune to float-sum-order drift, the same discipline as
 * [[QualityModel]]/[[LangModel]]. Documents with no bigrams get bucket
 * `na` (CCNet drops them; keeping them visible lets the caller decide).
 *
 * Scale contract: cutoffs are fitted on a bounded deterministic hash
 * sample and shipped as two constants — exactly how CCNet fits per-
 * language cutoffs once and reuses them — so bucketing itself is a pure
 * broadcast-free projection over the scored frame: no global sort, no
 * whole-corpus window. The sample collect is model-sized (rate-bounded),
 * the same bounded-collect discipline as ZoneModel/BPE/PCA.
 */
object Ppx {

  /** Integer nano-nat mean cross-entropy; null when the doc has no
   * bigrams. Input must carry `sum_fp` and `n_bigrams` ([[LangModel.xent]]). */
  def withXentFp(scored: DataFrame): DataFrame =
    scored.withColumn("xent_fp",
      when(col("n_bigrams") > 0,
        expr("(-sum_fp) * 1000 div n_bigrams")).cast("long"))

  /** Fitted cutoffs: xent_fp <= headCut → head, <= tailCut → middle. */
  final case class Cuts(headCut: Long, tailCut: Long, nSample: Long)

  /**
   * Fit bucket cutoffs on a deterministic hash sample of the scored
   * frame: the cut for quantile q is the sample's discrete quantile —
   * the value at sorted position floor((n-1) * q). Deterministic for a
   * given (corpus, seed, rate); duplicates cannot perturb it (the value
   * at a rank in a sorted multiset is tie-order-independent).
   *
   * The driver-side collect is HARD-BOUNDED: the effective rate is
   * `min(sampleRate, maxSample / n)` with `n` from a cheap count
   * aggregate (a scan, never a collect) over a PERSISTED (id, xent_fp)
   * projection — the scoring pipeline evaluates once, not once for the
   * count and again for the sample — so the collected sample is
   * ~`maxSample` rows in expectation regardless of corpus size — at 10⁹
   * docs the default collects ~64k longs (~512 KB), not the corpus.
   * Both the count and the hash predicate are exactly replayable in SQL
   * (integer count, one IEEE double division, md5-hash threshold), so
   * the fitted cuts stay oracle-mirrorable at any rate.
   */
  def cuts(scored: DataFrame, headQ: Double = 1.0 / 3,
      tailQ: Double = 2.0 / 3, sampleRate: Double = 1.0,
      seed: String = "ppx", idCol: String = "doc_id",
      maxSample: Long = 65536L): Cuts = {
    require(headQ > 0 && headQ <= tailQ && tailQ < 1,
      "need 0 < headQ <= tailQ < 1")
    require(maxSample > 0, "maxSample must be positive")
    // Persist the two-column projection before counting: the count and
    // the sample collect otherwise EACH recompute the upstream scoring
    // pipeline (model join + per-doc cross-entropy) — the most expensive
    // stage, run twice at exactly the 10⁹-doc scale the bound targets.
    // The persisted frame is (id, xent_fp) only, ~16 bytes/doc, spillable.
    val base = withXentFp(scored).where(col("xent_fp").isNotNull)
      .select(col(idCol), col("xent_fp"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val nAll = base.count()
      val effRate = math.min(sampleRate,
        maxSample.toDouble / math.max(nAll, 1L))
      val sample = Decontam.hashSample(base, effRate, seed, idCol)
        .select(col("xent_fp"))
        .collect().map(_.getLong(0)).sorted
      require(sample.nonEmpty,
        "ppx cutoff sample is empty: raise sampleRate or check the model")
      val n = sample.length
      def at(q: Double): Long = sample(math.floor((n - 1) * q).toInt)
      Cuts(at(headQ), at(tailQ), n.toLong)
    } finally base.unpersist(blocking = false)
  }

  /** Assign buckets from fitted cutoffs: one shuffle-free projection. */
  def withBuckets(scored: DataFrame, headCut: Long, tailCut: Long): DataFrame =
    withXentFp(scored).withColumn("ppx_bucket",
      when(col("xent_fp").isNull, "na")
        .when(col("xent_fp") <= headCut, "head")
        .when(col("xent_fp") <= tailCut, "middle")
        .otherwise("tail"))
}
