package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Benchmark decontamination and deterministic corpus sampling / mixing —
 * the remaining standard stages of a large-scale training-data pipeline
 * (n-gram-overlap decontamination as popularized by the GPT-3 appendix and
 * The Pile; hash-Bernoulli sampling; weighted domain mixing with
 * fractional epochs).
 *
 * Scale contracts (the 100 TB shapes):
 *  - The benchmark suite is SMALL relative to the corpus (benchmarks are
 *    MBs; corpora are TBs), so its distinct-shingle set is broadcast and
 *    the corpus side joins it map-side — corpus shingles are NEVER
 *    shuffled. Per-doc totals come from `size(array_distinct(...))` on the
 *    scan side, no explode, no shuffle.
 *  - Sampling and mixing are per-row hash predicates/generators: no
 *    shuffle at all, deterministic under retries and repartitioning
 *    (md5 of (seed, id) — never `rand()`, whose per-partition streams
 *    change with partitioning and break exactly-once semantics).
 *  - All semantics are SQL-expressible so the driver's DuckDB oracle can
 *    check them 1:1.
 */
object Decontam {

  /**
   * Deterministic unit-interval hash in [0, 1): first 6 hex chars of
   * md5(seed:id) as an int / 2^24. 6 chars keeps the value exactly
   * representable in both Spark and DuckDB integer casts (SQL parity:
   * `('0x' || substr(md5(...), 1, 6))::INT / 16777216.0`).
   */
  def hashUnit(id: Column, seed: String): Column =
    conv(substring(md5(concat(lit(seed + ":"), id.cast("string"))), 1, 6),
      16, 10).cast("long") / 16777216.0

  /**
   * Deterministic Bernoulli sample: keep a row iff hashUnit(id) < rate.
   * Repartition-stable and retry-stable, unlike `df.sample` (whose
   * per-partition RNG streams depend on the physical split). The same
   * (seed, rate) always selects the same ids — a corpus sample can be
   * reproduced months later from the predicate alone.
   */
  def hashSample(df: DataFrame, rate: Double, seed: String = "sample",
      idCol: String = "doc_id"): DataFrame =
    df.where(hashUnit(col(idCol), seed) < math.min(rate, 1.0))

  /**
   * Per-document benchmark n-gram overlap (decontamination measurement):
   * for each corpus doc, how many of its distinct word `n`-grams appear in
   * any benchmark doc. Word n-grams via [[Dedup.shingles]] (docs shorter
   * than n words contribute their whole text as one shingle — a short doc
   * equal to a short benchmark prompt is still a hit).
   *
   * Output: (id, n_ngrams, contaminated_ngrams, n_bench_docs,
   * contamination = contaminated/total rounded to 4 places).
   *
   * Plan shape: benchmark distinct (bench_id, shingle) pairs are
   * broadcast; the corpus explodes its distinct shingles, broadcast-joins,
   * and partially aggregates to doc grain — the only exchange is the final
   * doc-grain agg of HIT rows (tiny: contamination is the exception, not
   * the rule). `n_ngrams` never leaves the scan projection.
   */
  def overlap(corpus: DataFrame, benchmark: DataFrame, n: Int = 13,
      idCol: String = "doc_id", textCol: String = "text",
      benchIdCol: String = "bench_id", benchTextCol: String = "text"): DataFrame = {
    // contentShingles: a zero-word benchmark or corpus row has no n-gram
    // content — the degenerate "" shingle would otherwise mark every empty
    // corpus doc as "contaminated" by any empty benchmark row
    val benchSh = benchmark.select(col(benchIdCol).as("_bench_id"),
        explode(Dedup.contentShingles(col(benchTextCol), n)).as("_sh"))
      .distinct()
    val docSh = Par.spread(corpus).select(col(idCol),
      explode(Dedup.contentShingles(col(textCol), n)).as("_sh"))
    val hits = docSh.join(broadcast(benchSh), "_sh")
      .groupBy(col(idCol))
      .agg(countDistinct(col("_sh")).as("contaminated_ngrams"),
        countDistinct(col("_bench_id")).as("n_bench_docs"))
    // hits holds only CONTAMINATED docs — small by assumption (contamination
    // is the exception at corpus scale), so broadcast it and the totals
    // frame never shuffles either
    corpus
      .select(col(idCol),
        size(Dedup.contentShingles(col(textCol), n)).cast("long").as("n_ngrams"))
      .join(broadcast(hits), Seq(idCol), "left")
      .na.fill(0L, Seq("contaminated_ngrams", "n_bench_docs"))
      .withColumn("contamination",
        // exact-integer 4dp: engine-stable where round(p/q, 4) is not;
        // n_ngrams = 0 (empty/null doc) → 0.0: no content, no contamination
        when(col("n_ngrams") === 0, lit(0.0))
          .otherwise(Cols.ratio4dp(col("contaminated_ngrams"), col("n_ngrams"))))
  }

  /**
   * Benchmark decontamination filter: drop corpus docs whose benchmark
   * n-gram contamination exceeds `maxFrac` (0.0 = drop on any overlap).
   * Returns the surviving corpus rows plus the `contamination` column —
   * the measurement is kept so downstream lineage can audit the decision.
   *
   * Only the (tiny) contaminated-doc frame is joined back, broadcast —
   * the corpus passes through map-side with zero shuffles.
   */
  def decontaminate(corpus: DataFrame, benchmark: DataFrame, n: Int = 13,
      maxFrac: Double = 0.0, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val m = overlap(corpus, benchmark, n, idCol, textCol)
      .select(col(idCol), col("contamination"))
      .where(col("contamination") > 0)
    corpus.join(broadcast(m), Seq(idCol), "left")
      .na.fill(0.0, Seq("contamination"))
      .where(col("contamination") <= maxFrac)
  }

  /**
   * SURGICAL decontamination: instead of dropping contaminated documents
   * ([[decontaminate]]), strip only the words covered by an n-gram that
   * appears in the benchmark — the span-level removal a pipeline applies
   * when contaminated pages are otherwise valuable. Adds `text_stripped`
   * (covered words removed, single-space rejoined) and `was_stripped`.
   *
   * Plan shape: benchmark gram hashes are broadcast (distinct 13-gram md5s
   * of the benchmark — bounded); the corpus emits its word windows once
   * ([[Passage.occurrences]] — 32-byte keys), broadcast-joins, and only
   * AFFECTED documents rebuild at word grain ([[Passage.stripCovered]]).
   * Documents (or benchmark rows) shorter than n words emit no windows
   * and pass through — sub-n overlap is below the decontamination
   * threshold by definition (Brown et al. use 13-gram collisions).
   */
  def stripOverlaps(corpus: DataFrame, benchmark: DataFrame, n: Int = 13,
      idCol: String = "doc_id", textCol: String = "text",
      benchTextCol: String = "text"): DataFrame = {
    // md5(shingle) == Passage's window hash: shingles are lowercased
    // space-joined words, Passage hashes md5(lower(join(words, ' ')))
    val benchKeys = benchmark.select(
      explode(Dedup.contentShingles(col(benchTextCol), n)).as("sh"))
      .select(md5(col("sh")).as("gram")).distinct()
    val covered = graft.extract.Chunked.barrier(
      Passage.occurrences(corpus, n, idCol, textCol)
        .join(broadcast(benchKeys), Seq("gram"))
        .select(col(idCol),
          explode(sequence(col("start_idx"), col("start_idx") + (n - 1)))
            .as("w_idx"))
        .distinct())
    Passage.stripCovered(corpus, covered, Passage.wordsOf(textCol),
      idCol, textCol)
  }

  /**
   * Weighted domain mixing with fractional epochs (the GPT-3 data-mixing
   * table): `weights` maps a domain value to its target epoch count w.
   * Every doc in a weighted domain is emitted floor(w) times (epochs
   * 0..floor(w)-1) plus one more epoch with probability frac(w), decided
   * by the deterministic per-(doc, epoch) hash. Domains absent from
   * `weights` are dropped (an explicit mix is a whitelist). Output = the
   * doc columns plus `epoch`; expected row count = Σ_domain |domain|·w.
   *
   * No shuffle: the weights table is broadcast, the epoch explode is
   * per-row, and the keep predicate is a hash. Deterministic under
   * retries, so a resumed job regenerates the identical mix.
   */
  def mixCorpus(docs: DataFrame, weights: Map[String, Double],
      domainCol: String = "source", seed: String = "mix",
      idCol: String = "doc_id"): DataFrame = {
    val sess = docs.sparkSession
    import sess.implicits._
    val w = weights.toSeq.toDF(domainCol, "_weight")
    docs.join(broadcast(w), domainCol)
      .withColumn("epoch",
        explode(sequence(lit(0), greatest(ceil(col("_weight")).cast("int") - 1, lit(0)))))
      .where(col("epoch") < floor(col("_weight")) ||
        hashUnit(concat(col(idCol).cast("string"), lit("#"), col("epoch")), seed) <
          col("_weight") - floor(col("_weight")))
      .drop("_weight")
  }

  /**
   * Temperature-balanced multi-source sampling at α = 0.5 (the standard
   * exponent-smoothing rebalance for mixed corpora: small sources are
   * up-weighted relative to their share, big ones damped — sampling
   * probability ∝ √n_source instead of n_source). Given a row budget
   * `targetRows`, each source gets quota
   * `targetRows * isqrt(n_s) div Σ isqrt(n_j)` and keeps rows by the
   * deterministic [[hashUnit]] Bernoulli at rate `quota / n_s`.
   *
   * Numerics: the α = 0.5 weight is the INTEGER square root
   * (`floor(sqrt(n))` — IEEE sqrt is correctly rounded, so both engines
   * floor the same value for n < 2^52), the normalization is integer
   * division, and the only real-valued step is one exact-integer
   * division fed to the hash compare — no `pow`, no float sums, so the
   * DuckDB mirror reproduces every keep decision bit-for-bit.
   *
   * Plan shape: one small source-grain aggregate (+ its total) broadcast
   * back as a join; the corpus itself is filtered map-side — no shuffle
   * at corpus grain, retry/repartition-stable. Same discipline as
   * [[graft.ops.UrlOps.domainQuotaSample]] (per-domain caps) — this is
   * the cross-SOURCE rebalance that runs above it.
   */
  def sqrtTemperatureSample(docs: DataFrame, targetRows: Long,
      sourceCol: String = "source", idCol: String = "doc_id",
      seed: String = "tmix"): DataFrame = {
    require(targetRows > 0, "targetRows must be positive")
    val counts = docs.groupBy(sourceCol).agg(count(lit(1)).as("n_source"))
      .withColumn("w", floor(sqrt(col("n_source"))).cast("long"))
    val total = counts.agg(sum(col("w")).as("w_tot"))
    val quotas = counts.crossJoin(broadcast(total))
      .withColumn("quota",
        expr(s"${targetRows}L * w div w_tot").cast("long"))
      .withColumn("keep_rate",
        least(lit(1.0), col("quota").cast("double") / col("n_source")))
      .select(col(sourceCol), col("n_source"), col("quota"), col("keep_rate"))
    docs.join(broadcast(quotas), Seq(sourceCol))
      .where(hashUnit(col(idCol), seed) < col("keep_rate"))
  }
}
