package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * DSIR — Data Selection via Importance Resampling (Xie et al. 2023): pick
 * raw-corpus documents whose hashed-n-gram distribution looks like a
 * target domain. The canonical trained data-selection operator a
 * web-scale pipeline runs after cleaning ([[C4]]/[[Gopher]]) and before
 * mixing ([[Decontam.mix]]):
 *
 *  1. featurize every document as hashed unigram+bigram counts over `b`
 *     buckets ([[buckets]]);
 *  2. fit two Laplace-smoothed bag-of-hashed-ngrams models — target p,
 *     raw q — and keep the per-bucket log ratio ln p − ln q ([[fit]]);
 *  3. score each raw document with the integer sum of its buckets'
 *     weights ([[score]]);
 *  4. resample top-k under deterministic Gumbel noise ([[resample]]) —
 *     Gumbel-max sampling draws ∝ exp(score) = p/q, exactly the DSIR
 *     importance weight.
 *
 * Numerics follow the [[QualityModel]] discipline: weights are micro-nat
 * fixed point (`round(ln · 10⁶)` as long), document scores are integer
 * sums (order-independent under shuffled aggregation), and the Gumbel
 * keys derive from the [[Decontam.hashUnit]] md5 construction — so the
 * whole cascade is replayable in closed-form SQL and reproducible months
 * later from (b, seed, k) alone.
 *
 * Scale contract: `fit` is two map-side-combinable bucket-grain
 * aggregations (shuffle ships ≤`b` rows per mapper); the model is a dense
 * `b`-row table broadcast at scoring; `score` is explode → broadcast join
 * → one partial agg to doc grain; `resample` plans as
 * TakeOrderedAndProject (per-partition top-k, merge on the driver) — no
 * global sort materializes.
 */
object Dsir {

  private def toks(c: Column): Column =
    filter(split(lower(trim(coalesce(c, lit("")))), "\\s+"), t => t =!= "")

  private def fp(c: Column): Column = round(c * lit(1e6), 0).cast("long")

  /** md5-bucket of a gram: `('0x' || substr(md5(g),1,6))::INT % b` in SQL
   * — 6 hex chars keep the value exact in both engines. */
  private def bucketOf(g: Column, b: Int): Column =
    (conv(substring(md5(g), 1, 6), 16, 10).cast("int") % b).cast("int")

  /** Hashed unigram+bigram buckets of a text, WITH multiplicity — the
   * document's feature vector in sparse exploded form. Bigrams come from
   * `zip_with(ws, shift(ws))`, NOT an `element_at` lambda: `element_at`
   * inside a higher-order function re-evaluates the tokenizing `split`
   * per ELEMENT (O(words²·len) per row — measured 20× slower at sf0.1);
   * `zip_with` evaluates each input array once per ROW. The trailing
   * `(wₙ, null)` pair concats to null and is filtered. */
  def buckets(text: Column, b: Int): Column =
    // codegen'd kernel ([[graft.functions.DsirBuckets]]): the HOF form
    // below is CodegenFallback — interpreted per gram, with an md5/conv
    // string round-trip each. Bit-identical (differential-pinned by
    // ShingleKernelSpec against [[bucketsHof]]).
    graft.functions.DsirBuckets.of(text, b)

  /** The original Catalyst HOF form of [[buckets]] — the differential-test
   * twin (ShingleKernelSpec); not on any query path. */
  private[graft] def bucketsHof(text: Column, b: Int): Column =
    Cols.bound(toks(text)) { ws =>
      val bigrams = filter(
        zip_with(ws, slice(ws, lit(2), greatest(size(ws) - 1, lit(0))),
          (a, w2) => concat(a, lit(" "), w2)),
        g => g.isNotNull)
      transform(concat(ws, bigrams), g => bucketOf(g, b))
    }

  /**
   * Fit the importance model: a DENSE `b`-row table
   * `(bucket, w_fp = round(10⁶·(ln p_bucket − ln q_bucket)))` with Laplace
   * smoothing `(c+1)/(T+b)` on both sides — dense, so scoring needs no
   * unseen sentinel and the broadcast is exactly `b` rows.
   */
  def fit(target: DataFrame, raw: DataFrame, b: Int = 1024,
      textCol: String = "text"): DataFrame = {
    // ONE union-tagged aggregation computes both sides' bucket counts in a
    // single job (the two per-side passes each paid a localCheckpoint job,
    // plus a dense join + two totals crossJoins afterwards); the ≤b-row
    // result is collected once — a bounded model artifact, the same
    // discipline as ZoneModel/BPE/PCA — and the dense model is rebuilt as
    // a LOCAL relation whose w_fp arithmetic still runs through the exact
    // Spark expressions (log + fp rounding), so values are bit-identical
    // to the former distributed form.
    val counts = target
      .select(explode(buckets(col(textCol), b)).as("bucket"), lit(true).as("_t"))
      .unionByName(raw
        .select(explode(buckets(col(textCol), b)).as("bucket"), lit(false).as("_t")))
      .groupBy("bucket")
      .agg(sum(when(col("_t"), 1L).otherwise(0L)).as("ct"),
        sum(when(col("_t"), 0L).otherwise(1L)).as("cr"))
      .collect()
    denseModel(target.sparkSession, b,
      counts.map(r => (r.getInt(0), r.getLong(1), r.getLong(2))))
  }

  /** Dense b-row model from collected (bucket, ct, cr) triples: local
   * relation in, Spark-expression arithmetic out (bit-identical weights). */
  private def denseModel(spark: org.apache.spark.sql.SparkSession, b: Int,
      counts: Seq[(Int, Long, Long)]): DataFrame = {
    val ct = Array.ofDim[Long](b)
    val cr = Array.ofDim[Long](b)
    counts.foreach { case (i, t, r) => ct(i) = t; cr(i) = r }
    val tt = ct.sum
    val tr = cr.sum
    import spark.implicits._
    (0 until b).map(i => (i, ct(i), cr(i))).toDF("bucket", "ct", "cr")
      .select(col("bucket"),
        fp(log((col("ct") + 1).cast("double") / (lit(tt) + b)) -
          log((col("cr") + 1).cast("double") / (lit(tr) + b))).as("w_fp"))
  }

  /**
   * Fused fit + score over ONE featurization pass — the §8 "decide on
   * small rows" shape for the common case `target = docs WHERE cond`:
   * the corpus is exploded to hashed buckets ONCE and aggregated to
   * (doc, bucket, count) grain behind a plan barrier; bucket-grain model
   * counts roll up from that small frame (never re-reading text), and
   * scoring joins the broadcast model back onto the same frame. Output
   * and model values are identical to `score(docs, fit(docs.where(cond),
   * docs))` — pinned by DsirSpec and the dsir_scores/resample oracles —
   * but text is featurized once instead of three times (fit target, fit
   * raw, score).
   */
  def fitScored(docs: DataFrame, targetCond: Column, b: Int = 1024,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val db = graft.extract.Chunked.barrier(
      docs.select(col(idCol), targetCond.as("_t"),
          explode_outer(buckets(col(textCol), b)).as("bucket"))
        .groupBy(col(idCol), col("_t"), col("bucket"))
        .agg(count(lit(1)).as("c")))
    val counts = db.where(col("bucket").isNotNull)
      .groupBy("bucket")
      .agg(sum(when(col("_t"), col("c")).otherwise(0L)).as("ct"),
        sum(col("c")).as("cr"))
      .collect()
    val model = denseModel(docs.sparkSession, b,
      counts.map(r => (r.getInt(0), r.getLong(1), r.getLong(2))))
    db.join(broadcast(model), Seq("bucket"), "left")
      .groupBy(idCol)
      .agg(sum(when(col("bucket").isNotNull, col("c")).otherwise(0L))
          .as("n_grams"),
        coalesce(sum(col("c") * col("w_fp")), lit(0L)).as("dsir_score_fp"))
  }

  /** [[resample]] on top of [[fitScored]] — same selection, one
   * featurization pass. */
  def fitResampled(docs: DataFrame, targetCond: Column, k: Int,
      b: Int = 1024, seed: String = "dsir", idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    fitScored(docs, targetCond, b, idCol, textCol)
      .withColumn("key_fp", col("dsir_score_fp") + gumbelFp(seed, idCol))
      .orderBy(col("key_fp").desc, col(idCol))
      .limit(k)
  }

  /**
   * Score documents: `dsir_score_fp` = integer sum of the document's
   * bucket weights (micro-nats of ln(p/q) up to hashing), plus `n_grams`.
   * Gram-less documents score 0 via `explode_outer`.
   */
  def score(docs: DataFrame, model: DataFrame, b: Int = 1024,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.select(col(idCol), explode_outer(buckets(col(textCol), b)).as("bucket"))
      .join(broadcast(model), Seq("bucket"), "left")
      .groupBy(idCol)
      .agg(count(col("bucket")).as("n_grams"),
        coalesce(sum("w_fp"), lit(0L)).as("dsir_score_fp"))

  /**
   * Deterministic Gumbel-top-k importance resample: key = score_fp +
   * round(−10⁶·ln(−ln u)) with u = (md5-int + ½)/2²⁴ of `seed:id` — the
   * Gumbel-max trick, so selection probability ∝ exp(score) = p/q. Ties
   * (and the driver merge) break on id. Returns the k selected documents
   * with their scores and keys.
   */
  def resample(docs: DataFrame, model: DataFrame, k: Int, b: Int = 1024,
      seed: String = "dsir", idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    score(docs, model, b, idCol, textCol)
      .withColumn("key_fp", col("dsir_score_fp") + gumbelFp(seed, idCol))
      .orderBy(col("key_fp").desc, col(idCol))
      .limit(k)

  /** Deterministic Gumbel noise key shared by [[resample]]/[[fitResampled]]:
   * round(−10⁶·ln(−ln u)) with u = (md5-int + ½)/2²⁴ of `seed:id`. */
  private def gumbelFp(seed: String, idCol: String): Column = {
    val u = (conv(substring(md5(concat(lit(seed + ":"),
      col(idCol).cast("string"))), 1, 6), 16, 10).cast("double") + 0.5) /
      16777216.0
    round(lit(-1e6) * log(-log(u)), 0).cast("long")
  }
}
