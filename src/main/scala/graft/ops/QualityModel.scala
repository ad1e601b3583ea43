package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Trained document-quality classifier — the trained upgrade of
 * [[TextStats]]' heuristic quality score, filling the role a
 * fastText/CCNet-style quality model plays in a web-scale training-data
 * pipeline: learn from labeled examples which token distributions mark
 * keep-worthy documents, then score the corpus.
 *
 * Model: Laplace-smoothed multinomial Naive Bayes log-likelihood ratio.
 * Chosen over iterative logistic regression deliberately: training is ONE
 * map-side-combinable aggregation over the labeled corpus (no fixed-point
 * loops, no per-iteration shuffles), the model is a small weights table
 * broadcast at inference, and every quantity is a closed-form function of
 * integer counts — so the driver oracle can recompute it exactly in SQL.
 *
 * Numerics: weights are emitted in MICRO-NAT FIXED POINT
 * (`w_fp = round(w · 10⁶)` as long). Downstream document scores are then
 * SUMS OF INTEGERS — associative and order-independent — so distributed
 * aggregation order can never drift the result (the float-sum-order trap
 * that plagues doubles under shuffled aggregation; same discipline as the
 * integer-valued region sums in the chunked zoner). The only floating
 * computation is `ln` at train time, one value per distinct token.
 *
 * Scale: training shuffles token-grain counts once (map-side combined);
 * `minCount` bounds the vocabulary (rare tokens collapse into the
 * `__UNSEEN__` sentinel), which bounds the broadcast model size at
 * web-corpus vocabularies. Inference is explode → broadcast join →
 * one map-side-combinable groupBy per document: no doc×vocab blowup.
 *
 * Sentinel rows use uppercase names ([[priorTok]]/[[unseenTok]]); corpus
 * tokens are lowercased first, so no real token can collide.
 */
object QualityModel {

  /** Sentinel row carrying ln(N₁/N₀), the class-prior log odds. */
  val priorTok = "__PRIOR__"

  /** Sentinel row carrying the weight of a token unseen in training:
   * ln((T₀+V)/(T₁+V)), the ratio of the two Laplace denominators. */
  val unseenTok = "__UNSEEN__"

  /** Lowercased whitespace tokens (the wordsCte idiom shared with the
   * dedup/decontam operators, so oracles can mirror it verbatim). */
  private def toks(c: Column): Column =
    filter(split(lower(trim(c)), "\\s+"), t => t =!= "")

  private def fp(c: Column): Column = round(c * lit(1e6), 0).cast("long")

  /**
   * Train on a labeled corpus (`labelCol` ∈ {0, 1}; 1 = high quality).
   * Returns the model as a weights table `(tok, w_fp)` — positive pulls
   * toward quality — plus the two sentinel rows. Tokens seen fewer than
   * `minCount` times total are excluded from the vocabulary (they score
   * as unseen at inference), bounding model size.
   */
  def train(labeled: DataFrame, minCount: Long = 1, textCol: String = "text",
      labelCol: String = "label"): DataFrame = {
    val tok = labeled.select(col(labelCol).as("label"),
      explode(toks(col(textCol))).as("tok"))
    // Materialize the vocab-sized count table: three consumers below
    // (weights, totals, sentinels) would otherwise each re-run the
    // corpus-wide token aggregation — 3 scans of the labeled corpus
    // instead of 1. localCheckpoint truncates lineage at a small,
    // minCount-bounded frame (same discipline as Dedup.components).
    val counts = tok.groupBy("tok").agg(
      sum(when(col("label") === 1, 1L).otherwise(0L)).as("c1"),
      sum(when(col("label") === 0, 1L).otherwise(0L)).as("c0"))
      .where(col("c1") + col("c0") >= minCount)
      .localCheckpoint()
    val tot = counts.agg(sum("c1").as("t1"), sum("c0").as("t0"),
      count(lit(1)).as("v"))
    val nDocs = labeled.agg(
      sum(when(col(labelCol) === 1, 1L).otherwise(0L)).as("n1"),
      sum(when(col(labelCol) === 0, 1L).otherwise(0L)).as("n0"))
    val weights = counts.crossJoin(broadcast(tot)).select(col("tok"),
      fp(log((col("c1") + 1).cast("double") / (col("t1") + col("v"))) -
        log((col("c0") + 1).cast("double") / (col("t0") + col("v"))))
        .as("w_fp"))
    val sentinels = tot.crossJoin(broadcast(nDocs))
      .select(explode(array(
        struct(lit(priorTok).as("tok"),
          fp(log(col("n1").cast("double") / col("n0"))).as("w_fp")),
        struct(lit(unseenTok).as("tok"),
          fp(log((col("t0") + col("v")).cast("double") /
            (col("t1") + col("v")))).as("w_fp")))).as("s"))
      .select(col("s.tok"), col("s.w_fp"))
    weights.unionByName(sentinels)
  }

  /**
   * Score documents with a trained model: `score_fp` (micro-nats, exact
   * integer) and `label_hat` (1 when the log-odds favor quality). One
   * explode, one broadcast join, one map-side-combinable aggregation;
   * token-less documents score the bare prior via `explode_outer`.
   */
  def score(docs: DataFrame, model: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val scalars = model.agg(
      max(when(col("tok") === priorTok, col("w_fp"))).as("prior_fp"),
      max(when(col("tok") === unseenTok, col("w_fp"))).as("unseen_fp"))
    val weights = model.where(!col("tok").isin(priorTok, unseenTok))
    docs.select(col(idCol), explode_outer(toks(col(textCol))).as("tok"))
      .join(broadcast(weights), Seq("tok"), "left")
      .crossJoin(broadcast(scalars))
      .groupBy(col(idCol), col("prior_fp"))
      .agg(sum(when(col("tok").isNull, 0L)
        .otherwise(coalesce(col("w_fp"), col("unseen_fp")))).as("tok_sum"))
      .select(col(idCol),
        (col("prior_fp") + col("tok_sum")).as("score_fp"),
        (col("prior_fp") + col("tok_sum") > 0).cast("int").as("label_hat"))
  }
}
