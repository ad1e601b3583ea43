package graft.ops

import java.io.{BufferedReader, InputStreamReader}
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Trained character-trigram language identification — the trained upgrade
 * of [[TextStats.langId]]'s stopword heuristic, filling the role the
 * reference's `LanguageUtilities.runLanguageId` (a trained langdetect,
 * `DatacatSegmenterParser.java:667-682`) plays: stopword lists collapse on
 * short, stopword-free or morphologically rich text; character trigrams do
 * not.
 *
 * Model: per-language Laplace-smoothed multinomial Naive Bayes over char
 * trigrams of the normalized text (lowercased, whitespace collapsed,
 * space-padded). Same design rules as [[QualityModel]]: training is ONE
 * map-side-combinable aggregation, weights are MICRO-NAT FIXED POINT longs
 * (document scores are integer sums — aggregation order can never drift
 * them), and every quantity is a closed-form function of integer counts so
 * the driver oracle replays it exactly in SQL.
 *
 * Scale: the model is a bounded (langs × trigram-vocab) broadcast;
 * inference is explode → per-doc trigram count (map-side combined) →
 * broadcast join → one aggregation per (doc, lang) → argmax. The corpus
 * shuffles once at doc grain; nothing is corpus × vocab.
 *
 * A small built-in multilingual sample ships as a resource
 * (`graft/langid/corpus.tsv`, the [[graft.extract.ZoneModelArtifact]]
 * shipping discipline) so [[builtinModel]] works out of the box; real
 * deployments retrain on a larger labeled sample with the same `train`.
 */
object LangId {

  /** Sentinel rows (never 3 chars, so no collision with real trigrams). */
  val priorTri = "__PRIOR__"
  val unseenTri = "__UNSEEN__"

  /** Normalized text: lowercased, runs of whitespace to one space, wrapped
   * in sentinel spaces so word boundaries contribute trigrams. */
  def normText(text: Column): Column =
    concat(lit(" "), regexp_replace(lower(trim(coalesce(text, lit("")))),
      "\\s+", " "), lit(" "))

  /** Char trigrams of the normalized text; empty array when too short.
   * Cols.bound: the substr lambda would otherwise re-run the normalizing
   * regexp_replace per CHARACTER — O(len²) per row. */
  def trigrams(text: Column): Column =
    Cols.bound(normText(text)) { t =>
      when(length(t) >= 3,
        transform(sequence(lit(1), length(t) - 2), i => t.substr(i, lit(3))))
        .otherwise(array())
    }

  private def fp(c: Column): Column = round(c * lit(1e6), 0).cast("long")

  /**
   * Train on a labeled corpus `(langCol, textCol)`. Returns the model as
   * `(lang, tri, w_fp)` — `w_fp = round(ln((c+1)/(t_lang+V))·10⁶)` — plus
   * two sentinel rows per language: `__UNSEEN__` (the smoothed weight of a
   * trigram absent from that language's vocabulary) and `__PRIOR__`
   * (`ln(n_lang/N)` over training documents).
   */
  def train(labeled: DataFrame, langCol: String = "lang",
      textCol: String = "text"): DataFrame = {
    val tri = labeled.select(col(langCol).as("lang"),
      explode(trigrams(col(textCol))).as("tri"))
    // vocab-sized frame, three consumers: share one lineage
    val counts = tri.groupBy("lang", "tri").agg(count(lit(1)).as("c"))
      .localCheckpoint()
    val perLang = counts.groupBy("lang").agg(sum("c").as("t"))
    val vocab = counts.agg(countDistinct("tri").as("v"))
    val nDocs = labeled.groupBy(col(langCol).as("lang"))
      .agg(count(lit(1)).as("n"))
      .crossJoin(broadcast(labeled.agg(count(lit(1)).as("n_all"))))
    val weights = counts.join(broadcast(perLang), Seq("lang"))
      .crossJoin(broadcast(vocab))
      .select(col("lang"), col("tri"),
        fp(log((col("c") + 1).cast("double") / (col("t") + col("v")))).as("w_fp"))
    val sentinels = perLang.crossJoin(broadcast(vocab))
      .join(nDocs, Seq("lang"))
      .select(col("lang"), explode(array(
        struct(lit(unseenTri).as("tri"),
          fp(log(lit(1.0) / (col("t") + col("v")))).as("w_fp")),
        struct(lit(priorTri).as("tri"),
          fp(log(col("n").cast("double") / col("n_all"))).as("w_fp")))).as("s"))
      .select(col("lang"), col("s.tri").as("tri"), col("s.w_fp").as("w_fp"))
    weights.unionByName(sentinels)
  }

  /**
   * Classify documents: adds `(lang, score_fp)` — the argmax language and
   * its integer score `prior + Σ_tri n·w` (absent trigrams score that
   * language's `__UNSEEN__` weight). Documents whose text yields no
   * trigrams are dropped (callers default them to "und"). Deterministic
   * tie-break: larger language code wins.
   */
  def classify(docs: DataFrame, model: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    // barrier the (vocab-sized) model: weights and scalars below would
    // otherwise each inline the whole training plan — with a freshly
    // trained model that re-plans (and re-runs) training per consumer
    val m = graft.extract.Chunked.barrier(model)
    val weights = m.where(!col("tri").isin(priorTri, unseenTri))
    val scalars = broadcast(m.where(col("tri").isin(priorTri, unseenTri))
      .groupBy("lang").agg(
        max(when(col("tri") === priorTri, col("w_fp"))).as("prior_fp"),
        max(when(col("tri") === unseenTri, col("w_fp"))).as("unseen_fp")))
    // plan-barrier: two doc-grain consumers (n_tot, the weights join) share
    // the trigram-count shuffle stages instead of recomputing the explode
    val d = graft.extract.Chunked.barrier(docs
      .select(col(idCol), explode(trigrams(col(textCol))).as("tri"))
      .groupBy(idCol, "tri").agg(count(lit(1)).as("n")))
    val nTot = d.groupBy(idCol).agg(sum("n").as("n_tot"))
    val present = d.join(broadcast(weights), Seq("tri"))
      .groupBy(col(idCol), col("lang"))
      .agg(sum(col("n") * col("w_fp")).as("s1"), sum(col("n")).as("n_present"))
    nTot.crossJoin(scalars)
      .join(present, Seq(idCol, "lang"), "left")
      .select(col(idCol), col("lang"),
        (col("prior_fp") + coalesce(col("s1"), lit(0L)) +
          (col("n_tot") - coalesce(col("n_present"), lit(0L))) * col("unseen_fp"))
          .as("score_fp"))
      .groupBy(idCol)
      .agg(max(struct(col("score_fp"), col("lang"))).as("b"))
      .select(col(idCol), col("b.lang").as("lang"), col("b.score_fp").as("score_fp"))
  }

  /** The built-in multilingual training sample (lang, text) shipped under
   * `graft/langid/corpus.tsv`. */
  def builtinCorpus: Seq[(String, String)] = {
    val in = getClass.getResourceAsStream("/graft/langid/corpus.tsv")
    require(in != null, "missing resource graft/langid/corpus.tsv")
    val r = new BufferedReader(new InputStreamReader(in, StandardCharsets.UTF_8))
    try Iterator.continually(r.readLine()).takeWhile(_ != null)
      .filter(_.nonEmpty).map { l =>
        val i = l.indexOf('\t')
        require(i > 0, s"malformed langid corpus line: $l")
        (l.substring(0, i), l.substring(i + 1))
      }.toVector
    finally r.close()
  }

  /** Model trained on the built-in sample. */
  def builtinModel(spark: SparkSession): DataFrame = {
    import spark.implicits._
    train(builtinCorpus.toDF("lang", "text"))
  }
}
