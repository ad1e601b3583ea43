package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Gopher-style document-quality rules (Rae et al. 2021, "Scaling Language
 * Models: ... Gopher", appendix A1.1): the canonical web-corpus keep/drop
 * heuristics a training-data pipeline applies before any trained filter.
 * Complements [[TextStats.quality]] (a composite score) and
 * [[CorpusClean.repetitionMetrics]] (the Gopher *repetition* rules) with
 * the Gopher *quality* rules: word-count bounds, mean word length,
 * symbol-to-word ratio, bullet/ellipsis line fractions, alphabetic-word
 * fraction, and required-stopword hits.
 *
 * Scale contract: pure per-row projection — every column is a codegen'd
 * Catalyst expression over one `split`; no shuffle, no UDF, predicate
 * pushdown unobstructed. All regexes stay in the Java∩RE2 subset so the
 * DuckDB oracle mirrors them verbatim.
 */
object Gopher {

  /** Gopher's required-stopword list: a document failing to contain at
   * least two of these is likely not running English prose. */
  val requiredStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  private def nonEmptyLines(text: Column): Column =
    filter(transform(split(coalesce(text, lit("")), "\n"), l => trim(l)),
      l => l =!= "")

  private def lineFrac(lines: Column, pred: Column => Column): Column =
    when(size(lines) > 0,
      round(size(filter(lines, pred)).cast("double") / size(lines), 4))
      .otherwise(0.0)

  /**
   * Per-document Gopher quality statistics:
   *  - `n_words`: whitespace words (lowercased split, [[TextStats.words]]);
   *  - `mean_word_len`: non-whitespace chars / words;
   *  - `symbol_word_ratio`: (`#` + ellipsis occurrences) / words;
   *  - `bullet_line_frac`: fraction of non-empty lines starting `-`/`*`/`•`;
   *  - `ellipsis_line_frac`: fraction of non-empty lines ending `...`/`…`;
   *  - `alpha_word_frac`: fraction of words containing a letter;
   *  - `n_stop_hits`: how many of [[requiredStopwords]] occur as words.
   */
  def stats(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val text = coalesce(col(textCol), lit(""))
    val ws = TextStats.words(text)
    val lines = nonEmptyLines(text)
    val nw = size(ws)
    docs
      .withColumn("n_words", nw)
      .withColumn("mean_word_len",
        when(nw > 0, round(
          length(regexp_replace(text, "\\s", "")).cast("double") / nw, 4))
          .otherwise(0.0))
      .withColumn("symbol_word_ratio",
        when(nw > 0, round(
          (size(regexp_extract_all(text, lit("#"), lit(0)))
            + size(regexp_extract_all(text, lit("\\.{3}|…"), lit(0))))
            .cast("double") / nw, 4)).otherwise(0.0))
      .withColumn("bullet_line_frac", lineFrac(lines, l => l.rlike("^[-*•]")))
      .withColumn("ellipsis_line_frac",
        lineFrac(lines, l => l.rlike("(\\.{3}|…)$")))
      .withColumn("alpha_word_frac",
        when(nw > 0, round(
          size(filter(ws, w => w.rlike("[a-z]"))).cast("double") / nw, 4))
          .otherwise(0.0))
      .withColumn("n_stop_hits",
        size(filter(
          array(requiredStopwords.map(lit): _*), s => array_contains(ws, s))))
  }

  /**
   * The Gopher keep decision with the paper's default thresholds (word
   * count 50–100k, mean word length 3–10, symbol ratio ≤0.1, bullet lines
   * ≤90%, ellipsis lines ≤30%, alphabetic words ≥80%, ≥2 required
   * stopwords). Adds a boolean `gopher_keep`; filtering is the caller's
   * move so lineage can count drops per rule.
   */
  def withKeep(docs: DataFrame, minWords: Int = 50, maxWords: Int = 100000,
      minMeanWordLen: Double = 3.0, maxMeanWordLen: Double = 10.0,
      maxSymbolRatio: Double = 0.1, maxBulletFrac: Double = 0.9,
      maxEllipsisFrac: Double = 0.3, minAlphaFrac: Double = 0.8,
      minStopHits: Int = 2, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    stats(docs, idCol, textCol).withColumn("gopher_keep",
      col("n_words").between(minWords, maxWords) &&
      col("mean_word_len").between(minMeanWordLen, maxMeanWordLen) &&
      col("symbol_word_ratio") <= maxSymbolRatio &&
      col("bullet_line_frac") <= maxBulletFrac &&
      col("ellipsis_line_frac") <= maxEllipsisFrac &&
      col("alpha_word_frac") >= minAlphaFrac &&
      col("n_stop_hits") >= minStopHits)
}
