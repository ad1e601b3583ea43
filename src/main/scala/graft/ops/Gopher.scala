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

  // all ratio outputs are exact-integer 4dp (Cols.ratio4dp): round(p/q, 4)
  // over doubles is engine-dependent at ten-thousandth-half rationals
  private def lineFrac(lines: Column, pred: Column => Column): Column =
    when(size(lines) > 0,
      Cols.ratio4dp(size(filter(lines, pred)), size(lines)))
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
    // ONE codegen'd kernel pass ([[graft.functions.GopherQuality]]) — the
    // HOF/regex legs below ran interpreted per element (same story as
    // [[repetitionStats]]). Bit-identical, differential-pinned by
    // CurationKernelSpec against [[statsHof]]; same column names/order.
    val g = graft.functions.GopherQuality.of(coalesce(col(textCol), lit("")))
    docs
      .select(col("*"), g.as("_gq"))
      .select(col("*"),
        col("_gq.n_words").as("n_words"),
        col("_gq.mean_word_len").as("mean_word_len"),
        col("_gq.symbol_word_ratio").as("symbol_word_ratio"),
        col("_gq.bullet_line_frac").as("bullet_line_frac"),
        col("_gq.ellipsis_line_frac").as("ellipsis_line_frac"),
        col("_gq.alpha_word_frac").as("alpha_word_frac"),
        col("_gq.n_stop_hits").as("n_stop_hits"))
      .drop("_gq")
  }

  /** The original Catalyst-expression form of [[stats]] — the
   * differential-test twin (CurationKernelSpec); not on any query path. */
  private[graft] def statsHof(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val text = coalesce(col(textCol), lit(""))
    // one select (not a withColumn chain) so an upstream computed text
    // column evaluates once per row — see repetitionStats
    docs.select(col("*"),
      Cols.bound(TextStats.words(text)) { ws =>
        Cols.bound(size(ws)) { nw =>
          struct(
            nw.as("n_words"),
            when(nw > 0, Cols.ratio4dp(
              length(regexp_replace(text, "\\s", "")), nw))
              .otherwise(0.0).as("mean_word_len"),
            when(nw > 0, Cols.ratio4dp(
              size(regexp_extract_all(text, lit("#"), lit(0)))
                + size(regexp_extract_all(text, lit("\\.{3}|…"), lit(0))), nw))
              .otherwise(0.0).as("symbol_word_ratio"),
            when(nw > 0, Cols.ratio4dp(
              size(filter(ws, w => w.rlike("[a-z]"))), nw))
              .otherwise(0.0).as("alpha_word_frac"),
            size(filter(array(requiredStopwords.map(lit): _*),
              s => array_contains(ws, s))).as("n_stop_hits"))
        }
      }.as("_g"),
      Cols.bound(nonEmptyLines(text)) { lines =>
        struct(
          lineFrac(lines, l => l.rlike("^[-*•]")).as("bullet_line_frac"),
          lineFrac(lines, l => l.rlike("(\\.{3}|…)$"))
            .as("ellipsis_line_frac"))
      }.as("_l"))
      .select(col("*"), col("_g.n_words"), col("_g.mean_word_len"),
        col("_g.symbol_word_ratio"), col("_l.bullet_line_frac"),
        col("_l.ellipsis_line_frac"), col("_g.alpha_word_frac"),
        col("_g.n_stop_hits"))
      .drop("_g", "_l")
  }

  // ——— repetition rules (Gopher A1.1, the other half of the filter) ———

  /** (dup_frac, dup_char_frac) over a unit array: duplicate occurrences
   * beyond the first, counted per element and per character. The char
   * numerator is `totalChars − distinctChars` — exactly the chars of
   * repeat occurrences — so both stay per-row array folds, no shuffle. */
  private def chars(a: Column): Column =
    aggregate(a, lit(0L), (acc, x) => acc + length(x))

  private def dupFracs(arr: Column): (Column, Column) = {
    // Cols.bound: `arr` is a computed split — unbound, every use inside
    // the two output columns would re-split the text (~10 evaluations/row)
    val fracN = Cols.bound(arr) { a =>
      when(size(a) > 0,
        Cols.ratio4dp(size(a) - size(array_distinct(a)), size(a)))
        .otherwise(0.0)
    }
    val fracC = Cols.bound(arr) { a =>
      Cols.bound(chars(a)) { tc =>
        when(tc > 0, Cols.ratio4dp(tc - chars(array_distinct(a)), tc))
          .otherwise(0.0)
      }
    }
    (fracN, fracC)
  }

  /** Character mass of the most frequent word n-gram, as a fraction of the
   * total n-gram character mass (gram space — bounded [0,1] without
   * position attribution, the same monotone repetition signal as the
   * paper's document-char fraction). Per-row: sort the shingles and fold a
   * run-length accumulator; the top gram is the max by (count, char
   * length, gram) so count ties break deterministically. */
  private def topGramCharFrac(text: Column, n: Int): Column =
    // run-length encode the SORTED grams with scalar zips, then pick the
    // modal gram as array_max over (count, len, gram) structs — struct
    // field order IS the fold's lexicographic tie-break. (A struct-state
    // `aggregate` fold computed the same thing but ran interpreted —
    // higher-order functions have no codegen — at ~0.5 ms/doc; the zip
    // form is ~4 cheap scalar passes over bound arrays.)
    Cols.bound(array_sort(Dedup.shinglesHof(text, n))) { grams =>
      val nG = size(grams)
      val prev = concat(array(lit(null).cast("string")),
        slice(grams, lit(1), greatest(nG - 1, lit(0))))
      val startIdx = filter(
        transform(zip_with(grams, prev, (g, p) => p.isNull || g =!= p),
          (s, i) => when(s, i).otherwise(lit(-1))),
        i => i >= 0)
      Cols.bound(startIdx) { starts =>
        val nextStarts = concat(
          slice(starts, lit(2), greatest(size(starts) - 1, lit(0))),
          array(nG))
        val runs = zip_with(starts, nextStarts, (a, b) =>
          struct((b - a).cast("long").as("c"),
            length(element_at(grams, a + 1)).as("l"),
            element_at(grams, a + 1).as("g")))
        Cols.bound(chars(grams)) { totalChars =>
          Cols.bound(array_max(runs)) { best =>
            when(totalChars > 0,
              Cols.ratio4dp(best.getField("c") * best.getField("l"),
                totalChars)).otherwise(0.0)
          }
        }
      }
    }

  /** Duplicate n-gram character fraction in gram space: chars of repeat
   * occurrences / total gram chars (see [[dupFracs]]). */
  private def dupGramCharFrac(text: Column, n: Int): Column =
    dupFracs(Dedup.shinglesHof(text, n))._2

  /**
   * The full Gopher repetition statistics (Rae et al. 2021 A1.1, table
   * A1 — the rules [[stats]] does not cover): duplicate line / paragraph
   * fractions by count and by character mass, top-2/3/4-gram character
   * fractions, and duplicate-5..10-gram character fractions. Lines are
   * whitespace-normalized non-empty lines; paragraphs split on blank
   * lines; n-gram fractions are measured in gram space (total characters
   * over all overlapping n-grams) so they are bounded without position
   * attribution.
   *
   * Scale contract: every column is a per-row array fold over one
   * `split` — ZERO exchanges for the whole 13-column suite, so it
   * composes with [[withKeep]] into a single scan at any corpus size.
   */
  def repetitionStats(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    // ONE codegen'd kernel pass ([[graft.functions.GopherRepetition]])
    // instead of 9 interpreted shingle+sort HOF cascades per row — the
    // higher-order functions underneath the expression form are all
    // CodegenFallback, so the 13 projections ran interpreted at ~0.5 ms/doc
    // (the per-row ceiling on web_curation). Values are bit-identical
    // (differential-pinned by GopherKernelSpec against [[repetitionStatsHof]]
    // on fuzz + corpus; GopherSpec's hand computations unchanged). The
    // multi-use `_rep` alias keeps CollapseProject from inlining the kernel
    // 13× — single evaluation per row, same column names and order.
    docs
      .select(col("*"),
        graft.functions.GopherRepetition.of(coalesce(col(textCol), lit("")))
          .as("_rep"))
      .select(Seq(col("*")) ++
        graft.functions.GopherRepetition.fieldNames.map(f =>
          col(s"_rep.$f").as(f)): _*)
      .drop("_rep")
  }

  /** The original Catalyst-expression form of [[repetitionStats]] — kept as
   * the differential-test twin pinning the kernel's bit-exactness
   * (GopherKernelSpec); not on any query path. */
  private[graft] def repetitionStatsHof(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val text = coalesce(col(textCol), lit(""))
    def norm(a: Column): Column =
      filter(transform(a, l => regexp_replace(lower(trim(l)), "\\s+", " ")),
        l => l =!= "")
    val lines = norm(split(text, "\n"))
    val paras = norm(split(text, "\n\n"))
    val (dlf, dlcf) = dupFracs(lines)
    val (dpf, dpcf) = dupFracs(paras)
    // ONE select, not a withColumn chain: 13 projections each referencing
    // `textCol` keep the child projection a hard boundary (CollapseProject
    // leaves multi-use non-trivial aliases alone), so a computed upstream
    // text column — e.g. the C4-cleaned cascade in web_curation — is
    // evaluated once per row, not once per metric
    docs.select(
      Seq(col("*"),
        dlf.as("dup_line_frac"), dlcf.as("dup_line_char_frac"),
        dpf.as("dup_para_frac"), dpcf.as("dup_para_char_frac")) ++
      Seq(2, 3, 4).map(n =>
        topGramCharFrac(text, n).as(s"top_${n}gram_char_frac")) ++
      (5 to 10).map(n =>
        dupGramCharFrac(text, n).as(s"dup_${n}gram_char_frac")): _*)
  }

  /**
   * The Gopher repetition keep decision with the paper's table-A1
   * thresholds: dup lines/paras ≤0.30 by count and ≤0.20 by chars, top
   * 2/3/4-gram char mass ≤0.20/0.18/0.16, dup 5..10-gram char mass
   * ≤0.15/0.14/0.13/0.12/0.11/0.10. Adds `gopher_rep_keep`; composes
   * with [[withKeep]]'s `gopher_keep` for the full Gopher gate.
   */
  def withRepetitionKeep(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val topMax = Map(2 -> 0.20, 3 -> 0.18, 4 -> 0.16)
    val dupMax = Map(5 -> 0.15, 6 -> 0.14, 7 -> 0.13, 8 -> 0.12,
      9 -> 0.11, 10 -> 0.10)
    repetitionStats(docs, idCol, textCol).withColumn("gopher_rep_keep",
      col("dup_line_frac") <= 0.30 && col("dup_para_frac") <= 0.30 &&
      col("dup_line_char_frac") <= 0.20 &&
      col("dup_para_char_frac") <= 0.20 &&
      topMax.map { case (n, t) => col(s"top_${n}gram_char_frac") <= t }
        .reduce(_ && _) &&
      dupMax.map { case (n, t) => col(s"dup_${n}gram_char_frac") <= t }
        .reduce(_ && _))
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
