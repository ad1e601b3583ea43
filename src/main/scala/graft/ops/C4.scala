package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * C4-style corpus cleaning (Raffel et al. 2020, "Exploring the Limits of
 * Transfer Learning with a Unified Text-to-Text Transformer", §2.2): the
 * line- and page-level heuristics that turned Common Crawl into C4, plus
 * the three-sentence exact span dedup. Complements [[Gopher]] (statistical
 * quality rules) with C4's structural rules:
 *
 *  - line filter: keep only lines that end in terminal punctuation
 *    (`.` `!` `?` `"`), contain ≥5 words, and do not mention "javascript";
 *  - page filter: drop pages with fewer than 3 sentences (after line
 *    filtering), any blocklisted word, the phrase "lorem ipsum", or a
 *    curly brace (code);
 *  - span dedup: of any three-sentence span occurring more than once in
 *    the corpus, keep one canonical occurrence and strip the rest
 *    ([[Passage.stripUnits]] at sentence grain).
 *
 * Scale contract: [[lineFiltered]] / [[stats]] / [[withKeep]] are pure
 * per-row projections — codegen'd array folds over one `split`, ZERO
 * exchanges. [[spanDedup]] shares [[Passage]]'s shape: one
 * map-side-combinable shuffle of 32-byte gram hashes, canonical picks via
 * `min(struct)` in the same aggregate (never a per-gram window), and only
 * affected documents rebuild at sentence grain. All regexes stay in the
 * Java∩RE2 subset so the DuckDB oracle mirrors them verbatim.
 */
object C4 {

  /** Default blocklist (stand-in for C4's public "dirty/naughty" list —
   * a small adult/spam-marker subset; callers pass the full list). */
  val defaultBlocklist: Seq[String] =
    Seq("fuck", "shit", "porn", "xxx", "viagra", "casino")

  /** Sentences: maximal runs ending in terminal punctuation, trimmed and
   * non-empty. No lookbehind (RE2-safe): a sentence is `[^.!?]+[.!?]+`,
   * so a trailing unterminated fragment is not a sentence — the same
   * convention C4's "fewer than 3 sentences" rule needs. */
  def sentences(text: Column): Column =
    filter(transform(
      regexp_extract_all(coalesce(text, lit("")),
        lit("[^.!?]+[.!?]+"), lit(0)), s => trim(s)), s => s =!= "")

  private def wordCount(line: Column): Column =
    size(filter(split(line, "\\s+"), w => w =!= ""))

  /** The C4 line-keep predicate over a trimmed line. */
  private def lineKeep(l: Column): Column =
    l.rlike("[.!?\"]$") && wordCount(l) >= 5 &&
      !lower(l).contains("javascript")

  /**
   * The line filter: adds `text_clean` (kept lines, trimmed, newline
   * rejoined), `n_lines_kept`, and `n_lines_dropped` (non-empty lines
   * failing the predicate). Pure projection — zero exchanges.
   */
  def lineFiltered(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    // ONE codegen'd kernel pass ([[graft.functions.C4LineFilter]]) — the
    // HOF form below ran interpreted per line, with a re-split per word
    // count. Bit-identical, differential-pinned by CurationKernelSpec
    // against [[lineFilteredHof]]; same column names/order.
    val lf = graft.functions.C4LineFilter.of(coalesce(col(textCol), lit("")))
    docs
      .select(col("*"), lf.as("_lf"))
      .select(col("*"),
        col("_lf.text_clean").as("text_clean"),
        col("_lf.n_lines_kept").as("n_lines_kept"),
        col("_lf.n_lines_dropped").as("n_lines_dropped"))
      .drop("_lf")
  }

  /** The original Catalyst HOF form of [[lineFiltered]] — the
   * differential-test twin (CurationKernelSpec); not on any query path. */
  private[graft] def lineFilteredHof(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val lines = filter(transform(
      split(coalesce(col(textCol), lit("")), "\n"), l => trim(l)),
      l => l =!= "")
    // project the filtered arrays once: the three output columns would
    // otherwise each re-split and re-run the keep regexes per row
    docs
      .withColumn("_lines", lines)
      .withColumn("_kept", filter(col("_lines"), lineKeep(_)))
      .withColumn("text_clean", concat_ws("\n", col("_kept")))
      .withColumn("n_lines_kept", size(col("_kept")))
      .withColumn("n_lines_dropped", size(col("_lines")) - size(col("_kept")))
      .drop("_lines", "_kept")
  }

  /**
   * Page-level C4 statistics over `textCol` (conventionally the
   * `text_clean` a [[lineFiltered]] pass produced): `n_sentences`,
   * `has_lorem_ipsum`, `has_brace`, and `n_bad_words` (how many DISTINCT
   * blocklist entries occur as words).
   */
  def stats(docs: DataFrame, blocklist: Seq[String] = defaultBlocklist,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    // ONE codegen'd kernel pass ([[graft.functions.C4PageStats]]) — see
    // [[lineFiltered]]. Bit-identical, differential-pinned by
    // CurationKernelSpec against [[statsHof]]; same column names/order.
    val ps = graft.functions.C4PageStats.of(
      coalesce(col(textCol), lit("")), blocklist)
    docs
      .select(col("*"), ps.as("_ps"))
      .select(col("*"),
        col("_ps.n_sentences").as("n_sentences"),
        col("_ps.has_lorem_ipsum").as("has_lorem_ipsum"),
        col("_ps.has_brace").as("has_brace"),
        col("_ps.n_bad_words").as("n_bad_words"))
      .drop("_ps")
  }

  /** The original Catalyst form of [[stats]] — the differential-test twin
   * (CurationKernelSpec); not on any query path. */
  private[graft] def statsHof(docs: DataFrame, blocklist: Seq[String] = defaultBlocklist,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val text = coalesce(col(textCol), lit(""))
    // one select, not a withColumn chain — see Gopher.repetitionStats
    docs.select(col("*"),
      size(sentences(text)).as("n_sentences"),
      lower(text).contains("lorem ipsum").as("has_lorem_ipsum"),
      text.contains("{").as("has_brace"),
      size(filter(array(blocklist.map(lit): _*),
        b => array_contains(TextStats.words(text), b))).as("n_bad_words"))
  }

  /**
   * The C4 page keep decision: ≥3 sentences, no "lorem ipsum", no curly
   * brace, no blocklisted word. Adds `c4_keep`; composes with
   * [[Gopher.withKeep]] / [[Gopher.withRepetitionKeep]] in one scan.
   */
  def withKeep(docs: DataFrame, blocklist: Seq[String] = defaultBlocklist,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    stats(docs, blocklist, idCol, textCol).withColumn("c4_keep",
      col("n_sentences") >= 3 && !col("has_lorem_ipsum") &&
        !col("has_brace") && col("n_bad_words") === 0)

  /**
   * C4's exact three-sentence span dedup: any 3-sentence window occurring
   * more than once anywhere in the corpus keeps one canonical occurrence
   * (first by (doc, start)); every other occurrence's sentences are
   * stripped. Adds `text_stripped` (surviving sentences, space-rejoined)
   * and `was_stripped`; unaffected documents pass through verbatim and
   * never shuffle at sentence grain.
   */
  def spanDedup(docs: DataFrame, n: Int = 3, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    Passage.stripUnits(docs, sentences(col(textCol)), n, idCol, textCol)

  /** Non-empty trimmed paragraphs (split on blank lines). */
  def paragraphs(text: Column): Column =
    filter(transform(split(coalesce(text, lit("")), "\n\n"), p => trim(p)),
      p => p =!= "")

  /**
   * Exact corpus-wide paragraph dedup (the RefinedWeb/Falcon rule): any
   * paragraph occurring more than once anywhere keeps one canonical copy;
   * other occurrences are stripped ([[Passage.stripUnits]] at paragraph
   * grain, n=1, matching case-insensitively on the trimmed paragraph).
   * Survivors rejoin with blank lines.
   */
  def paragraphDedup(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    Passage.stripUnits(docs, paragraphs(col(textCol)), 1, idCol, textCol,
      sep = "\n\n")
}
