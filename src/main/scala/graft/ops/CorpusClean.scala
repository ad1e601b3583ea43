package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Corpus-cleaning operators for training-data preparation, complementing
 * [[Dedup]] (near-duplicates) and [[TextStats]] (per-doc quality):
 *
 *  - cross-document boilerplate line removal (the CCNet/RefinedWeb move:
 *    a line occurring in a large fraction of documents is chrome —
 *    cookie banners, nav bars — not content);
 *  - within-document repetition metrics (the Gopher repetition rules:
 *    duplicate-line fraction and top-n-gram mass);
 *  - PII redaction (emails / IPv4 / phone-shaped numbers → typed tags,
 *    with per-doc counts for lineage).
 *
 * Scale contracts: boilerplate detection is one line-grain hash aggregate
 * with map-side combine; the boilerplate SET is small by construction
 * (lines in ≥ minFrac of docs cannot number more than lines/minFrac·docs)
 * so the strip join broadcasts it. Repetition metrics shuffle n-gram rows
 * only at (doc, gram) grain with partial aggregation. Redaction is a pure
 * per-row projection — no shuffle, codegen'd regexes. All semantics are
 * SQL-expressible for the DuckDB oracle.
 */
object CorpusClean {

  /** Line normalization for boilerplate matching: lowercase, trim,
   * collapse internal whitespace. */
  def normLine(line: Column): Column =
    regexp_replace(lower(trim(line)), "\\s+", " ")

  private def docLines(docs: DataFrame, idCol: String, textCol: String) =
    docs.select(col(idCol), posexplode(split(col(textCol), "\n"))
      .as(Seq("line_no", "line")))

  /**
   * Boilerplate line census: normalized non-empty lines that occur in at
   * least `minDocs` documents AND at least `minFrac` of the corpus.
   * Output: (line_norm, n_docs, doc_frac). The thresholds bound the result
   * size (≤ 1/minFrac · corpus lines / docs), keeping it broadcastable.
   */
  def boilerplateLines(docs: DataFrame, minDocs: Int = 2, minFrac: Double = 0.05,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val total = docs.agg(count(lit(1)).as("_n_docs_total"))
    docLines(docs, idCol, textCol)
      .select(col(idCol), normLine(col("line")).as("line_norm"))
      .where(col("line_norm") =!= "")
      .distinct() // per-doc presence, not occurrence count
      .groupBy("line_norm").agg(count(lit(1)).as("n_docs"))
      .crossJoin(broadcast(total))
      // exact-integer 4dp: engine-stable where round(p/q, 4) is not
      .withColumn("doc_frac", Cols.ratio4dp(col("n_docs"), col("_n_docs_total")))
      .where(col("n_docs") >= minDocs && col("doc_frac") >= minFrac)
      .drop("_n_docs_total")
  }

  /**
   * Strip boilerplate lines from every document: lines whose normalized
   * form is in the census are dropped, the rest are rejoined in original
   * order. Docs reduced to nothing survive as empty strings (dropping is
   * [[TextStats.quality]]'s decision, not the stripper's). The census
   * frame is broadcast — the corpus reassembles with ONE doc-grain
   * aggregation and no other shuffle.
   */
  def stripBoilerplate(docs: DataFrame, boilerplate: DataFrame,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val bl = broadcast(boilerplate.select(col("line_norm")))
    val kept = docLines(docs, idCol, textCol)
      .join(bl, normLine(col("line")) === col("line_norm"), "left_anti")
    val rebuilt = kept.groupBy(idCol)
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("line_no"), col("line")))),
        x => x.getField("line")), "\n").as("text_clean"))
    docs.drop(textCol).join(rebuilt, Seq(idCol), "left")
      .withColumn("text_clean", coalesce(col("text_clean"), lit("")))
  }

  /**
   * Gopher-style within-document repetition metrics:
   * duplicate-line fraction (1 − distinct/total over normalized non-empty
   * lines) and the mass of the most frequent word 2-gram and 3-gram.
   * Thresholding (e.g. dup_line_frac > 0.3 → drop) is left to the caller.
   */
  def repetitionMetrics(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val lines = docs.select(col(idCol),
      filter(transform(split(col(textCol), "\n"), l => normLine(l)),
        l => l =!= "").as("ls"))
    val lineFrac = lines.select(col(idCol),
      // 1 − distinct/total = (total − distinct)/total as exact rationals
      when(size(col("ls")) > 0,
        Cols.ratio4dp(size(col("ls")) - size(array_distinct(col("ls"))),
          size(col("ls"))))
        .otherwise(0.0).as("dup_line_frac"))

    def topGramFrac(n: Int): DataFrame = {
      // array_remove("") keeps MULTIPLICITY (unlike Dedup.contentShingles,
      // which is distinct) while dropping the zero-word degenerate: an
      // empty doc has no n-grams, so its fraction is 0.0 via the left-join
      // fill below — not 1/1 over the "" shingle
      val grams = docs.select(col(idCol),
        explode(array_remove(Dedup.shingles(col(textCol), n), "")).as("g"))
      grams.groupBy(col(idCol), col("g")).agg(count(lit(1)).as("c"))
        .groupBy(col(idCol))
        .agg(Cols.ratio4dp(max(col("c")), sum(col("c")))
          .as(s"top_${n}gram_frac"))
    }
    lineFrac
      .join(topGramFrac(2), Seq(idCol), "left")
      .join(topGramFrac(3), Seq(idCol), "left")
      .na.fill(0.0, Seq("top_2gram_frac", "top_3gram_frac"))
  }

  // Patterns kept inside the regex subset Java and RE2/DuckDB share.
  val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val ipv4Re = "\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b"
  val phoneRe = "\\b\\d{3}[- ]\\d{3}[- ]\\d{4}\\b"

  /**
   * PII redaction: emails, IPv4 addresses, and phone-shaped numbers are
   * replaced by typed tags, with per-doc match counts kept for lineage.
   * Order matters (email before ip before phone: an address inside an
   * email's domain must not be double-redacted). Pure projection —
   * codegen'd, shuffle-free, pushdown-transparent.
   */
  def redactPii(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t0 = col(textCol)
    def count(re: String) = size(regexp_extract_all(t0, lit(re), lit(0)))
    docs
      .withColumn("n_emails", count(emailRe))
      .withColumn("n_ips", count(ipv4Re))
      .withColumn("n_phones", count(phoneRe))
      .withColumn("text_redacted",
        regexp_replace(regexp_replace(regexp_replace(t0,
          emailRe, "<EMAIL>"), ipv4Re, "<IP>"), phoneRe, "<PHONE>"))
  }
}
