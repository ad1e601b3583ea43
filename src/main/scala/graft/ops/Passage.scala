package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Exact repeated-passage deduplication (the Lee et al. 2022 "Deduplicating
 * Training Data Makes Language Models Better" role, re-expressed for
 * Spark): any word n-gram that occurs more than once ANYWHERE in the
 * corpus — across documents or within one — is a repeated passage; every
 * occurrence except a canonical first keeps gets its words stripped.
 * Document-level dedup ([[Dedup]]) misses exactly this: boilerplate
 * passages embedded in otherwise-unique pages.
 *
 * The reference implementation builds a corpus-wide suffix array; the
 * Spark-native equivalent is an n-gram-grain hash aggregate — the same
 * duplicated-span answer for spans ≥ n words, with one map-side-combinable
 * shuffle instead of a monolithic index:
 *
 *  - [[occurrences]]: one row per (doc, window start); the gram key is
 *    md5 of the lowercased window, so the shuffle ships 32-byte keys, not
 *    text.
 *  - [[repeated]]: global count > 1 → the duplicated spans, each flagged
 *    canonical (first by (doc_id, start)) or not.
 *  - [[strip]]: only AFFECTED documents are rebuilt (a semi-join picks
 *    them; untouched documents pass through with their original text and
 *    never shuffle at word grain). Affected docs drop every word covered
 *    by a non-canonical duplicated window and rejoin with single spaces.
 *
 * Semantics note: stripping operates on the whitespace word sequence
 * (case-preserving rebuild, case-insensitive matching), so a stripped
 * document's whitespace is normalized — the same canonicalization the
 * reference applies by operating on token streams.
 */
object Passage {

  private[ops] def wordsOf(textCol: String): Column =
    filter(split(coalesce(col(textCol), lit("")), "\\s+"), w => w =!= "")

  /** One row per n-word window: (id, start_idx, gram-hash). Documents with
   * fewer than n words emit nothing. */
  def occurrences(docs: DataFrame, n: Int = 15, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    occurrencesUnits(docs, wordsOf(textCol), n, idCol)

  /** Unit-grain [[occurrences]]: `units` is any array&lt;string&gt;
   * expression over the doc row — words for classic passage dedup,
   * sentences for the C4 three-sentence-span rule ([[C4.spanDedup]]). */
  def occurrencesUnits(docs: DataFrame, units: Column, n: Int,
      idCol: String = "doc_id"): DataFrame = {
    require(n > 0, "n must be positive")
    // codegen'd kernel ([[graft.functions.GramMd5]]): the HOF form
    // (`transform(sequence(...), i => md5(lower(concat_ws(" ",
    // slice(ws, i+1, n)))))`) is CodegenFallback — interpreted per
    // window. Bit-identical (differential-pinned by ShingleKernelSpec).
    docs.select(col(idCol), units.as("ws"))
      .where(size(col("ws")) >= n)
      .select(col(idCol),
        posexplode(graft.functions.GramMd5.of(col("ws"), n))
          .as(Seq("start_idx", "gram")))
  }

  /** Duplicated windows only, with their global occurrence count and a
   * canonical flag (first occurrence by (doc_id, start_idx) survives
   * stripping). The canonical pick is a `min(struct)` folded into the SAME
   * partial-aggregable count pass — not a `row_number() over (partition by
   * gram)` window, which would serialize a 10^6-occurrence boilerplate
   * gram onto one task at corpus scale. The join back is skew-splittable
   * by AQE; a window partition never is. */
  def repeated(docs: DataFrame, n: Int = 15, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    repeatedUnits(docs, wordsOf(textCol), n, idCol)

  /** Unit-grain [[repeated]] (see [[occurrencesUnits]]). */
  def repeatedUnits(docs: DataFrame, units: Column, n: Int,
      idCol: String = "doc_id"): DataFrame = {
    // barrier: the window explode feeds both the count aggregate and the
    // join side below — sharing one lineage halves the corpus scans
    val occ = graft.extract.Chunked.barrier(
      occurrencesUnits(docs, units, n, idCol))
    val dup = occ.groupBy("gram").agg(count(lit(1)).as("n_occ"),
        min(struct(col(idCol), col("start_idx"))).as("_first"))
      .where(col("n_occ") > 1)
    occ.join(dup, Seq("gram"))
      .withColumn("is_canonical",
        col(idCol) === col("_first")(idCol) &&
          col("start_idx") === col("_first")("start_idx"))
      .select(col(idCol), col("start_idx"), col("gram"), col("n_occ"),
        col("is_canonical"))
  }

  /**
   * The stripped corpus: every document keeps its original columns plus
   * `text_stripped` (words covered by non-canonical duplicated windows
   * removed, single-space rejoined) and `was_stripped`. Unaffected
   * documents carry their text through verbatim.
   */
  def strip(docs: DataFrame, n: Int = 15, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    stripUnits(docs, wordsOf(textCol), n, idCol, textCol)

  /** Unit-grain [[strip]]: rebuilds affected documents from their
   * non-covered units, rejoined with `sep` (see [[occurrencesUnits]]). */
  def stripUnits(docs: DataFrame, units: Column, n: Int,
      idCol: String = "doc_id", textCol: String = "text",
      sep: String = " "): DataFrame = {
    // plan-barrier the covered frame: three consumers below (affected ids,
    // the anti-join, the final flag join) would otherwise each re-plan —
    // and re-COMPUTE — the whole gram-count cascade; the barrier makes
    // them share one RDD lineage so the shuffle stages run once
    val covered = graft.extract.Chunked.barrier(
      repeatedUnits(docs, units, n, idCol)
        .where(!col("is_canonical"))
        .select(col(idCol),
          explode(sequence(col("start_idx"), col("start_idx") + (n - 1)))
            .as("w_idx"))
        .distinct())
    stripCovered(docs, covered, units, idCol, textCol, sep)
  }

  /**
   * Rebuild `docs` dropping the unit indices listed in `covered`
   * (`idCol`, `w_idx`) — the shared tail of [[stripUnits]] and
   * [[Decontam.stripOverlaps]]. Only documents present in `covered` are
   * rebuilt (semi-join); everything else passes through verbatim.
   */
  def stripCovered(docs: DataFrame, covered: DataFrame, units: Column,
      idCol: String = "doc_id", textCol: String = "text",
      sep: String = " "): DataFrame = {
    val affected = covered.select(idCol).distinct()
      .withColumn("was_stripped", lit(true))
    val rebuilt = docs.join(affected.drop("was_stripped"), Seq(idCol), "left_semi")
      .select(col(idCol), posexplode(units).as(Seq("w_idx", "w")))
      .join(covered, Seq(idCol, "w_idx"), "left_anti")
      .groupBy(idCol)
      .agg(concat_ws(sep,
        transform(array_sort(collect_list(struct(col("w_idx"), col("w")))),
          s => s.getField("w"))).as("_rebuilt"))
    docs
      .join(affected, Seq(idCol), "left")
      .join(rebuilt, Seq(idCol), "left")
      .withColumn("was_stripped", coalesce(col("was_stripped"), lit(false)))
      .withColumn("text_stripped",
        when(col("was_stripped"), coalesce(col("_rebuilt"), lit("")))
          .otherwise(coalesce(col(textCol), lit(""))))
      .drop("_rebuilt")
  }
}
