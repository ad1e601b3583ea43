package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Unicode text canonicalization — the deterministic pre-cleaning pass a
 * web corpus runs before any hashing/dedup/filter stage, so that
 * typographically-variant but semantically-identical text converges:
 *
 *  - smart quotes/apostrophes to ASCII (" and ');
 *  - dash family (en/em/horizontal bar/minus) to "-", soft hyphen dropped;
 *  - ellipsis char to "...", NBSP/thin/narrow/ideographic space to a
 *    plain space, zero-width family and BOM dropped;
 *  - C0 control characters (except newline and tab) dropped;
 *  - space/tab runs collapsed to one space, spaces around newlines and
 *    outer whitespace trimmed.
 *
 * Every rule is a plain character map (translate) or an RE2-safe
 * regexp_replace, so the DuckDB oracle replays the exact chain — no
 * locale- or ICU-dependent behavior (full NFKC is deliberately out of
 * scope: it is not replayable across engines; this is the stable subset
 * a cross-engine pipeline can pin).
 *
 * Scale contract: pure per-row projection, zero exchanges.
 */
object TextNorm {

  /** (from, to) character pairs for the 1:1 translate step (explicit
   * \u escapes — no invisible characters in source). */
  val charMap: Seq[(String, String)] = Seq(
    "\u2018" -> "'", "\u2019" -> "'", "\u201a" -> "'", "\u2032" -> "'",
    "\u201c" -> "\"", "\u201d" -> "\"", "\u201e" -> "\"", "\u2033" -> "\"",
    "\u2013" -> "-", "\u2014" -> "-", "\u2015" -> "-", "\u2212" -> "-",
    "\u00a0" -> " ", "\u2009" -> " ", "\u202f" -> " ", "\u3000" -> " ")

  /** Characters dropped outright (1:0 in the translate step): soft
   * hyphen, zero-width space/non-joiner/joiner, BOM. */
  val dropChars: String = "\u00ad\u200b\u200c\u200d\ufeff"

  /** The canonicalization chain as a Column expression. */
  def canonicalize(text: Column): Column = {
    val t0 = coalesce(text, lit(""))
    // multi-char expansion first (ellipsis), then the 1:1/1:0 translate
    val t1 = regexp_replace(t0, "\u2026", "...")
    val t2 = translate(t1,
      charMap.map(_._1).mkString + dropChars,
      charMap.map(_._2).mkString)
    // C0 controls except \n (x0A) and \t (x09), plus DEL; then collapse
    // space/tab runs and strip spaces hugging newlines; outer trim
    val t3 = regexp_replace(t2, "[\\x00-\\x08\\x0B-\\x1F\\x7F]", "")
    val t4 = regexp_replace(t3, "[ \t]+", " ")
    trim(regexp_replace(t4, " ?\n ?", "\n"))
  }

  /** Adds `text_norm` plus `n_chars_removed` (input length minus
   * normalized length — a cheap corpus-dirtiness signal). */
  def withCanonical(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    docs.select(col("*"),
      Cols.bound(canonicalize(col(textCol))) { t =>
        struct(t.as("text_norm"),
          (length(coalesce(col(textCol), lit(""))) - length(t))
            .as("n_chars_removed"))
      }.as("_n"))
      .select(col("*"), col("_n.text_norm"), col("_n.n_chars_removed"))
      .drop("_n")
}
