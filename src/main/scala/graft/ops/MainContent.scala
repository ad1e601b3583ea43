package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * HTML main-content extraction — the DOM-heuristic leg of the north rule
 * ("HTML boilerplate strip … DOM heuristics"): given documents whose text is
 * raw HTML, strip markup, segment into DOM-ish blocks, score each block by
 * text length and link density, and keep only content blocks (the
 * boilerpipe/readability move: navigation, sidebars and footers are short
 * and link-dense, article text is long and link-sparse).
 *
 * Design constraints, in priority order:
 *
 *  1. **Shuffle-free main path.** [[mainContent]] is a pure per-row
 *     projection built from `split` + higher-order `transform`/`filter` +
 *     `array_join` — no explode, no groupBy, no exchange. At 100 TB this
 *     runs entirely map-side inside whole-stage codegen; the only
 *     non-projection entry point is [[blockFeatures]], which explodes to
 *     block grain for inspection/debugging and is not on the corpus path.
 *  2. **Oracle-expressible.** Every regex is RE2-compatible (no
 *     backreferences, no lookaround) so the DuckDB oracle can run the
 *     byte-identical pattern; entity decoding is a fixed replace chain with
 *     `&amp;` LAST (so `&amp;lt;` decodes to the literal `&lt;`, matching
 *     HTML semantics for already-escaped text).
 *
 * The reference's analog is its repetitive header/footer pattern heuristic
 * (`DatacatSegmenterParser.java:268-299` — layout-level boilerplate
 * detection); this operator is the web-corpus generalization, complementing
 * [[CorpusClean.boilerplateLines]] (cross-document line census) with
 * within-document structural scoring.
 */
object MainContent {

  /** Container elements whose CONTENT is never article text; dropped whole.
   * One pattern per tag: RE2 has no backreferences so `<(x)>.*?</\1>` is
   * unavailable — and a joint alternation `</(script|style)>` as the closer
   * would let a `<script>` swallow text up to a later `</style>`. */
  val dropWholeRes: Seq[String] = Seq(
    "(?is)<script\\b[^>]*>.*?</script>",
    "(?is)<style\\b[^>]*>.*?</style>",
    "(?is)<noscript\\b[^>]*>.*?</noscript>",
    "(?s)<!--.*?-->")

  /** Closing block-level tags + `<br>`: the block segmentation boundary. */
  val blockSplitRe: String =
    "(?i)</(?:p|div|li|h[1-6]|td|tr|ul|ol|table|section|article|header|footer|nav|blockquote|pre)>|<br\\s*/?>"

  /** Any remaining tag (after whole-element drops). */
  val tagRe: String = "(?s)<[^>]*>"

  /** Anchor inner HTML (capture group 1) — the link-density numerator. */
  val anchorRe: String = "(?is)<a\\b[^>]*>(.*?)</a>"

  /** Entity pairs in decode order; `&amp;` deliberately last. */
  val entityDecodes: Seq[(String, String)] = Seq(
    "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"", "&apos;" -> "'",
    "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")

  private def decodeEntities(c: Column): Column =
    entityDecodes.foldLeft(c) { case (acc, (from, to)) =>
      regexp_replace(acc, java.util.regex.Pattern.quote(from), to)
    }

  /** Remove whole script/style/noscript/comment elements. */
  def dropNonContent(html: Column): Column =
    dropWholeRes.foldLeft(html)((acc, re) => regexp_replace(acc, re, " "))

  /** HTML → plain text: drop non-content elements, strip every remaining
   * tag, decode entities, collapse whitespace, trim. Pure projection. */
  def stripTags(html: Column): Column =
    trim(regexp_replace(
      decodeEntities(regexp_replace(dropNonContent(html), tagRe, " ")),
      "\\s+", " "))

  /** Tag-strip WITHOUT the non-content drop — for text already inside a
   * block (script blocks were removed before segmentation). */
  private def stripInner(html: Column): Column =
    trim(regexp_replace(decodeEntities(regexp_replace(html, tagRe, " ")),
      "\\s+", " "))

  /** Characters of anchor text in a block: the link-density numerator. */
  private def linkChars(block: Column): Column =
    aggregate(regexp_extract_all(block, lit(anchorRe), lit(1)), lit(0),
      (acc, a) => acc + length(stripInner(a)))

  /** Per-block struct array for one document's HTML: (block_no, text,
   * n_chars, link_chars). Blocks are numbered BEFORE empties are dropped so
   * numbering is split-stable. */
  private def blockStructs(html: Column): Column = {
    val blocks = split(dropNonContent(html), blockSplitRe)
    filter(
      zip_with(blocks, sequence(lit(0), greatest(size(blocks) - 1, lit(0))),
        (b, i) => struct(
          i.as("block_no"),
          stripInner(b).as("text"),
          length(stripInner(b)).as("n_chars"),
          linkChars(b).as("link_chars"))),
      s => s.getField("n_chars") > 0)
  }

  /**
   * Block grain (for inspection / threshold tuning): one row per non-empty
   * block with `(block_no, text, n_chars, link_chars, link_density)`.
   * Explodes — use on samples, not the corpus path.
   */
  def blockFeatures(docs: DataFrame, idCol: String = "doc_id",
      htmlCol: String = "html"): DataFrame =
    docs
      .select(col(idCol), explode(blockStructs(col(htmlCol))).as("b"))
      .select(col(idCol), col("b.block_no"), col("b.text"), col("b.n_chars"),
        col("b.link_chars"),
        round(col("b.link_chars") / col("b.n_chars"), 4).as("link_density"))

  /**
   * Main-content extraction: keep blocks with at least `minChars` of text
   * and link density at most `maxLinkDensity`, rejoin in document order
   * with newlines. Adds `text_main` (possibly empty) and `n_blocks_kept`.
   * Shuffle-free: one projection over the input.
   */
  def mainContent(docs: DataFrame, minChars: Int = 25,
      maxLinkDensity: Double = 0.33, idCol: String = "doc_id",
      htmlCol: String = "html"): DataFrame = {
    val kept = filter(blockStructs(col(htmlCol)), s =>
      s.getField("n_chars") >= minChars &&
        s.getField("link_chars") <= s.getField("n_chars") * lit(maxLinkDensity))
    docs.withColumn("_kept", kept)
      .withColumn("text_main",
        array_join(transform(col("_kept"), s => s.getField("text")), "\n"))
      .withColumn("n_blocks_kept", size(col("_kept")))
      .drop("_kept")
  }
}
