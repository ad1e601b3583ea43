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

  /** Per-block struct array for one document's HTML — EMPTY BLOCKS KEPT
   * (they anchor split-stable numbering and participate in neighbor
   * smoothing): (block_no, text, n_chars, link_chars, n_tags). `n_tags`
   * counts raw markup tags inside the block (post whole-element drop) —
   * the text-density denominator. */
  private def allBlockStructs(html: Column): Column = {
    // null html behaves as an empty page (one empty block, zero kept) —
    // a null would otherwise propagate NULL through every output column
    val blocks = split(dropNonContent(coalesce(html, lit(""))), blockSplitRe)
    zip_with(blocks, sequence(lit(0), greatest(size(blocks) - 1, lit(0))),
      (b, i) => struct(
        i.as("block_no"),
        stripInner(b).as("text"),
        length(stripInner(b)).as("n_chars"),
        linkChars(b).as("link_chars"),
        size(regexp_extract_all(b, lit(tagRe), lit(0))).as("n_tags")))
  }

  /** [[allBlockStructs]] with empty blocks dropped (numbering preserved). */
  private def blockStructs(html: Column): Column =
    filter(allBlockStructs(html), s => s.getField("n_chars") > 0)

  /** Text-to-tag ratio of a block struct (the CETR-style density signal):
   * text characters per markup tag; tag-free blocks use denominator 1 so
   * plain text lines score their own length. */
  private def ttrOf(s: Column): Column =
    s.getField("n_chars").cast("double") / greatest(s.getField("n_tags"), lit(1))

  /** Neighbor-smoothed ratios for a full (empties included) block sequence:
   * mean over blocks i-1..i+1 clipped to the array. Term order is
   * prev+cur+next to match a windowed AVG frame exactly (adding a 0.0
   * placeholder first is an IEEE no-op, so parity with the oracle holds). */
  private def smoothedTtrs(all: Column): Column = {
    // zip shifted copies instead of element_at(ttrs, i) in an indexed
    // lambda: element_at inside a higher-order function re-evaluates the
    // computed ttrs — and through it the whole HTML block parse — per
    // ELEMENT, O(blocks²·html_len) per row. The shifted-slice zips keep
    // every evaluation per ROW. Edge cells pad 0.0 exactly as before
    // (IEEE no-op in the prev+cur+next sum); cnt comes from the zip_with
    // index, not the padded value, so a genuine 0.0 ratio still counts.
    val ttrs = transform(all, ttrOf(_))
    val n = size(ttrs)
    val prevA = concat(array(lit(0.0)),
      slice(ttrs, lit(1), greatest(n - 1, lit(0))))
    val nextA = concat(slice(ttrs, lit(2), greatest(n - 1, lit(0))),
      array(lit(0.0)))
    val pc = zip_with(ttrs, prevA, (c, p) => struct(c.as("c"), p.as("p")))
    val pcn = zip_with(pc, nextA, (s, x) =>
      struct(s.getField("c").as("c"), s.getField("p").as("p"),
        coalesce(x, lit(0.0)).as("x")))
    transform(pcn, (s, i) => {
      val cnt = lit(1) + when(i > 0, 1).otherwise(0) +
        when(i < n - 1, 1).otherwise(0)
      (s.getField("p") + s.getField("c") + s.getField("x")) / cnt
    })
  }

  /**
   * Block grain (for inspection / threshold tuning): one row per non-empty
   * block with `(block_no, text, n_chars, link_chars, n_tags,
   * link_density, text_tag_ratio, smoothed_ttr)`. The smoothed ratio is
   * computed over the FULL block sequence (empties included) before the
   * non-empty filter, so it matches what a windowed scorer would see.
   * Explodes — use on samples, not the corpus path.
   */
  def blockFeatures(docs: DataFrame, idCol: String = "doc_id",
      htmlCol: String = "html"): DataFrame = {
    // project the parsed block array ONCE: `all` feeds the zip, the
    // smoothing shifts, and the size bound — as a named column every use
    // is an O(1) reference; inlined, each would re-parse the HTML
    // (CollapseProject keeps multi-use non-trivial aliases apart)
    val withAll = docs.select(col(idCol),
      allBlockStructs(col(htmlCol)).as("_all"))
    val all = col("_all")
    val enriched = zip_with(all, smoothedTtrs(all), (s, sm) => struct(
      s.getField("block_no").as("block_no"), s.getField("text").as("text"),
      s.getField("n_chars").as("n_chars"),
      s.getField("link_chars").as("link_chars"),
      s.getField("n_tags").as("n_tags"), ttrOf(s).as("ttr"), sm.as("sttr")))
    withAll
      .select(col(idCol),
        explode(filter(enriched, s => s.getField("n_chars") > 0)).as("b"))
      .select(col(idCol), col("b.block_no"), col("b.text"), col("b.n_chars"),
        col("b.link_chars"), col("b.n_tags"),
        // integer ratios: exact-integer 4dp (engine-stable where
        // round(p/q, 4) is not — see Cols.ratio4dp)
        Cols.ratio4dp(col("b.link_chars"), col("b.n_chars"))
          .as("link_density"),
        Cols.ratio4dp(col("b.n_chars"), greatest(col("b.n_tags"), lit(1)))
          .as("text_tag_ratio"),
        // sttr is a 3-term double mean, not an integer ratio: quantize the
        // bit-identical double the same way on both engines —
        // floor(x·10⁴ + ½)/10⁴ is deterministic on the binary value,
        // unlike round(x, 4) whose half handling is engine-dependent
        (floor(col("b.sttr") * lit(10000.0) + lit(0.5)) / lit(10000.0))
          .as("smoothed_ttr"))
  }

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

  /**
   * QoS guard for pathological pages (the reference's F5 size-guard role,
   * `DatacatSegmenterParser.java` page/block caps, applied to web input):
   * every regex pass here is single-task work per row, so one unbounded
   * document would set the straggler floor of the whole stage at 10¹²-doc
   * scale. Returns (kept, dropped) so the dropped frame can feed lineage
   * counters instead of vanishing silently.
   */
  def sizeGuard(docs: DataFrame, maxChars: Int = 2 * 1024 * 1024,
      htmlCol: String = "html"): (DataFrame, DataFrame) = {
    val fits = length(col(htmlCol)) <= maxChars
    (docs.where(fits), docs.where(!fits))
  }

  /**
   * Text-density main-content extraction (the CETR-family heuristic, the
   * complement of link density): keep blocks whose text-to-tag ratio is at
   * least `minTtr` — markup-heavy furniture (nav bars, tag-dense sidebars,
   * footers) scores low, article/entry text scores its character count.
   * Unlike [[mainContent]] there is no minimum length: a short line inside
   * an article is tag-free and keeps its full score, so density rescues
   * the short content lines the length threshold drops. Adds
   * `text_density` and `n_blocks_kept`. Shuffle-free projection.
   */
  def densityContent(docs: DataFrame, minTtr: Double = 9.0,
      idCol: String = "doc_id", htmlCol: String = "html"): DataFrame = {
    val kept = filter(allBlockStructs(col(htmlCol)), s =>
      s.getField("n_chars") > 0 && ttrOf(s) >= lit(minTtr))
    docs.withColumn("_kept", kept)
      .withColumn("text_density",
        array_join(transform(col("_kept"), s => s.getField("text")), "\n"))
      .withColumn("n_blocks_kept", size(col("_kept")))
      .drop("_kept")
  }
}
