package graft

import org.apache.spark.sql.functions._
import graft.ops.MainContent

/**
 * Exact-output tests for HTML main-content extraction: block segmentation,
 * whole-element drops, entity decoding, link-density scoring, and the
 * keep/drop thresholds. The driver oracles (mc_block_features /
 * mc_main_content) run the same logic against DuckDB on the synthetic
 * corpus; these pin hand-computable cases.
 */
class MainContentSpec extends SparkSpec {

  private val page =
    "<html><head><title>Doc 7</title><style>body { margin: 0; }</style>" +
      "<script type=\"text/javascript\">var trk = 'id-7';</script></head><body>" +
      "<nav><a href=\"/\">Home</a> <a href=\"/lots\">Lots</a> " +
      "<a href=\"/about\">About</a></nav>" +
      "<!-- layout: 1 --><div class=\"content\">" +
      "First line of the catalogue entry, quite long indeed<br/>short line<br/>" +
      "Entry text with &amp; ampersand and &lt;tag&gt; plus &nbsp;spaces here</div>" +
      "<div class=\"side\">Related: <a href=\"/lot/0\">lot 0</a> &amp; " +
      "<a href=\"/cat\">catalogue index</a></div>" +
      "<footer><a href=\"/terms\">Terms</a> <a href=\"/privacy\">Privacy</a> " +
      "&copy; Lot Catalogue</footer></body></html>"

  private def docs(rows: (Long, String)*) = {
    val sparkS = spark
    import sparkS.implicits._
    rows.toSeq.toDF("doc_id", "html")
  }

  test("blockFeatures segments, strips, decodes, and scores links exactly") {
    val got = MainContent.blockFeatures(docs(7L -> page))
      .orderBy("block_no")
      .collect()
      .map(r => (r.getInt(1), r.getString(2), r.getInt(3), r.getInt(4),
        r.getInt(5)))
      .toSeq
    assert(got === Seq(
      (0, "Doc 7 Home Lots About", 21, 13, 13),
      (1, "First line of the catalogue entry, quite long indeed", 52, 0, 1),
      (2, "short line", 10, 0, 0),
      (3, "Entry text with & ampersand and <tag> plus spaces here", 54, 0, 0),
      (4, "Related: lot 0 & catalogue index", 32, 20, 5),
      (5, "Terms Privacy &copy; Lot Catalogue", 34, 12, 5)))
  }

  test("text-tag ratios and neighbor smoothing over the full block sequence") {
    val rows = MainContent.blockFeatures(docs(7L -> page))
      .orderBy("block_no")
      .select("block_no", "text_tag_ratio", "smoothed_ttr")
      .collect().map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2)))
    // block 0: 21 chars / 13 tags; its smoothed value averages in the
    // adjacent 52-char tag-light content line.
    assert(rows(0) === ((0, 1.6154, 26.8077)))
    assert(rows(1)._2 === 52.0)
    // footer (block 5) smooths with the sidebar and the empty trailing
    // block: (6.4 + 6.8 + 0.0) / 3
    assert(rows(5) === ((5, 6.8, 4.4)))
  }

  test("densityContent keeps tag-light blocks including short content lines") {
    val row = MainContent.densityContent(docs(7L -> page))
      .select("text_density", "n_blocks_kept").head()
    assert(row.getString(0) ===
      "First line of the catalogue entry, quite long indeed\n" +
        "short line\n" +
        "Entry text with & ampersand and <tag> plus spaces here")
    assert(row.getInt(1) === 3)
  }

  test("mainContent keeps long link-sparse blocks only, in document order") {
    val row = MainContent.mainContent(docs(7L -> page))
      .select("text_main", "n_blocks_kept").head()
    assert(row.getString(0) ===
      "First line of the catalogue entry, quite long indeed\n" +
        "Entry text with & ampersand and <tag> plus spaces here")
    assert(row.getInt(1) === 2)
  }

  test("all-boilerplate page yields empty main text, not a dropped row") {
    val navOnly = "<nav><a href=\"/a\">A</a></nav><footer>tiny</footer>"
    val out = MainContent.mainContent(docs(1L -> navOnly))
      .select("doc_id", "text_main", "n_blocks_kept").collect()
    assert(out.length === 1)
    assert(out.head.getString(1) === "")
    assert(out.head.getInt(2) === 0)
  }

  test("block numbering is split-stable: empties counted, then dropped") {
    val html = "<p></p><p>First real paragraph with enough characters here</p>" +
      "<p> \t </p><p>Second real paragraph with enough characters too</p>"
    val got = MainContent.blockFeatures(docs(2L -> html))
      .orderBy("block_no").select("block_no").as[Int](spark.implicits.newIntEncoder)
      .collect().toSeq
    assert(got === Seq(1, 3))
  }

  test("stripTags flattens a whole page to plain text") {
    val txt = MainContent.stripTags(lit(page))
    val out = docs(0L -> "x").select(txt.as("t")).head().getString(0)
    assert(out.startsWith("Doc 7 Home Lots About"))
    assert(out.contains("Entry text with & ampersand and <tag> plus spaces here"))
    assert(!out.contains("var trk"))
    assert(!out.contains("margin"))
    assert(!out.contains("layout:"))
  }

  test("null html behaves as an empty page, not a NULL-propagating row") {
    val sparkS = spark
    import sparkS.implicits._
    val docs = Seq((1L, null: String), (2L, "<p>ok text here plenty chars</p>"))
      .toDF("doc_id", "html")
    val got = MainContent.mainContent(docs)
      .select("doc_id", "text_main", "n_blocks_kept").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getInt(2))).toMap
    assert(got(1L) === (("", 0)))
    assert(got(2L) === (("ok text here plenty chars", 1)))
  }

  test("sizeGuard splits oversized pages into a counted drop frame") {
    val (kept, dropped) = graft.ops.MainContent.sizeGuard(
      docs(1L -> "<p>small</p>", 2L -> ("<p>" + "x" * 100 + "</p>")),
      maxChars = 50)
    assert(kept.select("doc_id").collect().map(_.getLong(0)).toSeq === Seq(1L))
    assert(dropped.select("doc_id").collect().map(_.getLong(0)).toSeq === Seq(2L))
  }

  test("a script element never swallows text up to a later style close") {
    val html = "<script>x</script><p>Kept paragraph with plenty of characters" +
      "</p><style>y</style>"
    val out = MainContent.mainContent(docs(3L -> html)).head()
    assert(out.getAs[String]("text_main") ===
      "Kept paragraph with plenty of characters")
  }
}
