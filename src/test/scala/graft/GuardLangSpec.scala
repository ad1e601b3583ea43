package graft

import org.apache.spark.sql.functions._
import graft.extract.{Assemble, Structure}

/** F5 size guards + A5 per-conversation TEI language ID. */
class GuardLangSpec extends SparkSpec {

  private def turnsDf(rows: Seq[(String, Int, String, String)]) = {
    import spark.implicits._
    rows.toDF("conv_id", "turn_idx", "role", "text")
      .withColumn("tool", lit(null).cast("string"))
      .withColumn("ts", lit("2026-01-01 00:00:00").cast("timestamp"))
  }

  test("F5: size guard drops oversized conversations whole, keeps the rest") {
    val turns = turnsDf(
      (0 until 12).map(i => ("big", i, "user", s"line $i")) ++
        Seq(("small", 0, "user", "a\n\nb"), ("small", 1, "assistant", "c")))
    val lines = Structure.keptLines(turns)

    val kept = Structure.sizeGuard(lines, maxLines = 10, maxBlocks = 1000)
    assert(kept.select("conv_id").distinct().collect().map(_.getString(0)).toSet == Set("small"))
    // guard at the block grain: "big" has 12 single-line blocks, "small" 3 (a | b | c)
    val kept2 = Structure.sizeGuard(lines, maxLines = 100, maxBlocks = 11)
    assert(kept2.select("conv_id").distinct().collect().map(_.getString(0)).toSet == Set("small"))
    val kept3 = Structure.sizeGuard(lines, maxLines = 100, maxBlocks = 2)
    assert(kept3.count() == 0)
    // generous defaults pass everything through unchanged
    assert(Structure.sizeGuard(lines).count() == lines.count())
    // marked variant exposes the reject flag for lineage counters
    val marked = Structure.sizeGuardMarked(lines, 10, 1000)
      .select("conv_id", "size_rejected").distinct().collect()
      .map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(marked == Map("big" -> true, "small" -> false))
  }

  test("A5: TEI xml:lang from per-conversation language ID, default fr") {
    import spark.implicits._
    val spans = Seq(
      ("en_conv", 1L, "<entry>", "the cat and the dog sat in the house of it"),
      ("en_conv", 2L, "<entry>", "it is the best of the lot for the price"),
      ("fr_conv", 1L, "<entry>", "le chat et la maison de la ville est une merveille que"),
      ("und_conv", 1L, "<entry>", "zzz qqq www rrr ttt yyy")
    ).toDF("conv_id", "segment_id", "label", "text")
    val tei = Assemble.teiDocuments(spans).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(tei("en_conv").contains("<text xml:lang=\"en\">"))
    assert(tei("fr_conv").contains("<text xml:lang=\"fr\">"))
    assert(tei("und_conv").contains("<text xml:lang=\"fr\">"), "und falls back to fr")
    // span order is preserved inside the document
    val en = tei("en_conv")
    assert(en.indexOf("the cat") < en.indexOf("it is the best"))
  }

  test("blank-training TEI: wrapper + escaped raw text, no labels, fixed lang") {
    // reference createBlankTrainingFromPDF byte contract
    // (DatacatBodySegmentationParser.java:736-744): hardcoded xml:lang,
    // single newline before </text>, HTMLEncoded untagged text
    val turns = turnsDf(Seq(
      ("c1", 0, "user", "a <b> & \"q\" 'x'"),
      ("c1", 1, "assistant", "second turn")))
    val tei = Assemble.blankTrainingTei(turns).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(tei("c1") ==
      "<?xml version=\"1.0\" ?>\n<tei xml:space=\"preserve\">\n\t<teiHeader>" +
      "\n\t\t<fileDesc xml:id=\"c1\"/>\n\t</teiHeader>\n\t<text xml:lang=\"fr\">\n" +
      "a &lt;b&gt; &amp; &quot;q&quot; &apos;x&apos;\nsecond turn" +
      "\n\t</text>\n</tei>\n")
    assert(!tei("c1").contains("<note"), "no labels in a blank skeleton")
  }
}
