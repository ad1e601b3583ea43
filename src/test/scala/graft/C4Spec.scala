package graft

import graft.ops.C4

/** C4 cleaning rules: line filter, page filter, and the three-sentence
 * exact span dedup, each on hand-built planted documents. */
class C4Spec extends SparkSpec {
  import spark.implicits._

  test("line filter keeps terminal-punct 5-word lines, drops the rest") {
    val text = Seq(
      "This line ends with a period and stays.",     // kept
      "short line.",                                 // <5 words
      "This line has five words but no terminal",    // no terminal punct
      "This page uses JavaScript to render content.", // javascript
      "  Does a trimmed question line survive here?", // kept (trimmed)
      "",                                            // empty — not counted
      "He said \"keep the quote line in five words\"" // kept (ends ")
    ).mkString("\n")
    val r = C4.lineFiltered(Seq((0L, text)).toDF("doc_id", "text")).collect()(0)
    assert(r.getAs[Int]("n_lines_kept") === 3)
    assert(r.getAs[Int]("n_lines_dropped") === 3)
    assert(r.getAs[String]("text_clean") ===
      "This line ends with a period and stays.\n" +
      "Does a trimmed question line survive here?\n" +
      "He said \"keep the quote line in five words\"")
  }

  test("sentence extraction counts terminated runs only") {
    val df = Seq((0L, "One here. Two there! Three maybe? trailing fragment"))
      .toDF("doc_id", "text")
    val r = C4.stats(df).collect()(0)
    assert(r.getAs[Int]("n_sentences") === 3)
  }

  test("page keep flips on each C4 rule") {
    val three = "First sentence is long enough. Second one follows. Third closes."
    val docs = Seq(
      (0L, three),                                        // passes
      (1L, "Only two sentences here. And the second."),   // <3 sentences
      (2L, three + " Lorem Ipsum dolor sit amet."),       // lorem ipsum
      (3L, three + " A code block { appears here."),      // brace
      (4L, three + " Buy viagra now they said.")          // blocklist word
    ).toDF("doc_id", "text")
    val kept = C4.withKeep(docs).select("doc_id", "c4_keep")
      .as[(Long, Boolean)].collect().toMap
    assert(kept(0L) === true)
    assert(kept(1L) === false)
    assert(kept(2L) === false)
    assert(kept(3L) === false)
    assert(kept(4L) === false)
  }

  test("three-sentence span dedup keeps one canonical occurrence") {
    val block = "Alpha block one. Beta block two. Gamma block three."
    val docs = Seq(
      (0L, s"Unique opener here. $block"),
      (1L, s"$block Unique closer there."),
      (2L, "Nothing repeated in this document. Second sentence. Third one.")
    ).toDF("doc_id", "text")
    val out = C4.spanDedup(docs)
      .select("doc_id", "was_stripped", "text_stripped")
      .as[(Long, Boolean, String)].collect().map(r => r._1 -> ((r._2, r._3)))
      .toMap
    // canonical = (doc 0, start 1) < (doc 1, start 0): doc 0 keeps the block
    assert(out(0L)._1 === false)
    assert(out(0L)._2 === s"Unique opener here. $block")
    assert(out(1L)._1 === true)
    assert(out(1L)._2 === "Unique closer there.")
    assert(out(2L)._1 === false)
  }

  test("paragraph dedup strips repeat paragraphs within and across docs") {
    val docs = Seq(
      (0L, "Unique opening paragraph here.\n\nShared boilerplate block."),
      (1L, "Shared boilerplate block.\n\nOwn closing paragraph there."),
      (2L, "Repeated inside.\n\nRepeated inside.\n\nDistinct tail.")
    ).toDF("doc_id", "text")
    val out = C4.paragraphDedup(docs)
      .select("doc_id", "was_stripped", "text_stripped")
      .as[(Long, Boolean, String)].collect().map(r => r._1 -> ((r._2, r._3)))
      .toMap
    // canonical copy of the shared block lives in doc 0
    assert(out(0L) === ((false,
      "Unique opening paragraph here.\n\nShared boilerplate block.")))
    assert(out(1L) === ((true, "Own closing paragraph there.")))
    // within-doc repeat keeps the first occurrence
    assert(out(2L) === ((true, "Repeated inside.\n\nDistinct tail.")))
  }

  test("line and page filters plan with zero exchanges") {
    val docs = Seq((0L, "A line that ends well here.")).toDF("doc_id", "text")
    val plan = C4.withKeep(C4.lineFiltered(docs), textCol = "text_clean")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"C4 filters must not shuffle:\n$plan")
  }
}
