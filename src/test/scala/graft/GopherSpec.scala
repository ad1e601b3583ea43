package graft

import org.apache.spark.sql.functions._
import graft.ops.Gopher

/** Gopher quality rules: hand-computed stats on planted documents and the
 * keep decision at each threshold boundary. */
class GopherSpec extends SparkSpec {
  import spark.implicits._

  private def statsOf(text: String) =
    Gopher.stats(Seq((0L, text)).toDF("doc_id", "text")).collect()(0)

  test("word, length, and symbol statistics match hand computation") {
    val r = statsOf("The cat sat on the mat... ok # done")
    assert(r.getAs[Int]("n_words") === 9)
    // non-ws chars = 27, words 9 → 3.0
    assert(r.getAs[Double]("mean_word_len") === 3.0)
    // one '#' + one '...' over 9 words
    assert(r.getAs[Double]("symbol_word_ratio") === math.rint(2.0 / 9 * 1e4) / 1e4)
    assert(r.getAs[Int]("n_stop_hits") === 1) // only "the"
  }

  test("bullet and ellipsis line fractions count non-empty lines") {
    val text = "- first bullet\nplain line\n* second bullet\n\ntrailing…"
    val r = statsOf(text)
    assert(r.getAs[Double]("bullet_line_frac") === 0.5) // 2 of 4 non-empty
    assert(r.getAs[Double]("ellipsis_line_frac") === 0.25)
  }

  test("alpha word fraction and empty-text zeroing") {
    val r = statsOf("abc 123 x9 $$$")
    assert(r.getAs[Double]("alpha_word_frac") === 0.5) // abc, x9
    val z = statsOf("")
    assert(z.getAs[Int]("n_words") === 0)
    assert(z.getAs[Double]("mean_word_len") === 0.0)
    assert(z.getAs[Double]("bullet_line_frac") === 0.0)
  }

  test("keep decision flips at each rule boundary") {
    val good = ("the be to of and that have with good words " * 8).trim
    val docs = Seq(
      (0L, good),                                // passes all
      (1L, "the be to of short"),                // < minWords
      (2L, good + " ##########" * 20),           // symbol ratio blown
      (3L, ("aa " * 80).trim)                    // no stopword hits
    ).toDF("doc_id", "text")
    val kept = Gopher.withKeep(docs, minWords = 50)
      .select("doc_id", "gopher_keep").as[(Long, Boolean)].collect().toMap
    assert(kept(0L) === true)
    assert(kept(1L) === false)
    assert(kept(2L) === false)
    assert(kept(3L) === false)
  }

  // ——— repetition rules (table A1) ———

  private def repOf(text: String) =
    Gopher.repetitionStats(Seq((0L, text)).toDF("doc_id", "text")).collect()(0)

  test("duplicate line fractions by count and by character mass") {
    // lines (normalized): [aa bb, aa bb, cc] → dup count 1/3;
    // chars: total 5+5+2 = 12, distinct 7 → dup chars 5/12
    val r = repOf("aa bb\nAa  Bb\ncc")
    assert(r.getAs[Double]("dup_line_frac") === math.rint(1.0 / 3 * 1e4) / 1e4)
    assert(r.getAs[Double]("dup_line_char_frac") ===
      math.rint(5.0 / 12 * 1e4) / 1e4)
    assert(r.getAs[Double]("dup_para_frac") === 0.0) // one para, no dup
  }

  test("duplicate paragraph fractions split on blank lines") {
    // paras normalize newlines to spaces: [x y, x y, z] → 1/3 by count
    val r = repOf("x\ny\n\nx y\n\nz")
    assert(r.getAs[Double]("dup_para_frac") === math.rint(1.0 / 3 * 1e4) / 1e4)
    assert(r.getAs[Double]("dup_para_char_frac") ===
      math.rint(3.0 / 7 * 1e4) / 1e4) // chars 3+3+1, dup 3
  }

  test("top n-gram char fraction finds the modal gram in gram space") {
    // words: a b a b a → 2-grams: [a b, b a, a b, b a] — tie at 2/2;
    // tie-break by (count, len, gram): "b a" wins; mass 2*3 of total 12
    val r = repOf("a b a b a")
    assert(r.getAs[Double]("top_2gram_char_frac") === 0.5)
    // 3-grams: [a b a, b a b, a b a] → top "a b a" 2×5 of 15
    assert(r.getAs[Double]("top_3gram_char_frac") ===
      math.rint(10.0 / 15 * 1e4) / 1e4)
  }

  test("duplicate n-gram char fraction counts repeat occurrences' chars") {
    // 5 words "q w e r t" ×2 → 6 5-grams, the dup mass is the repeated ones
    val text = "q w e r t q w e r t"
    val r = repOf(text)
    // 5-grams: qwert(×2 at pos 0,5), werty.. — positions 0..5:
    // [q w e r t, w e r t q, e r t q w, r t q w e, t q w e r, q w e r t]
    // distinct 5, total 6, each len 9 → dup chars 9 of 54
    assert(r.getAs[Double]("dup_5gram_char_frac") ===
      math.rint(9.0 / 54 * 1e4) / 1e4)
    // 10 words → single 10-gram, no dup
    assert(r.getAs[Double]("dup_10gram_char_frac") === 0.0)
  }

  test("repetition metrics zero out on empty and tiny documents") {
    val z = repOf("")
    for (c <- Seq("dup_line_frac", "dup_line_char_frac", "dup_para_frac",
      "dup_para_char_frac", "top_2gram_char_frac", "dup_5gram_char_frac",
      "dup_10gram_char_frac"))
      assert(z.getAs[Double](c) === 0.0, c)
    // fewer words than n: one whole-doc gram, top frac 1, dup frac 0
    val tiny = repOf("only three words")
    assert(tiny.getAs[Double]("dup_5gram_char_frac") === 0.0)
    assert(tiny.getAs[Double]("top_4gram_char_frac") === 1.0)
  }

  test("repetition keep flips at the paper's thresholds") {
    // all-distinct words: no duplicate grams, lines, or paragraphs
    val clean = (1 to 60).map(i => s"word$i").mkString(" ")
    val docs = Seq(
      (0L, clean),                                    // passes all
      (1L, "dup line\ndup line\ndup line\nx\ny"),     // dup_line 2/5 > 0.3
      (2L, clean + ("\n\npara block" * 2) * 3),       // dup paras
      (3L, ("one two three four five " * 10).trim)    // dup 5-grams
    ).toDF("doc_id", "text")
    val kept = Gopher.withRepetitionKeep(docs)
      .select("doc_id", "gopher_rep_keep").as[(Long, Boolean)].collect().toMap
    assert(kept(0L) === true)
    assert(kept(1L) === false)
    assert(kept(2L) === false)
    assert(kept(3L) === false)
  }

  test("the 13-column repetition suite plans with zero exchanges") {
    val docs = Seq((0L, "a b c\nd e f")).toDF("doc_id", "text")
    val plan = Gopher.withRepetitionKeep(docs)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"repetition suite must not shuffle:\n$plan")
  }
}
