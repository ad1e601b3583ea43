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
}
