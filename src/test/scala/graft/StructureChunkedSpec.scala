package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.extract.{Structure, Synthetic}

/**
 * The chunk-parallel tokenizer ([[Structure.tokensFromLinesChunked]]) must
 * be row-identical to the conversation-grain lag path
 * ([[Structure.tokensFromLines]]) on every input — including the boundary
 * shapes: trailing whitespace crossing a chunk boundary, turn gaps that
 * leave whole chunk ids absent (the stitch must reach back to the last
 * EXISTING chunk), multi-line turns straddling chunks, and first-line /
 * empty-input degenerate cases.
 */
class StructureChunkedSpec extends SparkSpec {

  private def turnsDf(rows: Seq[(String, Int, String)]): DataFrame = {
    val sparkS = spark
    import sparkS.implicits._
    rows.map { case (conv, idx, text) =>
      (conv, idx, "user", text, null: String,
        java.sql.Timestamp.valueOf("2026-01-01 00:00:00"))
    }.toDF("conv_id", "turn_idx", "role", "text", "tool", "ts")
  }

  private def assertIdentical(turns: DataFrame, chunkTurns: Int): Unit = {
    val kept = Structure.keptLines(turns)
    val ord = Seq(col("conv_id"), col("turn_idx"), col("line_in_turn"), col("tok_idx"))
    val seqRows = Structure.tokensFromLines(kept).orderBy(ord: _*).collect().toSeq
    val chkRows = Structure.tokensFromLinesChunked(kept, chunkTurns)
      .orderBy(ord: _*).collect().toSeq
    assert(seqRows.nonEmpty, "differential input produced no token rows")
    assert(chkRows == seqRows,
      s"chunked (${chkRows.size} rows) != sequential (${seqRows.size} rows) at chunkTurns=$chunkTurns")
  }

  test("synthetic corpus: chunked == sequential at tiny chunk size") {
    Seq(1, 3, 7).foreach(c =>
      assertIdentical(Synthetic.transcripts(spark, 40), chunkTurns = c))
  }

  test("trailing whitespace and blank-line gaps crossing chunk boundaries") {
    val rows = Seq(
      ("c", 0, "alpha beta  \nmid\t\n\n  gamma"), // trailing spaces + tab + blank line
      ("c", 1, "  leading"),
      ("c", 2, "x\f\ny "),                        // form-feed trailing, then space
      ("c", 3, "tail"))
    Seq(1, 2, 4).foreach(c => assertIdentical(turnsDf(rows), c))
  }

  test("turn gaps leaving whole chunks empty: stitch reaches the last existing chunk") {
    val rows = Seq(
      ("c", 0, "first \t"),
      ("c", 97, "after a 97-turn gap"),   // chunks 1..n absent at small chunkTurns
      ("c", 98, "adjacent"),
      ("c", 300, "far tail"))
    Seq(2, 5, 16).foreach(c => assertIdentical(turnsDf(rows), c))
  }

  test("multi-conversation corpus with interleaved gaps") {
    val rows =
      (0 until 30).map(t => ("a", t * 3, s"conv a turn $t words  ")) ++
        (0 until 20).map(t => ("b", t, s"b$t\nsecond line of b$t\t"))
    Seq(1, 4, 9).foreach(c => assertIdentical(turnsDf(rows), c))
  }

  test("whitespace-only and filtered lines around a boundary") {
    val rows = Seq(
      ("c", 0, "kept line  "),
      ("c", 1, "   \t  "),        // whitespace-only: dropped by lines()
      ("c", 2, "next kept"))
    Seq(1, 2).foreach(c => assertIdentical(turnsDf(rows), c))
  }

  test("chunk larger than the conversation degenerates to the sequential result") {
    assertIdentical(Synthetic.transcripts(spark, 10), chunkTurns = 1000000)
  }

  test("empty input yields empty output without crashing") {
    val kept = Structure.keptLines(turnsDf(Seq(("x", 0, "word"))))
      .where(col("conv_id") === "none")
    assert(Structure.tokensFromLinesChunked(kept, 4).isEmpty)
  }
}
