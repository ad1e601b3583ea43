package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.extract.{Features, Structure, Synthetic}

/**
 * The chunk-parallel featurizer ([[Features.bodyChunked]]) must be
 * row-identical (values AND column order) to the conversation-grain window
 * path ([[Features.body]]) on every input — including the boundary shapes:
 * block/line statuses at chunk edges (phantom-row adjacency), indentation
 * state carried across chunks with and without local transitions, prefix
 * sums spanning chunks (relDocPos), and turn gaps leaving whole chunk ids
 * absent.
 */
class ChunkedFeaturesSpec extends SparkSpec {

  private def turnsDf(rows: Seq[(String, Int, String)]): DataFrame = {
    val sparkS = spark
    import sparkS.implicits._
    rows.map { case (conv, idx, text) =>
      (conv, idx, "user", text, null: String,
        java.sql.Timestamp.valueOf("2026-01-01 00:00:00"))
    }.toDF("conv_id", "turn_idx", "role", "text", "tool", "ts")
  }

  private def tokensOf(turns: DataFrame): DataFrame =
    Structure.tokensFromLines(
      Structure.keptLines(turns)
        .select("conv_id", "turn_idx", "role", "tool", "block_idx",
          "line_in_turn", "line_idx", "line"))

  private def assertIdentical(turns: DataFrame, chunkTurns: Int): Unit = {
    val toks = tokensOf(turns)
    val ord = Seq(col("conv_id"), col("turn_idx"), col("line_in_turn"), col("tok_idx"))
    val seqDf = Features.body(toks)
    val chkDf = Features.bodyChunked(toks, chunkTurns)
    assert(chkDf.columns.toSeq == seqDf.columns.toSeq,
      s"column order differs: ${chkDf.columns.toSeq} vs ${seqDf.columns.toSeq}")
    val seqRows = seqDf.orderBy(ord: _*).collect().toSeq
    val chkRows = chkDf.orderBy(ord: _*).collect().toSeq
    assert(seqRows.nonEmpty, "differential input produced no feature rows")
    assert(chkRows == seqRows,
      s"chunked (${chkRows.size} rows) != sequential (${seqRows.size} rows) at chunkTurns=$chunkTurns")
  }

  test("synthetic corpus: chunked == sequential at tiny chunk sizes") {
    Seq(1, 3, 7).foreach(c =>
      assertIdentical(Synthetic.transcripts(spark, 40), chunkTurns = c))
  }

  test("indentation state carried across chunks without local transitions") {
    // turn 0 establishes an indent; turns 1..5 are single-line with the same
    // leading space (no transition fires), so the LINEINDENT state must ride
    // the chunk-level carry through several all-quiet chunks
    val rows = Seq(
      ("c", 0, "base line\n    indented here"),
      ("c", 1, "    still indented"),
      ("c", 2, "    still indented"),
      ("c", 3, "    still indented"),
      ("c", 4, "back left"),       // ALIGNEDLEFT fires far from the origin
      ("c", 5, "left again"))
    Seq(1, 2, 3).foreach(c => assertIdentical(turnsDf(rows), c))
  }

  test("chunk whose only transition is its first line-start (carry reconstruction)") {
    val rows = Seq(
      ("c", 0, "aa"),              // lsp 0
      ("c", 1, "    deep"),        // chunk 1 at chunkTurns=1: single line-start, LINEINDENT
      ("c", 2, "next"))            // chunk 2: ALIGNEDLEFT, prev lsp from chunk 1
    assertIdentical(turnsDf(rows), 1)
  }

  test("block and line statuses at chunk edges, multi-line turns") {
    val rows = Seq(
      ("c", 0, "one two three\nfour five"),
      ("c", 1, "six\n\nseven eight"),   // blank line: block break inside turn
      ("c", 2, "nine"),
      ("c", 3, "ten eleven twelve"))
    Seq(1, 2).foreach(c => assertIdentical(turnsDf(rows), c))
  }

  test("turn gaps leaving whole chunks absent") {
    val rows = Seq(
      ("c", 0, "  start  "),
      ("c", 150, "far middle\n  indented"),
      ("c", 151, "  adjacent"),
      ("c", 400, "tail"))
    Seq(2, 16).foreach(c => assertIdentical(turnsDf(rows), c))
  }

  test("multi-conversation corpus") {
    val rows =
      (0 until 25).map(t => ("a", t * 2, s"conv a turn $t words here")) ++
        (0 until 15).map(t => ("b", t, s"b$t\n  second line of b$t"))
    Seq(1, 4, 9).foreach(c => assertIdentical(turnsDf(rows), c))
  }

  test("chunk larger than the conversation degenerates to the sequential result") {
    assertIdentical(Synthetic.transcripts(spark, 10), chunkTurns = 1000000)
  }

  test("empty input yields empty output without crashing") {
    val toks = tokensOf(turnsDf(Seq(("x", 0, "word"))))
      .where(col("conv_id") === "none")
    assert(Features.bodyChunked(toks, 4).isEmpty)
  }
}
