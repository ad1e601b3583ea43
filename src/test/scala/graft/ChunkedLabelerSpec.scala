package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.extract.{Features, Labeler, Structure, Synthetic}

/**
 * The chunk-parallel body labeler (parallel-FSM prefix composition,
 * [[Labeler.bodyLabelsChunked]]) must be row-identical to the sequential
 * FSM ([[Labeler.bodyLabels]]) on every input — including the adversarial
 * shapes: state propagating through anchor-free chunks, heading runs and
 * lookahead crossing chunk boundaries, and turn gaps that leave whole
 * chunks empty.
 */
class ChunkedLabelerSpec extends SparkSpec {

  private def featsOf(turns: DataFrame): DataFrame =
    Features.body(Structure.tokensFromLines(
      Structure.keptLines(turns)
        .select("conv_id", "turn_idx", "role", "tool", "block_idx",
          "line_in_turn", "line_idx", "line")))
      .select("conv_id", "turn_idx", "line_in_turn", "tok_idx",
        "tok", "sep_before", "line_trailing", "f_capitalisation")

  private def turnsDf(rows: Seq[(String, Int, String)]): DataFrame = {
    val sparkS = spark
    import sparkS.implicits._
    rows.map { case (conv, idx, text) =>
      (conv, idx, "user", text, null: String,
        java.sql.Timestamp.valueOf("2026-01-01 00:00:00"))
    }.toDF("conv_id", "turn_idx", "role", "text", "tool", "ts")
  }

  private def assertIdentical(turns: DataFrame, chunkTurns: Int): Unit = {
    val f = featsOf(turns)
    val ord = Seq(col("conv_id"), col("turn_idx"), col("line_in_turn"), col("tok_idx"))
    val seqRows = Labeler.bodyLabels(f).orderBy(ord: _*).collect().toSeq
    val chkRows = Labeler.bodyLabelsChunked(f, chunkTurns).orderBy(ord: _*).collect().toSeq
    assert(seqRows.nonEmpty, "differential input produced no labeled rows")
    assert(chkRows == seqRows,
      s"chunked (${chkRows.size} rows) != sequential (${seqRows.size} rows) at chunkTurns=$chunkTurns")
  }

  test("synthetic corpus: chunked == sequential at tiny chunk size") {
    assertIdentical(Synthetic.transcripts(spark, 200), chunkTurns = 4)
  }

  test("gold fixture text split one-line-per-turn: chunked == sequential") {
    assume(Fixtures.available)
    val fx = Fixtures.bodyFixtureNames.map(Fixtures.loadBody).maxBy(_.spans.size)
    val turns = turnsDf(
      fx.sourceText.split("\n").toIndexedSeq.zipWithIndex.map { case (l, i) => (fx.name, i, l) })
    assertIdentical(turns, chunkTurns = 3)
  }

  test("anchor-free prose stretch: state composes across many chunks") {
    // one entry anchor, then 60 continuation prose lines: every chunk after
    // the first is anchor-free, so its transition function never collapses
    // and the composed entry state is what keeps the <entry> label flowing
    val turns = turnsDf(
      ("c1", 0, "12 - Premier lot de la vente .") +:
        (1 to 60).map(i => ("c1", i,
          s"suite de la description du lot avec beaucoup de mots numero $i .")))
    assertIdentical(turns, chunkTurns = 5)
  }

  test("heading run and lookahead crossing a chunk boundary") {
    // title at the end of one chunk, short-name heading run + lot entry at
    // the start of the next: the peek row must carry the one-line lookahead
    val rows = Seq(
      ("c2", 0, "3 - Vase grec en terre cuite ."),
      ("c2", 1, "AR ."), // grade line closes the entry
      ("c2", 2, "MONNAIES GRECQUES"), // caps heading, chunk boundary after
      ("c2", 3, "Syracuse ."), // heading run continues across the boundary
      ("c2", 4, "14 - Tetradrachme d'argent ."),
      ("c2", 5, "suite de la description du lot ."),
      ("c2", 6, "Croton ."), // pre-entry heading: needs lookahead at boundary
      ("c2", 7, "15 - Statere incus ."))
    // boundary after every 1, 2 and 3 turns so each adjacency is exercised
    Seq(1, 2, 3).foreach(c => assertIdentical(turnsDf(rows), chunkTurns = c))
  }

  test("turn gap leaving whole chunk ranges empty") {
    // turns 0-5 then 40-45 with chunkTurns=8: chunk ids 0 and 5 exist,
    // 1-4 are empty; the peek for the line before the gap must route to
    // the previous EXISTING chunk, matching the sequential cross-gap walk
    val rows =
      (0 to 4).map(i => ("c3", i, s"${i + 1} - Lot avant la lacune numero $i .")) ++
        Seq(("c3", 5, "Syracuse .")) ++ // pre-entry heading right before the gap
        (40 to 45).map(i => ("c3", i, s"${i} - Lot apres la lacune numero $i ."))
    assertIdentical(turnsDf(rows), chunkTurns = 8)
  }

  test("multi-conversation frame with interleaved chunk ids") {
    val rows =
      (0 to 20).map(i => ("a", i, s"${i + 1} - Lot de la vente a numero $i .")) ++
        (0 to 20).map(i => ("b", i,
          if (i % 7 == 0) "GRAVURES ANCIENNES" else s"${i + 1} - Lot b numero $i .")) ++
        Seq(("c", 0, "une seule ligne sans ancre ."))
    Seq(2, 6).foreach(c => assertIdentical(turnsDf(rows), chunkTurns = c))
  }

  test("property: random corpora agree at random chunk sizes") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val word = Gen.oneOf("vase", "bronze", "gravure", "Monnaie", "ancien",
      "grand", "doré", "pièce", "médaille", "rare")
    val line: Gen[String] = Gen.frequency(
      (5, for { n <- Gen.choose(1, 999); ws <- Gen.listOfN(3, word) }
        yield s"$n - ${ws.mkString(" ")} ."),
      (2, Gen.listOfN(4, word).map(_.mkString(" ") + " .")), // prose
      (1, Gen.oneOf("MONNAIES GRECQUES", "OBJETS D'ART", "BIJOUX ANCIENS")),
      (1, Gen.oneOf("Syracuse .", "Croton .", "Pyrrhus , roi .")),
      (1, Gen.oneOf("AR .", "OR * F . D . C .", "-", "T . B .")),
      (1, for { a <- Gen.choose(1, 500); b <- Gen.choose(501, 999) }
        yield s"$a à $b"),
      (1, Gen.choose(1, 400).map(_.toString)))
    def sample[A](g: Gen[A], seed: Long): A =
      g.apply(Gen.Parameters.default, Seed(seed)).get
    (1 to 5).foreach { i =>
      val nConvs = 1 + sample(Gen.choose(0, 4), 1000L + i)
      val rows = (0 until nConvs).flatMap { c =>
        val nTurns = sample(Gen.choose(5, 40), 2000L + i * 31 + c)
        (0 until nTurns).map(t => (s"conv$c", t, sample(line, i * 100003L + c * 977L + t)))
      }
      val chunk = 1 + sample(Gen.choose(0, 8), 3000L + i)
      assertIdentical(turnsDf(rows), chunk)
    }
  }

  test("empty input yields empty output without crashing") {
    val f = featsOf(turnsDf(Seq(("x", 0, "1 - Lot .")))).where(col("conv_id") === "none")
    assert(Labeler.bodyLabelsChunked(f, 4).isEmpty)
  }

  test("chunked path spreads one conversation over many FSM groups") {
    val turns = turnsDf(
      (0 to 99).map(i => ("solo", i, s"${i + 1} - Lot numero $i .")))
    val f = featsOf(turns)
    // chunk count is what bounds the skew: 100 turns / 10 = 10 parallel units
    val nChunks = f.select((col("turn_idx") / lit(10)).cast("int")).distinct().count()
    assert(nChunks == 10)
    assertIdentical(turns, chunkTurns = 10)
  }
}
