package graft.extract

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * End-to-end extraction pipeline (SURVEY.md §3 "Spark lifecycle equivalent"):
 *
 *   transcripts → structure (lines/tokens) → features → zone labels →
 *   body labels on the <body> zone → segment ids → span assembly → TEI.
 *
 * Scale shape (the plan to protect at 100 TB): two conceptual exchanges —
 * one hash(conv_id) shuffle for the per-conversation windows/FSM, one for
 * the span-assembly groupBy; everything between pipelines inside a stage.
 * AQE handles residual skew; giant single conversations are bounded
 * upstream by the turn-grain windows (keyed (conv_id, turn_idx)) doing most
 * of the work.
 */
object Pipeline {

  /** Zone-label the lines of a transcript table. */
  def zonedLines(turns: DataFrame): DataFrame =
    Labeler.zones(Features.segmenter(Structure.keptLines(turns)))

  /** Full extraction: body spans of the <body> zone per conversation. */
  def extract(turns: DataFrame): DataFrame = {
    val zones = zonedLines(turns)
      .select(col("conv_id"), col("turn_idx"), col("line_in_turn"),
        col("zone").as("line_zone"))
    // F4: zone selection is a plain filter because labels are columns
    val toks = Structure.tokens(turns)
      .join(zones, Seq("conv_id", "turn_idx", "line_in_turn"))
      .where(col("line_zone") === "<body>")
    val feats = Features.body(toks)
    val labeled = Labeler.bodyLabels(feats)
    Assemble.bodySpans(labeled)
  }

  /** Extraction result as one TEI document per conversation. */
  def extractTei(turns: DataFrame): DataFrame =
    Assemble.teiDocuments(extract(turns))
}
