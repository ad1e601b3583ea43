package graft.extract

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Deterministic sequence labelers replacing the reference's Wapiti CRF calls
 * (W10, `DatacatSegmenterParser.java:148`, `DatacatBodySegmentationParser
 * .java:110,645`). We cannot ship the native CRF; these are feature-driven
 * decision rules with BIO encoding, applied per conversation in document
 * order — the structure (featurize → label sequence → spans) is identical,
 * only the label-assignment function differs (documented heuristics instead
 * of learned weights).
 *
 * Two implementation styles on purpose:
 *  - the zone labeler is pure Catalyst (when-chains + lag for BIO): the rules
 *    are per-line, so the optimizer should own them;
 *  - the body labeler is a streaming FSM inside `mapPartitions` after
 *    `repartition(conv_id) + sortWithinPartitions`: entry/title detection is
 *    genuinely sequential (state carried across tokens/lines). The FSM is
 *    O(1) state per conversation and never materializes a conversation in
 *    memory (buffering only one line at a time), so a 10^9-turn conversation
 *    streams through — this is the "batched passes inside mapPartitions"
 *    north-star pattern, and the reason we do NOT use groupByKey here.
 */
object Labeler {

  /** Zone rules (segmenter analog) over transcript lines:
   * system turns → front matter, tool turns and repetitive boilerplate →
   * other, everything else → body; a trailing system turn → back. */
  def zones(segFeatures: DataFrame): DataFrame = {
    val wConv = Window.partitionBy("conv_id")
      .orderBy(col("turn_idx"), col("line_in_turn"))
    val wTurnMax = Window.partitionBy("conv_id")
    val zone =
      when(col("f_repetitive"), "<other>")
        .when(col("role") === "tool" || col("tool").isNotNull, "<other>")
        .when(col("role") === "system" && col("turn_idx") === 0, "<front>")
        .when(col("role") === "system" &&
          col("turn_idx") === max(col("turn_idx")).over(wTurnMax), "<back>")
        .when(col("role") === "system", "<other>")
        .otherwise("<body>")
    segFeatures
      .withColumn("zone", zone)
      .withColumn("zone_label",
        when(coalesce(lag(col("zone"), 1).over(wConv) =!= col("zone"), lit(true)),
          concat(lit("I-"), col("zone"))).otherwise(col("zone")))
  }

  // one buffered line of the body FSM
  private case class LineBuf(rows: Vector[Row], tokIdxOf: Int, labelAt: Int)

  /**
   * Body labeler: token-level entry/title/titledesc/other FSM.
   * Heuristics (deterministic, on catalogue-style content):
   *  - a line whose alphabetic tokens are all-caps and short → `<title>`;
   *  - a line starting with a numeric-ish lot marker (digits or the OCR
   *    confusables i/I/j/!/,) followed by a dash/dot → starts an `<entry>`;
   *  - lines right after a title that start no entry → `<titledesc>`;
   *  - anything before the first title/entry → `<other>`;
   *  - continuation lines extend the open span (the sequential part).
   *
   * Input must contain columns (conv_id, turn_idx, line_in_turn, tok_idx,
   * tok, f_capitalisation). Output adds `label` (BIO-encoded).
   */
  def bodyLabels(tokens: DataFrame, repartitionByConv: Boolean = true): DataFrame = {
    val spark = tokens.sparkSession
    val inSchema = tokens.schema
    val outSchema = StructType(inSchema.fields :+ StructField("label", StringType, false))
    val iConv = inSchema.fieldIndex("conv_id")
    val iTurn = inSchema.fieldIndex("turn_idx")
    val iLine = inSchema.fieldIndex("line_in_turn")
    val iTok = inSchema.fieldIndex("tok")
    val iCap = inSchema.fieldIndex("f_capitalisation")

    val entryStart = "^(\\p{Nd}+|[iIjJ!,]\\p{Nd}*|[iIjJ]{1,3})$".r
    val dashes = Set("-", "_", "–", "−", ".")

    // when the caller's plan is already hash-partitioned by conv_id (the
    // single-exchange pipeline), skip the redundant shuffle
    val sorted = (if (repartitionByConv) tokens.repartition(col("conv_id")) else tokens)
      .sortWithinPartitions("conv_id", "turn_idx", "line_in_turn", "tok_idx")

    val labeled = sorted.mapPartitions { it =>
      new Iterator[Row] {
        private var out: Iterator[Row] = Iterator.empty
        private var curConv: String = null
        private var openLabel: String = null // current span base label
        private var lastWasTitle = false
        private val buf = scala.collection.mutable.ArrayBuffer.empty[Row]

        private def classifyLine(rows: Seq[Row]): String = {
          val toks = rows.map(_.getString(iTok))
          val caps = rows.map(_.getString(iCap))
          val alpha = toks.zip(caps).filter(_._1.exists(_.isLetter))
          val allCaps = alpha.nonEmpty && alpha.forall(_._2 == "ALLCAP")
          val isEntry = toks.headOption.exists(t => entryStart.findFirstIn(t).isDefined) &&
            (toks.lift(1).exists(dashes) || toks.headOption.exists(_.forall(_.isDigit)))
          if (isEntry) "<entry>"
          else if (allCaps && toks.size <= 8) "<title>"
          else if (openLabel == null) "<other>"
          else if (lastWasTitle) "<titledesc>"
          else openLabel // continuation
        }

        private def emitLine(rows: Seq[Row]): Iterator[Row] = {
          val conv = rows.head.getString(iConv)
          if (conv != curConv) { openLabel = null; lastWasTitle = false; curConv = conv }
          val base = classifyLine(rows)
          val isStart = base != openLabel
          openLabel = base
          lastWasTitle = base == "<title>"
          rows.iterator.zipWithIndex.map { case (r, i) =>
            val lab = if (i == 0 && isStart) "I-" + base else base
            Row.fromSeq(r.toSeq :+ lab)
          }
        }

        private def lineKey(r: Row) = (r.getString(iConv), r.getInt(iTurn), r.getInt(iLine))

        private def advance(): Unit = {
          while (!out.hasNext && it.hasNext) {
            val r = it.next()
            if (buf.nonEmpty && lineKey(buf.head) != lineKey(r)) {
              val rows = buf.toVector; buf.clear(); buf += r
              out = emitLine(rows)
            } else buf += r
          }
          if (!out.hasNext && buf.nonEmpty && !it.hasNext) {
            val rows = buf.toVector; buf.clear()
            out = emitLine(rows)
          }
        }

        def hasNext: Boolean = { advance(); out.hasNext }
        def next(): Row = { advance(); out.next() }
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))

    labeled
  }
}
