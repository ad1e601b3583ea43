package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Structured Streaming surface: the reference is batch-only (SURVEY.md §1.4)
 * but a transcript corpus at 10^12-turn scale arrives as a stream; these
 * operators make the same extraction semantics incremental.
 *
 *  - [[turnRates]]: watermarked tumbling-window counters (the streaming
 *    analog of the A6 processing counters);
 *  - [[convClose]]: conversation sessionization via
 *    `flatMapGroupsWithState` — a conversation is emitted once idle for
 *    `gapSeconds`, carrying turn count/bytes and the ordered text, ready
 *    for the batch extraction pipeline downstream.
 *
 * State is O(1 conversation) per key and conversations expire by event-time
 * timeout, so state size is bounded by the number of OPEN conversations,
 * not the corpus.
 */
object StreamingExtract {

  /** Per-role tumbling turn counters with a 10-minute watermark. */
  def turnRates(turns: DataFrame, window_ : String = "5 minutes"): DataFrame =
    turns.withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), window_), col("role"))
      .agg(count(lit(1)).as("n_turns"),
        sum(length(coalesce(col("text"), lit("")))).as("bytes"))

  final case class TurnEvent(conv_id: String, turn_idx: Int, role: String,
      text: String, ts: Timestamp)
  final case class ConvState(turns: List[(Int, String)], bytes: Long, lastTs: Long)
  final case class ClosedConv(conv_id: String, n_turns: Int, bytes: Long, text: String)

  /** Close a conversation after `gapSeconds` of event-time silence and emit
   * its ordered text (turn texts joined by newline — the Structure input). */
  def convClose(turns: Dataset[TurnEvent], gapSeconds: Long = 1800): Dataset[ClosedConv] = {
    import turns.sparkSession.implicits._
    turns
      .withWatermark("ts", "30 minutes")
      .groupByKey(_.conv_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (convId: String, events: Iterator[TurnEvent], state: GroupState[ConvState]) => {
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            val text = s.turns.sortBy(_._1).map(_._2).mkString("\n")
            Iterator(ClosedConv(convId, s.turns.size, s.bytes, text))
          } else {
            val prev = state.getOption.getOrElse(ConvState(Nil, 0L, 0L))
            val evs = events.toList
            val next = ConvState(
              prev.turns ++ evs.map(e => (e.turn_idx, Option(e.text).getOrElse(""))),
              prev.bytes + evs.map(e => Option(e.text).map(_.length.toLong).getOrElse(0L)).sum,
              math.max(prev.lastTs, evs.map(_.ts.getTime).max))
            state.update(next)
            state.setTimeoutTimestamp(next.lastTs + gapSeconds * 1000)
            Iterator.empty
          }
        })
  }
}
