package graft.extract

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Shared machinery of the chunk-parallel twins
 * ([[Features.bodyChunked]], [[Assemble.bodySpansChunked]],
 * [[Structure.tokensFromLinesChunked]], [[Labeler.bodyLabelsChunked]]):
 * split a conversation into `chunkTurns`-turn chunks so its
 * conversation-grain windows become (conv_id, chunk)-keyed — ONE giant
 * conversation then computes on nTurns/chunkTurns tasks — and import
 * PHANTOM copies of each chunk's neighbors' edge rows so lag/lead(1)
 * stays exact at chunk boundaries.
 */
private[graft] object Chunked {

  val ordCols = Seq("turn_idx", "line_in_turn", "tok_idx")

  /** Chunk id of a turn (a turn never straddles chunks). */
  def chunkCol(chunkTurns: Int) = expr(s"int(turn_idx div $chunkTurns)")

  /**
   * Adds `_chunk` and `_ph`, and unions in two phantom rows per chunk: a
   * copy of the previous EXISTING chunk's last row and of the next existing
   * chunk's first row (turn gaps may leave chunk ids absent — lag/lead on
   * the chunk-level frame skips them). After the caller's windowed pass,
   * real rows (`!_ph`) carry exact lag/lead(1) values; phantom rows are
   * garbage and must be filtered out. The edge frame is one row per chunk —
   * tiny, so its conversation-grain windows are not a skew surface.
   */
  def augmentBoundaries(df: DataFrame, chunkTurns: Int): DataFrame = {
    require(chunkTurns > 0, "chunkTurns must be positive")
    val inCols = df.columns.toSeq
    val chunked = df.withColumn("_chunk", chunkCol(chunkTurns))
    val ordS = struct(ordCols.map(col): _*)
    val wChunks = Window.partitionBy("conv_id").orderBy("_chunk")
    val phantoms = chunked.groupBy("conv_id", "_chunk")
      .agg(min_by(struct(inCols.map(col): _*), ordS).as("_first"),
        max_by(struct(inCols.map(col): _*), ordS).as("_last"))
      .withColumn("_from_prev", lag(col("_last"), 1).over(wChunks))
      .withColumn("_from_next", lead(col("_first"), 1).over(wChunks))
      .select(col("conv_id").as("_c"), col("_chunk"),
        explode(array(col("_from_prev"), col("_from_next"))).as("_p"))
      .where(col("_p").isNotNull)
      .select(col("_chunk") +: inCols.map(c => col(s"_p.$c").as(c)): _*)
      .withColumn("_ph", lit(true))
    chunked.withColumn("_ph", lit(false))
      .unionByName(phantoms.select((inCols :+ "_chunk" :+ "_ph").map(col): _*))
  }
}
