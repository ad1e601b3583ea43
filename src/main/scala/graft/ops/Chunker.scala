package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Context-window text chunking: split every document into fixed-size
 * character windows with optional overlap — the RAG-indexing / context-
 * budget companion to [[Pack]] (which concatenates whole documents up to a
 * token budget; this slices single documents down to one).
 *
 * Scale contract: a pure projection — `sequence` + `posexplode` +
 * `substring`, all codegen'd, no shuffle, no UDF. Output rows carry
 * (chunk_idx, chunk_start, n_chunks) so any consumer can reassemble or
 * window-join without re-scanning the source. With `overlap = 0` the
 * chunks partition the text exactly: `concat(chunks) == text`, pinned by
 * the constant-empty `chunk_concat_diff` oracle.
 */
object Chunker {

  /**
   * One row per (document, window): windows start every
   * `maxChars - overlap` characters and span `maxChars`. Every document
   * emits at least one chunk (empty text → one empty chunk), so chunking
   * never silently drops rows.
   */
  def chunk(docs: DataFrame, maxChars: Int = 512, overlap: Int = 0,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(maxChars > 0, "maxChars must be positive")
    require(overlap >= 0 && overlap < maxChars,
      "overlap must be in [0, maxChars)")
    val stride = maxChars - overlap
    val text = coalesce(col(textCol), lit(""))
    val len = length(text)
    // 1 chunk covers maxChars; each further stride covers the remainder
    val nChunks = when(len <= maxChars, lit(1)).otherwise(
      floor((len - maxChars + stride - 1).cast("double") / stride)
        .cast("int") + 1)
    docs
      .withColumn("n_chunks", nChunks)
      .select(col(idCol), col("n_chunks"),
        posexplode(sequence(lit(0), col("n_chunks") - 1)).as(Seq("chunk_idx", "_i")),
        text.as("_t"))
      .withColumn("chunk_start", col("chunk_idx") * stride)
      .withColumn("chunk_text",
        col("_t").substr(col("chunk_start") + 1, lit(maxChars)))
      .select(idCol, "chunk_idx", "chunk_start", "chunk_text", "n_chunks")
  }
}
