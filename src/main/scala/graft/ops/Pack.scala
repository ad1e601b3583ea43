package graft.ops

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Sequence packing for LM training: assign documents to fixed
 * token-budget packs (the batch-assembly step that turns a filtered
 * corpus into dense training sequences — padding waste is the metric).
 *
 * Rule: greedy START-OFFSET packing inside deterministic buckets. Each
 * document's `start_tok` is the running token total of its bucket before
 * it (window prefix sum); its pack is `start_tok div budget`. A document
 * whose span crosses a budget boundary stays in its starting pack
 * (standard practice — the loader truncates or wraps); packs are
 * therefore filled to at least `budget` tokens except each bucket's last.
 *
 * Scale: there is NO global sort. Buckets are `doc_id % nBuckets`, so the
 * only window partitions by bucket — with nBuckets ≈ a few × cluster
 * parallelism each window partition holds corpus/nBuckets tokens and
 * every executor packs independently. Pack identity is the composite
 * (bucket, pack_in_bucket), deterministic under any partitioning or
 * retry (no rand(), no monotonically_increasing_id()).
 */
object Pack {

  def packSequences(docs: DataFrame, budget: Long, nBuckets: Int = 64,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(budget > 0, "budget must be positive")
    val w = Window.partitionBy("bucket").orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    docs
      .withColumn("bucket", (col(idCol) % nBuckets).cast("int"))
      .withColumn("n_tokens",
        coalesce(size(TextStats.words(col(textCol))), lit(0)))
      .withColumn("start_tok",
        coalesce(sum("n_tokens").over(w), lit(0L)))
      .withColumn("pack_in_bucket", expr(s"start_tok div ${budget}L"))
      .select(col(idCol), col("bucket"), col("n_tokens"), col("start_tok"),
        col("pack_in_bucket"))
  }

  /** Pack-grain fill report: documents and tokens per (bucket, pack) —
   * the padding-waste audit (`tok_fill` short of budget = padding in
   * every pack but each bucket's last). */
  def packStats(packed: DataFrame): DataFrame =
    packed.groupBy("bucket", "pack_in_bucket")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("tok_fill"))
}
