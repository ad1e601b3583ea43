package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Agent-transcript structural operators — the QA and dedup passes an
 * agent-trajectory training corpus needs beyond plain chat SFT assembly
 * ([[Sft]]): tool-call sequencing audit, per-tool latency census, stuck-
 * loop detection, and conversation-prefix deduplication (re-logged agent
 * sessions are routinely exact prefixes of their own continuations).
 *
 * Conventions over the transcript schema (conv_id, turn_idx, role, text,
 * tool, ts): a tool CALL is an assistant turn with `tool` set; a tool
 * RESULT is a `role='tool'` turn whose `tool` names the tool that
 * produced it. A well-formed call/result exchange is adjacent: the
 * result's immediate predecessor is the call with the same tool name.
 *
 * Scale contract: every operator here shuffles once on `conv_id` (the
 * grain the semantics require) or on a high-entropy hash — nothing
 * corpus-grain, no windows over skewable non-conversation keys. See each
 * method's note for the 10^12-turn story.
 *
 * Reference role: grobid-datacat audits its batch runs with per-document
 * counters and validity checks before training-data emission
 * (`ProcessEngineDatacat.java` batch modes, the segmenter's per-doc
 * counters); these are the same gates at conversation grain.
 */
object Agent {

  /**
   * Per-conversation tool-call sequencing audit:
   *
   *  - `n_calls`           assistant turns with a tool name
   *  - `n_results`         role='tool' turns
   *  - `n_orphan_results`  results whose immediate predecessor is not a
   *                        call naming the same tool
   *  - `n_dangling_calls`  calls whose immediate successor is not a
   *                        result naming the same tool
   *  - `n_mistagged`       tool name set on a non-assistant, non-tool row
   *  - `tool_valid`        no orphans, no danglers, no mistags
   *
   * One lag/lead window + one hash aggregate, both on conv_id. Emits one
   * row per conversation (conversations with zero tool traffic audit
   * clean — they are still emitted, callers census everything).
   */
  def toolAudit(transcripts: DataFrame, idCol: String = "conv_id",
      orderCol: String = "turn_idx", roleCol: String = "role",
      toolCol: String = "tool"): DataFrame = {
    val w = Window.partitionBy(idCol).orderBy(orderCol)
    val role = col(roleCol)
    val tool = col(toolCol)
    val isCall = role === "assistant" && tool.isNotNull
    val isResult = role === "tool"
    transcripts
      .select(col(idCol), col(orderCol), role, tool)
      .withColumn("_pr", lag(role, 1).over(w))
      .withColumn("_pt", lag(tool, 1).over(w))
      .withColumn("_nr", lead(role, 1).over(w))
      .withColumn("_nt", lead(tool, 1).over(w))
      .groupBy(idCol)
      .agg(
        sum(when(isCall, 1L).otherwise(0L)).as("n_calls"),
        sum(when(isResult, 1L).otherwise(0L)).as("n_results"),
        sum(when(isResult &&
          !(col("_pr") === "assistant" && col("_pt") <=> tool), 1L)
          .otherwise(0L)).as("n_orphan_results"),
        sum(when(isCall &&
          !(col("_nr") === "tool" && col("_nt") <=> tool), 1L)
          .otherwise(0L)).as("n_dangling_calls"),
        sum(when(tool.isNotNull && !role.isin("assistant", "tool"), 1L)
          .otherwise(0L)).as("n_mistagged"))
      .withColumn("tool_valid",
        col("n_orphan_results") === 0L && col("n_dangling_calls") === 0L &&
          col("n_mistagged") === 0L)
  }

  /**
   * Per-tool latency census over well-formed call→result exchanges: for
   * every adjacent (call, result) pair with matching tool name, the
   * latency is `result.ts - call.ts`. Emits exact integer columns only
   * (`n_calls`, `n_matched`, `sum_lat_ms`) — consumers derive averages;
   * no doubles cross the oracle boundary.
   *
   * One lead window on conv_id, then a hash aggregate on the tool name.
   * Tool-name cardinality is small (it is a tool CATALOG), so the final
   * aggregate is a few-row reduce; the heavy side is map-side partial.
   */
  def toolStats(transcripts: DataFrame, idCol: String = "conv_id",
      orderCol: String = "turn_idx", roleCol: String = "role",
      toolCol: String = "tool", tsCol: String = "ts"): DataFrame = {
    val w = Window.partitionBy(idCol).orderBy(orderCol)
    val tool = col(toolCol)
    val isCall = col(roleCol) === "assistant" && tool.isNotNull
    val matched = col("_nr") === "tool" && col("_nt") <=> tool
    transcripts
      .select(col(idCol), col(orderCol), col(roleCol), tool, col(tsCol))
      .withColumn("_nr", lead(col(roleCol), 1).over(w))
      .withColumn("_nt", lead(tool, 1).over(w))
      .withColumn("_nts", lead(col(tsCol), 1).over(w))
      .where(isCall)
      .groupBy(tool.as("tool"))
      .agg(
        count(lit(1)).as("n_calls"),
        sum(when(matched, 1L).otherwise(0L)).as("n_matched"),
        sum(when(matched,
          unix_millis(col("_nts")) - unix_millis(col(tsCol)))
          .otherwise(0L)).as("sum_lat_ms"))
  }

  /**
   * Stuck-loop detection: maximal runs of CONSECUTIVE identical turns of
   * `role` (by exact text equality, nulls grouped) within a conversation,
   * of length >= `minRun` — the signature of an agent repeating the same
   * output across turns. "Consecutive" means adjacent in the sub-sequence
   * of `role` turns (intervening user/tool turns don't break a run).
   *
   * Gaps-and-islands over one conv_id window (two row_numbers, their
   * difference is the island id), then one hash aggregate on
   * (conv_id, island). Linear per conversation, one shuffle.
   *
   * Output: (conv_id, start_idx, end_idx, run_len) per qualifying run.
   */
  def loopRuns(transcripts: DataFrame, minRun: Int = 3,
      idCol: String = "conv_id", orderCol: String = "turn_idx",
      roleCol: String = "role", textCol: String = "text"): DataFrame = {
    require(minRun >= 2, "a run of 1 is not a loop")
    val key = coalesce(col(textCol), lit(""))
    val wAll = Window.partitionBy(idCol).orderBy(orderCol)
    val wKey = Window.partitionBy(col(idCol), col("_k")).orderBy(col(orderCol))
    transcripts
      .where(col(roleCol) === lit("assistant"))
      .select(col(idCol), col(orderCol), key.as("_k"))
      .withColumn("_isl", row_number().over(wAll) - row_number().over(wKey))
      .groupBy(col(idCol), col("_k"), col("_isl"))
      .agg(
        min(col(orderCol)).cast("int").as("start_idx"),
        max(col(orderCol)).cast("int").as("end_idx"),
        count(lit(1)).as("run_len"))
      .where(col("run_len") >= minRun)
      .select(idCol, "start_idx", "end_idx", "run_len")
  }

  /**
   * Structural transcript repair — the emit side of [[toolAudit]]:
   *
   *  1. CLEAR mistagged tool names (tool set on a row that is neither an
   *     assistant call nor a tool result);
   *  2. DROP orphan tool results (a `role='tool'` row whose original
   *     immediate predecessor is not an assistant call naming the same
   *     tool — the context that produced it is lost). A conversation-
   *     initial result is always dropped. Dropping preserves call→result
   *     adjacency for every KEPT result (calls are never dropped);
   *  3. MERGE runs of consecutive same-role turns that carry no tool name
   *     (re-logged UIs split one message across turns): texts join with
   *     `\n` (nulls as empty), the run keeps its first timestamp;
   *  4. RE-INDEX turn_idx densely from 0 per conversation.
   *
   * Dangling calls are kept — a result cannot be invented. Invariant
   * (oracle-pinned): `toolAudit` over the output reports zero orphan
   * results and zero mistags.
   *
   * Two conv_id window passes + one hash aggregate, all on conv_id; the
   * per-island text join is a bounded in-group sort (turn count), no
   * corpus-grain state.
   */
  def repair(transcripts: DataFrame, idCol: String = "conv_id",
      orderCol: String = "turn_idx", roleCol: String = "role",
      textCol: String = "text", toolCol: String = "tool",
      tsCol: String = "ts"): DataFrame = {
    val w = Window.partitionBy(idCol).orderBy(orderCol)
    val cum = w.rowsBetween(Window.unboundedPreceding, 0)
    val role = col(roleCol)
    val cleared = transcripts.withColumn("_tool",
      when(role.isin("assistant", "tool"), col(toolCol)))
    val matchedPrev =
      coalesce(lag(role, 1).over(w) === "assistant", lit(false)) &&
        (lag(col("_tool"), 1).over(w) <=> col("_tool"))
    val kept = cleared
      .withColumn("_keep", role =!= "tool" || matchedPrev)
      .where(col("_keep"))
    val brk = col("_tool").isNotNull ||
      lag(col("_tool"), 1).over(w).isNotNull ||
      !(role <=> lag(role, 1).over(w))
    kept
      .withColumn("_isl", sum(when(brk, 1L).otherwise(0L)).over(cum))
      .groupBy(col(idCol), col("_isl"))
      .agg(
        min(col(orderCol)).as("_o"),
        min(role).as(roleCol), // constant within an island
        array_join(transform(
          array_sort(collect_list(struct(col(orderCol).as("_o2"),
            coalesce(col(textCol), lit("")).as("_t2")))),
          x => x.getField("_t2")), "\n").as(textCol),
        max(col("_tool")).as(toolCol), // null except singleton call/result
        min(col(tsCol)).as(tsCol))
      .select(col(idCol),
        (row_number().over(Window.partitionBy(idCol).orderBy(col("_o")))
          - 1).cast("int").as(orderCol),
        col(roleCol), col(textCol), col(toolCol), col(tsCol))
  }

  /**
   * Conversation-prefix deduplication: flag every conversation whose full
   * (role, text) turn sequence equals the first k turns of some OTHER
   * conversation — a strictly longer one, or an equal-length exact
   * duplicate with a smaller conv_id (the tie-break keeps exactly one of
   * an identical pair). Re-logged agent sessions produce exactly this
   * shape: the continued session re-emits the original as its prefix.
   *
   * Mechanics (exact result, hash-accelerated):
   *  1. per-turn hash h = xxhash64(role, text); positional k and a
   *     cumulative order-sensitive signature sig_k = Σ h_i·i over one
   *     conv_id window;
   *  2. candidate coverers: join each conversation's FULL signature
   *     (sig at its last turn, with its length) against every prefix row
   *     (sig_k, k) of the corpus on (sig, k) — a shuffle on the 64-bit
   *     signature, high-entropy by construction, sized by true duplicate
   *     mass plus astronomically-rare collisions;
   *  3. verification: every candidate (a ⊑ b) pair is re-checked turn by
   *     turn on the actual (role, text) values, so hash collisions can
   *     never flag a non-duplicate — the output is exact. Verification
   *     work is O(prefix length) per candidate pair.
   *
   * Signature arithmetic is modular (per-term `pmod(h·k, 2^40)` with h
   * reduced mod 2^31−1) so the cumulative sum stays inside a long under
   * ANSI mode for conversations up to ~8M turns — far past any real
   * transcript; collisions the reduction adds only cost verification
   * work, never correctness.
   *
   * Plan shape (audited + measured): the corpus-grain window shuffles
   * ONLY (id, turn, hash, k, sig) — never the text. That slim frame feeds
   * three consumers (full signatures, prefix rows, the final join) through
   * a plan barrier (one LogicalRDD), so every consumer reuses the SAME
   * shuffle dependency as skipped stages: one slim corpus shuffle total.
   * (Earlier shapes measured here: recomputing the window per consumer =
   * 5 corpus shuffles; localCheckpoint = 2-5× slower and wildly noisy —
   * materializing the rows to the block store costs more than it saves;
   * carrying text through the barrier made the shuffle disk-bound at 10⁷
   * turns.) Prefix rows are pre-pruned to k ∈ {distinct conversation
   * lengths} (broadcast) before the signature join, so the join ships
   * #convs × #distinct-lengths rows, not one row per TURN. Verification
   * re-reads (role, text) from the SOURCE for candidate conversations only
   * — a column-pruned scan filtered by the broadcast candidate-id set,
   * sized by duplicate mass.
   *
   * Output: one row per conversation — (conv_id, n_turns, is_prefix_dup,
   * covered_by) with covered_by = min covering conv_id (null if none).
   */
  /** The corpus-SCAN stage of [[prefixDedup]] (hash + per-conv window
   * prefix signatures) behind the shared plan barrier — split out so the
   * scaling bench can time the scan leg vs the small-join fixed costs
   * separately (the Amdahl breakdown in BASELINE.md). */
  private[graft] def prefixSlim(transcripts: DataFrame, idCol: String,
      orderCol: String, h: org.apache.spark.sql.Column,
      w: org.apache.spark.sql.expressions.WindowSpec,
      cum: org.apache.spark.sql.expressions.WindowSpec): DataFrame =
    graft.extract.Chunked.barrier(transcripts
      .select(col(idCol), col(orderCol), h.as("_h"))
      .withColumn("_k", row_number().over(w))
      .withColumn("_sig",
        sum(pmod(col("_h") * col("_k"), lit(1L << 40))).over(cum)))

  /** Scan-stage-only entry for the profiler: materializes the prefix
   * signature frame exactly as [[prefixDedup]] builds it. */
  private[graft] def prefixSlimOnly(transcripts: DataFrame,
      idCol: String = "conv_id", orderCol: String = "turn_idx",
      roleCol: String = "role", textCol: String = "text"): DataFrame = {
    val w = Window.partitionBy(idCol).orderBy(orderCol)
    val cum = w.rowsBetween(Window.unboundedPreceding, 0)
    val h = pmod(xxhash64(coalesce(col(roleCol), lit("")),
      coalesce(col(textCol), lit(""))), lit(2147483647L))
    prefixSlim(transcripts, idCol, orderCol, h, w, cum)
  }

  def prefixDedup(transcripts: DataFrame, idCol: String = "conv_id",
      orderCol: String = "turn_idx", roleCol: String = "role",
      textCol: String = "text"): DataFrame = {
    val w = Window.partitionBy(idCol).orderBy(orderCol)
    val cum = w.rowsBetween(Window.unboundedPreceding, 0)
    // xxhash64 chains per-column states, so ("ab","c") and ("a","bc")
    // hash differently without an explicit separator
    val h = pmod(xxhash64(coalesce(col(roleCol), lit("")),
      coalesce(col(textCol), lit(""))), lit(2147483647L))
    val slim = prefixSlim(transcripts, idCol, orderCol, h, w, cum)
    val full = slim.groupBy(idCol).agg(
      max(col("_k")).as("n_turns"),
      max_by(col("_sig"), col("_k")).as("_fsig"))

    val a = full.select(col(idCol).as("_a"), col("n_turns"), col("_fsig"))
    val lens = full.select(col("n_turns").as("_k")).distinct()
    val b = slim.select(col(idCol).as("_b"), col("_k"), col("_sig"))
      .join(broadcast(lens), Seq("_k"), "left_semi")
    val bLen = full.select(col(idCol).as("_b"), col("n_turns").as("_bn"))
    val cand = graft.extract.Chunked.barrier(a
      .join(b, col("_fsig") === col("_sig") && col("n_turns") === col("_k")
        && col("_a") =!= col("_b"))
      .join(bLen, "_b")
      .where(col("_bn") > col("n_turns") ||
        (col("_bn") === col("n_turns") && col("_b") < col("_a")))
      .select("_a", "_b", "n_turns"))

    // exact verification: all n_turns positions must agree on (role, text)
    // — re-read the source for candidate conversations only, re-derive k
    // (the filter keeps whole conversations, so row_number is unchanged)
    val candIds = cand.select(col("_a").as(idCol))
      .union(cand.select(col("_b").as(idCol))).distinct()
    val vturns = graft.extract.Chunked.barrier(transcripts
      .join(broadcast(candIds), Seq(idCol), "left_semi")
      .select(col(idCol), col(orderCol),
        coalesce(col(roleCol), lit("")).as("_r"),
        coalesce(col(textCol), lit("")).as("_t"))
      .withColumn("_k", row_number().over(w)))
    val va = vturns.select(col(idCol).as("_a"), col("_k"),
      col("_r").as("_ar"), col("_t").as("_at"))
    val vb = vturns.select(col(idCol).as("_b"), col("_k"),
      col("_r").as("_br"), col("_t").as("_bt"))
    val verified = cand
      .join(va, "_a").where(col("_k") <= col("n_turns"))
      .join(vb, Seq("_b", "_k"))
      .groupBy(col("_a"), col("_b"), col("n_turns"))
      .agg(sum(when(col("_ar") === col("_br") && col("_at") === col("_bt"),
        1L).otherwise(0L)).as("_ok"))
      .where(col("_ok") === col("n_turns"))
      .groupBy(col("_a")).agg(min(col("_b")).as("covered_by"))

    full.join(verified, col(idCol) === col("_a"), "left")
      .select(col(idCol), col("n_turns"),
        col("covered_by").isNotNull.as("is_prefix_dup"), col("covered_by"))
  }
}
