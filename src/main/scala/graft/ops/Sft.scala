package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * SFT training-example assembly over multi-turn transcripts — the last
 * mile of a conversation-corpus pipeline: render each conversation into
 * ONE training string with role delimiters, emit the loss-mask character
 * spans that cover exactly the assistant-authored text (role tags and
 * non-assistant turns are masked out of the loss), and truncate long
 * conversations to a token budget keeping the most recent turns (the
 * standard chat-context rule: drop the oldest turns first, never the
 * system preamble).
 *
 * Template (fixed, deterministic): every turn renders as
 * `<|role|>\n{text}\n`; the conversation is the in-order concatenation.
 * Offsets are code-point offsets into that rendered string, so
 * `substr(rendered, span_start+1, span_end-span_start) == turn text`
 * exactly — pinned by the constant-empty `sft_mask_diff` oracle.
 *
 * Scale contract: everything is one shuffle on `conv_id` — the grouping
 * the semantics require. [[render]] is a single hash aggregate
 * (`collect_list` of (turn_idx, rendered) structs, sorted in-group);
 * [[maskSpans]] is a prefix-sum window over the same partitioning, linear
 * per conversation; [[truncateTail]] is a reverse prefix-sum window. No
 * UDFs, no corpus-grain joins. Giant-conversation skew: per-conv state is
 * O(turns in the conversation); at 10^12-turn scale conversations are
 * bounded (and the repo's chunked-pipeline discipline applies to any
 * pathological outlier, see extract/Labeler chunked twins).
 *
 * Reference role: grobid-datacat's training-data generators emit one
 * serialized training document per input with per-span labels
 * (`DatacatSegmenterParser.createTraining`, TEI + raw-feature pairs);
 * this is the same assembly step for LM fine-tuning corpora.
 */
object Sft {

  /** Per-turn rendered fragment `<|role|>\n{text}\n` and its length. */
  private def rendered(roleCol: String, textCol: String) =
    concat(lit("<|"), coalesce(col(roleCol), lit("")), lit("|>\n"),
      coalesce(col(textCol), lit("")), lit("\n"))

  /**
   * One row per conversation: the rendered training text, turn count and
   * rendered length. One hash aggregate on conv_id; in-group order comes
   * from sorting the collected (turn_idx, fragment) structs, so the result
   * is stable under any physical partitioning of the input.
   */
  def render(transcripts: DataFrame, idCol: String = "conv_id",
      orderCol: String = "turn_idx", roleCol: String = "role",
      textCol: String = "text"): DataFrame =
    transcripts
      .select(col(idCol), col(orderCol),
        rendered(roleCol, textCol).as("_frag"))
      .groupBy(idCol)
      .agg(
        array_join(transform(
          array_sort(collect_list(struct(col(orderCol), col("_frag")))),
          f => f.getField("_frag")), "").as("text"),
        count(lit(1)).as("n_turns"),
        sum(length(col("_frag"))).cast("long").as("n_chars"))

  /**
   * Loss-mask spans: one row per assistant turn with the [start, end)
   * code-point range of that turn's TEXT inside [[render]]'s output (the
   * `<|assistant|>\n` tag itself stays masked). Prefix-sum window over
   * (conv_id, turn_idx) — linear per conversation, one shuffle.
   */
  def maskSpans(transcripts: DataFrame, idCol: String = "conv_id",
      orderCol: String = "turn_idx", roleCol: String = "role",
      textCol: String = "text", maskRole: String = "assistant"): DataFrame = {
    val w = Window.partitionBy(idCol).orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    transcripts
      .select(col(idCol), col(orderCol), col(roleCol),
        rendered(roleCol, textCol).as("_frag"),
        length(coalesce(col(textCol), lit(""))).as("_tlen"),
        // tag prefix "<|" + role + "|>\n" = role length + 5 code points
        (length(coalesce(col(roleCol), lit(""))) + lit(5)).as("_tag"))
      .withColumn("_off", coalesce(sum(length(col("_frag"))).over(w), lit(0)))
      .where(col(roleCol) === maskRole)
      .select(col(idCol), col(orderCol),
        (col("_off") + col("_tag")).cast("long").as("span_start"),
        (col("_off") + col("_tag") + col("_tlen")).cast("long").as("span_end"))
  }

  /**
   * Context-budget truncation, newest-first: per conversation, keep the
   * longest SUFFIX of turns whose whitespace-token total fits
   * `budgetToks`, plus the leading system turn (the preamble survives
   * truncation, as every chat runtime does). Emits the keep decision for
   * EVERY turn (kept boolean + audit columns) so callers can census what
   * truncation drops before filtering.
   */
  def truncateTail(transcripts: DataFrame, budgetToks: Long,
      idCol: String = "conv_id", orderCol: String = "turn_idx",
      roleCol: String = "role", textCol: String = "text"): DataFrame = {
    require(budgetToks > 0, "budgetToks must be positive")
    val conv = Window.partitionBy(idCol)
    val wDesc = conv.orderBy(col(orderCol).desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    // non-whitespace runs (NOT split-on-\s: split leaves empty fields on
    // leading separators and Java drops trailing empties where DuckDB
    // keeps them — run-counting has no empty-field semantics to disagree on)
    val nToks = regexp_count(coalesce(col(textCol), lit("")),
      lit("[^ \\t\\n\\r\\f]+")).cast("long")
    transcripts
      .select(col(idCol), col(orderCol), col(roleCol), nToks.as("n_toks"))
      .withColumn("rev_cum", sum(col("n_toks")).over(wDesc))
      .withColumn("kept",
        col("rev_cum") <= budgetToks ||
          (col(roleCol) === "system" &&
            col(orderCol) === min(col(orderCol)).over(conv)))
  }

  /**
   * Role-alternation audit — the structural QA gate every SFT corpus runs
   * before training: ignoring system turns, a well-formed conversation
   * starts with a user turn, strictly alternates user/assistant, and ends
   * on an assistant turn (so the rendered example has a trainable
   * completion). Emits per-conversation counts and the three flags plus
   * their conjunction `role_valid` — callers census the failure modes
   * before deciding what to drop.
   *
   * One lag window + one hash aggregate, both on the conv_id partitioning
   * the semantics require; nothing corpus-grain beyond that.
   * Conversations with NO non-system turns emit no row (there is nothing
   * to audit — semi-join the output against the corpus to find them).
   */
  def roleAudit(transcripts: DataFrame, idCol: String = "conv_id",
      orderCol: String = "turn_idx", roleCol: String = "role"): DataFrame = {
    val w = Window.partitionBy(idCol).orderBy(orderCol)
    transcripts
      .where(col(roleCol) =!= "system")
      .withColumn("_prev", lag(col(roleCol), 1).over(w))
      .groupBy(idCol)
      .agg(
        count(lit(1)).as("n_turns_ns"),
        min_by(col(roleCol), col(orderCol)).as("first_role"),
        max_by(col(roleCol), col(orderCol)).as("last_role"),
        sum(when(col("_prev") === col(roleCol), 1L).otherwise(0L))
          .as("n_role_repeats"))
      .withColumn("role_valid",
        col("first_role") === "user" && col("last_role") === "assistant" &&
          col("n_role_repeats") === 0L)
  }
}
