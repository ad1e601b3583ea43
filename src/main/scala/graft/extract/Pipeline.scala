package graft.extract

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * End-to-end extraction pipeline (SURVEY.md §3 "Spark lifecycle equivalent"):
 *
 *   transcripts → structure (lines/tokens) → features → zone labels →
 *   body labels on the <body> zone → segment ids → span assembly → TEI.
 *
 * Scale shape (the plan to protect at 100 TB): ONE exchange — a single
 * hash(conv_id) shuffle feeds every per-conversation window, the zone
 * filter, the token explode, and the FSM, which emits finished spans
 * during its label walk (no second shuffle for span assembly; `.explain`
 * shows exactly one hashpartitioning). AQE handles residual skew; giant
 * single conversations are bounded upstream by the turn-grain windows
 * (keyed (conv_id, turn_idx)) doing most of the work and by the F5 size
 * guards.
 */
object Pipeline {

  /** Zone-label the lines of a transcript table. */
  def zonedLines(turns: DataFrame): DataFrame =
    Labeler.zones(Features.segmenter(Structure.keptLines(turns)))

  /** Synthesize null role/tool columns for document-shaped input. */
  private def withNullRoleCols(docs: DataFrame): DataFrame = {
    val withRole =
      if (docs.columns.contains("role")) docs
      else docs.withColumn("role", lit(null).cast("string"))
    if (withRole.columns.contains("tool")) withRole
    else withRole.withColumn("tool", lit(null).cast("string"))
  }

  /**
   * Full extraction: body spans of the <body> zone per conversation.
   *
   * Single-pass, single-exchange: the kept lines are hash-partitioned by
   * conv_id ONCE up front; every downstream window (keys ⊇ {conv_id}), the
   * zone filter, the token explode (partition-preserving) and the span FSM
   * are all satisfied by that one exchange — `.explain` shows exactly one
   * hashpartitioning(conv_id). The FSM runs as the custom Catalyst operator
   * ([[graft.plans.BodySpans]]): its DECLARED ClusteredDistribution +
   * sort-order requirements let EnsureRequirements reuse the exchange; it
   * consumes InternalRow directly (no Row-encoder round trip). The
   * mapPartitions twin ([[Labeler.bodySpansFused]]) is kept for the
   * failure-counted resumable path and is differential-tested identical.
   */
  def extract(turns: DataFrame): DataFrame =
    graft.plans.BodySpans.spans(bodyTokenFeats(turns))

  /**
   * Document-mode extraction — the reference's E1 cascade
   * (`DatacatBodySegmentationParser.createTraining`: stage-1 segmenter →
   * select BODY → stage-2 entry labeling) for corpora with NO role/tool
   * signal. Stage 1 defaults to the TRAINED [[ZoneModel]] when the shipped
   * artifact ([[ZoneModelArtifact]]) is on the classpath — the reference's
   * whole point is a trained segmenter (E3), and the trained stage-1
   * measures 96.9 held-out line accuracy / front F1 ~77 vs the heuristic's
   * 94.1 / 64.6 (ZoneModelSpec / ZoneEvalSpec) — falling back to the
   * heuristic [[extractDocumentsHeuristic]] when the resource is absent.
   */
  def extractDocuments(docs: DataFrame): DataFrame =
    ZoneModelArtifact.load(docs.sparkSession) match {
      case Some(model) => extractDocumentsModeled(docs, model)
      case None => extractDocumentsHeuristic(docs)
    }

  /** Stage-1 body lines with the same artifact dispatch as
   * [[extractDocuments]] — the frame its stage-2 tail consumes. */
  def documentBodyLines(docs: DataFrame): DataFrame =
    ZoneModelArtifact.load(docs.sparkSession) match {
      case Some(model) => documentBodyLinesModeled(docs, model)
      case None => documentBodyLinesHeuristic(docs)
    }

  /**
   * Document-mode extraction with the heuristic stage-1: content-based
   * [[Labeler.zonesContent]] (front matter, price-list annexes and OCR junk
   * are dropped), stage 2 the same fused FSM as [[extract]]. Input needs
   * (conv_id, turn_idx, text); role and tool are synthesized as nulls when
   * absent. Same single-exchange shape: zonesContent's windows are all
   * keyed on conv_id.
   */
  def extractDocumentsHeuristic(docs: DataFrame): DataFrame =
    graft.plans.BodySpans.spans(docBodyFeats(documentBodyLinesHeuristic(docs)))

  /** Heuristic twin of [[documentBodyLinesModeled]]. */
  def documentBodyLinesHeuristic(docs: DataFrame): DataFrame = {
    val turns = withNullRoleCols(docs)
    val lines = Structure.keptLines(graft.ops.Par.clusterBy(turns, "conv_id"))
    Labeler.zonesContent(lines)
      .where(col("zone") === "<body>")
      .select("conv_id", "turn_idx", "role", "tool", "block_idx",
        "line_in_turn", "line_idx", "line")
  }

  /**
   * Document-mode extraction with a TRAINED stage-1: like
   * [[extractDocuments]], but zone selection comes from a [[ZoneModel]]
   * (naive-Bayes, heuristic-stacked — 94.8% held-out vs the heuristic's
   * 86.4%, ZoneModelSpec). The model side is a broadcast join; the plan
   * still has a single conv_id exchange.
   */
  def extractDocumentsModeled(docs: DataFrame, model: ZoneModel.Model): DataFrame =
    graft.plans.BodySpans.spans(docBodyFeats(
      documentBodyLinesModeled(docs, model)))

  /** Document-mode stage-1 output: the body lines the trained zoner keeps.
   * Public so invariant oracles can pin the stage-2 tail against the text
   * entering it (doc_rebuild_diff). */
  def documentBodyLinesModeled(docs: DataFrame, model: ZoneModel.Model): DataFrame = {
    val turns = withNullRoleCols(docs)
    val lines = Structure.keptLines(graft.ops.Par.clusterBy(turns, "conv_id"))
    val hinted = Labeler.zonesContent(lines)
      .withColumnRenamed("zone", "hint").drop("zone_label")
    // NO score smoothing here: smoothing raises bulk line accuracy (+1.2%,
    // ZoneModelSpec) but blurs single-line zone BOUNDARIES — a smoothed
    // annex header gets outvoted by its body neighbors and leaks into the
    // extracted spans (DocumentPipelineSpec pins this)
    ZoneModel.apply(hinted, model)
      .where(col("zone_pred") === "<body>")
      .select("conv_id", "turn_idx", "role", "tool", "block_idx",
        "line_in_turn", "line_idx", "line")
  }

  /** Stage-2 head shared by the document-mode paths: tokens → narrowed
   * FSM feature projection. */
  private def docBodyFeats(bodyLines: DataFrame): DataFrame =
    Features.body(Structure.tokensFromLines(bodyLines))
      .select("conv_id", "turn_idx", "line_in_turn", "tok_idx",
        "tok", "sep_before", "line_trailing", "f_capitalisation")

  /**
   * Chunk-parallel twin of [[extractDocuments]] — row-identical output
   * (DocumentChunkedSpec differential + the doc_chunked_diff oracle), for
   * document-mode corpora with GIANT single documents: stage-1 zoning runs
   * through [[Labeler.zonesContentChunked]] (and, on the modeled default,
   * [[ZoneModel.withFeaturesChunked]]), stage 2 through the established
   * chunk-parallel tail ([[Structure.tokensFromLinesChunked]] →
   * [[Labeler.bodyLabelsChunked]] → [[Assemble.bodySpansChunked]]). Same
   * artifact dispatch as [[extractDocuments]].
   */
  def extractDocumentsChunked(docs: DataFrame, chunkTurns: Int = 4096): DataFrame =
    ZoneModelArtifact.load(docs.sparkSession) match {
      case Some(model) => extractDocumentsModeledChunked(docs, model, chunkTurns)
      case None => extractDocumentsHeuristicChunked(docs, chunkTurns)
    }

  /** Chunk-parallel twin of [[extractDocumentsHeuristic]]. */
  def extractDocumentsHeuristicChunked(docs: DataFrame, chunkTurns: Int = 4096): DataFrame = {
    val turns = withNullRoleCols(docs)
    val bodyLines = Labeler.zonesContentChunked(
      Structure.keptLines(turns), chunkTurns)
      .where(col("zone") === "<body>")
      .select("conv_id", "turn_idx", "role", "tool", "block_idx",
        "line_in_turn", "line_idx", "line")
    documentChunkedTail(bodyLines, chunkTurns)
  }

  /** Chunk-parallel twin of [[extractDocumentsModeled]]. */
  def extractDocumentsModeledChunked(docs: DataFrame, model: ZoneModel.Model,
      chunkTurns: Int = 4096): DataFrame = {
    val turns = withNullRoleCols(docs)
    val hinted = Labeler.zonesContentChunked(Structure.keptLines(turns), chunkTurns)
      .withColumnRenamed("zone", "hint").drop("zone_label")
    // barrier after the model stage: its explode→join→window chain sits on
    // the stage-1 barrier and is consumed 2-3× per tail stage
    val bodyLines = Chunked.barrier(
      ZoneModel.apply(hinted, model, chunkTurns = Some(chunkTurns))
        .where(col("zone_pred") === "<body>")
        .select("conv_id", "turn_idx", "role", "tool", "block_idx",
          "line_in_turn", "line_idx", "line"))
    documentChunkedTail(bodyLines, chunkTurns)
  }

  /** Shared stage-2 of the chunked document modes — identical to
   * [[labeledBodyTokensChunked]] minus the transcript-mode zone filter. */
  private def documentChunkedTail(bodyLines: DataFrame, chunkTurns: Int): DataFrame = {
    val toks = Structure.tokensFromLinesChunked(bodyLines, chunkTurns)
    val feats = Features.scalars(toks)
      .select("conv_id", "turn_idx", "line_in_turn", "tok_idx",
        "tok", "sep_before", "line_trailing", "f_capitalisation")
    Assemble.bodySpansChunked(
      Labeler.bodyLabelsChunked(feats, chunkTurns), chunkTurns)
  }

  /**
   * Chunk-parallel twin of [[extract]] — row-identical output
   * (ChunkedPipelineSpec differential), for corpora where single
   * conversations are so large that one-task-per-conversation is the
   * bottleneck (the north rule's 10^12-turn regime with 10^9-turn
   * conversations). NO stage in this path partitions by conv_id alone:
   *
   *   - structuring windows are turn-grain already ([[Structure.lines]]);
   *   - zone selection's conversation-grain repetitive count becomes a
   *     two-level aggregate ([[Labeler.bodyLinesChunked]]);
   *   - the tokenizer's separator lags stitch across (conv_id, turn-chunk)
   *     boundaries ([[Structure.tokensFromLinesChunked]]);
   *   - the FSM's feature input is pure per-token scalars (the narrow
   *     projection [[extract]] relies on Catalyst to prune to);
   *   - the FSM itself runs as the prefix-composed parallel automaton
   *     ([[Labeler.bodyLabelsChunked]]);
   *   - span assembly's running segment count becomes a two-level scan
   *     ([[Assemble.bodySpansChunked]]), whose span groupBy merges
   *     boundary-straddling spans by construction.
   *
   * Cost vs [[extract]]: several narrow chunk-frame aggregates/joins and a
   * second FSM pass — keep [[extract]] (one exchange) for corpora whose
   * conversations are ordinarily sized; conv_id alone balances there.
   */
  def extractChunked(turns: DataFrame, chunkTurns: Int = 4096,
      materialize: Boolean = false): DataFrame = {
    // `materialize` caches the FSM output (and the FSM input, inside the
    // labeler) so downstream multi-scans never recompute. MEASURED
    // (ChunkBench, 2M-turn single conversation, 16 cores / 16g):
    // materialize=false runs at sequential parity (174s vs 168s) because
    // AQE stage reuse serves every repeated subtree from its shuffle
    // files, while materialize=true THRASHES the storage pool (379s) —
    // two full-frame localCheckpoints exceed a single JVM's storage
    // fraction and evict each other to disk. Default OFF: recompute is
    // near-free under shuffle reuse, caching risks the memory cliff; turn
    // it on only when executor storage comfortably fits ~2 copies of the
    // token frame. The resumable path ([[runResumable]] with chunkTurns)
    // sidesteps the tradeoff: its committed parquet stages make every
    // re-scan a column-pruned file read.
    val labeled0 = labeledBodyTokensChunked(turns, chunkTurns,
      materialize = materialize)
    val labeled = if (materialize) labeled0.localCheckpoint() else labeled0
    Assemble.bodySpansChunked(labeled, chunkTurns)
  }

  /** structure → zone → scalar features → parallel FSM, all chunk-keyed —
   * the giant-conversation twin of [[labeledBodyTokens]]. */
  def labeledBodyTokensChunked(turns: DataFrame, chunkTurns: Int,
      failures: Option[Lineage.PartitionStats] = None,
      materialize: Boolean = true): DataFrame = {
    val bodyLines = Labeler.bodyLinesChunked(Structure.keptLines(turns), chunkTurns)
      .select("conv_id", "turn_idx", "role", "tool", "block_idx",
        "line_in_turn", "line_idx", "line")
    val toks = Structure.tokensFromLinesChunked(bodyLines, chunkTurns)
    val feats = Features.scalars(toks)
      .select("conv_id", "turn_idx", "line_in_turn", "tok_idx",
        "tok", "sep_before", "line_trailing", "f_capitalisation")
    Labeler.bodyLabelsChunked(feats, chunkTurns, failures, materialize)
  }

  /** Declarative span assembly (windows + groupBy) over the labeled tokens —
   * output-identical to [[extract]] (differential-tested); kept as the
   * Catalyst-native reference path and for the driver's oracle queries. */
  def extractDeclarative(turns: DataFrame): DataFrame =
    Assemble.bodySpans(labeledBodyTokens(turns))

  /** structure → zone → body features, narrowed to the FSM's inputs, over
   * one exchange. */
  private def bodyTokenFeats(turns: DataFrame): DataFrame = {
    val lines = Structure.keptLines(graft.ops.Par.clusterBy(turns, "conv_id"))
    val zoned = Labeler.zones(Features.segmenter(lines))
    // F4: zone selection is a plain filter because labels are columns
    val bodyLines = zoned.where(col("zone") === "<body>")
      .select("conv_id", "turn_idx", "role", "tool", "block_idx",
        "line_in_turn", "line_idx", "line")
    val toks = Structure.tokensFromLines(bodyLines)
    Features.body(toks)
      // the FSM consumes a narrow projection; Catalyst prunes the unused
      // feature windows behind it (mapPartitions would otherwise pin all
      // 24 feature columns through the object boundary)
      .select("conv_id", "turn_idx", "line_in_turn", "tok_idx",
        "tok", "sep_before", "line_trailing", "f_capitalisation")
  }

  /** structure → zone → body features → FSM labels, over one exchange. */
  def labeledBodyTokens(turns: DataFrame,
      failures: Option[Lineage.PartitionStats] = None): DataFrame =
    Labeler.bodyLabels(bodyTokenFeats(turns), repartitionByConv = false, failures)

  /** Extraction result as one TEI document per conversation. */
  def extractTei(turns: DataFrame): DataFrame =
    Assemble.teiDocuments(extract(turns))

  /**
   * conv_id-salted repartition for turn-keyed stages (north rule): spreads a
   * giant conversation over `salt` partitions while keeping each turn whole.
   * Whole-conversation stages (the FSM, span groupBy) re-group on conv_id —
   * their inputs are already reduced to label/segment rows by then.
   */
  def saltedByTurn(df: DataFrame, partitions: Int, salt: Int = 16): DataFrame =
    df.repartition(partitions, col("conv_id"),
      pmod(hash(col("turn_idx")), lit(salt)))

  /**
   * Resumable run (north rule): each stage commits a parquet snapshot +
   * manifest through [[TableIO]]; a re-run skips committed stages, so a
   * killed job resumes from its last checkpoint with identical output.
   * Per-partition lineage rows (rows/bytes/parse failures) are committed
   * alongside each stage.
   *
   * `chunkTurns = Some(c)` runs both stages on the chunk-parallel path
   * (same rows, ChunkedPipelineSpec) for giant-conversation corpora; the
   * committed `labeled` table doubles as the materialization the in-memory
   * path gets from localCheckpoint, so span assembly's phantom-edge scan
   * re-reads column-pruned parquet instead of re-running the FSM.
   */
  def runResumable(turns: DataFrame, io: TableIO, runId: String = "r1",
      chunkTurns: Option[Int] = None): DataFrame = {
    val spark = turns.sparkSession

    val labeled = io.committedSnapshot("labeled") match {
      case Some(_) => io.read(spark, "labeled")
      case None =>
        val acc = Lineage.newTotals(spark, "labeled")
        val fails = Lineage.newStats(spark, "labeled_failures")
        val labeledDf = chunkTurns match {
          case Some(c) => labeledBodyTokensChunked(turns, c, Some(fails))
          case None => labeledBodyTokens(turns, Some(fails))
        }
        val out = Lineage.withPartitionLineage(
          labeledDf, acc, Seq("tok", "sep_before"))
        io.commit(out, "labeled", runId)
        io.commit(Lineage.lineageRows(spark, "labeled", acc,
          fails.value.map { case (p, (r, _)) => p -> r }), "lineage_labeled", runId)
        io.read(spark, "labeled")
    }

    io.committedSnapshot("spans") match {
      case Some(_) => io.read(spark, "spans")
      case None =>
        val acc = Lineage.newTotals(spark, "spans")
        val spansDf = chunkTurns match {
          case Some(c) => Assemble.bodySpansChunked(labeled, c)
          case None => Assemble.bodySpans(labeled)
        }
        val spans = Lineage.withPartitionLineage(spansDf, acc, Seq("text"))
        io.commit(spans, "spans", runId)
        io.commit(Lineage.lineageRows(spark, "spans", acc), "lineage_spans", runId)
        io.read(spark, "spans")
    }
  }

  /**
   * Incremental (offset-style) extraction over a snapshot-logged transcript
   * table: extract only the turns appended to `inStage` since the last run
   * and append the resulting spans to `outStage`. The consumed-offset store
   * IS the output table — each output snapshot is committed under the INPUT
   * snapshot id it consumed, so the output's committed id is the offset and
   * the whole step is one atomic commit (a crash before the manifest swap
   * re-runs the same batch; [[TableIO]]'s duplicate-id check makes an
   * accidental double-apply impossible). Exactly-once per input snapshot.
   *
   * Contract: input appends must be CONVERSATION-COMPLETE (a conversation
   * never spans two input snapshots — extraction state is per-conversation)
   * and the input must be append-only (an input overwrite restarts its
   * chain; reset the output table alongside it). Returns the number of
   * input snapshots consumed this call (0 = already caught up).
   */
  def extractIncremental(spark: org.apache.spark.sql.SparkSession,
      inIo: TableIO, outIo: TableIO,
      inStage: String = "transcripts", outStage: String = "spans"): Int = {
    val latest = inIo.committedSnapshot(inStage).getOrElse(
      throw new IllegalStateException(s"no committed input snapshot for $inStage"))
    val from = outIo.committedSnapshot(outStage)
    if (from.contains(latest)) return 0
    val newTurns = inIo.readIncremental(spark, inStage, from)
    val spans = extract(newTurns)
    if (from.isEmpty) outIo.commit(spans, outStage, latest)
    else outIo.commitAppend(spans, outStage, latest)
    inIo.history(inStage).takeWhile(m => !from.contains(m.id)).size
  }
}
