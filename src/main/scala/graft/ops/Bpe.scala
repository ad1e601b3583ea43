package graft.ops

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StringType}

/**
 * Byte-pair-encoding tokenizer: distributed training + encoding for LM
 * training-data preparation (the sentencepiece/GPT-2-trainer role).
 *
 * Scale contract (the whole point of the design):
 *  - Training never iterates over the corpus. ONE map-side-combinable
 *    word-count aggregation reduces 100 TB of text to a vocabulary-bounded
 *    word-frequency dictionary (`minCount` prunes the Zipf tail, `maxWords`
 *    caps the dict at a model-sized row count — the same bounded-collect
 *    discipline as [[graft.extract.ZoneModel]] training). The classic BPE
 *    merge loop then runs driver-side over that small dict — this is how
 *    real BPE trainers work (corpus scan once, merges from the dict), not a
 *    shortcut.
 *  - Encoding is a pure `mapPartitions` projection: merge ranks broadcast,
 *    no shuffle, with a per-partition word→tokens memo so the Zipf head is
 *    encoded once per task, not once per occurrence.
 *
 * Pre-tokenization: the text splits into maximal whitespace / non-whitespace
 * runs (`\s+|\S+`). Whitespace runs pass through as single literal tokens;
 * non-whitespace runs ("words") are BPE-encoded from code-point symbols up.
 * Hence `concat(tokens) == text` EXACTLY for arbitrary input — the
 * round-trip invariant the driver oracle pins (`bpe_roundtrip_diff`) — and
 * the word dictionary is SQL-mirrorable for the DuckDB oracle
 * (`bpe_word_counts`). Symbols are Unicode code points, never Java chars,
 * so astral-plane input (emoji) cannot split into broken surrogates.
 */
object Bpe {

  /** Maximal whitespace / non-whitespace runs, in order; concat == text. */
  def preTokens(text: Column): Column =
    regexp_extract_all(coalesce(text, lit("")), lit("\\s+|\\S+"), lit(0))

  /** EXACTLY the `\s` class Java and RE2/DuckDB regexes share — NOT
   * `Character.isWhitespace`, which disagrees on U+2028/U+001C (true) and
   * matches nothing extra the regex sees; using the regex class keeps
   * [[runsOf]] (executor) and [[preTokens]]/the DuckDB oracle (regex)
   * byte-identical on all input. */
  private[graft] def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  /** Split a string into whitespace / non-whitespace runs (driver/executor
   * twin of [[preTokens]]). */
  private[graft] def runsOf(text: String): Vector[String] = {
    if (text == null || text.isEmpty) return Vector.empty
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < text.length) {
      val ws = isWs(text.charAt(i))
      var j = i
      while (j < text.length && isWs(text.charAt(j)) == ws) j += 1
      out += text.substring(i, j)
      i = j
    }
    out.result()
  }

  /** A word as code-point symbols (surrogate-pair safe). */
  private[graft] def codePointSymbols(word: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < word.length) {
      val cp = word.codePointAt(i)
      out += new String(Character.toChars(cp))
      i += Character.charCount(cp)
    }
    out.result()
  }

  /**
   * The training dictionary: corpus word frequencies, `minCount`-pruned and
   * capped at the `maxWords` most frequent (total order: count desc, word —
   * deterministic across engines, so the cap is oracle-checkable). Plans as
   * one partial+final hash aggregate followed by TakeOrdered (a bounded
   * per-partition heap, NOT a global sort).
   */
  def wordCounts(docs: DataFrame, textCol: String = "text",
      minCount: Int = 2, maxWords: Int = 100000): DataFrame =
    docs.select(explode(filter(preTokens(col(textCol)),
        t => !t.rlike("^\\s"))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .where(col("cnt") >= minCount)
      .orderBy(col("cnt").desc, col("word"))
      .limit(maxWords)

  /**
   * Learn `nMerges` BPE merges from a word-frequency dict (driver-side —
   * the dict is bounded by construction, see the object doc). Pair counts
   * are weighted by word frequency; ties break on the lexicographically
   * smallest (left, right) pair so training is fully deterministic.
   * Stops early when no pair occurs twice.
   */
  def train(wordCounts: DataFrame, nMerges: Int): Seq[(String, String)] = {
    var words: Map[Vector[String], Long] =
      wordCounts.select(col("word"), col("cnt").cast("long")).collect()
        .map(r => codePointSymbols(r.getString(0)) -> r.getLong(1))
        .toMap
    val merges = Seq.newBuilder[(String, String)]
    var done = false
    var i = 0
    while (i < nMerges && !done) {
      val pairCounts = mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (syms, c) =>
        var k = 0
        while (k + 1 < syms.length) {
          val p = (syms(k), syms(k + 1))
          pairCounts.update(p, pairCounts.getOrElse(p, 0L) + c)
          k += 1
        }
      }
      // a merge seen once buys nothing; also the natural fixpoint
      val candidates = pairCounts.filter(_._2 >= 2)
      if (candidates.isEmpty) done = true
      else {
        val best = candidates.minBy { case ((l, r), c) => (-c, l, r) }._1
        merges += best
        words = words.map { case (syms, c) => mergePair(syms, best) -> c }
          .groupMapReduce(_._1)(_._2)(_ + _)
        i += 1
      }
    }
    merges.result()
  }

  /** Merge every non-overlapping occurrence of `pair`, left to right. */
  private[graft] def mergePair(syms: Vector[String],
      pair: (String, String)): Vector[String] = {
    val out = Vector.newBuilder[String]
    var k = 0
    while (k < syms.length) {
      if (k + 1 < syms.length && syms(k) == pair._1 && syms(k + 1) == pair._2) {
        out += syms(k) + syms(k + 1); k += 2
      } else { out += syms(k); k += 1 }
    }
    out.result()
  }

  /** Greedy BPE encode of one word: repeatedly apply the lowest-rank merge
   * present (the GPT-2 `bpe()` loop). */
  private[graft] def encodeWord(word: String,
      ranks: Map[(String, String), Int]): Vector[String] = {
    var syms = codePointSymbols(word)
    var continue = syms.length > 1
    while (continue) {
      var bestRank = Int.MaxValue
      var best: (String, String) = null
      var k = 0
      while (k + 1 < syms.length) {
        val r = ranks.getOrElse((syms(k), syms(k + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; best = (syms(k), syms(k + 1)) }
        k += 1
      }
      if (best == null) continue = false
      else {
        syms = mergePair(syms, best)
        if (syms.length < 2) continue = false
      }
    }
    syms
  }

  /**
   * Encode documents with a learned merge list: adds a `tokens`
   * array<string> column where `concat(tokens) == coalesce(text, '')`.
   * Pure mapPartitions over the input — no shuffle; merge ranks ride one
   * broadcast; the per-partition memo collapses repeated words (Zipf head)
   * to a single encode per task.
   */
  def encode(docs: DataFrame, merges: Seq[(String, String)],
      textCol: String = "text", memoMax: Int = 1 << 16): DataFrame = {
    val ranks = merges.iterator.zipWithIndex
      .map { case (p, i) => p -> i }.toMap
    val bc = docs.sparkSession.sparkContext.broadcast(ranks)
    val schema = docs.schema.add("tokens", ArrayType(StringType, containsNull = false))
    val idx = docs.schema.fieldIndex(textCol)
    docs.mapPartitions { it =>
      val memo = mutable.HashMap.empty[String, Vector[String]]
      val rk = bc.value
      it.map { r =>
        val text = if (r.isNullAt(idx)) "" else r.getString(idx)
        val toks = runsOf(text).flatMap { run =>
          if (isWs(run.charAt(0))) Vector(run)
          else memo.get(run).getOrElse {
            // only the INSERT is gated by the cap — a full memo must keep
            // serving the Zipf head it already holds, not bypass itself
            val enc = encodeWord(run, rk)
            if (memo.size < memoMax) memo.update(run, enc)
            enc
          }
        }
        Row.fromSeq(r.toSeq :+ toks)
      }
    }(org.apache.spark.sql.Encoders.row(schema))
  }

  /** Train on the corpus and encode it: the composed convenience. */
  def trainAndEncode(docs: DataFrame, nMerges: Int = 200,
      textCol: String = "text", minCount: Int = 2,
      maxWords: Int = 100000): DataFrame =
    encode(docs, train(wordCounts(docs, textCol, minCount, maxWords), nMerges),
      textCol)

  /** Persist a merge list as a parquet table (rank, left, right) — the
   * tokenizer artifact a production pipeline trains once and ships to
   * every downstream job. */
  def saveMerges(spark: org.apache.spark.sql.SparkSession,
      merges: Seq[(String, String)], path: String): Unit = {
    import spark.implicits._
    merges.zipWithIndex.map { case ((l, r), i) => (i, l, r) }
      .toDF("rank", "left", "right")
      .repartition(1).write.mode("overwrite").parquet(path)
  }

  /** Load a merge list saved by [[saveMerges]], rank order restored. */
  def loadMerges(spark: org.apache.spark.sql.SparkSession,
      path: String): Seq[(String, String)] =
    spark.read.parquet(path).orderBy("rank")
      .select("left", "right").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq

  /** Per-document token statistics of an encoded frame: token count and
   * the compression ratio vs code points (tokens per 100 code points). */
  def tokenStats(encoded: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    encoded.select(col(idCol), size(col("tokens")).as("n_tokens"),
      length(coalesce(col(textCol), lit(""))).as("n_chars"))
      .withColumn("tokens_per_100_chars",
        // exact-integer 2dp on the rational 100·tokens/chars; cast BEFORE
        // the ×100 — int·int arithmetic would wrap past ~21.4M tokens/doc
        when(col("n_chars") > 0,
          Cols.ratioDp(col("n_tokens").cast("long") * 100, col("n_chars"), 2))
          .otherwise(0.0))
}
