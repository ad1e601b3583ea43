package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Winnowing document fingerprints (Schleimer, Wilkerson, Aiken 2003 —
 * the MOSS algorithm): select the minimum k-gram hash from every window
 * of `w` consecutive hashes. The selected set is a LOCAL fingerprint —
 * any shared substring of length ≥ w + k − 1 characters between two
 * documents is guaranteed to surface a shared fingerprint, which neither
 * a whole-document hash ([[TextStats.fingerprint]]) nor word-shingle
 * MinHash ([[Dedup.minHashSignatures]]) guarantees at character grain.
 *
 * Hashes are the repo's md5-24-bit construction
 * (`('0x' || substr(md5(g),1,6))::INT` in SQL) so the DuckDB oracle
 * replays them exactly.
 *
 * Scale contract: fingerprinting is a pure per-row projection over bound
 * arrays (zero exchanges); [[candidatePairs]] is one map-side-combinable
 * fingerprint-grain aggregate with a per-fingerprint cap — the same
 * bounded-bucket shape as the LSH pair generator, so a boilerplate
 * fingerprint shared by 10⁶ documents cannot explode the join.
 */
object Winnow {

  /** Normalized character stream: lowercased, whitespace runs collapsed
   * to one space, trimmed — so formatting differences don't shift grams. */
  private def normChars(text: Column): Column =
    regexp_replace(lower(trim(coalesce(text, lit("")))), "\\s+", " ")

  /** 24-bit md5 hash of a gram (SQL-replayable). */
  private def hash24(g: Column): Column =
    conv(substring(md5(g), 1, 6), 16, 10).cast("int")

  /**
   * The winnowed fingerprint set of a text as a sorted distinct int
   * array: k-char grams → 24-bit hashes → min of every w-hash window →
   * distinct. Texts shorter than k chars fingerprint their whole
   * normalized form (one gram), mirroring [[Dedup.shingles]]' short-doc
   * convention.
   */
  def fingerprints(text: Column, k: Int = 8, w: Int = 4): Column = {
    require(k > 0 && w > 0, "k and w must be positive")
    Cols.bound(normChars(text)) { t =>
      val grams = when(length(t) < k, array(t))
        .otherwise(transform(sequence(lit(1), length(t) - (k - 1)),
          i => t.substr(i, lit(k))))
      Cols.bound(transform(grams, hash24(_))) { hs =>
        val mins = when(size(hs) < w, array(array_min(hs)))
          .otherwise(transform(sequence(lit(1), size(hs) - (w - 1)),
            i => array_min(slice(hs, i, lit(w)))))
        array_sort(array_distinct(mins))
      }
    }
  }

  /** One row per (id, fingerprint). */
  def docFingerprints(docs: DataFrame, k: Int = 8, w: Int = 4,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.select(col(idCol),
      explode(fingerprints(col(textCol), k, w)).as("fp"))

  /**
   * Candidate pairs (a &lt; b) sharing at least `minShared` fingerprints.
   * Per-fingerprint doc lists are capped at `maxBucket` (ORDER-FREE cap:
   * the smallest ids survive, deterministically) before pairing, so a
   * universal boilerplate fingerprint stays bounded.
   */
  def candidatePairs(docs: DataFrame, k: Int = 8, w: Int = 4,
      minShared: Int = 2, maxBucket: Int = 64, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val fps = docFingerprints(docs, k, w, idCol, textCol)
    val buckets = fps.groupBy("fp")
      .agg(slice(array_sort(collect_set(col(idCol))), 1, maxBucket).as("ids"))
      .where(size(col("ids")) >= 2)
    buckets
      .select(explode(expr(
        "flatten(transform(ids, (a, i) -> " +
          "transform(slice(ids, i + 2, size(ids)), b -> struct(a, b))))"))
        .as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(count(lit(1)).as("n_shared"))
      .where(col("n_shared") >= minShared)
  }
}
