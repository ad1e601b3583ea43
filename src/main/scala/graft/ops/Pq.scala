package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Product quantization — the memory-compression half of billion-vector
 * ANN (the FAISS IVF-PQ role): split each d-dim embedding into `m`
 * subspaces of d/m dims, learn `k ≤ 256` sub-centroids per subspace, and
 * store each vector as `m` small codes (one byte each at k=256) instead
 * of d floats — a 4·d/m compression that turns a 3 TB float corpus into
 * the tens of gigabytes a scan-and-rank pass can actually stream.
 * Distances are answered from codes alone via ADC (asymmetric distance
 * computation): per query, an m×k lookup table of exact
 * query-slice-to-centroid distances; a corpus row costs m table lookups,
 * never a d-dim float read.
 *
 * Scale contracts: the codebook is m×k×(d/m) = d·k doubles — a bounded
 * single-row broadcast at any corpus size; [[encode]] is a pure
 * projection (zero exchanges); [[pqTopK]] broadcasts only queries (each
 * carrying its own lut) and ranks with one per-query window. Composes
 * with [[Similarity.cellAssignmentsTwoLevel]] for IVF-PQ: route by coarse
 * cell, store PQ codes per cell.
 *
 * Determinism/oracle discipline: sub-centroids are the hash-ordered
 * member sample (the [[Similarity]] `centroidsRow` rule) with DENSE codes
 * 0..k-1 in hash order; all distances are squared L2 rounded to 4dp
 * before any argmin/rank, ties broken on (code) / (neighbor id) — the
 * driver oracle replays everything closed-form in SQL.
 */
object Pq {

  /** Squared L2 between two array<double> columns (deterministic
   * left-to-right fold — no aggregation-order drift). Codegen'd kernel,
   * bit-identical to the `zip_with`+`aggregate` fold it replaces; also
   * evaluates as one JVM loop when nested inside HOF lambdas (encode /
   * queryLuts), where Catalyst interprets. */
  def dist2(a: Column, b: Column): Column =
    graft.functions.VecMath.dist2Col(a, b)

  private def subslice(v: Column, s: Column, w: Int): Column =
    slice(v, s * w + 1, lit(w))

  /** Embedding width from the first row (one tiny plan-time job). */
  private def dimOf(corpus: DataFrame, vecCol: String): Int =
    corpus.select(size(col(vecCol))).head(1).headOption
      .map(_.getInt(0)).getOrElse(0)

  /**
   * Train a PQ codebook: `(subspace, code, cv)` — for each of the `m`
   * subspaces, the d/m-dim slices of the same k hash-sampled corpus
   * vectors, codes dense 0..k-1 in hash order. One k-row sample feeds
   * every subspace; nothing corpus-sized moves.
   */
  def trainCodebook(corpus: DataFrame, m: Int, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(m >= 1, "m must be >= 1")
    require(k >= 1 && k <= 256, s"k must be in [1, 256] (byte codes), got $k")
    val d = dimOf(corpus, vecCol)
    require(d > 0 && d % m == 0, s"dim $d must be divisible by m=$m")
    val w = d / m
    val hashOrd = Seq(md5(col(idCol).cast("string")), col(idCol))
    corpus.orderBy(hashOrd: _*).limit(k)
      .select(col(idCol), col(vecCol).cast("array<double>").as("v"))
      // k rows only — the single-partition window is model-sized
      .withColumn("code", row_number().over(Window.orderBy(hashOrd: _*)) - 1)
      .select(col("code"), col("v"),
        explode(sequence(lit(0), lit(m - 1))).as("subspace"))
      .select(col("subspace"), col("code"),
        subslice(col("v"), col("subspace"), w).as("cv"))
  }

  /** Codebook re-aggregated into ONE broadcast row: per subspace the
   * code-ordered centroid list (so element_at(cvs, code+1) is the
   * centroid). */
  private def codebookRow(codebook: DataFrame): DataFrame =
    broadcast(codebook
      .groupBy("subspace")
      .agg(transform(array_sort(collect_list(struct(col("code"), col("cv")))),
        s => s.getField("cv")).as("cvs"))
      .agg(transform(array_sort(collect_list(struct(col("subspace"), col("cvs")))),
        s => s.getField("cvs")).as("cb")))

  /**
   * Encode the corpus: adds `codes` (array<int>, length m) — per
   * subspace the argmin-distance code (4dp-rounded, lower code on ties).
   * Pure projection over a broadcast codebook; the original vector column
   * is dropped (codes ARE the compressed representation).
   */
  def encode(corpus: DataFrame, codebook: DataFrame,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val m = size(col("cb"))
    val w = size(element_at(element_at(col("cb"), 1), 1))
    Par.spread(corpus).crossJoin(codebookRow(codebook))
      .select(col(idCol),
        transform(sequence(lit(0), m - 1), s =>
          get(array_sort(zip_with(
            element_at(col("cb"), s + 1),
            sequence(lit(0), size(element_at(col("cb"), s + 1)) - 1),
            (cv, code) => struct(
              round(dist2(slice(col(vecCol).cast("array<double>"),
                s * w + 1, w), cv), 4).as("d"),
              code.as("code")))), lit(0)).getField("code")).as("codes"))
  }

  /** Per-query ADC lookup tables: (query_id, lut) where
   * `lut[s][code] = round(||q_s − c_{s,code}||², 4)` — the broadcastable
   * query side of every ADC ranking ([[pqTopK]], IVF-PQ routing). Keeps
   * `extraCols` (e.g. the raw query vector for cell probing). */
  def queryLuts(queries: DataFrame, codebook: DataFrame,
      idCol: String = "vec_id", vecCol: String = "embedding",
      extraCols: Seq[Column] = Nil): DataFrame = {
    val m = size(col("cb"))
    val w = size(element_at(element_at(col("cb"), 1), 1))
    queries.crossJoin(codebookRow(codebook))
      .select((Seq(col(idCol).as("query_id"),
        transform(sequence(lit(0), m - 1), s =>
          transform(element_at(col("cb"), s + 1), cv =>
            round(dist2(slice(col(vecCol).cast("array<double>"),
              s * w + 1, w), cv), 4))).as("lut")) ++ extraCols): _*)
  }

  /** ADC scoring + per-query top-k over candidate rows
   * `(query_id, neighbor_id, codes, lut)`: `dist2` is the subspace-ordered
   * sum of table lookups, rank 1 = nearest, ties on neighbor id. */
  def adcRank(candidates: DataFrame, k: Int): DataFrame = {
    val scored = candidates.withColumn("dist2", round(aggregate(
      zip_with(col("lut"), col("codes"),
        (lutS, code) => element_at(lutS, code + 1)),
      lit(0.0), (acc, v) => acc + v), 4))
    val rw = Window.partitionBy("query_id")
      .orderBy(col("dist2"), col("neighbor_id"))
    scored.withColumn("rank", row_number().over(rw))
      .where(col("rank") <= k)
      .select("query_id", "neighbor_id", "dist2", "rank")
  }

  /**
   * ADC top-k: for each (small, broadcast) query, rank the ENCODED corpus
   * by the sum of per-subspace lookup-table distances — m lookups per
   * corpus row, no float vectors on the corpus side. Returns
   * (query_id, neighbor_id, dist2, rank), rank 1 = nearest.
   */
  def pqTopK(codes: DataFrame, queries: DataFrame, codebook: DataFrame,
      k: Int = 5, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val q = broadcast(queryLuts(queries, codebook, idCol, vecCol))
    adcRank(
      codes.select(col(idCol).as("neighbor_id"), col("codes"))
        .crossJoin(q)
        .where(col("neighbor_id") =!= col("query_id")),
      k)
  }
}
