package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Similarity search over an embedding column (`array<float>`).
 *
 *  - bruteForceTopK: exact baseline — broadcast the (small) query set, one
 *    pass over the corpus, per-query top-k via window. At 100 TB the corpus
 *    side stays partition-parallel; only queries are broadcast.
 *  - signRandomProjection / lshTopK: the scale path — P deterministic
 *    hyperplanes (md5-derived, no RNG state) → P-bit bucket; candidates
 *    share a bucket, exact re-rank inside. Recall tunable via multi-probe
 *    (hamming-1 neighbors).
 *
 * Dot products run through `zip_with`+`aggregate` in double precision —
 * pure Catalyst, no UDF.
 */
object Similarity {

  /** Cosine similarity of two array<float> columns, computed in double. */
  def cosine(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column): Column =
      aggregate(zip_with(x, y, (p, q) => p.cast("double") * q.cast("double")),
        lit(0.0), (acc, v) => acc + v)
    def norm(x: Column): Column =
      sqrt(aggregate(x, lit(0.0), (acc, v) => acc + v.cast("double") * v.cast("double")))
    dot(a, b) / (norm(a) * norm(b))
  }

  /**
   * Exact top-k cosine neighbors of each query vector (excluding itself).
   * `queries` is expected small (broadcast side).
   */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int = 5,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("qv")))
    val scored = Par.spread(corpus).select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
      .crossJoin(q)
      .where(col("neighbor_id") =!= col("query_id"))
      .withColumn("cosine", round(cosine(col("qv"), col("cv")), 4))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "neighbor_id", "cosine", "rank")
  }

  /** Deterministic pseudo-random hyperplane component for (plane p, dim d):
   * uniform in [-1,1), derived from md5 — reproducible everywhere. */
  private def planeComponent(p: Int, d: Column): Column =
    (conv(substring(md5(concat(lit(p), lit("#"), d)), 1, 6), 16, 10).cast("double")
      / lit((1 << 24).toDouble)) * 2.0 - 1.0

  /** Same value computed driver-side (identical md5-derived bytes) so plane
   * vectors become plan-time literals instead of per-row md5 calls. */
  private def planeValue(p: Int, d: Int): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"$p#$d".getBytes("UTF-8")).map("%02x".format(_)).mkString
    (java.lang.Long.parseLong(hex.substring(0, 6), 16).toDouble / (1 << 24)) * 2.0 - 1.0
  }

  /** P-bit sign-random-projection bucket id for an embedding column.
   * `dim > 0` precomputes the P plane vectors as literals (the md5s depend
   * only on (plane, dim) — without this every row re-derives planes·dim
   * hashes); `dim = 0` falls back to the in-plan derivation. */
  def srpBucket(vec: Column, planes: Int = 8, dim: Int = 0): Column = {
    val bits = (0 until planes).map { p =>
      val dotp =
        if (dim > 0)
          aggregate(
            zip_with(vec, array((0 until dim).map(d => lit(planeValue(p, d))): _*),
              (v, w) => v.cast("double") * w),
            lit(0.0), (acc, v) => acc + v)
        else
          aggregate(
            zip_with(vec, sequence(lit(0), size(vec) - 1),
              (v, i) => v.cast("double") * planeComponent(p, i)),
            lit(0.0), (acc, v) => acc + v)
      when(dotp >= 0, 1 << p).otherwise(0)
    }
    bits.reduce(_ + _).cast("int")
  }

  /** Embedding width, read once from the first corpus row (plan-time cost:
   * one tiny job) so srpBucket can use literal plane vectors. */
  private def dimOf(corpus: DataFrame, vecCol: String): Int =
    corpus.select(size(col(vecCol))).head(1).headOption.map(_.getInt(0)).getOrElse(0)

  /**
   * ANN via SRP-LSH: bucket both sides, candidates share a bucket, exact
   * cosine re-rank per query, top-k. The bucket join replaces the cross
   * join — at 10^9 vectors with 8 planes the expected candidate set shrinks
   * ~256×; increase `planes` with corpus size.
   */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int = 5, planes: Int = 8,
      idCol: String = "vec_id", vecCol: String = "embedding",
      multiProbe: Boolean = false): DataFrame = {
    val dim = dimOf(corpus, vecCol)
    val c = Par.spread(corpus).select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
      srpBucket(col(vecCol), planes, dim).as("bucket"))
    // multi-probe: a query also searches every hamming-1 neighbor bucket
    // (one flipped plane bit) — planes+1 probes, recall up at the cost of
    // ~planes× more candidate pairs; corpus side is untouched
    val qBucket = srpBucket(col(vecCol), planes, dim)
    val probeBuckets =
      if (!multiProbe) array(qBucket)
      else array((qBucket +: (0 until planes).map(p =>
        qBucket.bitwiseXOR(lit(1 << p)))): _*)
    val q = broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      explode(probeBuckets).as("bucket")))
    val scored = c.join(q, Seq("bucket"))
      .where(col("neighbor_id") =!= col("query_id"))
      .withColumn("cosine", round(cosine(col("qv"), col("cv")), 4))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "neighbor_id", "cosine", "rank")
  }

  /**
   * IVF-flat ANN (the second scale path besides SRP-LSH): centroids are a
   * deterministic sample of the corpus (`vec_id % centroidStride == 0` —
   * an oracle-expressible stand-in for k-means training), every vector is
   * assigned to its best cell, and each query probes its `nProbe` best
   * cells with exact re-ranking inside.
   *
   * Scale shape: the centroid table is tiny (≤ a few thousand rows at any
   * corpus size — it is collected once and embedded as literals), so cell
   * assignment is a pure per-row expression: NO shuffle to build the
   * inverted file, one (cell)-keyed join corpus-side to search. Assignment
   * cosines are rounded to 4dp with cell-id tie-breaks so the partitioning
   * is deterministic and engine-independent (DuckDB-checkable).
   */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int = 5,
      centroidStride: Long = 100, nProbe: Int = 2,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    // centroid cells: (cell_id = centroid vec_id, centroid vector literal)
    val cents: Array[(Long, Array[Double])] = corpus
      .where(pmod(col(idCol), lit(centroidStride)) === 0)
      .select(col(idCol).cast("long"), col(vecCol).cast("array<double>"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1)

    // best = max over struct(cosine4, cell_id): highest cosine, tie → higher id
    def bestCells(vec: Column, n: Int): Column = {
      val scored = cents.map { case (cid, cv) =>
        val cvCol = array(cv.map(lit): _*)
        struct(round(cosine(vec, cvCol), 4).as("c"), lit(cid).as("cell"))
      }
      slice(reverse(array_sort(array(scored: _*))), 1, n)
    }

    val assigned = Par.spread(corpus).select(
      col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
      element_at(bestCells(col(vecCol), 1), 1).getField("cell").as("cell"))
    val probes = broadcast(queries.select(
      col(idCol).as("query_id"), col(vecCol).as("qv"),
      explode(transform(bestCells(col(vecCol), nProbe), s => s.getField("cell")))
        .as("cell")))
    val scored = assigned.join(probes, Seq("cell"))
      .where(col("neighbor_id") =!= col("query_id"))
      .withColumn("cosine", round(cosine(col("qv"), col("cv")), 4))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "neighbor_id", "cosine", "rank")
  }

  /** Embedding-cosine near-duplicate pairs above a threshold, via SRP
   * buckets (a < b ordering, exact cosine verification inside buckets). */
  def cosineNearDups(corpus: DataFrame, threshold: Double = 0.95, planes: Int = 8,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val b = Par.spread(corpus).select(col(idCol), col(vecCol),
      srpBucket(col(vecCol), planes, dimOf(corpus, vecCol)).as("bucket"))
    val l = b.select(col(idCol).as("a"), col(vecCol).as("va"), col("bucket"))
    val r = b.select(col(idCol).as("b"), col(vecCol).as("vb"), col("bucket"))
    l.join(r, Seq("bucket")).where(col("a") < col("b"))
      .withColumn("cosine", round(cosine(col("va"), col("vb")), 4))
      .where(col("cosine") >= threshold)
      .select("a", "b", "cosine").distinct()
  }
}
