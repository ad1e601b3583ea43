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

  /** Cosine similarity of two array<float> columns, computed in double.
   * Runs on the codegen'd [[graft.functions.VecMath]] kernels (one JVM
   * loop per row) — bit-identical to the interpreted `zip_with`+
   * `aggregate` fold it replaces, ~100× cheaper per row. */
  def cosine(a: Column, b: Column): Column = {
    import graft.functions.VecMath
    VecMath.dotCol(a, b) / (VecMath.normCol(a) * VecMath.normCol(b))
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

  /** Plane id for (table t, plane p): table 0 keeps ids 0..planes-1 so the
   * single-table form is unchanged; further tables draw fresh hyperplanes. */
  private def planeId(table: Int, p: Int): Int = table * 100 + p

  /** P-bit sign-random-projection bucket id for an embedding column.
   * `dim > 0` precomputes the P plane vectors as literals (the md5s depend
   * only on (plane, dim) — without this every row re-derives planes·dim
   * hashes); `dim = 0` falls back to the in-plan derivation. `table` selects
   * an independent hyperplane set (OR-amplification across tables). */
  def srpBucket(vec: Column, planes: Int = 8, dim: Int = 0, table: Int = 0): Column = {
    // planes > 31 would overflow the int bucket (1 << p), and planes > 99
    // would additionally collide plane ids across tables (stride 100 in
    // [[planeId]]), silently correlating the "independent" tables
    require(planes >= 1 && planes <= 31,
      s"planes must be in [1, 31] (int bucket width), got $planes")
    val bits = (0 until planes).map { p =>
      val pid = planeId(table, p)
      val dotp =
        if (dim > 0)
          graft.functions.VecMath.dotCol(vec,
            array((0 until dim).map(d => lit(planeValue(pid, d))): _*))
        else
          aggregate(
            zip_with(vec, sequence(lit(0), size(vec) - 1),
              (v, i) => v.cast("double") * planeComponent(pid, i)),
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
   *
   * Recall amplification, both OR-style:
   *  - `tables` > 1: L independent hyperplane sets (the minhash banding
   *    trick applied to SRP) — a neighbor is a candidate if it collides in
   *    ANY table. Corpus-side cost is L bucket rows per vector (explode),
   *    NOT L copies of the vector payload through the shuffle: candidates
   *    are deduped on (query, neighbor) before re-ranking.
   *  - `multiProbe`: each query additionally probes every hamming-1 bucket
   *    per table; corpus side is untouched.
   *
   * DEFAULT OPERATING POINT (planes = 6, tables = 8, multiProbe = true):
   * measured recall@5 = 0.91 vs brute force on the sf0.1 isotropic
   * benchmark embeddings — the adversarial case for SRP (no cluster
   * structure, concentrated cosines). The full recall-vs-knobs curve is
   * driver-pinned every round by the `sim_ann_recall` oracle; cheaper
   * points (8 planes, 1-4 tables) reach 0.6+ only on clustered
   * real-world embeddings (SimilaritySpec) and can be selected
   * explicitly when the corpus is known to cluster.
   */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int = 5, planes: Int = 6,
      idCol: String = "vec_id", vecCol: String = "embedding",
      multiProbe: Boolean = true, tables: Int = 8): DataFrame = {
    val dim = dimOf(corpus, vecCol)
    val cBuckets = array((0 until tables).map(t =>
      struct(lit(t).as("tbl"), srpBucket(col(vecCol), planes, dim, t).as("bucket"))): _*)
    val c = Par.spread(corpus)
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
        explode(cBuckets).as("tb"))
      .select(col("neighbor_id"), col("cv"),
        col("tb.tbl").as("tbl"), col("tb.bucket").as("bucket"))
    val qProbes = array((0 until tables).flatMap { t =>
      val qBucket = srpBucket(col(vecCol), planes, dim, t)
      val probes =
        if (!multiProbe) Seq(qBucket)
        else qBucket +: (0 until planes).map(p => qBucket.bitwiseXOR(lit(1 << p)))
      probes.map(b => struct(lit(t).as("tbl"), b.as("bucket")))
    }: _*)
    val q = broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      explode(qProbes).as("tb"))
      .select(col("query_id"), col("qv"),
        col("tb.tbl").as("tbl"), col("tb.bucket").as("bucket")))
    val joined = c.join(q, Seq("tbl", "bucket"))
      .where(col("neighbor_id") =!= col("query_id"))
    // dedup across tables BEFORE the cosine: one re-rank per candidate pair
    // (within one table a pair collides at most once — skip the shuffle)
    val cands = if (tables > 1) joined.dropDuplicates("query_id", "neighbor_id")
                else joined
    val scored = cands
      .withColumn("cosine", round(cosine(col("qv"), col("cv")), 4))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "neighbor_id", "cosine", "rank")
  }

  /**
   * IVF-flat ANN (the second scale path besides SRP-LSH): centroids are a
   * deterministic FIXED-BUDGET sample of the corpus (hash-ordered LIMIT —
   * an oracle-expressible stand-in for k-means‖ training), every vector is
   * assigned to its best cell, and each query probes its `nProbe` best
   * cells with exact re-ranking inside.
   *
   * Scale shape: the centroid set is bounded by `nCentroids` REGARDLESS of
   * corpus size and is never collected to the driver — it is aggregated
   * into a single array-of-structs row and broadcast (one tiny
   * BroadcastNestedLoopJoin), so cell assignment stays a pure per-row
   * expression: NO corpus-side shuffle to build the inverted file, one
   * (cell)-keyed broadcast join to search, executor memory bounded by
   * nCentroids·dim doubles. Assignment cosines are rounded to 4dp with
   * cell-id tie-breaks so the partitioning is deterministic and
   * engine-independent (DuckDB-checkable). An empty corpus yields an empty
   * centroid array and an empty (not erroring) result.
   *
   * DEFAULT OPERATING POINT (nProbe = 12 of 16 cells): measured recall@5
   * = 0.96 on the sf0.1 isotropic benchmark embeddings (nProbe 1/2/4/8 →
   * 0.26/0.41/0.60/0.82 — the `sim_ann_recall` oracle pins the curve).
   * Isotropic vectors are the worst case: with real clustered embeddings
   * a small nProbe/nCells ratio reaches the same recall at a fraction of
   * the scan — pass nProbe explicitly when the corpus is known to
   * cluster.
   */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int = 5,
      nCentroids: Int = 16, nProbe: Int = 12,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    ivfProbe(corpus, queries, k, nProbe,
      centroidsRow(corpus, nCentroids, idCol, vecCol), idCol, vecCol)

  /**
   * IVF top-k with a Lloyd-TRAINED coarse quantizer ([[kmeans]]) instead
   * of the hash-sample init — the production IVF shape: centroids follow
   * the data's density, so the same `nProbe` recovers more true
   * neighbors. Same probing plan as [[ivfTopK]]; only the broadcast
   * codebook differs.
   */
  def ivfTopKTrained(corpus: DataFrame, queries: DataFrame, k: Int = 5,
      nCentroids: Int = 16, iters: Int = 2, nProbe: Int = 2,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    ivfProbe(corpus, queries, k, nProbe,
      codebookRow(kmeans(corpus, nCentroids, iters, idCol, vecCol)),
      idCol, vecCol)

  /** A trained per-dimension codebook ([[kmeans]] output) re-aggregated
   * into the single broadcast `cents` row the probe plans expect. */
  private def codebookRow(codebook: DataFrame): DataFrame =
    broadcast(codebook
      .groupBy("cell")
      .agg(collect_list(struct(col("dim"), col("centroid_val"))).as("dm"))
      .select(col("cell"),
        transform(array_sort(col("dm")), s => s.getField("centroid_val")).as("cv"))
      .agg(collect_list(struct(col("cell"), col("cv"))).as("cents")))

  private def ivfProbe(corpus: DataFrame, queries: DataFrame, k: Int,
      nProbe: Int, centsRow: DataFrame,
      idCol: String, vecCol: String): DataFrame = {
    val assigned = Par.spread(corpus).crossJoin(centsRow).select(
      col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
      get(bestCells(col(vecCol), 1), lit(0)).getField("cell").as("cell"))
    val probes = broadcast(queries.crossJoin(centsRow).select(
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

  /** Bounded deterministic centroid frame, aggregated into ONE broadcast
   * row (never collected to the driver): a hash-ordered LIMIT sample —
   * the oracle-expressible stand-in for k-means‖ training shared by
   * [[ivfTopK]] and [[semDedupStarEdges]]. */
  private def centroidsRow(corpus: DataFrame, nCentroids: Int,
      idCol: String, vecCol: String): DataFrame = {
    val cents = corpus
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
      .limit(nCentroids)
      .select(col(idCol).cast("long").as("cell"),
        col(vecCol).cast("array<double>").as("cv"))
    // downstream sorts by (cosine, cell) so collect_list's order never matters
    broadcast(cents.agg(collect_list(struct(col("cell"), col("cv"))).as("cents")))
  }

  /** best = max over struct(cosine4, cell_id): highest cosine, tie → higher
   * id. Expects the [[centroidsRow]] `cents` column in scope. */
  private def bestCells(vec: Column, n: Int): Column =
    slice(reverse(array_sort(transform(col("cents"), c =>
      struct(round(cosine(vec, c.getField("cv")), 4).as("c"),
        c.getField("cell").as("cell"))))), 1, n)

  /** Every corpus vector with its best-centroid cell id — the clustering
   * half of semantic dedup, also usable as a corpus partitioner. */
  def cellAssignments(corpus: DataFrame, nCentroids: Int = 16,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    Par.spread(corpus).crossJoin(centroidsRow(corpus, nCentroids, idCol, vecCol))
      .select(col(idCol), col(vecCol),
        get(bestCells(col(vecCol), 1), lit(0)).getField("cell").as("cell"))

  /**
   * IVF-PQ top-k — the FAISS flagship composition, both scale devices at
   * once: vectors are ROUTED by IVF cell ([[cellAssignments]]' bounded
   * centroid broadcast) and STORED as PQ byte codes ([[Pq.encode]]);
   * each query probes its `nProbe` nearest cells and ADC-ranks only the
   * codes inside them — the corpus never ships floats, and the candidate
   * set shrinks by ~nCells/nProbe before any distance math. Exactly-
   * mirrorable: cells and ranks reuse the 4dp-rounded deterministic rules
   * of the component operators (the ivfpq_topk oracle replays all of it).
   */
  def ivfPqTopK(corpus: DataFrame, queries: DataFrame, k: Int = 5,
      nCells: Int = 16, nProbe: Int = 2, m: Int = 8, kCodes: Int = 16,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val cents = centroidsRow(corpus, nCells, idCol, vecCol)
    val cb = Pq.trainCodebook(corpus, m, kCodes, idCol, vecCol)
    val routed = Par.spread(corpus).crossJoin(cents)
      .select(col(idCol).as("neighbor_id"),
        get(bestCells(col(vecCol), 1), lit(0)).getField("cell").as("cell"))
      .join(Pq.encode(corpus, cb, idCol, vecCol)
        .withColumnRenamed(idCol, "neighbor_id"), Seq("neighbor_id"))
    val probes = broadcast(
      Pq.queryLuts(queries, cb, idCol, vecCol, extraCols = Seq(col(vecCol)))
        .crossJoin(cents)
        .select(col("query_id"), col("lut"),
          explode(transform(bestCells(col(vecCol), nProbe),
            s => s.getField("cell"))).as("cell")))
    Pq.adcRank(
      routed.join(probes, Seq("cell"))
        .where(col("neighbor_id") =!= col("query_id")),
      k)
  }

  /**
   * Two-level cell assignment — the documented 10⁹-vector growth path for
   * [[semDedupEdges]]/[[ivfTopK]], now built: one bounded broadcast of
   * `nCoarse` coarse centroids assigns every vector a coarse cell; FINE
   * centroids are a per-coarse-cell hash-ordered member sample (the same
   * deterministic rule as [[centroidsRow]]) carried on an
   * nCoarse-row frame and joined back BY `coarse_cell` — the fine codebook
   * never rides one broadcast row, so total centroid count scales as
   * nCoarse × nFinePerCell (past any single-broadcast budget) while
   * per-row work stays nFinePerCell × d. The fine-selection window
   * partitions by coarse cell (≈ N/nCoarse rows per task — level 1 is the
   * skew bound). With nCoarse = 1 this degenerates to EXACTLY
   * [[cellAssignments]]: SimilaritySpec pins the equality and the
   * sim_two_level_diff driver oracle re-pins it every round.
   * Output: (id, vec, coarse_cell, cell) — `cell` ids are globally unique
   * (they are member vec_ids).
   */
  def cellAssignmentsTwoLevel(corpus: DataFrame, nCoarse: Int,
      nFinePerCell: Int, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    // barrier: the fine-centroid selection and the join back both consume
    // the coarse assignment — share one lineage, one coarse pass
    val coarse = graft.extract.Chunked.barrier(
      cellAssignments(corpus, nCoarse, idCol, vecCol)
        .withColumnRenamed("cell", "coarse_cell"))
    val fine = twoLevelFine(coarse, nFinePerCell, idCol, vecCol)
    coarse.join(fine, Seq("coarse_cell"))
      .select(col(idCol), col(vecCol), col("coarse_cell"),
        get(bestCells(col(vecCol), 1), lit(0)).getField("cell").as("cell"))
  }

  /** Fine-centroid frame of the two-level scheme: per coarse cell, the
   * hash-ordered `nFinePerCell` member sample as a `cents` list — an
   * nCoarse-ROW distributed frame joined by `coarse_cell`, never a single
   * broadcast row (that is the whole point of the growth path). */
  private def twoLevelFine(coarse: DataFrame, nFinePerCell: Int,
      idCol: String, vecCol: String): DataFrame = {
    val w = Window.partitionBy("coarse_cell")
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    coarse
      .withColumn("_rk", row_number().over(w))
      .where(col("_rk") <= nFinePerCell)
      .groupBy("coarse_cell")
      .agg(collect_list(struct(col(idCol).cast("long").as("cell"),
        col(vecCol).cast("array<double>").as("cv"))).as("cents"))
  }

  /**
   * Two-level IVF-PQ top-k — [[ivfPqTopK]] with its routing stage swapped
   * for [[cellAssignmentsTwoLevel]], so the flagship ANN path has the
   * 10⁹-vector growth shape END-TO-END: the only single-row broadcast is
   * the `nCoarse` coarse centroids; fine centroids live on an nCoarse-row
   * frame joined by coarse cell (total centroid count nCoarse ×
   * nFinePerCell scales past any one-broadcast budget), and the corpus
   * side still ships only PQ byte codes. Queries probe `nProbeCoarse`
   * coarse cells, rank the fine centroids inside them by the SAME
   * (4dp cosine desc, cell desc) rule as [[bestCells]], take `nProbe`
   * fine cells, and ADC-rank the codes there. With nCoarse = 1 this is
   * EXACTLY [[ivfPqTopK]] (nCells = nFinePerCell) — pinned by the
   * sim_ivfpq_two_level_diff constant-empty oracle and SimilaritySpec.
   */
  def ivfPqTopKTwoLevel(corpus: DataFrame, queries: DataFrame, k: Int = 5,
      nCoarse: Int = 4, nFinePerCell: Int = 4, nProbe: Int = 2,
      m: Int = 8, kCodes: Int = 16, nProbeCoarse: Int = 1,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val cb = Pq.trainCodebook(corpus, m, kCodes, idCol, vecCol)
    val coarse = graft.extract.Chunked.barrier(
      cellAssignments(corpus, nCoarse, idCol, vecCol)
        .withColumnRenamed("cell", "coarse_cell"))
    val fine = twoLevelFine(coarse, nFinePerCell, idCol, vecCol)
    // corpus: two-level fine cell + PQ codes; floats never leave the scan
    val routed = coarse.join(fine, Seq("coarse_cell"))
      .select(col(idCol).as("neighbor_id"),
        get(bestCells(col(vecCol), 1), lit(0)).getField("cell").as("cell"))
      .join(Pq.encode(corpus, cb, idCol, vecCol)
        .withColumnRenamed(idCol, "neighbor_id"), Seq("neighbor_id"))
    // queries: coarse probe via the bounded coarse broadcast, then rank
    // the probed cells' fine centroids, then the ADC lookup tables
    val cents = centroidsRow(corpus, nCoarse, idCol, vecCol)
    val qCoarse = Pq.queryLuts(queries, cb, idCol, vecCol,
        extraCols = Seq(col(vecCol)))
      .crossJoin(cents)
      .select(col("query_id"), col("lut"), col(vecCol),
        explode(transform(bestCells(col(vecCol), nProbeCoarse),
          s => s.getField("cell"))).as("coarse_cell"))
    val qRanked = qCoarse.join(fine, Seq("coarse_cell"))
      .select(col("query_id"), col("lut"), col(vecCol),
        explode(col("cents")).as("c"))
      .select(col("query_id"), col("lut"),
        round(cosine(col(vecCol), col("c").getField("cv")), 4).as("c4"),
        col("c").getField("cell").as("cell"))
    val pw = Window.partitionBy("query_id")
      .orderBy(col("c4").desc, col("cell").desc)
    val probes = broadcast(qRanked
      .withColumn("_pr", row_number().over(pw))
      .where(col("_pr") <= nProbe)
      .select(col("query_id"), col("lut"), col("cell")))
    Pq.adcRank(
      routed.join(probes, Seq("cell"))
        .where(col("neighbor_id") =!= col("query_id")),
      k)
  }

  /**
   * Assign every corpus vector to its nearest centroid from a TRAINED
   * codebook (the per-dimension frame [[kmeans]] returns): the inference
   * half of k-means, one broadcast crossJoin, no shuffle on the corpus.
   * Output: (id, cell, cosine to the centroid, n_members of that cell).
   */
  def kmeansAssign(corpus: DataFrame, codebook: DataFrame,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val cents = broadcast(codebook
      .groupBy("cell")
      .agg(collect_list(struct(col("dim"), col("centroid_val"))).as("dm"),
        max(col("n_members")).as("n_members"))
      .select(col("cell"),
        transform(array_sort(col("dm")), s => s.getField("centroid_val")).as("cv"),
        col("n_members"))
      .agg(collect_list(struct(col("cell"), col("cv"), col("n_members")))
        .as("cbook")))
    Par.spread(corpus).crossJoin(cents).select(col(idCol), col(vecCol),
      get(slice(reverse(array_sort(transform(col("cbook"), c =>
        struct(round(cosine(col(vecCol), c.getField("cv")), 4).as("c"),
          c.getField("cell").as("cell"),
          c.getField("n_members").as("n_members"))))), 1, 1), lit(0)).as("best"))
      .select(col(idCol), col("best").getField("cell").as("cell"),
        col("best").getField("c").as("cosine"),
        col("best").getField("n_members").as("n_members"))
  }

  /**
   * Lloyd-refined spherical k-means over the embedding column: the
   * deterministic hash-sample init ([[cellAssignments]]' centroids), then
   * `iters` rounds of assign-to-best-cosine-centroid / recompute
   * per-dimension means. Each round is ONE narrow crossJoin against a
   * broadcast centroid row plus ONE (cell, dim)-grain shuffle with partial
   * aggregation — no driver collect anywhere; the refreshed centroids
   * re-aggregate into a single broadcast row (the [[centroidsRow]] shape).
   * Centroid components round to 6dp each iteration so distributed
   * float-sum ordering cannot drift the next round's assignments — the
   * device that keeps the DuckDB oracle in exact lockstep. Cells that lose
   * every member drop out (standard Lloyd). Returns per-dimension rows
   * (cell, dim, centroid_val, n_members) — the trained codebook for
   * [[ivfTopK]]-style probing or corpus partitioning.
   */
  def kmeans(corpus: DataFrame, nCentroids: Int = 8, iters: Int = 2,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    val spark = corpus.sparkSession
    import spark.implicits._
    val base = Par.spread(corpus)
      .select(col(vecCol).cast("array<double>").as("v"))
    var cents = centroidsRow(corpus, nCentroids, idCol, vecCol)
    var byDim: Array[(Long, Int, Double, Long)] = null
    for (_ <- 1 to iters) {
      val assigned = base.crossJoin(cents).select(
        get(bestCells(col("v"), 1), lit(0)).getField("cell").as("cell"),
        col("v"))
      // The k×d centroid frame is model-sized: COLLECT it each round (one
      // job) and rebuild the next round's broadcast row as a local
      // relation. This keeps every round's plan flat (the former per-round
      // plan barrier did too — without one, Catalyst analysis grows
      // combinatorially past ~10 rounds) while dropping the barrier
      // materialization + distributed re-aggregation + broadcast-build
      // jobs each round. All arithmetic (assignment cosines, 6dp-rounded
      // means) still runs in Spark expressions — the collect is pure data
      // movement, so centroids are bit-identical to the distributed form.
      byDim = assigned
        .select(col("cell"), posexplode(col("v")).as(Seq("dim", "x")))
        .groupBy("cell", "dim")
        .agg(round(avg(col("x")), 6).as("m"), count(lit(1)).as("n"))
        .collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getLong(3)))
      val cvs = byDim.groupBy(_._1).toSeq
        .map { case (cell, rows) =>
          (cell, rows.sortBy(_._2).map(_._3).toSeq) }
      cents = broadcast(cvs.toDF("cell", "cv")
        .agg(collect_list(struct(col("cell"), col("cv"))).as("cents")))
    }
    byDim.toSeq.toDF("cell", "dim", "centroid_val", "n_members")
  }

  /**
   * SemDeDup-style semantic near-duplicate edges: cluster by bounded
   * deterministic centroids, then verify ALL pairs within a cell (a < b,
   * cosine ≥ threshold). Unlike the SRP paths, cell membership is the
   * semantic neighborhood itself, so pairwise-inside-the-cluster is the
   * operator's actual contract (the published SemDeDup algorithm) — which
   * is exactly why `nCentroids` must SCALE WITH THE CORPUS (k ≈ N /
   * target-cell-size keeps cells bounded; the paper's 50k clusters for
   * 100M docs is this rule). `maxCell` is the guard rail: cells that
   * exceed it are excluded from pairwise verification rather than
   * detonating quadratically — the same discipline as
   * [[cosineNearDups]]'s `maxBucket`. Feed edges to
   * [[Dedup.components]] or use [[semDedupKeep]] directly.
   *
   * (At 10^9+-vector scale the single-row centroid broadcast stops
   * fitting; [[cellAssignmentsTwoLevel]] is that growth path — coarse
   * centroids then per-coarse-cell fine centroids, the fine codebook
   * joined by coarse cell instead of broadcast.)
   */
  def semDedupEdges(corpus: DataFrame, nCentroids: Int = 16,
      threshold: Double = 0.95, maxCell: Int = 1000,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val assigned = cellAssignments(corpus, nCentroids, idCol, vecCol)
      .withColumn("csz", count(lit(1)).over(Window.partitionBy("cell")))
      .where(col("csz") <= maxCell)
    val l = assigned.select(col(idCol).as("a"), col(vecCol).as("va"), col("cell"))
    val r = assigned.select(col(idCol).as("b"), col(vecCol).as("vb"), col("cell"))
    l.join(r, Seq("cell")).where(col("a") < col("b"))
      .withColumn("cosine", round(cosine(col("va"), col("vb")), 4))
      .where(col("cosine") >= threshold)
      .select("a", "b", "cosine")
  }

  /** The kept corpus after semantic dedup: the canonical (min-id) member
   * of every semantic-duplicate component survives, the rest drop. */
  def semDedupKeep(corpus: DataFrame, nCentroids: Int = 16,
      threshold: Double = 0.95, maxCell: Int = 1000,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    Dedup.keepCanonical(corpus,
      semDedupEdges(corpus, nCentroids, threshold, maxCell, idCol, vecCol), idCol)

  /** Embedding-cosine near-duplicate pairs above a threshold, via SRP
   * buckets (a < b ordering, exact cosine verification inside buckets).
   *
   * `maxBucket` caps the in-bucket all-pairs blowup — the same treatment
   * its MinHash twin [[Dedup.minhashCandidates]] has: a cluster of d
   * near-identical embeddings (boilerplate documents at 100 TB) lands in
   * ONE bucket and would emit d(d-1)/2 pairs (10^6 dups → 5·10^11 rows).
   * Buckets larger than the cap are dropped from pairwise verification;
   * anything feeding cluster resolution should use [[cosineStarEdges]]
   * (O(d) edges per bucket, same component connectivity). */
  def cosineNearDups(corpus: DataFrame, threshold: Double = 0.95, planes: Int = 8,
      idCol: String = "vec_id", vecCol: String = "embedding",
      maxBucket: Int = 1000): DataFrame = {
    val b = Par.spread(corpus).select(col(idCol), col(vecCol),
      srpBucket(col(vecCol), planes, dimOf(corpus, vecCol)).as("bucket"))
      .withColumn("bsz", count(lit(1)).over(Window.partitionBy("bucket")))
      .where(col("bsz") <= maxBucket)
    val l = b.select(col(idCol).as("a"), col(vecCol).as("va"), col("bucket"))
    val r = b.select(col(idCol).as("b"), col(vecCol).as("vb"), col("bucket"))
    l.join(r, Seq("bucket")).where(col("a") < col("b"))
      .withColumn("cosine", round(cosine(col("va"), col("vb")), 4))
      .where(col("cosine") >= threshold)
      .select("a", "b", "cosine").distinct()
  }

  /** Star-form near-duplicate candidate edges per SRP bucket: (a = min id
   * in bucket, b = every other member), cosine-verified per EDGE. A
   * d-member bucket emits at most d-1 edges — linear in duplicate-cluster
   * size — and connected components over the verified stars equal
   * components over verified all-pairs whenever the bucket is a true
   * near-dup cluster (every member is within threshold of every other, so
   * the hub edges alone keep the bucket connected). This is the feed for
   * [[Dedup.components]] at scale; [[cosineNearDups]] is for when the
   * pairs themselves (with cosines) are the product. */
  def cosineStarEdges(corpus: DataFrame, threshold: Double = 0.95, planes: Int = 8,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val b = Par.spread(corpus).select(col(idCol), col(vecCol),
      srpBucket(col(vecCol), planes, dimOf(corpus, vecCol)).as("bucket"))
    // hub id AND hub vector via one sorted window pass — no join back to
    // the corpus, so the only exchange is the bucket hash partitioning
    val w = Window.partitionBy("bucket").orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    b.withColumn("hub", first(col(idCol)).over(w))
      .withColumn("va", first(col(vecCol)).over(w))
      .where(col(idCol) =!= col("hub"))
      .withColumn("cosine", round(cosine(col("va"), col(vecCol)), 4))
      .where(col("cosine") >= threshold)
      .select(col("hub").as("a"), col(idCol).as("b"), col("cosine")).distinct()
  }

  /**
   * Exact fixed-point mean-pooling of embeddings per group — the passage →
   * document embedding rollup every retrieval/semantic-dedup pipeline runs
   * before indexing at document grain. Each component is quantized to
   * micro-units (`round(double(x)·10⁶)` as long) BEFORE summation, so the
   * group mean is integer arithmetic: deterministic under any row order or
   * partitioning, and exactly SQL-mirrorable — a float sum would drift
   * with reduction order on both engines. The mean is `floor(sum/n)` (a
   * double division, exact: micro-sums stay far below 2⁵³).
   *
   * One hash aggregate; the in-group fold is a bounded `collect_list` +
   * `zip_with` (group size = passages per document, never corpus-scale).
   * Output: (group_id, n_vecs, embedding_fp: array<long> micro-units).
   */
  def meanPoolFp(embeddings: DataFrame, group: Column, dim: Int,
      vecCol: String = "embedding"): DataFrame = {
    require(dim > 0, "dim must be positive")
    embeddings
      // null vectors contribute neither a sum term nor a count: without
      // this filter, collect_list drops the null _fp but count(lit(1))
      // still counts the row, deflating the mean (and diverging from the
      // SQL mirror, whose unnest skips null arrays entirely)
      .where(col(vecCol).isNotNull)
      .select(group.as("group_id"),
        transform(col(vecCol),
          x => round(x.cast("double") * 1000000).cast("long")).as("_fp"))
      .groupBy("group_id")
      .agg(count(lit(1)).as("n_vecs"), collect_list(col("_fp")).as("_l"))
      .selectExpr("group_id", "n_vecs",
        s"""transform(
           |  aggregate(_l, array_repeat(CAST(0 AS BIGINT), $dim),
           |            (acc, e) -> zip_with(acc, e, (a, x) -> a + x)),
           |  s -> CAST(floor(s * 1.0 / n_vecs) AS BIGINT)
           |) AS embedding_fp""".stripMargin)
  }

  /** Scalar-grain twin of [[meanPoolFp]]: one row per (group, component)
   * instead of an array column — (group_id, n_vecs, pos, component).
   *
   * This is also the better 100 TB shape: posexplode BEFORE the aggregate
   * turns the rollup into a plain `groupBy(group, pos).sum` with map-side
   * partial aggregation, so the shuffle carries only groups×dim partial
   * sums instead of every input vector riding a `collect_list` — and the
   * whole plan stays inside whole-stage codegen (no nested higher-order
   * lambdas, whose analysis/codegen alone dominated the array form's
   * small-input runtime). Same fixed-point rule (micro-unit quantization
   * before summation, mean = floor(sum/n)) and identical output to
   * [[meanPoolFp]] on the operator's input contract: non-null vectors of
   * uniform length (whole-null vectors are filtered identically by both).
   * Outside the contract they diverge by construction — a null ELEMENT
   * at position p poisons the array form's whole component p (the
   * zip_with sum propagates null) but is skipped by this form's sum(),
   * and ragged lengths give this form per-position n_vecs where the
   * array form keeps one group-level count. */
  def meanPoolFpScalar(embeddings: DataFrame, group: Column,
      vecCol: String = "embedding"): DataFrame =
    embeddings
      .where(col(vecCol).isNotNull)
      .select(group.as("group_id"),
        posexplode(col(vecCol)).as(Seq("pos", "_x")))
      .groupBy(col("group_id"), col("pos"))
      .agg(sum(round(col("_x").cast("double") * 1000000).cast("long"))
        .as("_sfp"), count(lit(1)).as("n_vecs"))
      .select(col("group_id"), col("n_vecs"),
        col("pos").cast("int").as("pos"),
        floor(col("_sfp").cast("double") / col("n_vecs")).cast("long")
          .as("component"))
}
