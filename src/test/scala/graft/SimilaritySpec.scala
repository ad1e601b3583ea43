package graft

import org.apache.spark.sql.functions._
import graft.ops.Similarity

/**
 * Positive-path tests for the similarity operators with PLANTED structure —
 * the driver's oracle checks run on near-orthogonal synthetic embeddings
 * where "0 near-dups" is the correct (but weak) answer.
 */
class SimilaritySpec extends SparkSpec {

  /** 16-dim corpus: clusters of near-duplicates around 4 seed directions
   * plus lone vectors; all deterministic. */
  private def corpus() = {
    val sparkS = spark
    import sparkS.implicits._
    val rnd = new scala.util.Random(7)
    def unit(v: Array[Float]): Array[Float] = {
      val n = math.sqrt(v.map(x => x * x).sum).toFloat
      v.map(_ / n)
    }
    def randVec() = unit(Array.fill(16)(rnd.nextGaussian().toFloat))
    val seeds = Vector.fill(4)(randVec())
    val rows = Vector.newBuilder[(Long, Array[Float])]
    var id = 0L
    // 3 near-dups per seed (tiny perturbation => cosine ~0.999)
    seeds.foreach { s =>
      (0 until 3).foreach { _ =>
        rows += ((id, unit(s.map(x => x + 0.01f * rnd.nextGaussian().toFloat))))
        id += 1
      }
    }
    // 20 lone vectors
    (0 until 20).foreach { _ => rows += ((id, randVec())); id += 1 }
    rows.result().toDF("vec_id", "embedding")
  }

  test("cosineNearDups finds exactly the planted duplicate pairs") {
    val c = corpus()
    val pairs = Similarity.cosineNearDups(c, threshold = 0.98, planes = 6)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // each 3-cluster contributes up to 3 pairs; SRP bucketing may miss a
    // pair whose members straddle a plane, so require most but allow misses
    val planted = (0 until 4).flatMap { g =>
      val ids = (g * 3 until g * 3 + 3).map(_.toLong)
      for (a <- ids; b <- ids if a < b) yield (a, b)
    }.toSet
    assert(pairs.subsetOf(planted), s"false positives: ${pairs -- planted}")
    assert(pairs.size * 10 >= planted.size * 6,
      s"only ${pairs.size}/${planted.size} planted pairs found")
  }

  test("near-dup star edges are O(d) on a giant duplicate cluster; the " +
      "capped pairs form drops the oversized bucket") {
    val sparkS = spark
    import sparkS.implicits._
    // 1000 identical embeddings (one boilerplate doc duplicated 10^3 times)
    // plus a handful of distinct lones — all land in one SRP bucket
    val base = Array.fill(8)(0.5f)
    val rnd = new scala.util.Random(11)
    val rows = (0 until 1000).map(i => (i.toLong, base)) ++
      (1000 until 1010).map(i => (i.toLong,
        Array.fill(8)(rnd.nextGaussian().toFloat)))
    val c = rows.toDF("vec_id", "embedding")
    val stars = Similarity.cosineStarEdges(c, threshold = 0.98, planes = 4)
      .collect()
    // O(d): the 1000-dup cluster contributes exactly d-1 = 999 hub edges,
    // never the d(d-1)/2 ≈ 5*10^5 all-pairs blowup
    assert(stars.length < 1100,
      s"star edges not O(d): ${stars.length} rows for a 1000-dup cluster")
    assert(stars.count(r => r.getLong(0) == 0L) == 999,
      "every duplicate should link to the bucket hub (id 0)")
    // connectivity preserved: components over stars = one cluster of 1000
    val comp = graft.ops.Dedup.components(
      Similarity.cosineStarEdges(c, threshold = 0.98, planes = 4)
        .select("a", "b"))
    assert(comp.where(col("cluster_id") === 0L).count() == 1000)
    // the capped all-pairs form refuses the oversized bucket entirely
    val capped = Similarity.cosineNearDups(c, threshold = 0.98, planes = 4,
      maxBucket = 100)
    assert(capped.where(col("a") < 1000 && col("b") < 1000).isEmpty,
      "maxBucket must drop the 1000-dup bucket from pairwise verification")
  }

  test("brute-force top-k ranks a planted duplicate first") {
    val c = corpus()
    val q = c.where(col("vec_id") === 0L)
    val top = Similarity.bruteForceTopK(c, q, k = 3)
      .orderBy(desc("cosine")).collect()
    // vec 0's nearest non-self neighbors are its cluster mates 1 and 2
    val neighbors = top.map(_.getAs[Long]("neighbor_id")).toSet
    assert(Set(1L, 2L).subsetOf(neighbors - 0L) || neighbors.contains(1L),
      s"expected cluster mates in top-3, got ${neighbors.mkString(",")}")
  }

  test("IVF top-k agrees with brute force on the planted clusters") {
    val c = corpus()
    val q = c.where(col("vec_id") < 4L)
    val exact = Similarity.bruteForceTopK(c, q, k = 3)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.ivfTopK(c, q, k = 3, nCentroids = 4, nProbe = 3)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact intersect ivf).size.toDouble / exact.size
    assert(recall >= 0.5, f"IVF recall too low: $recall%.2f")
  }

  /** recall@5 over the driver's sf0.01 bench embeddings — the everything-is-
   * deterministic pair (md5 planes/centroids, fixed parquet) makes these
   * floors exact regression guards, not flaky statistics. The embeddings
   * are near-random (top-5 cosine ≈ 0.37, no cluster structure), which is
   * the WORST case for ANN: the floors document measured quality at the
   * tuned parameters (LSH 4 planes × 16 tables ⇒ 0.82; IVF 16 cells,
   * 6 probes ⇒ 0.66). */
  private val benchEmbeddings = "/root/testdata/sf0.01/embeddings.parquet"

  private def benchRecall(ann: String): Double = {
    assume(java.nio.file.Files.exists(java.nio.file.Paths.get(benchEmbeddings)),
      "driver testdata not mounted")
    val e = spark.read.parquet(benchEmbeddings)
    val q = e.where(col("vec_id") < 10)
    val exact = Similarity.bruteForceTopK(e, q, k = 5)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = (ann match {
      case "lsh" => Similarity.lshTopK(e, q, k = 5, planes = 4, tables = 16)
      case "ivf" => Similarity.ivfTopK(e, q, k = 5, nCentroids = 16, nProbe = 6)
      case "ivf_trained" =>
        Similarity.ivfTopKTrained(e, q, k = 5, nCentroids = 16, iters = 2,
          nProbe = 6)
    }).select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    (exact intersect approx).size.toDouble / exact.size
  }

  test("multi-table SRP-LSH recall@5 on bench embeddings clears 0.6") {
    val r = benchRecall("lsh")
    assert(r >= 0.6, f"OR-amplified SRP recall@5 = $r%.2f < 0.6")
  }

  test("IVF recall@5 on bench embeddings clears 0.6") {
    val r = benchRecall("ivf")
    assert(r >= 0.6, f"IVF recall@5 = $r%.2f < 0.6")
  }

  test("Lloyd-trained IVF recall@5 is at least the hash-sample IVF's") {
    val trained = benchRecall("ivf_trained")
    val sampled = benchRecall("ivf")
    assert(trained >= 0.6, f"trained IVF recall@5 = $trained%.2f < 0.6")
    assert(trained >= sampled - 0.2,
      f"trained $trained%.2f far below sampled $sampled%.2f")
  }

  test("cellAssignments puts every vector in exactly one cell; twins share") {
    val c = corpus()
    val assigned = Similarity.cellAssignments(c, nCentroids = 4)
    assert(assigned.count() === c.count())
    // identical geometry ⇒ identical cell: members of a planted 3-cluster
    // sit within cosine 0.999 of each other — they must co-locate
    val cells = assigned.where(col("vec_id") < 12)
      .select("vec_id", "cell").collect()
      .map(r => (r.getLong(0) / 3, r.getLong(1))).groupBy(_._1)
    cells.foreach { case (g, rows) =>
      assert(rows.map(_._2).distinct.length === 1, s"cluster $g split cells")
    }
  }

  test("semDedup collapses planted twin clusters and keeps the lones") {
    val c = corpus() // ids 0-11: four 3-clusters; 12-31: lone vectors
    val edges = Similarity.semDedupEdges(c, nCentroids = 8, threshold = 0.98)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val planted = (0 until 4).flatMap { g =>
      val ids = (g * 3 until g * 3 + 3).map(_.toLong)
      for (a <- ids; b <- ids if a < b) yield (a, b)
    }.toSet
    // within-cell pairwise is exhaustive: every planted pair is found
    // (co-location proven above) and nothing else crosses 0.98
    assert(edges === planted)
    val kept = Similarity.semDedupKeep(c, nCentroids = 8, threshold = 0.98)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(kept === (Set(0L, 3L, 6L, 9L) ++ (12L until 32L)))
  }

  test("kmeans iteration 1 equals the mean of cellAssignments members") {
    val c = corpus()
    val got = Similarity.kmeans(c, nCentroids = 6, iters = 1)
      .select("cell", "dim", "centroid_val", "n_members")
      .collect().map(r => (r.getLong(0), r.getInt(1)) ->
        (r.getDouble(2), r.getLong(3))).toMap
    // independent recomputation: assignment op + per-dim average
    val want = Similarity.cellAssignments(c, nCentroids = 6)
      .select(col("cell"), posexplode(col("embedding").cast("array<double>"))
        .as(Seq("dim", "x")))
      .groupBy("cell", "dim")
      .agg(round(avg(col("x")), 6).as("m"), count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getInt(1)) ->
        (r.getDouble(2), r.getLong(3))).toMap
    assert(got === want)
    val members = got.collect { case ((_, 0), (_, n)) => n }.sum
    assert(members === c.count())
  }

  test("kmeans refinement is deterministic and tightens planted clusters") {
    val c = corpus()
    val a = Similarity.kmeans(c, nCentroids = 4, iters = 2).collect().toSet
    val b = Similarity.kmeans(c.repartition(5), nCentroids = 4, iters = 2)
      .collect().toSet
    assert(a === b)
    assert(a.map(_.getLong(0)).size <= 4) // cells can drop, never appear
  }

  test("kmeans runs 10 Lloyd rounds inside a time bound (per-round barrier)") {
    // before the per-iteration plan barrier, each round nested the whole
    // prior plan inside the next crossJoin — analysis cost exploded
    // combinatorially past ~10 rounds. 10 rounds must now plan + execute
    // comfortably; the bound is generous for VM noise but far below the
    // minutes-scale blowup this guards against.
    val c = corpus()
    val t0 = System.nanoTime()
    val got = Similarity.kmeans(c, nCentroids = 4, iters = 10).collect()
    val secs = (System.nanoTime() - t0) / 1e9
    assert(got.nonEmpty)
    assert(got.map(_.getLong(3)).sum % c.count() === 0) // n_members per dim
    assert(secs < 120.0, s"10-iteration kmeans took ${secs}s — plan blowup?")
  }

  test("kmeansAssign is the argmax over the trained codebook") {
    val c = corpus()
    val codebook = Similarity.kmeans(c, nCentroids = 4, iters = 2)
    val cents = codebook.collect()
      .groupBy(_.getLong(0))
      .map { case (cell, rows) =>
        cell -> rows.sortBy(_.getInt(1)).map(_.getDouble(2))
      }
    val vecs = c.collect().map(r =>
      r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map(p => p._1 * p._2).sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val got = Similarity.kmeansAssign(c, codebook)
      .select("vec_id", "cell", "cosine").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got.size === vecs.size)
    vecs.foreach { case (id, v) =>
      val best = cents.map { case (cell, cv) =>
        (math.rint(cos(v, cv) * 1e4) / 1e4, cell)
      }.maxBy(identity)
      assert(got(id) === ((best._2, best._1)), s"vec $id")
    }
  }

  test("two-level assignment: nCoarse=1 equals single-level; fine state bounded") {
    val c = corpus()
    // differential: with one coarse cell the fine sample IS centroidsRow's
    // global hash-ordered sample, so assignments must match exactly
    val single = Similarity.cellAssignments(c, nCentroids = 6)
      .select("vec_id", "cell").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val two = Similarity.cellAssignmentsTwoLevel(c, nCoarse = 1, nFinePerCell = 6)
      .select("vec_id", "cell").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(two === single)
    // bounded state at nCoarse > 1: the fine codebook frame is one row per
    // coarse cell with ≤ nFinePerCell centroids — never a corpus-sized or
    // all-centroids broadcast
    val multi = Similarity.cellAssignmentsTwoLevel(c, nCoarse = 4, nFinePerCell = 3)
    val got = multi.collect()
    assert(got.length === c.count())
    val byCoarse = got.groupBy(_.getLong(2))
    assert(byCoarse.keySet.size <= 4)
    byCoarse.foreach { case (cc, rows) =>
      val fineCells = rows.map(_.getLong(3)).toSet
      assert(fineCells.size <= 3, s"coarse $cc has ${fineCells.size} fine cells")
      // a fine cell id is a member of its own coarse cell
      assert(fineCells.subsetOf(rows.map(_.getLong(0)).toSet))
    }
  }

  test("two-level IVF-PQ: nCoarse=1 equals single-broadcast IVF-PQ; " +
      "multi-coarse output is a well-formed top-k") {
    val c = corpus()
    val q = c.where(org.apache.spark.sql.functions.col("vec_id") < 3)
    def key(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1),
        r.getDouble(2), r.getInt(3))).toSet
    val one = Similarity.ivfPqTopK(c, q, k = 3, nCells = 4, nProbe = 2,
      m = 4, kCodes = 8)
    val two = Similarity.ivfPqTopKTwoLevel(c, q, k = 3, nCoarse = 1,
      nFinePerCell = 4, nProbe = 2, m = 4, kCodes = 8)
    assert(key(two) === key(one))
    // multi-coarse: per query at most k rows, ranks dense from 1, sorted
    // by dist2, self excluded
    val multi = Similarity.ivfPqTopKTwoLevel(c, q, k = 3, nCoarse = 3,
      nFinePerCell = 2, nProbe = 2, m = 4, kCodes = 8, nProbeCoarse = 2)
      .collect().groupBy(_.getLong(0))
    assert(multi.nonEmpty)
    multi.foreach { case (qid, rows) =>
      assert(rows.length <= 3)
      assert(rows.map(_.getInt(3)).sorted.toSeq == (1 to rows.length))
      assert(!rows.exists(_.getLong(1) == qid))
      val byRank = rows.sortBy(_.getInt(3)).map(_.getDouble(2)).toSeq
      assert(byRank == byRank.sorted)
    }
  }

  test("semDedupEdges excludes cells over maxCell instead of exploding") {
    val sparkS = spark
    import sparkS.implicits._
    val base = Array.fill(8)(0.5f)
    val pile = (0L until 300L).map(i => (i, base)) // one giant identical pile
    val c = pile.toDF("vec_id", "embedding")
    val capped = Similarity.semDedupEdges(c, nCentroids = 2,
      threshold = 0.9, maxCell = 100)
    assert(capped.count() === 0L)
    val uncapped = Similarity.semDedupEdges(c, nCentroids = 2,
      threshold = 0.9, maxCell = 1000)
    assert(uncapped.count() === 300L * 299L / 2)
  }

  test("meanPoolFp is exact, order-independent, and floors negative means") {
    val sparkS = spark
    import sparkS.implicits._
    val e = Seq(
      (0L, Array(1.0f, -1.0f)), (1L, Array(2.0f, -0.000001f)),
      (10L, Array(-1.0f, 0.5f)), (11L, Array(-0.000001f, 0.5f)))
      .toDF("vec_id", "embedding")
    def pool(df: org.apache.spark.sql.DataFrame) =
      Similarity.meanPoolFp(df, expr("vec_id div 10"), dim = 2)
        .as[(Long, Long, Seq[Long])].collect().map(r => r._1 -> r).toMap
    val got = pool(e)
    // group 0: sums (3000000, -1000001) over 2 → (1500000, floor(-500000.5))
    assert(got(0L) === (0L, 2L, Seq(1500000L, -500001L)))
    // group 1: sums (-1000001, 1000000) over 2 → (floor(-500000.5), 500000)
    assert(got(1L) === (1L, 2L, Seq(-500001L, 500000L)))
    // order/partitioning independence: reversed, repartitioned input
    assert(pool(e.orderBy(col("vec_id").desc).repartition(5)) === got)
  }

  test("meanPoolFpScalar equals posexplode(meanPoolFp) and skips null vectors") {
    val sparkS = spark
    import sparkS.implicits._
    val e = Seq(
      (0L, Array(1.0f, -1.0f)), (1L, Array(2.0f, -0.000001f)),
      (10L, Array(-1.0f, 0.5f)), (11L, Array(-0.000001f, 0.5f)),
      (12L, null.asInstanceOf[Array[Float]])) // must not deflate group 1's mean
      .toDF("vec_id", "embedding")
    val viaArray = Similarity.meanPoolFp(e, expr("vec_id div 10"), dim = 2)
      .select(col("group_id"), col("n_vecs"),
        posexplode(col("embedding_fp")).as(Seq("pos", "component")))
      .select(col("group_id"), col("n_vecs"),
        col("pos").cast("int").as("pos"), col("component"))
      .as[(Long, Long, Int, Long)].collect().sorted
    val scalar = Similarity.meanPoolFpScalar(e, expr("vec_id div 10"))
      .as[(Long, Long, Int, Long)].collect().sorted
    assert(scalar === viaArray)
    assert(scalar.toSeq === Seq(
      (0L, 2L, 0, 1500000L), (0L, 2L, 1, -500001L),
      (1L, 2L, 0, -500001L), (1L, 2L, 1, 500000L)))
  }
}
