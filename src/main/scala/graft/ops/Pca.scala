package graft.ops

import breeze.linalg.{eigSym, DenseMatrix, DenseVector}

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * PCA for embedding columns — the dimensionality-reduction / whitening
 * stage an embedding pipeline runs before coarse quantization (IVF/OPQ)
 * or visualization.
 *
 * Scale shape: the corpus contributes ONE map-side-combinable aggregation
 * — (i, j) moment cells from a double posexplode, so the shuffle carries
 * `partitions × d²` partial sums, never rows. The d×d eigendecomposition
 * is driver-side breeze over that model-sized matrix (d is the embedding
 * width — tiny; the corpus never moves), and projection broadcasts the
 * k×d basis back as ONE literal-free crossJoin row feeding a codegen'd
 * dot-product projection. Eigenvector signs are canonicalized (largest-
 * magnitude component positive) so the basis is deterministic.
 */
object Pca {

  /** Trained PCA basis. `components(k)(d)` are unit rows sorted by
   * descending eigenvalue; `mean` is the corpus mean. */
  final case class Model(mean: Array[Double], components: Array[Array[Double]],
      eigenvalues: Array[Double])

  /**
   * Fit a k-component PCA: one corpus aggregation for first/second moments
   * (map-side combinable; shuffle volume `partitions × d²`), then a
   * driver-side `eigSym` of the d×d covariance.
   */
  def fit(corpus: DataFrame, k: Int, vecCol: String = "embedding"): Model = {
    val v = col(vecCol).cast("array<double>")
    val cells = Par.spread(corpus)
      .select(posexplode(v).as(Seq("i", "xi")), v.as("w"))
      .select(col("i"), col("xi"), posexplode(col("w")).as(Seq("j", "xj")))
      .groupBy("i", "j")
      .agg(sum(col("xi") * col("xj")).as("sxx"), sum(col("xi")).as("sx"),
        count(lit(1)).as("n"))
      .collect()
    require(cells.nonEmpty, "PCA fit on an empty corpus")
    val d = math.sqrt(cells.length.toDouble).round.toInt
    // ragged/null-width vectors would skew the covariance silently: with a
    // uniform width every (i,j) cell sees every vector exactly once, so
    // d*d == #cells and all per-cell counts agree — fail loudly otherwise
    require(d.toLong * d == cells.length,
      s"ragged embedding widths: ${cells.length} moment cells is not a square")
    val counts = cells.iterator.map(_.getLong(4)).toSet
    require(counts.size == 1,
      s"ragged embedding widths: per-cell counts differ (${counts.toSeq.sorted.take(5)}…)")
    val n = cells.head.getLong(4).toDouble
    val mean = new Array[Double](d)
    val cov = DenseMatrix.zeros[Double](d, d)
    cells.foreach { r =>
      if (r.getInt(1) == 0) mean(r.getInt(0)) = r.getDouble(3) / n
    }
    cells.foreach { r =>
      val (i, j) = (r.getInt(0), r.getInt(1))
      cov(i, j) = r.getDouble(2) / n - mean(i) * mean(j)
    }
    val es = eigSym(cov)
    // descending eigenvalue order; canonical sign = largest-|component| > 0
    val order = es.eigenvalues.toArray.zipWithIndex.sortBy(-_._1).take(k)
    val comps = order.map { case (_, idx) =>
      val vec = es.eigenvectors(::, idx).toArray
      val pivot = vec.maxBy(math.abs)
      if (pivot < 0) vec.map(-_) else vec
    }
    Model(mean, comps, order.map(_._1))
  }

  /** Project the corpus onto a fitted basis: adds `proj` (k doubles) in one
   * codegen'd projection — the mean and basis ride a single broadcast row,
   * never plan literals. */
  def transformCorpus(corpus: DataFrame, model: Model,
      vecCol: String = "embedding"): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val basis = broadcast(Seq((model.mean, model.components))
      .toDF("pca_mean", "pca_comps"))
    corpus.crossJoin(basis)
      .withColumn("proj", transform(col("pca_comps"), row =>
        graft.functions.VecMath.dotCol(
          zip_with(col(vecCol).cast("array<double>"), col("pca_mean"),
            (x, m) => x - m), row)))
      .drop("pca_mean", "pca_comps")
  }

  /**
   * Self-check frame for the driver oracle (the constant-row pattern):
   * one row of booleans asserting the fitted basis is orthonormal, the
   * eigenvalue order is non-increasing, and the per-component projected
   * variance equals its eigenvalue — all computed from live data, so any
   * drift in the moment aggregation or the projection breaks the oracle.
   */
  def invariants(corpus: DataFrame, k: Int,
      vecCol: String = "embedding"): DataFrame = {
    val model = fit(corpus, k, vecCol)
    val d = model.mean.length
    val dots = for (a <- 0 until k; b <- 0 until k) yield {
      val s = (0 until d).map(i => model.components(a)(i) * model.components(b)(i)).sum
      math.abs(s - (if (a == b) 1.0 else 0.0))
    }
    val orthonormal = dots.max < 1e-8
    val ordered = model.eigenvalues.sliding(2).forall {
      case Array(x, y) => x >= y - 1e-12
      case _           => true
    }
    val projected = transformCorpus(corpus, model, vecCol)
    val varRow = projected
      .select((0 until k).map(i =>
        variance(element_at(col("proj"), i + 1)).as(s"v$i")): _*)
      .collect()(0)
    // sample variance vs population eigenvalue: rescale by (n-1)/n
    val n = corpus.count().toDouble
    val varsMatch = (0 until k).forall { i =>
      val sampleVar = varRow.getDouble(i) * (n - 1) / n
      math.abs(sampleVar - model.eigenvalues(i)) <=
        1e-6 * math.max(1.0, math.abs(model.eigenvalues(i)))
    }
    val spark = corpus.sparkSession
    import spark.implicits._
    Seq((orthonormal, ordered, varsMatch))
      .toDF("orthonormal", "eigen_ordered", "variance_matches")
  }
}
