package graft

import org.apache.spark.sql.functions._
import graft.ops.Pca

/** PCA: hand-computed basis on planted axis-aligned data, projection
 * values, and the live-data invariants frame. */
class PcaSpec extends SparkSpec {
  import spark.implicits._

  // mean 0, cov = diag(4, 1, 0, 0): principal axes are e1 then e2
  private def planted = Seq(
    (0L, Array(2f, 1f, 0f, 0f)), (1L, Array(2f, -1f, 0f, 0f)),
    (2L, Array(-2f, 1f, 0f, 0f)), (3L, Array(-2f, -1f, 0f, 0f)))
    .toDF("vec_id", "embedding")

  test("ragged embedding widths fail loudly, not with a skewed covariance") {
    val ragged = Seq(
      (0L, Array(1f, 2f)), (1L, Array(1f, 2f, 3f)), (2L, Array(4f, 5f)))
      .toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] { Pca.fit(ragged, k = 1) }
    assert(e.getMessage.contains("ragged"), e.getMessage)
  }

  test("fit recovers the planted axes with canonical signs") {
    val m = Pca.fit(planted, k = 2)
    assert(m.mean.forall(math.abs(_) < 1e-12))
    assert(math.abs(m.eigenvalues(0) - 4.0) < 1e-9)
    assert(math.abs(m.eigenvalues(1) - 1.0) < 1e-9)
    def close(a: Array[Double], b: Array[Double]) =
      a.zip(b).forall { case (x, y) => math.abs(x - y) < 1e-9 }
    assert(close(m.components(0), Array(1.0, 0, 0, 0)),
      m.components(0).mkString(","))
    assert(close(m.components(1), Array(0, 1.0, 0, 0)))
  }

  test("projection yields the planted coordinates") {
    val m = Pca.fit(planted, k = 2)
    val proj = Pca.transformCorpus(planted, m)
      .select(col("vec_id"), col("proj")).as[(Long, Seq[Double])]
      .collect().toMap
    assert(proj(0L).zip(Seq(2.0, 1.0)).forall(p => math.abs(p._1 - p._2) < 1e-9))
    assert(proj(3L).zip(Seq(-2.0, -1.0)).forall(p => math.abs(p._1 - p._2) < 1e-9))
  }

  test("invariants hold on the synthetic embeddings table") {
    val emb = (0L until 200L).map { i =>
      val rnd = new scala.util.Random(i)
      (i, Array.fill(16)(rnd.nextGaussian().toFloat * (1 + (i % 4))))
    }.toDF("vec_id", "embedding")
    val inv = Pca.invariants(emb, k = 6).collect()(0)
    assert(inv.getBoolean(0), "orthonormal")
    assert(inv.getBoolean(1), "eigen_ordered")
    assert(inv.getBoolean(2), "variance_matches")
  }
}
