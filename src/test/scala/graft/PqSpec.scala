package graft

import org.apache.spark.sql.functions._
import graft.ops.Pq

/** Product quantization: codebook shape/determinism, self-encoding of
 * sampled vectors, ADC ranking quality vs exact L2, byte-code bound. */
class PqSpec extends SparkSpec {
  import spark.implicits._

  // 3 well-separated clusters in 8 dims (PQ with m=2: two 4-dim subspaces)
  private def corpus() = {
    val base = Map(
      0 -> Array(10f, 10f, 0f, 0f, 0f, 0f, 0f, 0f),
      1 -> Array(0f, 0f, 10f, 10f, 0f, 0f, 0f, 0f),
      2 -> Array(0f, 0f, 0f, 0f, 10f, 10f, 0f, 0f))
    (0L until 60L).map { i =>
      val c = base((i % 3).toInt)
      (i, c.zipWithIndex.map { case (v, d) =>
        v + ((i * 7 + d) % 5) * 0.1f // small deterministic jitter
      })
    }.toDF("vec_id", "embedding")
  }

  test("codebook: m*k rows, dense codes, d/m-wide slices, repartition-stable") {
    val c = corpus()
    val cb = Pq.trainCodebook(c, m = 2, k = 4)
    val rows = cb.collect()
    assert(rows.length === 8)
    assert(rows.map(r => (r.getInt(0), r.getInt(1))).toSet ===
      (for (s <- 0 until 2; k <- 0 until 4) yield (s, k)).toSet)
    assert(rows.forall(_.getSeq[Double](2).size === 4))
    val again = Pq.trainCodebook(c.repartition(7), m = 2, k = 4)
      .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getSeq[Double](2))).toMap
    rows.foreach { r =>
      assert(again((r.getInt(0), r.getInt(1))) === r.getSeq[Double](2))
    }
  }

  test("sampled vectors encode to themselves (zero distance per subspace)") {
    val c = corpus()
    val cb = Pq.trainCodebook(c, m = 2, k = 4)
    // reconstruct which vec each (subspace, code) slice came from
    val codeSlices = cb.collect()
      .map(r => (r.getInt(0), r.getSeq[Double](2)) -> r.getInt(1)).toMap
    val encoded = Pq.encode(c, cb).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val vecs = c.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble)).toMap
    // for every vector whose slice IS a codebook slice, the encoder must
    // pick exactly that code (distance 0 beats everything)
    vecs.foreach { case (id, v) =>
      for (s <- 0 until 2) {
        val slice = v.slice(s * 4, s * 4 + 4)
        codeSlices.get((s, slice)).foreach { code =>
          assert(encoded(id)(s) === code, s"vec $id subspace $s")
        }
      }
    }
  }

  test("ADC top-k finds same-cluster neighbors first; matches exact L2 top-1 cluster") {
    val c = corpus()
    val cb = Pq.trainCodebook(c, m = 2, k = 6)
    val queries = c.where(col("vec_id") < 3)
    val got = Pq.pqTopK(Pq.encode(c, cb), queries, cb, k = 5)
      .select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Int)].collect()
    assert(got.length === 15)
    // every retrieved neighbor of query q belongs to q's planted cluster
    got.foreach { case (q, n, _) =>
      assert(n % 3 === q % 3, s"query $q got cross-cluster neighbor $n")
    }
  }

  test("IVF-PQ probing every cell equals plain PQ top-k exactly") {
    val c = corpus()
    val cb = Pq.trainCodebook(c, m = 2, k = 6)
    val q = c.where(col("vec_id") < 3)
    def key(df: org.apache.spark.sql.DataFrame) = df
      .select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Int)].collect().toSet
    val full = key(Pq.pqTopK(Pq.encode(c, cb), q, cb, k = 5))
    val ivf = key(graft.ops.Similarity.ivfPqTopK(c, q, k = 5,
      nCells = 3, nProbe = 3, m = 2, kCodes = 6))
    assert(ivf === full)
    // narrower probing still answers (bounded candidate set, never empty
    // on a corpus where every cell is populated)
    val narrow = key(graft.ops.Similarity.ivfPqTopK(c, q, k = 3,
      nCells = 3, nProbe = 1, m = 2, kCodes = 6))
    assert(narrow.nonEmpty)
    val universe = key(graft.ops.Similarity.ivfPqTopK(c, q, k = 60,
      nCells = 3, nProbe = 3, m = 2, kCodes = 6)).map(t => (t._1, t._2))
    assert(narrow.forall(n => universe.contains((n._1, n._2))),
      "narrow-probe results must come from the all-probe candidate universe")
  }

  test("k > 256 is rejected (codes must stay byte-width)") {
    val e = intercept[IllegalArgumentException] {
      Pq.trainCodebook(corpus(), m = 2, k = 300)
    }
    assert(e.getMessage.contains("256"))
  }

  test("dim not divisible by m fails loudly") {
    val bad = Seq((0L, Array(1f, 2f, 3f))).toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      Pq.trainCodebook(bad, m = 2, k = 2)
    }
    assert(e.getMessage.contains("divisible"))
  }
}
