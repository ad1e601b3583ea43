package graft

import org.apache.spark.sql.functions._
import graft.ops.Dedup

/** Duplicate-cluster resolution: connected components + canonical keep. */
class ComponentsSpec extends SparkSpec {

  test("components resolve chains and separate clusters") {
    val sparkS = spark
    import sparkS.implicits._
    // a 5-chain (diameter forces multiple propagation rounds), a pair, a triangle
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
      (7L, 8L), (10L, 11L), (11L, 12L), (10L, 12L)).toDF("a", "b")
    val got = Dedup.components(pairs).as[(Long, Long)].collect().toMap
    assert((1L to 5L).forall(got(_) == 1L))
    assert(got(7L) == 7L && got(8L) == 7L)
    assert(Seq(10L, 11L, 12L).forall(got(_) == 10L))
  }

  test("a 60-node chain converges within maxIter=20 (pointer jumping)") {
    // bucket-chained near-dup drift: doc_i pairs only with doc_{i+1}.
    // One-hop min-label propagation would need 59 rounds; pointer jumping
    // halves chain depth per round, so 20 suffice (this threw before)
    val sparkS = spark
    import sparkS.implicits._
    val pairs = (1L until 60L).map(i => (i, i + 1)).toDF("a", "b")
    val got = Dedup.components(pairs).as[(Long, Long)].collect().toMap
    assert((1L to 60L).forall(got(_) == 1L))
  }

  test("components: empty pair set yields empty clusters; order-invariant") {
    val sparkS = spark
    import sparkS.implicits._
    assert(Dedup.components(Seq.empty[(Long, Long)].toDF("a", "b")).isEmpty)
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (9L, 8L))
    val fwd = Dedup.components(pairs.toDF("a", "b"))
      .as[(Long, Long)].collect().sorted.toSeq
    val rev = Dedup.components(pairs.reverse.toDF("a", "b"))
      .as[(Long, Long)].collect().sorted.toSeq
    assert(fwd == rev)
  }

  test("driver fast path ≡ distributed loop (longs and strings)") {
    // localEdgeCap = 0 forces the distributed label-propagation loop; the
    // default cap takes the driver union-find. Both must produce identical
    // (id, cluster_id) labels — including Spark's unsigned-UTF-8 string
    // ordering for the min-id pick (é sorts AFTER z byte-wise).
    val sparkS = spark
    import sparkS.implicits._
    val longPairs = Seq((5L, 2L), (2L, 9L), (7L, 8L), (3L, 3L)).toDF("a", "b")
    val lLocal = Dedup.components(longPairs).as[(Long, Long)].collect().sorted.toSeq
    val lDist = Dedup.components(longPairs, localEdgeCap = 0)
      .as[(Long, Long)].collect().sorted.toSeq
    assert(lLocal == lDist)
    val strPairs = Seq(("zeta", "éta"), ("éta", "beta"), ("conv2", "conv10"))
      .toDF("a", "b")
    val sLocal = Dedup.components(strPairs).as[(String, String)].collect().sorted.toSeq
    val sDist = Dedup.components(strPairs, localEdgeCap = 0)
      .as[(String, String)].collect().sorted.toSeq
    assert(sLocal == sDist)
    assert(sLocal.toMap.apply("éta") == "beta") // min by utf8 bytes, not codepoints
  }

  test("keepCanonical drops every non-representative duplicate") {
    val sparkS = spark
    import sparkS.implicits._
    val docs = (1L to 9L).map(i => (i, s"text$i")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("a", "b")
    val kept = Dedup.keepCanonical(docs, pairs).select("doc_id")
      .as[Long].collect().sorted
    assert(kept.toSeq == Seq(1L, 4L, 5L, 7L, 8L, 9L))
  }
}
