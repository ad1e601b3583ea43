package graft

import graft.ops.Search

/** BM25 retrieval: hand-computed scores on a 3-doc corpus, unknown-term
 * neutrality, postings shape. */
class SearchSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = Seq(
    (0L, "apple banana apple"),
    (1L, "banana cherry"),
    (2L, "cherry cherry cherry durian")).toDF("doc_id", "text")

  test("postings carry per-doc term frequencies") {
    val p = Search.postings(corpus).as[(Long, String, Long)].collect().toSet
    assert(p.contains((0L, "apple", 2L)))
    assert(p.contains((2L, "cherry", 3L)))
    assert(p.size === 6)
  }

  test("bm25 matches the hand computation") {
    // N=3, avgdl=3; df(apple)=1 → idf=ln(1+2.5/1.5)=0.9808293;
    // df(cherry)=2 → idf=ln(1.6)=0.4700036.
    // d0: tf(apple)=2, dl=3 → w=idf*4.4/3.2 = 1.3486
    // d2: tf(cherry)=3, dl=4 → w=idf*6.6/4.5 = 0.6893
    // d1: tf(cherry)=1, dl=2 → w=idf*2.2/1.9 = 0.5442
    val q = Seq((0, "apple cherry")).toDF("query_id", "query")
    val got = Search.bm25TopK(corpus, q, k = 10)
      .as[(Int, Long, Double, Int)].collect().sortBy(_._4)
    assert(got === Array((0, 0L, 1.3486, 1), (0, 2L, 0.6893, 2),
      (0, 1L, 0.5442, 3)))
  }

  test("terms absent from the corpus do not perturb scores") {
    val qa = Seq((0, "apple")).toDF("query_id", "query")
    val qb = Seq((0, "apple zzzunknown")).toDF("query_id", "query")
    val a = Search.bm25TopK(corpus, qa).as[(Int, Long, Double, Int)].collect().toSet
    val b = Search.bm25TopK(corpus, qb).as[(Int, Long, Double, Int)].collect().toSet
    assert(a === b)
  }

  test("persisted index serves identical results to the inline path") {
    val q = Seq((0, "apple cherry"), (1, "banana durian")).toDF("query_id", "query")
    val dir = java.nio.file.Files.createTempDirectory("bm25-index").toString
    Search.buildIndex(corpus, dir)
    val inline = Search.bm25TopK(corpus, q)
      .as[(Int, Long, Double, Int)].collect().toSet
    val indexed = Search.bm25TopKIndexed(spark, dir, q)
      .as[(Int, Long, Double, Int)].collect().toSet
    assert(indexed === inline)
    assert(indexed.nonEmpty)
  }

  test("k caps results per query independently") {
    val q = Seq((0, "cherry"), (1, "banana")).toDF("query_id", "query")
    val got = Search.bm25TopK(corpus, q, k = 1)
      .as[(Int, Long, Double, Int)].collect()
    assert(got.length === 2)
    assert(got.forall(_._4 === 1))
  }
}
