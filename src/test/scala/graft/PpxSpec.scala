package graft

import org.apache.spark.sql.functions._
import graft.ops.{LangModel, Ppx}

/** Perplexity bucketing: exact fixed-point conversion, discrete-quantile
 * cutoffs, bucket assignment, and end-to-end over a trained bigram LM. */
class PpxSpec extends SparkSpec {
  import spark.implicits._

  // a fake scored frame: xent_fp works out to exactly 10..60 nano-nats
  private def scoredOf(xfps: Seq[Long]) =
    xfps.zipWithIndex
      .map { case (x, i) => (i.toLong, -x, 1000L) } // sum_fp = -x, n = 1000
      .toDF("doc_id", "sum_fp", "n_bigrams")

  test("withXentFp is exact integer nano-nats; zero-bigram docs are null") {
    val df = Seq((0L, -7_500_000L, 3L), (1L, 0L, 0L))
      .toDF("doc_id", "sum_fp", "n_bigrams")
    val got = Ppx.withXentFp(df).select("doc_id", "xent_fp")
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
    // 7_500_000 micro-nats * 1000 / 3 bigrams = 2_500_000_000 nano-nats
    assert(got.toMap === Map(0L -> 2_500_000_000L, 1L -> -1L))
  }

  test("cuts picks the discrete sample quantiles") {
    val c = Ppx.cuts(scoredOf(Seq(10L, 20L, 30L, 40L, 50L, 60L)))
    // n=6: head idx floor(5/3)=1 → 20; tail idx floor(10/3)=3 → 40
    assert(c === Ppx.Cuts(20L, 40L, 6L))
  }

  test("withBuckets splits on the fitted cutoffs, inclusive") {
    val scored = scoredOf(Seq(10L, 20L, 30L, 40L, 50L, 60L))
    val got = Ppx.withBuckets(scored, 20L, 40L)
      .select("xent_fp", "ppx_bucket").as[(Long, String)].collect().toMap
    assert(got === Map(10L -> "head", 20L -> "head", 30L -> "middle",
      40L -> "middle", 50L -> "tail", 60L -> "tail"))
  }

  test("end-to-end: fluent text buckets ahead of word salad under a trained LM") {
    val fluent = (0 until 8).map(i =>
      (i.toLong, "the cat sat on the mat and the dog sat on the rug"))
    val salad = (8 until 12).map(i =>
      (i.toLong, "rug mat the on dog sat cat salad zebra quark flux"))
    val corpus = (fluent ++ salad).toDF("doc_id", "text")
    val model = LangModel.train(corpus.where($"doc_id" < 8))
    val scored = LangModel.xent(corpus, model)
    val c = Ppx.cuts(scored)
    val buckets = Ppx.withBuckets(scored, c.headCut, c.tailCut)
      .select("doc_id", "ppx_bucket").as[(Long, String)].collect().toMap
    // every fluent doc scores at or below every salad doc
    assert((0L until 8L).forall(buckets(_) != "tail"))
    assert((8L until 12L).forall(buckets(_) == "tail"))
  }
}
