package graft

import org.apache.spark.sql.functions._
import graft.ops.QualityModel

/**
 * Closed-form tests for the trained quality classifier: NB weights match
 * hand-recomputed Laplace log-ratios exactly (they're deterministic
 * functions of integer counts), and scores are exact integer sums of
 * fixed-point weights.
 */
class QualityModelSpec extends SparkSpec {

  // pos tokens: good:2 fine:1 prose:2 here:1 solid:1 text:1 (T1=8)
  // neg tokens: spam:3 buy:2 now:1                         (T0=6), V=9
  private def labeled() = {
    val sparkS = spark
    import sparkS.implicits._
    Seq(
      (1L, 1, "good fine prose here"), (2L, 1, "good solid prose text"),
      (3L, 0, "spam spam buy"), (4L, 0, "buy spam now")
    ).toDF("doc_id", "label", "text")
  }

  private def fp(x: Double): Long = math.round(x * 1e6)
  private def w(c1: Long, c0: Long, t1: Long = 8, t0: Long = 6, v: Long = 9) =
    fp(math.log((c1 + 1).toDouble / (t1 + v)) -
      math.log((c0 + 1).toDouble / (t0 + v)))

  private def model() = QualityModel.train(labeled())

  test("weights equal the closed-form Laplace log-ratio, in fixed point") {
    val got = model().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.size === 11) // 9 vocab + 2 sentinels
    assert(got("good") === w(2, 0))
    assert(got("fine") === w(1, 0))
    assert(got("spam") === w(0, 3))
    assert(got("buy") === w(0, 2))
    assert(got("now") === w(0, 1))
    assert(got(QualityModel.priorTok) === 0L) // balanced classes: ln(2/2)
    assert(got(QualityModel.unseenTok) === fp(math.log(15.0 / 17.0)))
  }

  test("scores are exact integer sums; unseen and empty docs handled") {
    val sparkS = spark
    import sparkS.implicits._
    val docs = Seq(
      (10L, "good prose spam zzz-neverseen"),
      (11L, "   "),
      (12L, "qqq www")
    ).toDF("doc_id", "text")
    val got = QualityModel.score(docs, model()).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getInt(2))).toMap
    val unseen = fp(math.log(15.0 / 17.0))
    assert(got(10L)._1 === w(2, 0) + w(2, 0) + w(0, 3) + unseen)
    assert(got(11L)._1 === 0L) // bare prior: no tokens at all
    assert(got(12L)._1 === 2 * unseen)
    assert(got(12L)._2 === 0) // unseen-only doc leans to the neg class
  }

  test("classification separates planted spam from prose") {
    val sparkS = spark
    import sparkS.implicits._
    val eval = Seq(
      (20L, "solid prose text here", 1), (21L, "buy now spam spam", 0),
      (22L, "good text", 1), (23L, "spam buy", 0)
    ).toDF("doc_id", "text", "label")
    val got = QualityModel.score(eval, model())
      .join(eval.select("doc_id", "label"), Seq("doc_id")).collect()
    assert(got.length === 4)
    got.foreach(r => assert(r.getAs[Int]("label_hat") === r.getAs[Int]("label"),
      s"doc ${r.getLong(0)}"))
  }

  test("minCount collapses rare tokens into the unseen sentinel") {
    val m2 = QualityModel.train(labeled(), minCount = 2)
    val toks = m2.collect().map(_.getString(0)).toSet
    // singletons fine/here/solid/text/now drop; vocab = good prose spam buy
    assert(toks === Set("good", "prose", "spam", "buy",
      QualityModel.priorTok, QualityModel.unseenTok))
    // totals/vocab recomputed on the kept vocabulary: T1=4 (good 2, prose 2),
    // T0=5 (spam 3, buy 2), V=4
    val got = m2.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got("good") === w(2, 0, t1 = 4, t0 = 5, v = 4))
    assert(got(QualityModel.unseenTok) === fp(math.log(9.0 / 8.0)))
  }
}
