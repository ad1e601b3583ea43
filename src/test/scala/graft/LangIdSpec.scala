package graft

import org.apache.spark.sql.functions._
import graft.ops.{LangId, TextStats}

/** Trained char-trigram NB language ID: must classify every planted probe
 * (including the stopword-free ones the heuristic langId scores 'und'),
 * held-out accuracy floor on the shipped resource corpus, deterministic
 * model bytes. */
class LangIdSpec extends SparkSpec {
  import spark.implicits._

  private val expected =
    Map(0L -> "en", 1L -> "fr", 2L -> "de", 3L -> "es",
      4L -> "en", 5L -> "fr", 6L -> "de", 7L -> "es")

  test("built-in corpus resource parses: 4 langs, balanced") {
    val byLang = LangId.builtinCorpus.groupBy(_._1).view.mapValues(_.size).toMap
    assert(byLang.keySet === Set("en", "fr", "de", "es"))
    assert(byLang.values.forall(_ == 10), byLang)
  }

  test("classifies all planted probes; heuristic misses the stopword-free ones") {
    val tests = Queries.langIdTests.toDF("doc_id", "text")
    val model = LangId.builtinModel(spark)
    val got = LangId.classify(tests, model)
      .select("doc_id", "lang").as[(Long, String)].collect().toMap
    assert(got === expected)
    // ids 0-3 are the heuristic's documented blind spot: no stopword from
    // any list appears, so TextStats.langId returns 'und' on every one —
    // exactly the gap the trained model closes
    val heur = tests.select(col("doc_id"),
      TextStats.langId(col("text")).as("l")).as[(Long, String)].collect().toMap
    (0L to 3L).foreach { i => assert(heur(i) === "und", s"probe $i") }
  }

  test("leave-one-out floor on the resource corpus: >= 90% accuracy") {
    // hold out sentence i of each language, train on the rest, classify
    // the held-out four — a real held-out floor, not train-set recall
    val corpus = LangId.builtinCorpus.zipWithIndex
      .map { case ((l, t), i) => (i.toLong, l, t) }
    var ok = 0; var n = 0
    for (fold <- 0 until 5) {
      val hold = corpus.filter(_._1 % 10 == fold)
      val train = corpus.filter(_._1 % 10 != fold)
      val model = LangId.train(train.map(c => (c._2, c._3)).toDF("lang", "text"))
      val got = LangId.classify(
        hold.map(c => (c._1, c._3)).toDF("doc_id", "text"), model)
        .select("doc_id", "lang").as[(Long, String)].collect().toMap
      val want = hold.map(c => c._1 -> c._2).toMap
      n += want.size
      ok += want.count { case (id, l) => got.get(id).contains(l) }
    }
    assert(n === 20)
    assert(ok.toDouble / n >= 0.9, s"held-out accuracy $ok/$n")
  }

  test("model is deterministic and repartition-stable") {
    val a = LangId.builtinModel(spark).collect().toSet
    val b = LangId.train(LangId.builtinCorpus.toDF("lang", "text")
      .repartition(7)).collect().toSet
    assert(a === b)
    // sentinels present for every language
    val langs = Set("en", "fr", "de", "es")
    for (s <- Seq(LangId.priorTri, LangId.unseenTri))
      assert(a.filter(_.getString(1) == s).map(_.getString(0)) === langs)
  }

  test("trigrams: padded, normalized, empty-safe") {
    val got = Seq((1L, "Ab  cd"), (2L, ""), (3L, null.asInstanceOf[String]))
      .toDF("id", "t")
      .select(col("id"), LangId.trigrams(col("t")).as("g"))
      .as[(Long, Seq[String])].collect().toMap
    assert(got(1L) === Seq(" ab", "ab ", "b c", " cd", "cd "))
    assert(got(2L) === Seq.empty)
    assert(got(3L) === Seq.empty)
  }
}
