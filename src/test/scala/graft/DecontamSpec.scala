package graft

import org.apache.spark.sql.functions._
import graft.ops.Decontam

/**
 * Planted-case tests for benchmark decontamination and deterministic
 * sampling/mixing (the driver oracles run on the synthetic corpus, whose
 * contamination is incidental — these tests control it exactly).
 */
class DecontamSpec extends SparkSpec {

  private val benchText = "alpha bravo charlie delta echo foxtrot golf hotel " +
    "india juliet kilo lima mike november oscar papa quebec romeo sierra tango"

  private def corpus() = {
    val sparkS = spark
    import sparkS.implicits._
    Seq(
      // exact copy of the benchmark doc: contamination 1.0
      (0L, benchText, "src0"),
      // shares exactly one 13-word window (words 1..13 of bench) inside
      // otherwise-novel text
      (1L, "zero1 zero2 zero3 alpha bravo charlie delta echo foxtrot golf " +
        "hotel india juliet kilo lima mike end1 end2 end3 end4 end5 end6 end7", "src0"),
      // clean doc, same vocabulary length
      (2L, "uno dos tres cuatro cinco seis siete ocho nueve diez once doce " +
        "trece catorce quince dieciseis diecisiete dieciocho diecinueve veinte", "src1"),
      // short doc (< 13 words) equal to a short benchmark prompt
      (3L, "what is the capital of france", "src1"),
      // short clean doc
      (4L, "completely unrelated short note", "src2")
    ).toDF("doc_id", "text", "source")
  }

  private def bench() = {
    val sparkS = spark
    import sparkS.implicits._
    Seq((100L, benchText), (101L, "what is the capital of france"))
      .toDF("bench_id", "text")
  }

  test("overlap measures exact, windowed, and whole-short-doc contamination") {
    val m = Decontam.overlap(corpus(), bench()).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toMap
    // doc0: 20 words -> 8 distinct 13-grams, all from bench doc 100
    assert(m(0L) == ((8L, 8L, 1L, 1.0)))
    // doc1: 23 words -> 11 13-grams, exactly one matches (bench words 1..13)
    assert(m(1L)._1 == 11L && m(1L)._2 == 1L && m(1L)._3 == 1L && m(1L)._4 == 0.0909)
    // doc2: clean
    assert(m(2L) == ((8L, 0L, 0L, 0.0)))
    // doc3: whole-text shingle hits the short benchmark prompt
    assert(m(3L) == ((1L, 1L, 1L, 1.0)))
    assert(m(4L) == ((1L, 0L, 0L, 0.0)))
  }

  test("decontaminate drops docs above maxFrac and keeps the measurement") {
    val kept = Decontam.decontaminate(corpus(), bench(), maxFrac = 0.1)
      .select("doc_id", "contamination").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(kept.keySet == Set(1L, 2L, 4L)) // 0 and 3 are fully contaminated
    assert(kept(1L) == 0.0909 && kept(2L) == 0.0)
    // zero tolerance also drops the single-window doc
    assert(Decontam.decontaminate(corpus(), bench(), maxFrac = 0.0)
      .select("doc_id").collect().map(_.getLong(0)).toSet == Set(2L, 4L))
  }

  test("hashSample is deterministic, partition-independent, and near-rate") {
    val sparkS = spark
    import sparkS.implicits._
    val ids = (0L until 2000L).map(i => (i, s"t$i")).toDF("doc_id", "text")
    val a = Decontam.hashSample(ids, 0.25, "s1").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val b = Decontam.hashSample(ids.repartition(7), 0.25, "s1").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(a == b, "sample must not depend on physical partitioning")
    assert(math.abs(a.size / 2000.0 - 0.25) < 0.03, s"rate off: ${a.size}")
    val c = Decontam.hashSample(ids, 0.25, "s2").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(a != c, "different seeds must draw different samples")
    assert(Decontam.hashSample(ids, 1.0, "s1").count() == 2000)
  }

  test("mixCorpus emits floor(w) full epochs plus a hash-thinned fractional one") {
    val sparkS = spark
    import sparkS.implicits._
    val docs = (0L until 300L).map(i => (i, s"t$i", s"src${i % 3}"))
      .toDF("doc_id", "text", "source")
    val mixed = Decontam.mixCorpus(docs,
      Map("src0" -> 2.0, "src1" -> 0.5, "src2" -> 1.25))
    val byDomain = mixed.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byDomain("src0") == 200L) // integer weight: exact
    assert(math.abs(byDomain("src1") - 50.0) < 15, s"src1: ${byDomain("src1")}")
    assert(byDomain("src2") >= 100L && // full epoch 0 always present
      math.abs(byDomain("src2") - 125.0) < 15, s"src2: ${byDomain("src2")}")
    // epochs are 0-based and dense for integer weights
    val e0 = mixed.where(col("source") === "src0").groupBy("epoch").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(e0 == Map(0 -> 100L, 1 -> 100L))
    // unweighted domains are dropped; determinism across replans
    assert(Decontam.mixCorpus(docs, Map("src9" -> 2.0)).count() == 0)
    val again = Decontam.mixCorpus(docs.repartition(5),
      Map("src0" -> 2.0, "src1" -> 0.5, "src2" -> 1.25))
    assert(again.select("doc_id", "epoch").collect().map(r => (r.getLong(0), r.getInt(1))).toSet ==
      mixed.select("doc_id", "epoch").collect().map(r => (r.getLong(0), r.getInt(1))).toSet)
  }

  test("stripOverlaps removes only benchmark-covered 13-gram spans") {
    import spark.implicits._
    val phrase = "one two three four five six seven eight nine ten eleven twelve thirteen"
    val corpus = Seq(
      (0L, s"Clean preamble words here. $phrase"),     // partial strip
      (1L, phrase),                                    // fully covered
      (2L, "totally unrelated words that stay put"),   // untouched
      (3L, "short doc")                                // < n words, untouched
    ).toDF("doc_id", "text")
    val bench = Seq(Tuple1(phrase)).toDF("text")
    val out = graft.ops.Decontam.stripOverlaps(corpus, bench)
      .select("doc_id", "was_stripped", "text_stripped")
      .as[(Long, Boolean, String)].collect().map(r => r._1 -> ((r._2, r._3)))
      .toMap
    assert(out(0L) === ((true, "Clean preamble words here.")))
    assert(out(1L) === ((true, "")))
    assert(out(2L) === ((false, "totally unrelated words that stay put")))
    assert(out(3L) === ((false, "short doc")))
  }

  test("sqrtTemperatureSample: integer quotas, full keep of tiny sources, determinism") {
    import spark.implicits._
    // 9 / 4 / 1 rows → isqrt weights 3 / 2 / 1 (tot 6); target 6 → quotas 3/2/1
    val docs = ((0L until 9L).map((_, "a")) ++ (9L until 13L).map((_, "b")) ++
      Seq((13L, "c"))).toDF("doc_id", "source")
    val out = Decontam.sqrtTemperatureSample(docs, targetRows = 6L)
    val quotas = out.select("source", "n_source", "quota")
      .distinct().as[(String, Long, Long)].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
    assert(quotas.get("a").forall(_ === ((9L, 3L))))
    assert(quotas.get("b").forall(_ === ((4L, 2L))))
    // rate for c is 1/1 = 1.0 → the single row always survives
    val kept = out.select("doc_id").as[Long].collect().toSet
    assert(kept.contains(13L))
    // deterministic under repartitioning
    val again = Decontam.sqrtTemperatureSample(docs.repartition(7), 6L)
      .select("doc_id").as[Long].collect().toSet
    assert(again === kept)
    // every kept row honors the hash predicate at its source's rate
    val rates = Map("a" -> 3.0 / 9, "b" -> 2.0 / 4, "c" -> 1.0)
    val byId = docs.as[(Long, String)].collect().toMap
    kept.foreach { id =>
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"tmix:$id".getBytes("UTF-8"))
      val hex = md.map("%02x".format(_)).mkString.take(6)
      val h = java.lang.Long.parseLong(hex, 16) / 16777216.0
      assert(h < rates(byId(id)), s"doc $id kept but hash $h >= rate")
    }
  }
}
