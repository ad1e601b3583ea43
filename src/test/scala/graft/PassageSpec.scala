package graft

import org.apache.spark.sql.functions._
import graft.ops.Passage

/** Exact repeated-passage dedup: planted cross-doc and within-doc
 * duplicates, canonical-keep semantics, untouched-doc pass-through. */
class PassageSpec extends SparkSpec {
  import spark.implicits._

  // doc 0 and doc 1 share a 6-word passage; doc 2 is unique; doc 3
  // repeats its own first 3 words at the end (too short for n=6)
  private def corpus = Seq(
    (0L, "alpha beta gamma delta epsilon zeta UNIQUE0 tail0"),
    (1L, "head1 alpha beta gamma delta epsilon zeta tail1"),
    (2L, "totally unrelated words that appear nowhere else at all"),
    (3L, "one two three filler filler one two three")).toDF("doc_id", "text")

  test("occurrences emit one row per n-window with stable hashes") {
    val occ = Passage.occurrences(corpus, n = 6)
    // doc0: 8 words → 3 windows; doc1: 8 → 3; doc2: 9 → 4; doc3: 8 → 3
    assert(occ.groupBy("doc_id").count().as[(Long, Long)].collect().toMap
      === Map(0L -> 3L, 1L -> 3L, 2L -> 4L, 3L -> 3L))
  }

  test("repeated finds the shared window once per occurrence, canonical first") {
    val rep = Passage.repeated(corpus, n = 6)
      .select("doc_id", "start_idx", "n_occ", "is_canonical")
      .as[(Long, Int, Long, Boolean)].collect().sortBy(r => (r._1, r._2))
    // the shared 6-gram is at doc0[0] and doc1[1]
    assert(rep === Array((0L, 0, 2L, true), (1L, 1, 2L, false)))
  }

  test("strip removes only the non-canonical occurrence's words") {
    val got = Passage.strip(corpus, n = 6)
      .select("doc_id", "was_stripped", "text_stripped")
      .as[(Long, Boolean, String)].collect().sortBy(_._1)
    assert(got(0) === ((0L, false, "alpha beta gamma delta epsilon zeta UNIQUE0 tail0")))
    assert(got(1) === ((1L, true, "head1 tail1")))
    assert(got(2) === ((2L, false, "totally unrelated words that appear nowhere else at all")))
    assert(got(3) === ((3L, false, "one two three filler filler one two three")))
  }

  test("within-doc repetition strips the later copy") {
    val df = Seq((7L, "a b c d e f g h a b c d e f g h")).toDF("doc_id", "text")
    val got = Passage.strip(df, n = 8)
      .select("was_stripped", "text_stripped").as[(Boolean, String)].collect()(0)
    assert(got._1 === true)
    assert(got._2 === "a b c d e f g h")
  }

  test("a 10^4-occurrence gram plans without a single-partition window") {
    // one boilerplate 6-gram planted in 10^4 docs: at 100 TB this gram
    // would serialize onto one task under row_number() over (partition by
    // gram) — the canonical pick must be a partial-aggregable min(struct)
    val boiler = spark.range(10000)
      .select(col("id").as("doc_id"),
        concat(lit("shared boiler plate gram here now uniq"), col("id"))
          .as("text"))
    val rep = Passage.repeated(boiler, n = 6)
    val plan = rep.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"window in plan:\n$plan")
    val got = rep.select("doc_id", "n_occ", "is_canonical")
      .as[(Long, Long, Boolean)].collect()
    assert(got.length === 10000)
    assert(got.forall(_._2 === 10000L))
    assert(got.count(_._3) === 1)
    assert(got.find(_._3).get._1 === 0L)
  }

  test("a full duplicate is stripped to nothing; matching is case-insensitive") {
    val df = Seq(
      (0L, "The Quick Brown Fox Jumps Over The Lazy Dog"),
      (1L, "the quick brown fox jumps over the lazy dog")).toDF("doc_id", "text")
    val got = Passage.strip(df, n = 9)
      .select("doc_id", "was_stripped", "text_stripped")
      .as[(Long, Boolean, String)].collect().sortBy(_._1)
    // canonical (doc 0) keeps its original casing; doc 1 empties
    assert(got(0) === ((0L, false, "The Quick Brown Fox Jumps Over The Lazy Dog")))
    assert(got(1) === ((1L, true, "")))
  }
}
