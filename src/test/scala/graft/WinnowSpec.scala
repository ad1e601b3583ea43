package graft

import org.apache.spark.sql.functions._
import graft.ops.Winnow

/** Winnowing fingerprints: the w+k-1 shared-substring guarantee,
 * formatting invariance, short docs, and the bounded pair generator. */
class WinnowSpec extends SparkSpec {
  import spark.implicits._

  private val K = 8
  private val W = 4

  private def fpsOf(texts: (Long, String)*): Map[Long, Seq[Int]] =
    texts.toSeq.toDF("doc_id", "text")
      .select(col("doc_id"), Winnow.fingerprints(col("text"), K, W).as("f"))
      .as[(Long, Seq[Int])].collect().toMap

  test("a shared substring of length >= w+k-1 guarantees a shared fingerprint") {
    // shared span: 11 chars = w+k-1 exactly, embedded in unrelated text
    val span = "abcdefghijk"
    val m = fpsOf(
      (0L, s"zzzz qqqq $span wwww qqqq pppp rrrr"),
      (1L, s"mmmm nnnn oooo $span uuuu vvvv xxxx"))
    assert(m(0L).toSet.intersect(m(1L).toSet).nonEmpty)
  }

  test("fingerprints are formatting-invariant (case + whitespace runs)") {
    val m = fpsOf(
      (0L, "The Quick   Brown\n\tFox Jumps Over"),
      (1L, "the quick brown fox jumps over"))
    assert(m(0L) === m(1L))
  }

  test("short and empty docs fingerprint their whole normalized form") {
    val m = fpsOf((0L, "tiny"), (1L, ""), (2L, "  TINY  "))
    assert(m(0L).length === 1)
    assert(m(1L).length === 1)
    assert(m(0L) === m(2L))
  }

  test("density: fingerprint count is bounded by gram count") {
    val text = (1 to 50).map(i => s"word$i").mkString(" ")
    val m = fpsOf((0L, text))
    val nGrams = text.length - K + 1
    assert(m(0L).nonEmpty && m(0L).length <= nGrams - W + 1)
  }

  test("candidate pairs find the cloned doc and cap the bucket width") {
    val body = "a distinctive sentence that repeats verbatim across two documents here"
    val docs = Seq(
      (0L, body), (1L, body + " with a small suffix change"),
      (2L, "entirely different content with its own private wording style")
    ).toDF("doc_id", "text")
    val pairs = Winnow.candidatePairs(docs, K, W, minShared = 2)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1L)))
    assert(!pairs.exists(p => p._1 == 2L || p._2 == 2L))
    // bucket cap: 5 identical docs, maxBucket=3 → pairs only among 3 smallest
    val clones = (0L to 4L).map(i => (i, body)).toDF("doc_id", "text")
    val capped = Winnow.candidatePairs(clones, K, W, minShared = 1, maxBucket = 3)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(capped === Set((0L, 1L), (0L, 2L), (1L, 2L)))
  }

  test("fingerprinting plans with zero exchanges") {
    val plan = Seq((0L, "some text")).toDF("doc_id", "text")
      .select(Winnow.fingerprints(col("text")).as("f"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }
}
