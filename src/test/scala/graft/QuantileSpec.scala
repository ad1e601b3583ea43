package graft

import org.apache.spark.sql.functions._
import graft.ops.TextStats

/** Per-group exact discrete quantiles ([[TextStats.groupQuantiles]]):
  * rank rule, ties, null metric rows, and hash-sample determinism. */
class QuantileSpec extends SparkSpec {
  import spark.implicits._

  test("value at rank floor((n-1)q/1000) per group; singleton groups") {
    val df = Seq(
      ("A", 1L, 30L), ("A", 2L, 10L), ("A", 3L, 40L), ("A", 4L, 20L),
      ("B", 5L, 7L))
      .toDF("source", "doc_id", "len")
    val got = TextStats.groupQuantiles(df, "source", col("len"))
      .as[(String, Long, Long, Long)].collect().toSet
    assert(got === Set(
      ("A", 250L, 10L, 4L), // rank floor(3*.25)=0
      ("A", 500L, 20L, 4L), // rank 1
      ("A", 750L, 30L, 4L), // rank floor(2.25)=2
      ("A", 900L, 30L, 4L), // rank floor(2.7)=2
      ("B", 250L, 7L, 1L), ("B", 500L, 7L, 1L),
      ("B", 750L, 7L, 1L), ("B", 900L, 7L, 1L)))
  }

  test("tied values at the rank are order-independent; nulls drop") {
    val df = Seq(
      ("A", 1L, Some(5L)), ("A", 2L, Some(5L)), ("A", 3L, Some(5L)),
      ("A", 4L, Some(9L)), ("A", 5L, None))
      .toDF("source", "doc_id", "len")
    val got = TextStats.groupQuantiles(
      df.repartition(7), "source", col("len"), qsPermille = Seq(500))
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got === Seq(("A", 500L, 5L, 4L))) // null row excluded from n
  }

  test("a NULL group key is a group of its own, not silently dropped") {
    val df = Seq(
      (Some("A"), 1L, 10L), (None, 2L, 5L), (None, 3L, 9L))
      .toDF("source", "doc_id", "len")
    val got = TextStats.groupQuantiles(df, "source", col("len"),
      qsPermille = Seq(500))
      .as[(Option[String], Long, Long, Long)].collect().toSet
    assert(got === Set(
      (Some("A"), 500L, 10L, 1L),
      (None, 500L, 5L, 2L))) // rank floor(1*.5)=0 of (5, 9)
  }

  test("sampleRate < 1 is deterministic and bounds the window partition") {
    val df = (0L until 400L).map(i => ("S", i, i)).toDF("source", "doc_id", "len")
    val a = TextStats.groupQuantiles(df, "source", col("len"),
      sampleRate = 0.25, seed = "s1").collect().toSet
    val b = TextStats.groupQuantiles(df, "source", col("len"),
      sampleRate = 0.25, seed = "s1").collect().toSet
    assert(a === b && a.nonEmpty)
    val n = TextStats.groupQuantiles(df, "source", col("len"),
      sampleRate = 0.25, seed = "s1")
      .select("n_sample").as[Long].head()
    assert(n > 50 && n < 200) // ~100 of 400 at rate .25
  }
}
