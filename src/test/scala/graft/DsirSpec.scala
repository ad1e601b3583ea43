package graft

import graft.ops.Dsir
import org.apache.spark.sql.functions._

/** DSIR importance resampling: model shape, score direction on planted
 * domains, determinism, and the scale-shaped plans. */
class DsirSpec extends SparkSpec {
  import spark.implicits._

  private val B = 64

  // a tiny "legal" target domain vs a mixed raw corpus
  private def target = Seq(
    (0L, "the court held that the contract was void"),
    (1L, "the judge ruled on the contract dispute"),
    (2L, "counsel argued the statute applied to the contract")
  ).toDF("doc_id", "text")

  private def raw = Seq(
    (10L, "the court held the contract was valid"),     // target-like
    (11L, "the judge and counsel discussed the statute"), // target-like
    (12L, "banana smoothie recipes with oat milk"),     // off-domain
    (13L, "football scores and transfer rumors today"), // off-domain
    (14L, "")                                           // empty
  ).toDF("doc_id", "text")

  test("fit emits a dense b-row integer-weight model") {
    val m = Dsir.fit(target, raw, b = B)
    assert(m.count() === B)
    assert(m.schema("w_fp").dataType.typeName === "long")
    assert(m.select(countDistinct("bucket")).as[Long].head() === B)
  }

  test("target-like documents outscore off-domain ones") {
    val m = Dsir.fit(target, raw, b = B)
    val s = Dsir.score(raw, m, b = B)
      .select("doc_id", "dsir_score_fp").as[(Long, Long)].collect().toMap
    assert(s(10L) > s(12L))
    assert(s(10L) > s(13L))
    assert(s(11L) > s(12L))
    assert(s(14L) === 0L) // gram-less doc scores zero
  }

  test("scoring is repartition-stable (integer sums)") {
    val m = Dsir.fit(target, raw, b = B)
    val a = Dsir.score(raw, m, b = B).collect().sortBy(_.getLong(0))
    val c = Dsir.score(raw.repartition(7), m, b = B)
      .collect().sortBy(_.getLong(0))
    assert(a.map(_.toString).toSeq === c.map(_.toString).toSeq)
  }

  test("resample is deterministic and biased toward the target domain") {
    val m = Dsir.fit(target, raw, b = B)
    val pick1 = Dsir.resample(raw, m, k = 2, b = B).select("doc_id")
      .as[Long].collect().toSet
    val pick2 = Dsir.resample(raw, m, k = 2, b = B).select("doc_id")
      .as[Long].collect().toSet
    assert(pick1 === pick2)
    // the two target-like docs dominate: at least one of them is picked
    assert(pick1.intersect(Set(10L, 11L)).nonEmpty)
  }

  test("score broadcasts the model; resample plans as TakeOrdered") {
    val m = Dsir.fit(target, raw, b = B)
    val sPlan = Dsir.score(raw, m, b = B)
      .queryExecution.executedPlan.toString
    assert(sPlan.contains("BroadcastHashJoin") ||
      sPlan.contains("BroadcastNestedLoopJoin"), sPlan)
    val rPlan = Dsir.resample(raw, m, k = 2, b = B)
      .queryExecution.executedPlan.toString
    assert(rPlan.contains("TakeOrderedAndProject"), rPlan)
  }
}
