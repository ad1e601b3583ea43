package graft

import org.apache.spark.sql.functions._
import graft.ops.Sft

/** SFT assembly: exact render template, loss-mask span offsets (incl.
 * code-point offsets under emoji), and newest-first budget truncation. */
class SftSpec extends SparkSpec {
  import spark.implicits._

  private val conv = Seq(
    ("c1", 0, "system", "be nice"),
    ("c1", 1, "user", "hi there"),
    ("c1", 2, "assistant", "hello world foo"))
    .toDF("conv_id", "turn_idx", "role", "text")

  test("render matches the hand-built template string") {
    val got = Sft.render(conv).as[(String, String, Long, Long)].collect()
    assert(got === Array(("c1",
      "<|system|>\nbe nice\n<|user|>\nhi there\n<|assistant|>\nhello world foo\n",
      3L, 67L)))
  }

  test("render is stable under physical partitioning") {
    val a = Sft.render(conv.repartition(7)).collect()
    val b = Sft.render(conv.coalesce(1)).collect()
    assert(a === b)
  }

  test("mask spans cover exactly the assistant text") {
    val got = Sft.maskSpans(conv)
      .select("conv_id", "turn_idx", "span_start", "span_end")
      .as[(String, Int, Long, Long)].collect()
    assert(got === Array(("c1", 2, 51L, 66L)))
  }

  test("span substring equals turn text, incl. emoji code points and nulls") {
    val messy = Seq(
      ("c2", 0, "user", "a 😀😀 b"),        // supplementary-plane offsets
      ("c2", 1, "assistant", "ok 😀 fine"),
      ("c2", 2, "user", null),
      ("c2", 3, "assistant", "follow-up"),
      ("c3", 0, "assistant", ""))           // empty assistant text
      .toDF("conv_id", "turn_idx", "role", "text")
    val bad = Sft.maskSpans(messy)
      .join(Sft.render(messy).withColumnRenamed("text", "rendered"), "conv_id")
      .join(messy, Seq("conv_id", "turn_idx"))
      .where(expr("substr(rendered, span_start + 1, span_end - span_start)")
        =!= coalesce(col("text"), lit("")))
    assert(bad.count() === 0L)
    // and the empty-text span is zero-width, not dropped
    val c3 = Sft.maskSpans(messy).where($"conv_id" === "c3")
      .select("span_start", "span_end").as[(Long, Long)].collect()
    assert(c3 === Array((14L, 14L)))
  }

  test("truncateTail keeps the fitting suffix plus the system preamble") {
    val got = Sft.truncateTail(conv, budgetToks = 4L)
      .select("turn_idx", "n_toks", "rev_cum", "kept")
      .as[(Int, Long, Long, Boolean)].collect().sortBy(_._1)
    assert(got === Array((0, 2L, 7L, true), (1, 2L, 5L, false),
      (2, 3L, 3L, true)))
  }

  test("truncateTail keeps everything under a large budget; non-head system is not special") {
    val all = Sft.truncateTail(conv, budgetToks = 100L)
      .select("kept").as[Boolean].collect()
    assert(all.forall(identity))
    // system turn NOT at the conversation head gets no preamble exemption
    val tail = Seq(
      ("c4", 0, "user", "a"),
      ("c4", 1, "system", "one two three four"),
      ("c4", 2, "assistant", "x y"))
      .toDF("conv_id", "turn_idx", "role", "text")
    val kept = Sft.truncateTail(tail, budgetToks = 2L)
      .select("turn_idx", "kept").as[(Int, Boolean)].collect().toMap
    assert(kept === Map(0 -> false, 1 -> false, 2 -> true))
  }

  test("roleAudit flags alternation violations, ignoring system turns") {
    val convs = Seq(
      ("ok", 0, "system"), ("ok", 1, "user"), ("ok", 2, "assistant"),
      ("ok2", 0, "user"), ("ok2", 1, "assistant"),
      ("ok2", 2, "user"), ("ok2", 3, "assistant"),
      ("dbl", 0, "user"), ("dbl", 1, "user"), ("dbl", 2, "assistant"),
      ("astart", 0, "assistant"), ("astart", 1, "user"),
      ("uend", 0, "user"), ("uend", 1, "assistant"), ("uend", 2, "user"))
      .map(t => (t._1, t._2, t._3, "x"))
      .toDF("conv_id", "turn_idx", "role", "text")
    val got = Sft.roleAudit(convs)
      .select("conv_id", "n_turns_ns", "n_role_repeats", "role_valid")
      .as[(String, Long, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got === Map(
      "ok" -> ((2L, 0L, true)),
      "ok2" -> ((4L, 0L, true)),
      "dbl" -> ((3L, 1L, false)),
      "astart" -> ((2L, 0L, false)),
      "uend" -> ((3L, 0L, false))))
  }
}
