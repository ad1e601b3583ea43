package graft

import org.apache.spark.sql.functions._
import graft.ops.{Agent, Dedup}

/** Agent-transcript operators: tool sequencing audit, latency census,
  * loop detection, conversation-prefix dedup, and the Bloom-accelerated
  * incremental exact dedup. */
class AgentSpec extends SparkSpec {
  import spark.implicits._

  private def ts(sec: Int) =
    java.sql.Timestamp.valueOf(f"2026-01-01 00:00:${sec}%02d")

  // (conv, idx, role, text, tool, ts)
  private lazy val tr = Seq(
    // well-formed exchange: call then matching result
    ("c1", 0, "user", "find x", null, ts(0)),
    ("c1", 1, "assistant", "searching", "search", ts(1)),
    ("c1", 2, "tool", "hits", "search", ts(4)),
    ("c1", 3, "assistant", "done", null, ts(5)),
    // orphan result (prev is user) + dangling call (next is user)
    ("c2", 0, "tool", "hits", "search", ts(0)),
    ("c2", 1, "assistant", "go", "browse", ts(1)),
    ("c2", 2, "user", "why?", null, ts(2)),
    // mismatched tool name on the result -> orphan AND dangling
    ("c3", 0, "assistant", "go", "browse", ts(0)),
    ("c3", 1, "tool", "hits", "files", ts(9)),
    // mistagged: tool name on a user turn
    ("c4", 0, "user", "hello", "search", ts(0)),
    ("c4", 1, "assistant", "hi", null, ts(1)))
    .toDF("conv_id", "turn_idx", "role", "text", "tool", "ts")

  test("toolAudit flags orphans, danglers and mistags per conversation") {
    val got = Agent.toolAudit(tr)
      .select("conv_id", "n_calls", "n_results", "n_orphan_results",
        "n_dangling_calls", "n_mistagged", "tool_valid")
      .as[(String, Long, Long, Long, Long, Long, Boolean)]
      .collect().map(r => r._1 -> r).toMap
    assert(got("c1") === ("c1", 1L, 1L, 0L, 0L, 0L, true))
    assert(got("c2") === ("c2", 1L, 1L, 1L, 1L, 0L, false))
    assert(got("c3") === ("c3", 1L, 1L, 1L, 1L, 0L, false))
    assert(got("c4") === ("c4", 0L, 0L, 0L, 0L, 1L, false))
  }

  test("toolStats sums exact latencies over matched exchanges only") {
    val got = Agent.toolStats(tr)
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(got("search") === ("search", 1L, 1L, 3000L)) // c1: ts1 -> ts4
    assert(got("browse") === ("browse", 2L, 0L, 0L))    // c2+c3 both unmatched
  }

  test("loopRuns finds repeated-assistant islands across interleaved turns") {
    val looped = Seq(
      ("L", 0, "user", "q"), ("L", 1, "assistant", "same"),
      ("L", 2, "user", "?"), ("L", 3, "assistant", "same"),
      ("L", 4, "assistant", "same"), ("L", 5, "assistant", "other"),
      ("L", 6, "assistant", "same"), // not consecutive with 3-4 anymore
      ("M", 0, "assistant", "same"), ("M", 1, "assistant", "same"))
      .toDF("conv_id", "turn_idx", "role", "text")
    val got = Agent.loopRuns(looped, minRun = 3)
      .as[(String, Int, Int, Long)].collect().toSet
    assert(got === Set(("L", 1, 4, 3L))) // M's run of 2 is below minRun
  }

  test("prefixDedup flags true prefixes and equal-length dups, not near-misses") {
    val base = Seq(
      ("a", 0, "user", "one"), ("a", 1, "assistant", "two"),
      ("a", 2, "user", "three"),
      ("p", 0, "user", "one"), ("p", 1, "assistant", "two"), // prefix of a
      ("q", 0, "user", "one"), ("q", 1, "assistant", "TWO"), // near-miss
      ("z", 0, "user", "one"), ("z", 1, "assistant", "two"),
      ("z", 2, "user", "three")) // equal-length dup of a
      .toDF("conv_id", "turn_idx", "role", "text")
    val got = Agent.prefixDedup(base)
      .as[(String, Int, Boolean, Option[String])]
      .collect().map(r => r._1 -> r).toMap
    assert(got("a") === ("a", 3, false, None))      // covered only by z (>id)
    assert(got("p") === ("p", 2, true, Some("a")))  // min of coverers a, z
    assert(got("q") === ("q", 2, false, None))
    assert(got("z") === ("z", 3, true, Some("a")))  // tie-break to smaller id
  }

  test("prefixDedup verification kills signature collisions") {
    // two single-turn convs engineered to share sig only if hashes collide
    // is impossible to plant for xxhash64; instead assert the verify join
    // rejects a same-(sig,k) candidate whose texts differ by construction:
    // identical first turn, so prefixes of length 1 collide legitimately
    val d = Seq(
      ("x", 0, "user", "same"), ("x", 1, "assistant", "left"),
      ("y", 0, "user", "same"), ("y", 1, "assistant", "right"))
      .toDF("conv_id", "turn_idx", "role", "text")
    assert(Agent.prefixDedup(d).where(col("is_prefix_dup")).count() === 0L)
  }

  test("repair drops orphans, clears mistags, merges runs, re-indexes") {
    val messy = Seq(
      // r: orphan result at 0 (conv-initial), split assistant message at
      // 3+4, call/result pair at 5/6, mistagged tool on user turn 7
      ("r", 0, "tool", "lost", "search", ts(0)),
      ("r", 1, "user", "hi", null, ts(1)),
      ("r", 2, "user", "there", null, ts(2)),
      ("r", 3, "assistant", "part one", null, ts(3)),
      ("r", 4, "assistant", null, null, ts(4)),
      ("r", 5, "assistant", "looking", "grep", ts(5)),
      ("r", 6, "tool", "found", "grep", ts(6)),
      ("r", 7, "user", "thanks", "grep", ts(7)))
      .toDF("conv_id", "turn_idx", "role", "text", "tool", "ts")
    val got = Agent.repair(messy)
      .orderBy("turn_idx")
      .as[(String, Int, String, String, Option[String], java.sql.Timestamp)]
      .collect().toSeq
    assert(got === Seq(
      ("r", 0, "user", "hi\nthere", None, ts(1)),
      ("r", 1, "assistant", "part one\n", None, ts(3)), // null text -> ""
      ("r", 2, "assistant", "looking", Some("grep"), ts(5)),
      ("r", 3, "tool", "found", Some("grep"), ts(6)),
      ("r", 4, "user", "thanks", None, ts(7)))) // mistag cleared, kept
  }

  test("repair output always audits free of orphans and mistags") {
    val audited = Agent.toolAudit(Agent.repair(tr))
    assert(audited.agg(sum(col("n_orphan_results")) +
      sum(col("n_mistagged"))).as[Long].head() === 0L)
    // and calls/results that were well-formed survive verbatim
    val c1 = Agent.repair(tr).where(col("conv_id") === "c1")
      .orderBy("turn_idx")
      .select("role", "tool").as[(String, Option[String])].collect().toSeq
    assert(c1 === Seq("user" -> None, "assistant" -> Some("search"),
      "tool" -> Some("search"), "assistant" -> None))
  }

  test("incrementalExact equals the plain anti-join and prunes with the bloom") {
    val corpus = (0L until 200L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val batch = (150L until 260L).map(i => (i + 1000L, s"doc $i"))
      .toDF("doc_id", "text") // 50 dups (150..199), 60 new (200..259)
    val got = Dedup.incrementalExact(batch, corpus, expectedItems = 200L)
    assert(got.columns.toSeq === Seq("doc_id", "text"))
    val ids = got.select("doc_id").as[Long].collect().toSet
    assert(ids === (200L until 260L).map(_ + 1000L).toSet)
    // whitespace-normalized fingerprint semantics, like Dedup.exact
    val fuzz = Seq((1L, "  DOC   199 "), (2L, "brand new")).toDF("doc_id", "text")
    assert(Dedup.incrementalExact(fuzz, corpus, 200L)
      .select("doc_id").as[Long].collect().toSet === Set(2L))
    // empty corpus: everything is new
    val empty = corpus.where(lit(false))
    assert(Dedup.incrementalExact(batch, empty, 1L).count() === batch.count())
  }
}
