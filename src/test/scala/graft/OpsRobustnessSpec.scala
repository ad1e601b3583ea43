package graft

import org.apache.spark.sql.functions._
import graft.ops.{C4, Decontam, Dsir, Gopher, Sft, UrlOps}

/** Adversarial inputs through the round-4 corpus operators: nulls,
  * empties, whitespace-only, unicode — no crashes, sane zeros. */
class OpsRobustnessSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) = rows.toSeq.toDF("doc_id", "text")

  test("ratio4dp rounds the exact rational half-up at every boundary") {
    // 3/160 = 0.01875 exactly: its nearest double is BELOW the half, so
    // round(double, 4) gives 0.0187 on Spark and 0.0188 on DuckDB — the
    // engine divergence ratio4dp exists to remove. 1/32 = 0.03125 is a
    // binary-EXACT half (engines agreed, half-up). Both must be .…88/.…13.
    val df = Seq((3L, 160L), (1L, 32L), (1L, 3L), (0L, 7L), (7L, 20000L))
      .toDF("p", "q")
    val got = df.select(graft.ops.Cols.ratioDp(col("p"), col("q"), 4))
      .as[Double].collect().toSeq
    assert(got === Seq(0.0188, 0.0313, 0.3333, 0.0, 0.0004))
    // property: equals BigDecimal exact HALF_UP for a (p, q) sweep
    val cases = for (q <- 1L to 40L; p <- 0L to q) yield (p, q)
    val expect = cases.map { case (p, q) =>
      BigDecimal(p)./(BigDecimal(q))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val swept = cases.toDF("p", "q")
      .select(graft.ops.Cols.ratioDp(col("p"), col("q"), 4))
      .as[Double].collect().toSeq
    assert(swept === expect)
    // null/zero-divisor semantics match round(p/q): null out
    val edge = Seq((Some(1L), Some(0L)), (None, Some(3L)))
      .toDF("p", "q")
      .select(graft.ops.Cols.ratioDp(col("p"), col("q"), 4))
      .as[Option[Double]].collect().toSeq
    assert(edge === Seq(None, None))
  }

  test("C4 line and page filters survive null/empty/unicode text") {
    val d = docs((0L, null), (1L, ""), (2L, "   \n\t\n  "),
      (3L, "«Unicode» sentence with five words héré."),
      (4L, "中文句子没有空格但有句号. Second sentence here today fine. Third one closes now."))
    val lf = C4.lineFiltered(d)
    val out = C4.withKeep(lf, textCol = "text_clean")
      .select("doc_id", "n_lines_kept", "c4_keep")
      .as[(Long, Int, Boolean)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(0L)._1 === 0 && out(0L)._2 === false)
    assert(out(1L)._1 === 0 && out(1L)._2 === false)
    assert(out(2L)._1 === 0 && out(2L)._2 === false)
    assert(out(3L)._1 === 1) // accented words count, guillemets survive
    assert(out(4L)._2 === true) // three sentences, no rule tripped
  }

  test("C4 span dedup passes null/short documents through untouched") {
    val block = "Alpha dup one. Beta dup two. Gamma dup three."
    val d = docs((0L, null), (1L, ""), (2L, "One sentence only."),
      (3L, s"Opener here. $block"), (4L, s"$block Closer there."))
    val out = C4.spanDedup(d).select("doc_id", "was_stripped", "text_stripped")
      .as[(Long, Boolean, String)].collect().map(r => r._1 -> ((r._2, r._3)))
      .toMap
    assert(out(0L) === ((false, "")))
    assert(out(1L) === ((false, "")))
    assert(out(2L) === ((false, "One sentence only.")))
    assert(out(4L)._1 === true)
  }

  test("Gopher repetition metrics are all-zero on null and whitespace docs") {
    val d = docs((0L, null), (1L, " \n \n "))
    val rows = Gopher.withRepetitionKeep(d).collect()
    for (r <- rows; c <- Seq("dup_line_frac", "dup_para_char_frac",
        "top_2gram_char_frac", "dup_10gram_char_frac"))
      assert(r.getAs[Double](c) === 0.0, s"doc ${r.getLong(0)} col $c")
    assert(rows.forall(_.getAs[Boolean]("gopher_rep_keep")))
  }

  test("quality scores null/empty/whitespace docs 0.0, never a fall-through 1.0") {
    // size(words(NULL)) is NULL: without a null-safe zero-word guard the
    // composite skips every ratio penalty and a NULL-text doc scores a
    // "perfect" 1.0, surviving quality-floor corpus prep
    val d = docs((0L, null), (1L, ""), (2L, "  \t "), (3L, "enough plain words " +
      "in this sentence to score well"))
    val q = graft.ops.TextStats.quality(d).select("doc_id", "quality_score")
      .as[(Long, Double)].collect().toMap
    assert(q(0L) === 0.0); assert(q(1L) === 0.0); assert(q(2L) === 0.0)
    assert(q(3L) === 1.0)
  }

  test("digit/capitalisation classes are Unicode: non-ASCII digits are ALLDIGIT") {
    // the engine classifies with \p{Nd}; the oracle mirrors must match
    // (an ASCII [0-9] mirror calls Arabic-Indic or fullwidth digits
    // NODIGIT/ALLCAP — the review-caught divergence class)
    val toks = Seq("٣٤", "１２", "42", "4x", "abc").toDF("tok")
    val got = toks.select(col("tok"),
      graft.text.TextCols.digitClass(col("tok")).as("d"))
      .withColumn("c", graft.text.TextCols.capitalisation(col("tok"), col("d")))
      .as[(String, String, String)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got("٣٤") === (("ALLDIGIT", "NOCAPS")))
    assert(got("１２") === (("ALLDIGIT", "NOCAPS")))
    assert(got("42") === (("ALLDIGIT", "NOCAPS")))
    assert(got("4x") === (("CONTAINSDIGITS", "NOCAPS")))
    assert(got("abc") === (("NODIGIT", "NOCAPS")))
  }

  test("contentShingles: zero-word docs have no cross-document candidacy") {
    import graft.ops.Dedup
    val d = docs((0L, null), (1L, ""), (2L, " \n\t "), (3L, "one two"),
      (4L, "a b c d e f g"))
    val sh = d.select(col("doc_id"), Dedup.contentShingles(col("text"), 5).as("sh"))
      .as[(Long, Seq[String])].collect().toMap
    assert(sh(0L).isEmpty && sh(1L).isEmpty && sh(2L).isEmpty,
      "no-content docs must emit zero shingles")
    assert(sh(3L) === Seq("one two"))
    assert(sh(4L).size === 3 && sh(4L).forall(_.nonEmpty))
    // downstream: empty docs emit no minhash signature rows at all
    val sig = Dedup.minhashSignatures(d, k = 4)
    assert(sig.select("doc_id").distinct().as[Long].collect().toSet === Set(3L, 4L))
  }

  test("DSIR handles null/empty docs and an all-empty target gracefully") {
    val raw = docs((0L, null), (1L, ""), (2L, "some words appear here"))
    val target = docs((10L, "some words appear here too"))
    val m = Dsir.fit(target, raw, b = 32)
    assert(m.count() === 32)
    val s = Dsir.score(raw, m, b = 32)
      .select("doc_id", "n_grams", "dsir_score_fp")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(s(0L) === ((0L, 0L)))
    assert(s(1L) === ((0L, 0L)))
    assert(s(2L)._1 > 0L)
    // degenerate: target with zero grams still yields a finite model
    val m0 = Dsir.fit(docs((20L, "")), raw, b = 32)
    assert(m0.count() === 32)
    assert(Dsir.resample(raw, m0, k = 2, b = 32).count() === 2)
  }

  test("Sft ops survive null text, single-turn and system-only conversations") {
    val tr = Seq(
      ("c1", 0, "system", null.asInstanceOf[String]),   // system-only conv
      ("c2", 0, "assistant", ""),                        // single empty turn
      ("c3", 0, "user", "\t\n "),                        // whitespace-only
      ("c3", 1, "assistant", "ok"))
      .toDF("conv_id", "turn_idx", "role", "text")
    assert(Sft.render(tr).count() === 3L)                // every conv renders
    assert(Sft.maskSpans(tr).count() === 2L)             // c2 + c3 assistants
    val tks = Sft.truncateTail(tr, budgetToks = 5L)
      .select("conv_id", "n_toks").as[(String, Long)].collect()
    assert(tks.filter(_._1 != "c3").forall(_._2 === 0L)) // null/empty/ws → 0
    // system-only conversations emit no audit row; others do
    val audited = Sft.roleAudit(tr).select("conv_id").as[String].collect().toSet
    assert(audited === Set("c2", "c3"))
  }

  test("blockVerdict passes null/empty URLs through as clean, rows preserved") {
    val docs = Seq((0L, null.asInstanceOf[String]), (1L, ""),
      (2L, "https://delta.net/x")).toDF("doc_id", "url")
    val dom = Seq(("delta.net", "ads")).toDF("pattern", "category")
    val kw = Seq(("casino", "spam")).toDF("keyword", "category")
    val got = UrlOps.blockVerdict(docs, dom, kw)
      .select("doc_id", "blocked").as[(Long, Boolean)].collect().toMap
    assert(got === Map(0L -> false, 1L -> false, 2L -> true))
  }

  test("sqrtTemperatureSample tolerates a single source and quota >= corpus") {
    val docs = (0L until 4L).map((_, "only")).toDF("doc_id", "source")
    val out = Decontam.sqrtTemperatureSample(docs, targetRows = 100L)
    // quota 100*2 div 2 = 100 ≥ 4 rows → rate 1.0 → everything kept
    assert(out.count() === 4L)
  }

  test("agent ops survive empty frames and degenerate conversations") {
    import graft.ops.Agent
    val empty = Seq.empty[(String, Int, String, String, String, java.sql.Timestamp)]
      .toDF("conv_id", "turn_idx", "role", "text", "tool", "ts")
    assert(Agent.toolAudit(empty).count() === 0L)
    assert(Agent.toolStats(empty).count() === 0L)
    assert(Agent.loopRuns(empty).count() === 0L)
    assert(Agent.prefixDedup(empty).count() === 0L)
    assert(Agent.repair(empty).count() === 0L)
    // single conv made entirely of orphan results repairs to nothing
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    val orphans = Seq(("o", 0, "tool", "a", "x", t0), ("o", 1, "tool", "b", "y", t0))
      .toDF("conv_id", "turn_idx", "role", "text", "tool", "ts")
    assert(Agent.repair(orphans).count() === 0L)
    // a single-conversation corpus has nothing to be a prefix of
    val solo = Seq(("s", 0, "user", "hi", null, t0))
      .toDF("conv_id", "turn_idx", "role", "text", "tool", "ts")
    val pd = Agent.prefixDedup(solo).collect().head
    assert(pd.getAs[Boolean]("is_prefix_dup") === false)
    // null text/tool everywhere: audit + loops stay sane
    val nulls = Seq(("n", 0, "assistant", null, null, t0),
      ("n", 1, "assistant", null, null, t0),
      ("n", 2, "assistant", null, null, t0))
      .toDF("conv_id", "turn_idx", "role", "text", "tool", "ts")
    assert(Agent.toolAudit(nulls).where(col("tool_valid")).count() === 1L)
    assert(Agent.loopRuns(nulls, minRun = 3).count() === 1L) // nulls group
  }

  test("groupQuantiles on an empty frame and an all-null metric") {
    import graft.ops.TextStats
    val empty = Seq.empty[(String, Long, Option[Long])]
      .toDF("source", "doc_id", "len")
    assert(TextStats.groupQuantiles(empty, "source", col("len")).count() === 0L)
    val allNull = Seq(("s", 1L, Option.empty[Long]), ("s", 2L, None))
      .toDF("source", "doc_id", "len")
    assert(TextStats.groupQuantiles(allNull, "source", col("len")).count() === 0L)
  }
}
