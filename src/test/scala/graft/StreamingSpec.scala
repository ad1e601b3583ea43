package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.StreamingExtract
import graft.streaming.StreamingExtract.{ClosedConv, TurnEvent}

class StreamingSpec extends SparkSpec {

  private def ts(min: Int) = Timestamp.valueOf(f"2026-01-01 10:$min%02d:00")

  test("convClose emits a conversation after event-time silence") {
    val sparkS = spark
    import sparkS.implicits._
    implicit val sqlCtx = spark.sqlContext

    val input = MemoryStream[TurnEvent]
    val q = StreamingExtract.convClose(input.toDS(), gapSeconds = 600)
      .writeStream.format("memory").queryName("closed")
      .outputMode(OutputMode.Append).start()

    input.addData(
      TurnEvent("c1", 0, "user", "hello", ts(0)),
      TurnEvent("c1", 1, "assistant", "world", ts(1)))
    q.processAllAvailable()
    assert(spark.table("closed").count() == 0, "conversation still open")

    // advance event time far past the gap + watermark
    input.addData(TurnEvent("c2", 0, "user", "later", ts(55)))
    q.processAllAvailable()
    input.addData(TurnEvent("c2", 1, "user", "more", ts(56)))
    q.processAllAvailable()

    val closed = spark.table("closed").as[ClosedConv].collect()
    assert(closed.map(_.conv_id).contains("c1"))
    val c1 = closed.find(_.conv_id == "c1").get
    assert(c1.n_turns == 2 && c1.text == "hello\nworld" && c1.bytes == 10)
    q.stop()
  }

  test("streaming extraction matches the batch pipeline on closed conversations") {
    val sparkS = spark
    import sparkS.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.StreamingExtract.Turn

    val convTurns = Seq(
      Turn("s1", 0, "system", "You are helpful.", null, ts(0)),
      Turn("s1", 1, "user", "first question about spark rows", null, ts(1)),
      Turn("s1", 2, "assistant", "an answer with enough body text", null, ts(2)))

    val outDir = java.nio.file.Files.createTempDirectory("graft-stream-out").toString
    val ckDir = java.nio.file.Files.createTempDirectory("graft-stream-ck").toString
    val input = MemoryStream[Turn]
    val q = StreamingExtract.extractionQuery(input.toDS(), outDir, ckDir, gapSeconds = 600)

    input.addData(convTurns: _*)
    q.processAllAvailable()
    // push event time past gap + watermark so s1 closes
    input.addData(Turn("s2", 0, "user", "late turn", null, ts(58)))
    q.processAllAvailable()
    input.addData(Turn("s2", 1, "user", "later still", null, ts(59)))
    q.processAllAvailable()
    q.stop()

    val streamed = spark.read.parquet(outDir)
      .where($"conv_id" === "s1")
      .select("conv_id", "segment_id", "label", "turn_idx", "text")
      .collect().map(_.mkString("|")).sorted.toSeq
    val batch = graft.extract.Pipeline.extract(convTurns.toDF())
      .select("conv_id", "segment_id", "label", "turn_idx", "text")
      .collect().map(_.mkString("|")).sorted.toSeq
    assert(batch.nonEmpty)
    assert(streamed == batch, "streamed spans differ from batch spans")
  }

  test("streaming agent audit matches the batch toolAudit on closed convs") {
    val sparkS = spark
    import sparkS.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.StreamingExtract.Turn

    // planted anomalies: a1 well-formed, a2 orphan result + dangling call
    val convTurns = Seq(
      Turn("a1", 0, "user", "find x", null, ts(0)),
      Turn("a1", 1, "assistant", "searching", "search", ts(1)),
      Turn("a1", 2, "tool", "hits", "search", ts(2)),
      Turn("a2", 0, "tool", "hits", "grep", ts(0)),
      Turn("a2", 1, "assistant", "go", "browse", ts(1)),
      Turn("a2", 2, "user", "why?", null, ts(2)))

    val outDir = java.nio.file.Files.createTempDirectory("graft-audit-out").toString
    val ckDir = java.nio.file.Files.createTempDirectory("graft-audit-ck").toString
    val input = MemoryStream[Turn]
    val q = StreamingExtract.agentAuditQuery(input.toDS(), outDir, ckDir,
      gapSeconds = 600)
    // out-of-order arrival across micro-batches
    input.addData(convTurns.filter(_.turn_idx != 1): _*)
    q.processAllAvailable()
    input.addData(convTurns.filter(_.turn_idx == 1): _*)
    q.processAllAvailable()
    input.addData(Turn("a3", 0, "user", "late", null, ts(58))) // close a1+a2
    q.processAllAvailable()
    q.stop()

    val cols = Seq("conv_id", "n_calls", "n_results", "n_orphan_results",
      "n_dangling_calls", "n_mistagged", "tool_valid")
    val streamed = spark.read.parquet(outDir)
      .where($"conv_id".isin("a1", "a2"))
      .select(cols.head, cols.tail: _*)
      .collect().map(_.mkString("|")).sorted.toSeq
    val batch = graft.ops.Agent.toolAudit(convTurns.toDF())
      .select(cols.head, cols.tail: _*)
      .collect().map(_.mkString("|")).sorted.toSeq
    assert(batch.nonEmpty)
    assert(streamed == batch, "streamed audit differs from batch audit")
  }

  test("turnRates windows with watermark") {
    val sparkS = spark
    import sparkS.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[TurnEvent]
    val q = StreamingExtract.turnRates(
      input.toDS().toDF().withColumnRenamed("conv_id", "conv_id"))
      .writeStream.format("memory").queryName("rates")
      .outputMode(OutputMode.Append).start()
    input.addData(
      TurnEvent("c1", 0, "user", "abc", ts(0)),
      TurnEvent("c1", 1, "user", "defg", ts(1)),
      TurnEvent("c1", 2, "assistant", "hi", ts(2)))
    q.processAllAvailable()
    input.addData(TurnEvent("c9", 0, "user", "x", ts(59)))
    q.processAllAvailable()
    val rows = spark.table("rates").collect()
    assert(rows.exists(r => r.getString(1) == "user" && r.getLong(2) == 2 && r.getLong(3) == 7))
    q.stop()
  }

  test("dedupDocs passes the first copy of a fingerprint and drops later ones") {
    val sparkS = spark
    import sparkS.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.StreamingExtract.DocEvent

    val input = MemoryStream[DocEvent]
    val q = StreamingExtract.dedupDocs(input.toDS().toDF(), watermark = "10 minutes")
      .writeStream.format("memory").queryName("deduped")
      .outputMode(OutputMode.Append).start()

    input.addData(
      DocEvent("d1", "Hello   World", ts(0)),
      DocEvent("d2", "unique second document", ts(1)))
    q.processAllAvailable()
    // same normalized fingerprint as d1 (case + whitespace collapse) → dropped
    input.addData(DocEvent("d3", "  hello world ", ts(2)))
    q.processAllAvailable()

    val kept = spark.table("deduped").select("doc_id").as[String].collect().toSet
    assert(kept == Set("d1", "d2"), s"expected d3 dropped, got $kept")
    q.stop()
  }

  test("mainContent is stateless: HTML strip runs inside an append stream") {
    val sparkS = spark
    import sparkS.implicits._
    implicit val sqlCtx = spark.sqlContext

    val input = MemoryStream[(Long, String)]
    val q = graft.ops.MainContent.mainContent(
        input.toDS().toDF("doc_id", "html"))
      .select("doc_id", "text_main", "n_blocks_kept")
      .writeStream.format("memory").queryName("stripped")
      .outputMode(OutputMode.Append).start()

    input.addData(
      1L -> ("<nav><a href=\"/\">Home</a> <a href=\"/x\">More</a></nav>" +
        "<p>A real paragraph with plenty of characters in it</p>"),
      2L -> "<nav><a href=\"/\">Home navigation only</a></nav>")
    q.processAllAvailable()

    val got = spark.table("stripped").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getInt(2))).toMap
    assert(got(1L) === (("A real paragraph with plenty of characters in it", 1)))
    assert(got(2L) === (("", 0)))
    q.stop()
  }

  test("C4 + Gopher curation gates are stateless: run inside an append stream") {
    val sparkS = spark
    import sparkS.implicits._
    implicit val sqlCtx = spark.sqlContext

    val input = MemoryStream[(Long, String)]
    val lf = graft.ops.C4.lineFiltered(input.toDS().toDF("doc_id", "text"))
      .selectExpr("doc_id", "text_clean AS text")
    val gated = graft.ops.Gopher.withRepetitionKeep(
        graft.ops.C4.withKeep(lf))
      .select("doc_id", "c4_keep", "gopher_rep_keep")
    val q = gated.writeStream.format("memory").queryName("curated")
      .outputMode(OutputMode.Append).start()

    val three = "First sentence is long enough. Second one follows. Third closes."
    input.addData(
      (0L, three),
      (1L, three + " A code block { appears here."),
      (2L, "dup line stays here fine.\n" * 4 + three))
    q.processAllAvailable()
    val out = spark.table("curated")
      .as[(Long, Boolean, Boolean)].collect().map(r => r._1 -> ((r._2, r._3)))
      .toMap
    assert(out(0L) === ((true, true)))
    assert(out(1L) === ((false, true)))   // brace trips C4
    assert(out(2L)._2 === false)          // dup lines trip the repetition gate
    q.stop()
  }
}
