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
}
