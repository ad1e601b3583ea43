package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.ops.Par

/** Bucketed-table layout ([[Par.writeBucketed]]): co-located joins and
  * conv_id windows read `HashPartitioning` straight from the scan — the
  * flagship extraction plans with ZERO exchanges over a bucketed
  * transcripts table. */
class ParSpec extends SparkSpec {

  private def exchanges(df: org.apache.spark.sql.DataFrame): Int =
    df.queryExecution.executedPlan.toString
      .linesIterator.count(_.contains("Exchange hashpartitioning"))

  private def tmp() = Files.createTempDirectory("graft-bucket").toString

  test("bucketed self-join on the bucket key plans without exchanges") {
    val sparkS = spark
    import sparkS.implicits._
    val df = (0L until 1000L).map(i => (s"conv${i % 50}", i, s"text $i"))
      .toDF("conv_id", "row_id", "text")
    Par.writeBucketed(df, "bk_a", "conv_id", 8, path = Some(tmp()))
    Par.writeBucketed(df, "bk_b", "conv_id", 8, path = Some(tmp()))
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val j = spark.table("bk_a").join(spark.table("bk_b"), "conv_id")
      assert(exchanges(j) === 0, j.queryExecution.executedPlan.toString)
      assert(j.count() === 1000L * 20) // 20 rows per conv on each side
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("flagship extraction over a bucketed transcripts table: zero exchanges") {
    val turns = graft.extract.Synthetic.transcripts(spark, 50)
    Par.writeBucketed(turns, "bk_tr", "conv_id", 8,
      sortCols = Seq("conv_id", "turn_idx"), path = Some(tmp()))
    val bucketed = spark.table("bk_tr")
    val spans = graft.extract.Pipeline.extract(bucketed)
    assert(exchanges(spans) === 0, spans.queryExecution.executedPlan.toString)
    // identical rows to the unbucketed run
    val plain = graft.extract.Pipeline.extract(turns)
    assert(spans.exceptAll(plain).union(plain.exceptAll(spans)).count() === 0L)
  }
}
