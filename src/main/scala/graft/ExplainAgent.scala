package graft
import org.apache.spark.sql.SparkSession

/** Scratch plan audit for the agent ops (dev main, not driver surface). */
object ExplainAgent {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def dump(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val plan = df.queryExecution.executedPlan.toString
      println(s"==== $name")
      println("== exchanges: " + plan.linesIterator.count(_.contains("Exchange hashpartitioning")))
      println("== reused: " + plan.linesIterator.count(_.contains("ReusedExchange")))
      println("== scans: " + plan.linesIterator.count(_.contains("Scan parquet")))
      plan.linesIterator.filter(l =>
        l.contains("Exchange") || l.contains("Window") ||
        l.contains("SortMergeJoin") || l.contains("BroadcastHashJoin") ||
        l.contains("HashAggregate") || l.contains("Scan parquet")).foreach(println)
    }
    val dir = "/root/testdata/sf0.01"
    dump("agent_tool_audit", Queries.all("agent_tool_audit")(spark, dir))
    dump("agent_loop_runs", Queries.all("agent_loop_runs")(spark, dir))
    dump("agent_prefix_dedup", Queries.all("agent_prefix_dedup")(spark, dir))
    dump("dedup_incremental", Queries.all("dedup_incremental")(spark, dir))
    spark.stop()
  }
}
