package graft
import org.apache.spark.sql.SparkSession
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val turns = graft.extract.Synthetic.transcripts(spark, 100)
    def dump(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val plan = df.queryExecution.executedPlan.toString
      println(s"==== $name")
      println("== exchanges: " + plan.linesIterator.count(_.contains("Exchange hashpartitioning")))
      println("== sorts: " + plan.linesIterator.count(l => l.contains("Sort [")))
      plan.linesIterator.filter(l =>
        l.contains("Exchange") || l.contains("Sort [") || l.contains("Window") ||
        l.contains("WholeStageCodegen") || l.contains("MapPartitions") ||
        l.contains("HashAggregate")).foreach(println)
    }
    dump("extract (transcript mode)", graft.extract.Pipeline.extract(turns))
    dump("extractDocuments (document mode)",
      graft.extract.Pipeline.extractDocuments(
        turns.select("conv_id", "turn_idx", "text")))
    spark.stop()
  }
}
