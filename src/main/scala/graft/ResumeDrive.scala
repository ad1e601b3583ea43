package graft
import org.apache.spark.sql.SparkSession
import graft.extract._
/** verification driver: resumable extraction over a snapshot root */
object ResumeDrive {
  def main(args: Array[String]): Unit = {
    val root = args(0)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val turns = Synthetic.transcripts(spark, 3000)
    val io = new LocalSnapshotIO(root)
    println(s"[resume] before: labeled=${io.committedSnapshot("labeled")} spans=${io.committedSnapshot("spans")}")
    val spans = Pipeline.runResumable(turns, io, sys.env.getOrElse("RUN_ID", "runA"))
    println(s"[resume] spans=${spans.count()} labeled_snap=${io.committedSnapshot("labeled")} spans_snap=${io.committedSnapshot("spans")}")
    val lin = io.read(spark, "lineage_labeled")
    println(s"[resume] lineage partitions=${lin.count()} rows=${lin.agg(org.apache.spark.sql.functions.sum("rows")).collect()(0).getLong(0)}")
    spark.stop()
  }
}
