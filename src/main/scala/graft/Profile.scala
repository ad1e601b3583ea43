package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.extract._

/** Dev tool: per-stage wall times of the flagship pipeline (noop sink =
  * full materialization, no column pruning shortcuts). */
object Profile {
  def main(args: Array[String]): Unit = {
    val nConvs = args.headOption.map(_.toLong).getOrElse(20000L)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def sink(df: org.apache.spark.sql.DataFrame): Long = {
      df.write.format("noop").mode("overwrite").save(); 0L
    }
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[profile] $name%-22s ${(System.nanoTime()-t0)/1e9}%8.2f s")
    }
    (1 to 2).foreach { _ => Pipeline.extract(Synthetic.transcripts(spark, 2000)).count() }
    val turns = Synthetic.transcripts(spark, nConvs)
    def lines = Structure.keptLines(turns.repartition(col("conv_id")))
    def zonedBody = Labeler.zones(Features.segmenter(lines)).where(col("zone") === "<body>")
      .select("conv_id","turn_idx","role","tool","block_idx","line_in_turn","line_idx","line")
    time("turns")        { sink(turns) }
    time("keptLines")    { sink(lines) }
    time("segFeatures")  { sink(Features.segmenter(lines)) }
    time("zoned")        { sink(Labeler.zones(Features.segmenter(lines))) }
    time("tokens(body)") { sink(Structure.tokensFromLines(zonedBody)) }
    time("bodyFeatures") { sink(Features.body(Structure.tokensFromLines(zonedBody))) }
    time("labeled(FSM)") { sink(Pipeline.labeledBodyTokens(turns)) }
    time("spans(full)")  { sink(Pipeline.extract(turns)) }
    time("tei")          { sink(Pipeline.extractTei(turns)) }
    time("spans→parquet"){ Pipeline.extract(turns).write.mode("overwrite").parquet("/tmp/graft-profile-out"); 0L }
    spark.stop()
  }
}
