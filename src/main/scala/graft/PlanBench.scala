package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.extract.{Features, Labeler, Structure, Synthetic}
import graft.plans.BodySpans

/** Dev tool: fused-FSM span emission — custom physical operator vs the
  * mapPartitions path, same input, same upstream plan. Measured round 1
  * (60k convs, local[8], warmed): operator 4.7-5.4 s vs mapPartitions
  * 5.3-5.8 s (upstream feature computation dominates both). */
object PlanBench {
  def main(args: Array[String]): Unit = {
    val nConvs = args.headOption.map(_.toLong).getOrElse(50000L)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def feats(n: Long) = {
      val turns = Synthetic.transcripts(spark, n)
      Features.body(Structure.tokensFromLines(
        Structure.keptLines(turns)
          .select("conv_id", "turn_idx", "role", "tool", "block_idx",
            "line_in_turn", "line_idx", "line")))
        .select("conv_id", "turn_idx", "line_in_turn", "tok_idx",
          "tok", "sep_before", "line_trailing", "f_capitalisation")
    }
    def sink(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    (1 to 3).foreach { _ =>
      sink(BodySpans.spans(feats(3000)))
      sink(Labeler.bodySpansFused(feats(3000), repartitionByConv = false))
    }
    val f = feats(nConvs)
    (1 to 2).foreach { rep =>
      val tOp = time(sink(BodySpans.spans(f)))
      val tMp = time(sink(Labeler.bodySpansFused(f, repartitionByConv = false)))
      println(f"[planbench] rep$rep operator=$tOp%.2f s  mapPartitions=$tMp%.2f s")
    }
    spark.stop()
  }
}
