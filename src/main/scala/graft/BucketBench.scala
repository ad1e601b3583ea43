package graft

/** Dev bench: flagship extraction from a PLAIN parquet transcripts table
  * vs the SAME data as a conv_id-bucketed catalog table (zero-exchange
  * plan). Reports min-of-N for both. Args: [cpus] [nConvs]. */
object BucketBench {
  def main(args: Array[String]): Unit = {
    val cpus = args.headOption.getOrElse("32")
    val nConvs = args.drop(1).headOption.map(_.toLong).getOrElse(400000L)
    Bench.pinCpus(cpus)
    val spark = Bench.mkSpark(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    val base = java.nio.file.Files.createTempDirectory("graft-bb").toString
    val turns = graft.extract.Synthetic.transcripts(spark, nConvs)
    turns.write.mode("overwrite").parquet(s"$base/plain")
    graft.ops.Par.writeBucketed(turns, "bb_tr", "conv_id",
      nBuckets = cpus.toInt, sortCols = Seq("conv_id", "turn_idx"),
      path = Some(s"$base/bucketed"))
    def run(in: org.apache.spark.sql.DataFrame): Double =
      Bench.time(graft.extract.Pipeline.extract(in)
        .write.mode("overwrite").parquet(s"$base/out"))._2
    def best(name: String, mk: () => org.apache.spark.sql.DataFrame): Double = {
      (1 to 2).foreach(_ => run(mk())) // warmup
      val t = (1 to 5).map(_ => run(mk())).min
      println(f"[bucketbench] $name%-9s min-of-5 = $t%.2f s")
      t
    }
    val plain = best("plain", () => spark.read.parquet(s"$base/plain"))
    val bucketed = best("bucketed", () => spark.table("bb_tr"))
    println(f"[bucketbench] speedup = ${plain / bucketed}%.2fx (cpus=$cpus, convs=$nConvs)")
    spark.stop()
  }
}
