package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** verification driver: file-source streaming turn rates */
object StreamDrive {
  def main(args: Array[String]): Unit = {
    val dir = "/tmp/graft-stream-in"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    def batch(minOff: Int, n: Int) =
      (0 until n).map(i => ("c" + i, i, if (i % 2 == 0) "user" else "assistant",
        "text " * 5, null.asInstanceOf[String],
        java.sql.Timestamp.valueOf(f"2026-01-01 10:${minOff + i % 3}%02d:00")))
        .toDF("conv_id", "turn_idx", "role", "text", "tool", "ts")
    new java.io.File(dir).mkdirs()
    batch(0, 40).coalesce(1).write.mode("append").parquet(dir)
    val stream = spark.readStream.schema(batch(0, 1).schema).parquet(dir)
    val q = graft.streaming.StreamingExtract.turnRates(stream)
      .writeStream.format("memory").queryName("rates").start()
    q.processAllAvailable()
    println(s"[stream] after batch1 (watermark not advanced): ${spark.table("rates").count()} finalized windows")
    batch(50, 10).coalesce(1).write.mode("append").parquet(dir) // advances event time
    q.processAllAvailable()
    batch(55, 5).coalesce(1).write.mode("append").parquet(dir)
    q.processAllAvailable()
    println("[stream] finalized windows after late batches:")
    spark.table("rates").orderBy("window", "role").collect()
      .foreach(r => println(s"[stream] $r"))
    q.stop(); spark.stop()
  }
}
