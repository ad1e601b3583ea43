package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.Dedup

/** Dev scratch: stage-by-stage timing of the jaccard verification path. */
object DevJac {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[devjac] $name%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s ($n)")
    }
    (1 to 2).foreach { rep =>
      println(s"-- rep $rep")
      val sh = Dedup.spread(docs).select(col("doc_id"),
        explode(array_distinct(Dedup.shingles(col("text"), 5))).as("shingle"))
      t("sh count")(sh.count())
      val pairs = Dedup.minhashCandidates(docs, k = 8, rowsPerBand = 4)
      t("pairs count")(pairs.count())
      val common = pairs
        .join(sh.withColumnRenamed("doc_id", "a"), Seq("a"))
        .join(sh.withColumnRenamed("doc_id", "b"), Seq("b", "shingle"))
        .groupBy("a", "b").agg(count(lit(1)).as("n_common"))
      t("common count")(common.count())
      t("full jaccard")(Dedup.jaccard(docs, pairs).where(col("jaccard") >= 0.5).count())
    }
    spark.stop()
  }
}
