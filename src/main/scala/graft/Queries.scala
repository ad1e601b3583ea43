package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.extract.Structure

/**
 * Driver-checked operator queries (SURVEY.md §2) with DuckDB oracle SQL.
 * Column names are aligned between the Spark plan and the oracle SQL —
 * the driver sorts columns by name before hashing.
 */
object Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** Transcripts view over documents (same derivation as oracle SQL). */
  def transcripts(s: SparkSession, dir: String): DataFrame =
    Structure.transcriptsFromDocuments(t(s, dir, "documents"))

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg" -> ((s, dir) =>
      t(s, dir, "lineitem").groupBy("l_returnflag")
        .agg(sum("l_quantity").as("sum_qty"),
          count(lit(1)).as("cnt"))
        .orderBy("l_returnflag"))
  )

  val oracles: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, sum(l_quantity) AS sum_qty, count(*) AS cnt
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""
  )
}
