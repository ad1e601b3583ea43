package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.extract.{Pipeline, Structure}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship: full extraction pipeline (structure → features → labels →
   * spans) over the transcripts view of sf0.001 documents. */
  def entry(spark: SparkSession): DataFrame = {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    Pipeline.extract(Structure.transcriptsFromDocuments(docs))
  }

  /** One entry per implemented operator from SURVEY.md §2.
   * Populated incrementally; see Queries.scala. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Queries.all

  /** DuckDB-equivalent SQL per query (same column names — driver compares
   * hashes after sorting columns by name). */
  def oracleSql: Map[String, String] = Queries.oracles
}
