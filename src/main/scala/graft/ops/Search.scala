package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Full-text keyword retrieval over the corpus: BM25 scoring (the Lucene
 * `k1`/`b` variant with `idf = ln(1 + (N − df + 0.5)/(df + 0.5))`), built
 * from one postings aggregation. The retrieval complement of the embedding
 * ANN in [[Similarity]] — corpus curation uses it for targeted audits
 * ("find documents about X") and lexical quality probes.
 *
 * Scale shape: postings build is ONE (doc, term) hash aggregate over the
 * token explode (map-side combinable). Query terms are broadcast, so the
 * corpus-side postings are filtered by a broadcast semi-join BEFORE any
 * further work — document frequencies and scores aggregate only the
 * matched slice, never the full postings. Document length arrives as a
 * scan-side projection (`size(terms)`, no shuffle); corpus-level stats
 * (N, avgdl) are one tiny broadcast row. Everything is SQL-expressible
 * for the DuckDB oracle.
 */
object Search {

  /** Whitespace term split, lowercased — [[TextStats.words]]' tokenization,
   * shared with the DuckDB mirror. */
  def terms(text: Column): Column =
    filter(split(lower(trim(coalesce(text, lit("")))), "\\s+"), w => w =!= "")

  /** Postings: one row per (doc, term) with its term frequency. */
  def postings(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    docs.select(col(idCol), explode(terms(col(textCol))).as("term"))
      .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))

  /**
   * Persist the retrieval index (postings + doc lengths + corpus stats)
   * as parquet tables: build ONCE, then serve any number of query
   * batches without re-scanning the corpus ([[bm25TopKIndexed]]). The
   * three tables are exactly the frames [[bm25TopK]] derives inline.
   */
  def buildIndex(docs: DataFrame, path: String, idCol: String = "doc_id",
      textCol: String = "text"): Unit = {
    postings(docs, idCol, textCol).write.mode("overwrite")
      .parquet(s"$path/postings")
    docs.select(col(idCol), size(terms(col(textCol))).as("dl"))
      .write.mode("overwrite").parquet(s"$path/doclen")
    docs.agg(count(lit(1)).as("n_docs"),
        avg(size(terms(col(textCol)))).as("avgdl"))
      .write.mode("overwrite").parquet(s"$path/stats")
  }

  /** BM25 top-k over a persisted [[buildIndex]] — identical results to
   * [[bm25TopK]] on the indexed corpus, zero corpus scans at query time. */
  def bm25TopKIndexed(spark: org.apache.spark.sql.SparkSession, path: String,
      queries: DataFrame, k: Int = 10, k1: Double = 1.2, b: Double = 0.75,
      idCol: String = "doc_id",
      queryIdCol: String = "query_id", queryCol: String = "query"): DataFrame =
    score(spark.read.parquet(s"$path/postings"),
      spark.read.parquet(s"$path/doclen"),
      spark.read.parquet(s"$path/stats"),
      queries, k, k1, b, idCol, queryIdCol, queryCol)

  /**
   * BM25 top-k: for each query row (query_id, query) return the k best
   * documents. Scores rounded to 4dp, ties broken by doc id — fully
   * deterministic and engine-independent.
   */
  def bm25TopK(docs: DataFrame, queries: DataFrame, k: Int = 10,
      k1: Double = 1.2, b: Double = 0.75,
      idCol: String = "doc_id", textCol: String = "text",
      queryIdCol: String = "query_id", queryCol: String = "query"): DataFrame = {
    // Postings are computed ONCE behind a plan barrier, and doc length +
    // corpus stats derive FROM them: dl = Σtf per doc and total tokens =
    // Σtf — identical values to size(terms(text)) (every token occurrence
    // is counted by exactly one (doc, term) row; integer-valued double
    // sums are order-exact below 2^53), so the corpus text is scanned and
    // term-split once instead of three times. Only n_docs still touches
    // `docs` (a count — column-pruned scan, no splitting).
    val post = graft.extract.Chunked.barrier(postings(docs, idCol, textCol))
    val dl = post.groupBy(idCol).agg(sum("tf").as("dl"))
    val stats = post.agg(coalesce(sum("tf"), lit(0L)).as("_tt"))
      .crossJoin(docs.agg(count(lit(1)).as("n_docs")))
      .select(col("n_docs"),
        (col("_tt").cast("double") / col("n_docs")).as("avgdl"))
    score(post, dl, stats, queries, k, k1, b,
      idCol, queryIdCol, queryCol)
  }

  /** The scoring tail shared by the inline and indexed paths. */
  private def score(postings: DataFrame, dl: DataFrame, stats: DataFrame,
      queries: DataFrame, k: Int, k1: Double, b: Double,
      idCol: String, queryIdCol: String, queryCol: String): DataFrame = {
    val qterms = broadcast(queries.select(col(queryIdCol),
      explode(array_distinct(terms(col(queryCol)))).as("term")))

    val matched = postings
      .join(broadcast(qterms.select("term").distinct()), Seq("term"))
    // df per query term over the matched slice ((doc, term) rows are unique)
    val dfreq = matched.groupBy("term").agg(count(lit(1)).as("df"))

    val scored = matched
      .join(broadcast(dfreq), Seq("term"))
      .join(dl, Seq(idCol))
      .crossJoin(broadcast(stats))
      .join(qterms, Seq("term"))
      .withColumn("idf",
        log(lit(1.0) + (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5)))
      .withColumn("w",
        col("idf") * (col("tf") * (k1 + 1)) /
          (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * col("dl") / col("avgdl"))))
      .groupBy(col(queryIdCol), col(idCol))
      .agg(round(sum(col("w")), 4).as("score"))

    val w = Window.partitionBy(queryIdCol)
      .orderBy(col("score").desc, col(idCol))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col(queryIdCol), col(idCol), col("score"), col("rank"))
  }
}
