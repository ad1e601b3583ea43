package graft

import org.apache.spark.sql.functions._
import graft.ops.Chunker

/** Context-window chunking: exact window math, overlap coverage, and the
 * partition-exactly invariant at overlap 0. */
class ChunkerSpec extends SparkSpec {
  import spark.implicits._

  test("chunk windows and counts match hand computation") {
    // len 25, maxChars 10, overlap 4 → stride 6; starts 0,6,12,18 → 4 chunks
    val df = Seq((0L, "abcdefghijklmnopqrstuvwxy")).toDF("doc_id", "text")
    val got = Chunker.chunk(df, maxChars = 10, overlap = 4)
      .select("chunk_idx", "chunk_start", "chunk_text", "n_chunks")
      .as[(Int, Int, String, Int)].collect().sortBy(_._1)
    assert(got === Array(
      (0, 0, "abcdefghij", 4), (1, 6, "ghijklmnop", 4),
      (2, 12, "mnopqrstuv", 4), (3, 18, "stuvwxy", 4)))
  }

  test("boundary lengths: exactly maxChars is one chunk, +1 is two") {
    val df = Seq((0L, "x" * 10), (1L, "y" * 11)).toDF("doc_id", "text")
    val n = Chunker.chunk(df, maxChars = 10, overlap = 0)
      .groupBy("doc_id").count().as[(Long, Long)].collect().toMap
    assert(n(0L) === 1L)
    assert(n(1L) === 2L)
  }

  test("empty and null text emit one empty chunk") {
    val df = Seq((0L, ""), (1L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val got = Chunker.chunk(df, maxChars = 10)
      .select("doc_id", "chunk_text").as[(Long, String)].collect().toMap
    assert(got === Map(0L -> "", 1L -> ""))
  }

  test("overlap 0 partitions the text exactly; overlapped chunks agree") {
    val docs = (0L until 40L)
      .map(i => (i, ("lorem ipsum dolor sit amet " * (i.toInt + 1)).trim))
      .toDF("doc_id", "text")
    val rejoined = Chunker.chunk(docs, maxChars = 17, overlap = 0)
      .groupBy("doc_id")
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("chunk_idx"), col("chunk_text")))),
        c => c.getField("chunk_text")), "").as("r"))
      .join(docs, Seq("doc_id"))
      .where(col("r") =!= col("text")).count()
    assert(rejoined === 0L)
    // with overlap, consecutive chunks share exactly `overlap` characters
    val over = Chunker.chunk(docs, maxChars = 17, overlap = 5)
      .select("doc_id", "chunk_idx", "chunk_text")
      .as[(Long, Int, String)].collect()
      .groupBy(_._1).values
    over.foreach { cs =>
      cs.sortBy(_._2).sliding(2).foreach {
        case Array((_, _, a), (_, _, b)) if a.length == 17 =>
          assert(a.takeRight(5) === b.take(5))
        case _ => ()
      }
    }
  }
}
