package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.ops.{Dedup, LocalMinHash}
import graft.streaming.StreamingExtract
import graft.streaming.StreamingExtract.DocEvent

/** Streaming LSH near-dedup: the row-local kernel must be byte-equivalent
 * to the batch column expressions, and the streamed keep-set must equal
 * the batch verifiedEdges→keepCanonical keep-set on the planted-clone
 * corpus (arrival order = id order, star-shaped clusters). */
class StreamingNearDupSpec extends SparkSpec {

  private def docText(i: Int): String =
    (0 until 40).map(w => s"token${i}x$w word$w item${(i * 7 + w) % 13}")
      .mkString(" ")

  private def corpus: Seq[(String, String)] = {
    val originals = (0 until 10).map(i => (f"doc$i%02d", docText(i)))
    val clones = (0 until 10).map(i => (f"doc$i%02dn", docText(i) + " extra"))
    originals ++ clones
  }

  test("LocalMinHash kernels are byte-equivalent to the batch expressions") {
    val sparkS = spark
    import sparkS.implicits._
    val texts = Seq("doc one", "", "  A   b\tC  ", docText(3),
      "short words only four", docText(7) + " extra")
    val df = texts.zipWithIndex.map { case (t, i) => (s"d$i", t) }
      .toDF("doc_id", "text")

    // shingles (distinct, zero-word degenerate removed — contentShingles)
    val sparkSh = df.select(col("doc_id"),
      Dedup.contentShingles(col("text"), 5).as("sh"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toVector).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      assert(LocalMinHash.shingles(t, 5) == sparkSh(s"d$i"), s"shingles d$i")
    }
    assert(LocalMinHash.shingles("", 5).isEmpty, "empty doc has no shingles")

    // minhash signature (k = 8); a zero-shingle doc emits NO signature row
    // on the batch side and an empty signature from the local kernel
    val wide = Dedup.minhashWide(df, k = 8, n = 5).collect()
      .map(r => r.getString(0) -> (0 until 8).map(s => r.getString(1 + s)).toArray)
      .toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      val local = LocalMinHash.minhash(LocalMinHash.shingles(t, 5), 8)
      wide.get(s"d$i") match {
        case Some(sig) => assert(local.toSeq == sig.toSeq, s"minhash d$i")
        case None => assert(local.isEmpty, s"minhash d$i: batch emitted no " +
          "row, local kernel must emit the empty signature")
      }
    }

    // band buckets (rowsPerBand = 4); zero-shingle docs emit no bands
    val bks = Dedup.lshBucketsFromWide(Dedup.minhashWide(df, 8, 5), 8, 4)
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getString(2)).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      val localBands = LocalMinHash.bandBuckets(
        LocalMinHash.minhash(LocalMinHash.shingles(t, 5), 8), 4)
      assert(localBands.isEmpty == !bks.keys.exists(_._1 == s"d$i"),
        s"band presence d$i")
      localBands.foreach { case (b, bk) =>
        assert(bks((s"d$i", b)) == bk, s"bucket d$i band $b")
      }
    }

    // jaccard (exact-integer 4dp half-up) — md5'd sets give the same value
    val pair = Seq(("a", "b")).toDF("a", "b")
    val docs2 = Seq(("a", docText(3)), ("b", docText(3) + " extra"))
      .toDF("doc_id", "text")
    val sparkJ = Dedup.jaccard(docs2, pair, 5).collect().head.getDouble(3)
    def md5Set(t: String) =
      LocalMinHash.shingles(t, 5).map(LocalMinHash.md5Hex).toSet
    assert(LocalMinHash.jaccard(
      md5Set(docText(3)), md5Set(docText(3) + " extra")) == sparkJ)
  }

  test("streamed keep-set equals batch keepCanonical on planted clones; " +
      "state expires past the watermark horizon") {
    val sparkS = spark
    import sparkS.implicits._
    implicit val sqlc: org.apache.spark.sql.SQLContext = sparkS.sqlContext

    val t0 = Timestamp.valueOf("2026-01-01 10:00:00")
    def at(mins: Int) = new Timestamp(t0.getTime + mins * 60000L)

    val input = MemoryStream[DocEvent]
    val verdicts = StreamingExtract.nearDedupDocs(input.toDS(),
      k = 8, n = 5, rowsPerBand = 4, tau = 0.5, watermark = "1 hour")
    val q = verdicts.writeStream.format("memory").queryName("ndv")
      .outputMode("append").start()
    try {
      // originals arrive first (minute 0), clones second (minute 1);
      // a whitespace-only doc rides along: zero shingles → no bands → the
      // stateless no-content branch must still verdict it (kept)
      input.addData(corpus.take(10).map { case (id, tx) => DocEvent(id, tx, at(0)) }
        :+ DocEvent("doc_blank", "  \t ", at(0)))
      q.processAllAvailable()
      input.addData(corpus.drop(10).map { case (id, tx) => DocEvent(id, tx, at(1)) })
      q.processAllAvailable()

      // the conf exemption is scoped to the query's cloned session: the
      // memory sink's table lives there, and the CALLER's session keeps
      // the global-watermark safety check enabled
      assert(sparkS.conf.get(
        "spark.sql.streaming.statefulOperator.checkCorrectness.enabled",
        "true") == "true",
        "nearDedupDocs must not mutate the caller's session conf")
      val scoped = verdicts.sparkSession
      val streamed = scoped.sql("SELECT * FROM ndv").collect()
        .map(r => r.getString(0) -> r.getBoolean(2)).toMap
      assert(streamed.size == 21, "every doc gets exactly one verdict")
      val streamKeep = streamed.filter(!_._2).keys.toSet

      val docsDf = (corpus :+ ("doc_blank", "  \t ")).toDF("doc_id", "text")
      val edges = Dedup.verifiedEdges(docsDf, k = 8, rowsPerBand = 4, tau = 0.5)
      val batchKeep = Dedup.keepCanonical(docsDf, edges)
        .select("doc_id").collect().map(_.getString(0)).toSet
      assert(streamKeep == batchKeep,
        s"streamed $streamKeep != batch $batchKeep")
      assert(streamKeep ==
        ((0 until 10).map(i => f"doc$i%02d").toSet + "doc_blank"))

      // expiry: a clone of doc00 arriving 3 hours later (horizon = 1h,
      // watermark pushed past the originals) is KEPT — bucket state is
      // bounded by the horizon, cross-horizon dups are batch compaction's
      input.addData(Seq(DocEvent("late_push", "unrelated filler " * 30, at(200))))
      q.processAllAvailable()
      input.addData(Seq(DocEvent("doc00_late", docText(0), at(205))))
      q.processAllAvailable()
      val late = scoped.sql("SELECT * FROM ndv WHERE doc_id = 'doc00_late'")
        .collect()
      assert(late.length == 1 && !late.head.getBoolean(2),
        "cross-horizon duplicate must be kept (state expired)")
    } finally q.stop()
  }
}
