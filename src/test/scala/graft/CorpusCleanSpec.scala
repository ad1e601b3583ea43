package graft

import org.apache.spark.sql.functions._
import graft.ops.CorpusClean

/** Planted-case tests for cross-doc boilerplate removal, Gopher repetition
 * metrics, and PII redaction. */
class CorpusCleanSpec extends SparkSpec {

  private def docs() = {
    val sparkS = spark
    import sparkS.implicits._
    Seq(
      (0L, "unique content about spark plans\nCookie Notice: we use cookies\nmore body text"),
      (1L, "different article body here\ncookie   notice: we use cookies\nclosing paragraph"),
      (2L, "third doc real content\nCookie Notice: we use cookies"),
      (3L, "no chrome in this one\njust two content lines"),
      (4L, "Cookie Notice: we use cookies") // nothing but boilerplate
    ).toDF("doc_id", "text")
  }

  test("boilerplate census finds the shared line across normalization variants") {
    val bl = CorpusClean.boilerplateLines(docs(), minDocs = 3, minFrac = 0.5)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(bl.toSeq == Seq(("cookie notice: we use cookies", 4L, 0.8)))
  }

  test("stripBoilerplate removes census lines, keeps order, empties chrome-only docs") {
    val stripped = CorpusClean.stripBoilerplate(docs(),
      CorpusClean.boilerplateLines(docs(), minDocs = 3, minFrac = 0.5))
      .select("doc_id", "text_clean").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(stripped(0L) == "unique content about spark plans\nmore body text")
    assert(stripped(1L) == "different article body here\nclosing paragraph")
    assert(stripped(2L) == "third doc real content")
    assert(stripped(3L) == "no chrome in this one\njust two content lines")
    assert(stripped(4L) == "")
  }

  test("repetition metrics: duplicate lines and top-n-gram mass") {
    val sparkS = spark
    import sparkS.implicits._
    val d = Seq(
      (0L, "same line\nsame line\nsame line\nother line"),
      (1L, "buy now buy now buy now buy now"),
      (2L, "all words here are fully distinct tokens")
    ).toDF("doc_id", "text")
    val m = CorpusClean.repetitionMetrics(d).collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(m(0L)._1 == 0.5) // 2 distinct of 4 lines
    // "buy now" appears 4x of 7 bigrams; "now buy" 3x
    assert(m(1L)._1 == 0.0 && m(1L)._2 == 0.5714)
    // 3-grams of doc1: "buy now buy" 3x, "now buy now" 3x of 6
    assert(m(1L)._3 == 0.5)
    assert(m(2L)._2 == round6(1.0 / 6) || m(2L)._2 == 0.1667) // all distinct
  }

  private def round6(d: Double) = math.rint(d * 10000) / 10000

  test("PII redaction replaces emails, IPs, phones and counts them") {
    val sparkS = spark
    import sparkS.implicits._
    val d = Seq(
      (0L, "write to jane.doe+test@example.co.uk or visit 192.168.1.10 call 555-123-4567"),
      (1L, "no pii here at all"),
      (2L, "two mails a@b.io c@d.org and ip 10.0.0.1")
    ).toDF("doc_id", "text")
    val out = CorpusClean.redactPii(d).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(0L).getAs[Int]("n_emails") == 1 && out(0L).getAs[Int]("n_ips") == 1 &&
      out(0L).getAs[Int]("n_phones") == 1)
    assert(out(0L).getAs[String]("text_redacted") ==
      "write to <EMAIL> or visit <IP> call <PHONE>")
    assert(out(1L).getAs[String]("text_redacted") == "no pii here at all")
    assert(out(2L).getAs[Int]("n_emails") == 2 && out(2L).getAs[Int]("n_ips") == 1)
  }
}
