package graft

import org.apache.spark.sql.functions._
import graft.ops.TextNorm

/** Unicode canonicalization: each rule class on planted strings. */
class TextNormSpec extends SparkSpec {
  import spark.implicits._

  private def norm(s: String): String =
    Seq(Tuple1(s)).toDF("text")
      .select(TextNorm.canonicalize(col("text")).as("n"))
      .as[String].head()

  test("smart quotes and apostrophes fold to ASCII") {
    assert(norm("“Smart” ‘quotes’ „alt“") ===
      "\"Smart\" 'quotes' \"alt\"")
  }

  test("dash family folds to hyphen; soft hyphen drops") {
    assert(norm("a–b — c−d e­f") === "a-b - c-d ef")
  }

  test("ellipsis expands; NBSP family becomes plain space") {
    assert(norm("wait… done here and　there") ===
      "wait... done here and there")
  }

  test("zero-width characters, BOM, and controls drop") {
    assert(norm("﻿ze​ro‌wi‍dth bell esc!") ===
      "zerowidth bell esc!")
  }

  test("whitespace runs collapse, newline-hugging spaces strip, outer trim") {
    assert(norm("  a \t b  \n  c\t\td  ") === "a b\nc d")
    assert(norm(null) === "")
  }

  test("withCanonical reports the removed-char count") {
    val rows = TextNorm.withCanonical(
      Seq((0L, "a​​b  c"), (1L, "clean")).toDF("doc_id", "text"))
      .select("doc_id", "text_norm", "n_chars_removed")
      .as[(Long, String, Int)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(rows(0L) === (("ab c", 3)))
    assert(rows(1L) === (("clean", 0)))
  }

  test("canonicalize plans with zero exchanges") {
    val plan = Seq((0L, "x")).toDF("doc_id", "text")
      .select(TextNorm.canonicalize(col("text")))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }
}
