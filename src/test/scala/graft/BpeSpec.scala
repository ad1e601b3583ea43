package graft

import org.apache.spark.sql.functions._
import graft.ops.Bpe

/** BPE trainer/encoder: hand-computed merge sequences, lossless round-trip
 * on adversarial input, deterministic tie-breaks, physical-partitioning
 * invariance. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  // the classic BPE teaching corpus as word frequencies:
  // hug:10 pug:5 pun:12 bun:4 hugs:5
  private def classicCorpus = Seq(
    (0L, Array.fill(10)("hug").mkString(" ")),
    (1L, Array.fill(5)("pug").mkString(" ")),
    (2L, Array.fill(12)("pun").mkString(" ")),
    (3L, Array.fill(4)("bun").mkString(" ")),
    (4L, Array.fill(5)("hugs").mkString(" "))).toDF("doc_id", "text")

  test("merge sequence matches the hand computation (incl. tie-break)") {
    val wc = Bpe.wordCounts(classicCorpus, minCount = 1)
    val counts = wc.as[(String, Long)].collect().toMap
    assert(counts === Map("hug" -> 10L, "pug" -> 5L, "pun" -> 12L,
      "bun" -> 4L, "hugs" -> 5L))
    val merges = Bpe.train(wc, nMerges = 5)
    // pair counts: (u,g)=20 (p,u)=17 (u,n)=16 (h,u)=15 → ug, un, hug, pun;
    // 5th round ties (hug,s)=5 with (p,ug)=5 → lexicographically smaller
    // left wins: ("hug","s")
    assert(merges === Seq(("u", "g"), ("u", "n"), ("h", "ug"), ("p", "un"),
      ("hug", "s")))
  }

  test("greedy encode applies lowest-rank merges (hand cases)") {
    val merges = Seq(("u", "g"), ("u", "n"), ("h", "ug"), ("p", "un"),
      ("hug", "s"))
    val ranks = merges.zipWithIndex.toMap
    assert(Bpe.encodeWord("hugs", ranks) === Vector("hugs"))
    assert(Bpe.encodeWord("pugs", ranks) === Vector("p", "ug", "s"))
    assert(Bpe.encodeWord("bun", ranks) === Vector("b", "un"))
    assert(Bpe.encodeWord("punt", ranks) === Vector("pun", "t"))
    assert(Bpe.encodeWord("x", ranks) === Vector("x"))
  }

  test("train stops early when no pair repeats") {
    val wc = Seq(("ab", 1L)).toDF("word", "cnt")
    assert(Bpe.train(wc, nMerges = 10) === Seq.empty)
  }

  test("encode round-trips arbitrary text exactly (unicode, emoji, nulls)") {
    val nasty = Seq(
      (0L, "plain words here"),
      (1L, "  leading and\ttab\nnewline  trailing  "),
      (2L, "café «•» ’quote’  nbsp run"),
      (3L, "emoji 😀😀 pair 🏴 flag"),
      (4L, ""),
      (5L, null),
      (6L, "xml <&> \"specials\" 'kept'")).toDF("doc_id", "text")
    val enc = Bpe.trainAndEncode(nasty, nMerges = 50, minCount = 1)
    val bad = enc.where(
      array_join(col("tokens"), "") =!= coalesce(col("text"), lit(""))).count()
    assert(bad === 0L)
    // astral symbols never split into lone surrogates: no token starts
    // with a low surrogate or ends with a high one
    val toks = enc.select(explode(col("tokens"))).as[String].collect()
    assert(toks.forall(t => t.nonEmpty &&
      !Character.isLowSurrogate(t.head) && !Character.isHighSurrogate(t.last)))
  }

  test("zero-merge encode = code points + whitespace runs") {
    val df = Seq((0L, "ab  cd\ne"), (1L, "😀x")).toDF("doc_id", "text")
    val n = Bpe.tokenStats(Bpe.encode(df, Nil))
      .select("doc_id", "n_tokens").as[(Long, Int)].collect().toMap
    // "ab  cd\ne": 5 non-ws code points + 2 ws runs = 7
    assert(n(0L) === 7)
    // emoji is ONE symbol despite two chars, plus "x" = 2
    assert(n(1L) === 2)
  }

  test("merge artifact round-trips through parquet with rank order intact") {
    val merges = Bpe.train(Bpe.wordCounts(classicCorpus, minCount = 1), 5)
    val dir = java.nio.file.Files.createTempDirectory("bpe-merges").toString
    Bpe.saveMerges(spark, merges, s"$dir/merges")
    assert(Bpe.loadMerges(spark, s"$dir/merges") === merges)
  }

  test("encoding is invariant under physical repartitioning and memo limits") {
    val docs = classicCorpus.union(Seq((5L, "hug pugs bun punt")).toDF("doc_id", "text"))
    val merges = Bpe.train(Bpe.wordCounts(docs, minCount = 1), nMerges = 5)
    def toks(df: org.apache.spark.sql.DataFrame, memoMax: Int) =
      Bpe.encode(df, merges, memoMax = memoMax)
        .select("doc_id", "tokens").as[(Long, Seq[String])]
        .collect().sortBy(_._1).toSeq
    val a = toks(docs.coalesce(1), memoMax = 1 << 16)
    val b = toks(docs.repartition(7), memoMax = 0) // memo disabled
    assert(a === b)
    // with doc 5 in the dict the 5th merge becomes (p, ug) — counts:
    // ug 22, un 18, (h,ug) 16, (p,un) 13, then (p,ug) ties (ug,s) at 6
    assert(a.find(_._1 == 5L).get._2 ===
      Seq("hug", " ", "pug", "s", " ", "b", "un", " ", "pun", "t"))
  }
}
