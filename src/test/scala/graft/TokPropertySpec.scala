package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.text.Tok

/** Property tests for the tokenizer (no SparkSession needed; raw scalacheck
  * Gen with a fixed seed — scalatestplus bridge is not on the classpath). */
class TokPropertySpec extends AnyFunSuite {

  private val interesting: Gen[Char] = Gen.frequency(
    (6, Gen.alphaNumChar),
    (2, Gen.oneOf(' ', '\n', '\t', '\f', '\r', ' ')),
    (2, Gen.oneOf(Tok.punctDelims.toSeq)),
    (1, Gen.oneOf('é', '中', '∑', 'ß', '€', '_', '^', '~')))

  private val texts: Gen[String] = Gen.listOf(interesting).map(_.mkString)

  private def samples(g: Gen[String], n: Int, seed: Long): Seq[String] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(seed + i)))

  private val cases = samples(texts, 500, 42L)

  test("sepBefore + text concatenation reproduces the source byte-for-byte") {
    cases.foreach { s =>
      val toks = Tok.tokenize(s)
      val rebuilt = toks.map(t => t.sepBefore + t.text).mkString + Tok.trailing(s)
      assert(rebuilt == s, s"round-trip failed for ${s.map(_.toInt)}")
    }
  }

  test("no token contains whitespace or is empty; delimiters are singletons") {
    cases.foreach { s =>
      Tok.tokenize(s).foreach { t =>
        assert(t.text.nonEmpty)
        assert(!t.text.exists(Tok.whitespace))
        if (t.text.exists(Tok.punctDelims)) assert(t.text.length == 1)
        assert(t.sepBefore.forall(Tok.whitespace))
      }
    }
  }

  test("tokenization is prefix-stable across line concatenation") {
    cases.zip(cases.reverse).foreach { case (a, b) =>
      val whole = Tok.tokenize(a + " " + b).map(_.text)
      val parts = Tok.tokenize(a).map(_.text) ++ Tok.tokenize(b).map(_.text)
      assert(whole == parts)
    }
  }
}
