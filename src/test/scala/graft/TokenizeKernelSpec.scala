package graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Tokenize
import graft.text.Tok

/**
 * Differential pin for the byte-path tokenizer kernel: for every input,
 * [[Tokenize.tokenize]] (UTF-8 byte scan, zero-copy slices) must equal
 * [[Tokenize.tokenizeViaString]] (the original `toString` →
 * [[Tok.tokenize]] → `fromString` round-trip) element-for-element —
 * token bytes AND separator bytes. Exercises every delimiter character,
 * NBSP, astral codepoints, CR/LF/FF/tab runs, and random fuzz.
 */
class TokenizeKernelSpec extends AnyFunSuite {

  private def arrToPairs(a: org.apache.spark.sql.catalyst.util.ArrayData) =
    (0 until a.numElements()).map { i =>
      val r = a.getStruct(i, 2)
      (r.getUTF8String(0).toString, r.getUTF8String(1).toString)
    }

  private def assertSame(s: String): Unit = {
    val u = UTF8String.fromString(s)
    val fast = arrToPairs(Tokenize.tokenize(u))
    val slow = arrToPairs(Tokenize.tokenizeViaString(u))
    assert(fast === slow, s"input=${s.take(80)}")
  }

  test("byte path equals String path on delimiter and whitespace zoo") {
    val delims = Tok.punctDelims.toSeq
    val ws = Tok.whitespace.toSeq
    assertSame("")
    assertSame("plain words only")
    assertSame(delims.mkString)
    assertSame(ws.mkString)
    assertSame(delims.zip(ws).map { case (d, w) => s"a$d${w}b" }.mkString(" "))
    assertSame("«quoted» — text – with −dashes‐ and •bullets*")
    assertSame("tail whitespace   \t\r\n")
    assertSame(" leading nbsp and inner")
    assertSame("astral 😀pair𝔘𝔫𝔦 mixed😀.with!delims")
    assertSame("中文，测试。CJK regular")
    assertSame("price: $12.50 (50%) [a]/b\\c")
  }

  test("byte path equals String path on random fuzz") {
    val pool: Array[Char] =
      (('a' to 'z') ++ ('0' to '9') ++ Tok.punctDelims ++ Tok.whitespace ++
        Seq('é', '中', ' ', ' ', 'Σ')).toArray
    val rnd = new scala.util.Random(82220626L)
    (0 until 2000).foreach { _ =>
      val n = rnd.nextInt(60)
      val sb = new StringBuilder
      (0 until n).foreach { _ =>
        if (rnd.nextInt(20) == 0) sb.appendAll(Character.toChars(
          0x10000 + rnd.nextInt(0x1000))) // astral
        else sb.append(pool(rnd.nextInt(pool.length)))
      }
      assertSame(sb.toString)
    }
  }

  test("invalid UTF-8 takes the sanitizing String path") {
    val invalid = UTF8String.fromBytes(Array[Byte]('a', 0x80.toByte, 'b'))
    assert(!invalid.isValid)
    val fast = arrToPairs(Tokenize.tokenize(invalid))
    val slow = arrToPairs(Tokenize.tokenizeViaString(invalid))
    assert(fast === slow)
  }

  test("round-trip invariant holds on the byte path") {
    val s = "a. b «c»\t\td ! e😀f"
    val u = UTF8String.fromString(s)
    val parts = arrToPairs(Tokenize.tokenize(u))
    val rebuilt = parts.map { case (t, sep) => sep + t }.mkString + Tok.trailing(s)
    assert(rebuilt === s)
  }
}
