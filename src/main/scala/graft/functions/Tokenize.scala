package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import graft.text.Tok

/**
 * Native Catalyst expression for the delimiter tokenizer — the engine's one
 * genuinely non-builtin scalar. A codegen'd `Expression` (not a Scala UDF):
 * `doGenCode` emits a direct static call producing Catalyst `ArrayData` of
 * `InternalRow(tok, sep)`, so rows stay inside WholeStageCodegen with no
 * UDF encoder round-trip (Scala tuples ↔ InternalRow) per token.
 *
 * Semantics are exactly [[graft.text.Tok.tokenize]] (fixture-pinned,
 * property-tested); null input yields an empty array (the UDF contract).
 */
case class Tokenize(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_tokenize expects STRING, got ${child.dataType.catalogString}")
  override def dataType: DataType = Tokenize.outType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_tokenize"

  override def eval(input: InternalRow): Any =
    Tokenize.tokenize(child.eval(input).asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val resultCode =
      code"""
         |${childGen.code}
         |org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
         |  graft.functions.Tokenize$$.MODULE$$.tokenize(
         |    ${childGen.isNull} ? null : ${childGen.value});
       """.stripMargin
    ev.copy(code = resultCode, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Tokenize =
    copy(child = newChild)
}

object Tokenize {

  /** array<struct<tok: string, sep: string>> */
  val outType: ArrayType = ArrayType(StructType(Seq(
    StructField("tok", StringType, nullable = false),
    StructField("sep", StringType, nullable = false))), containsNull = false)

  // Tok's char-class table rebuilt from its public delimiter sets: 0 =
  // regular, 1 = whitespace, 2 = stand-alone delimiter. All classed
  // codepoints are < 0x2220 (BMP), so astral codepoints — surrogate
  // PAIRS on the String path, single codepoints here — are class 0 on
  // both paths and token boundaries agree.
  private val maxClassed: Int =
    (Tok.whitespace ++ Tok.punctDelims).map(_.toInt).max
  private val charClass: Array[Byte] = {
    val t = new Array[Byte](maxClassed + 1)
    Tok.whitespace.foreach(c => t(c.toInt) = 1)
    Tok.punctDelims.foreach(c => t(c.toInt) = 2)
    t
  }

  /** Runtime kernel, called from generated code and from `eval`.
   *
   * Fast path: scan the UTF-8 BYTES directly and emit tokens/separators
   * as `fromBytes` slices over one shared array — no UTF-16 decode, no
   * per-token re-encode, no substring copies (the `toString` →
   * `Tok.tokenize` → `fromString` round-trip was the hottest frame
   * group of the flagship reduce stage). Byte-identical to the String
   * path for valid UTF-8 (same class table over decoded codepoints,
   * same state machine; TokenizeKernelSpec pins the equivalence, the
   * byte-exact fixture suites pin the pipeline); INVALID UTF-8 falls
   * back to the String path so its U+FFFD sanitization semantics are
   * preserved exactly. */
  def tokenize(u: UTF8String): ArrayData = {
    if (u == null) return new GenericArrayData(Array.empty[Any])
    if (!u.isValid) return tokenizeViaString(u)
    val b = u.getBytes
    val n = b.length
    val out = new java.util.ArrayList[Any](16 + n / 4)
    var i = 0
    var sepStart = 0
    var sepEnd = 0
    var tokStart = -1
    def slice(from: Int, until: Int): UTF8String =
      UTF8String.fromBytes(b, from, until - from)
    def flushCur(end: Int): Unit = if (tokStart >= 0) {
      out.add(InternalRow(slice(tokStart, end), slice(sepStart, sepEnd)))
      sepStart = end; sepEnd = end; tokStart = -1
    }
    while (i < n) {
      val b0 = b(i)
      var cpLen = 1
      var cp: Int = b0 & 0xFF
      if ((b0 & 0x80) != 0) {
        cpLen = UTF8String.numBytesForFirstByte(b0)
        cp = cpLen match {
          case 2 => ((b0 & 0x1F) << 6) | (b(i + 1) & 0x3F)
          case 3 => ((b0 & 0x0F) << 12) | ((b(i + 1) & 0x3F) << 6) |
            (b(i + 2) & 0x3F)
          case _ => 0x10000 // 4-byte: always astral, always class 0
        }
      }
      val cls: Byte = if (cp <= maxClassed) charClass(cp) else 0
      if (cls == 1) { // whitespace
        flushCur(i)
        sepEnd = i + cpLen
      } else if (cls == 2) { // stand-alone delimiter token
        flushCur(i)
        out.add(InternalRow(slice(i, i + cpLen), slice(sepStart, sepEnd)))
        sepStart = i + cpLen; sepEnd = i + cpLen
      } else if (tokStart < 0) tokStart = i
      i += cpLen
    }
    flushCur(n)
    new GenericArrayData(out.toArray)
  }

  /** The original String-path kernel — the invalid-UTF-8 fallback and
   * the differential-test twin (TokenizeKernelSpec). */
  private[graft] def tokenizeViaString(u: UTF8String): ArrayData = {
    val toks = Tok.tokenize(u.toString)
    val arr = new Array[Any](toks.length)
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      arr(i) = InternalRow(UTF8String.fromString(t.text), UTF8String.fromString(t.sepBefore))
      i += 1
    }
    new GenericArrayData(arr)
  }

  /** Column over an attribute name (resolved at analysis time). */
  def ofAttr(name: String): Column =
    org.apache.spark.sql.graftbridge.bridge.column(Tokenize(UnresolvedAttribute.quoted(name)))
}
