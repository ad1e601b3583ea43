package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.graftbridge.bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Codegen'd kernel for the per-token digit/capitalisation classes
 * ([[graft.text.TextCols.digitClass]] / [[TextCols.capitalisation]]):
 * the expression forms run up to four `rlike` legs per token — four
 * Matcher allocations and a `toString` each — on the FSM hot path
 * (`f_capitalisation` feeds the line classifier for every token of
 * every line). This expression classifies in ONE codepoint scan and
 * returns interned label strings, zero allocation per token.
 *
 * Bit-identical by construction (differential-pinned by
 * TokCapsKernelSpec): Java regex `\p{Nd}`/`\p{Ll}`/`\p{Lu}` are the
 * Unicode general categories, i.e. `Character.getType(cp) ==`
 * DECIMAL_DIGIT_NUMBER / LOWERCASE_LETTER / UPPERCASE_LETTER per
 * codepoint (NOT `Character.isDigit/isLowerCase`, which include
 * Other_Lowercase etc.); `substring(tok, 1, 1)` is the first CODEPOINT,
 * so the INITCAP test reads the first codepoint's category. Tokens
 * containing a line terminator would change the `$` anchor semantics of
 * `^\p{Nd}+$` — such inputs (impossible for tokenizer output, which
 * strips \r\n as whitespace) and invalid UTF-8 fall back to the
 * original expression semantics via the String path. Null token yields
 * (NODIGIT, NOCAPS), exactly the when-chain's null-falsy fall-through.
 */
case class TokCaps(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_tok_caps expects STRING, got ${child.dataType.catalogString}")
  override def dataType: DataType = TokCaps.outType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_tok_caps"

  override def eval(input: InternalRow): Any =
    TokCaps.compute(child.eval(input).asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    ev.copy(code =
      code"""
         |${childGen.code}
         |InternalRow ${ev.value} = graft.functions.TokCaps$$.MODULE$$.compute(
         |  ${childGen.isNull} ? null : ${childGen.value});
       """.stripMargin, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): TokCaps =
    copy(child = newChild)
}

object TokCaps {

  val outType: StructType = StructType(Seq(
    StructField("digit_class", StringType, nullable = false),
    StructField("cap_class", StringType, nullable = false)))

  def of(tok: Column): Column =
    bridge.column(TokCaps(bridge.expression(tok)))

  // interned labels — the struct reuses these, zero allocation per token
  private val ALLDIGIT = UTF8String.fromString("ALLDIGIT")
  private val CONTAINSDIGITS = UTF8String.fromString("CONTAINSDIGITS")
  private val NODIGIT = UTF8String.fromString("NODIGIT")
  private val ALLCAP = UTF8String.fromString("ALLCAP")
  private val INITCAP = UTF8String.fromString("INITCAP")
  private val NOCAPS = UTF8String.fromString("NOCAPS")

  private def row(d: UTF8String, c: UTF8String): InternalRow =
    new GenericInternalRow(Array[Any](d, c))

  private def isLineTerm(cp: Int): Boolean =
    cp == '\n' || cp == '\r' || cp == 0x85 || cp == 0x2028 || cp == 0x2029

  def compute(tok: UTF8String): InternalRow = {
    if (tok == null) return row(NODIGIT, NOCAPS)
    if (!tok.isValid) return computeViaString(tok.toString)
    val b = tok.getBytes
    val n = b.length
    var anyNd = false
    var allNd = n > 0
    var anyLl = false
    var firstType = -1
    var i = 0
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
          case _ => (((b0 & 0x07) << 18) | ((b(i + 1) & 0x3F) << 12) |
            ((b(i + 2) & 0x3F) << 6) | (b(i + 3) & 0x3F))
        }
      }
      if (isLineTerm(cp)) return computeViaString(tok.toString)
      val t = Character.getType(cp)
      if (t == Character.DECIMAL_DIGIT_NUMBER) anyNd = true else allNd = false
      if (t == Character.LOWERCASE_LETTER) anyLl = true
      if (firstType < 0) firstType = t
      i += cpLen
    }
    val digit = if (allNd) ALLDIGIT else if (anyNd) CONTAINSDIGITS else NODIGIT
    val cap =
      if (allNd) NOCAPS
      else if (!anyLl) ALLCAP
      else if (firstType == Character.UPPERCASE_LETTER) INITCAP
      else NOCAPS
    row(digit, cap)
  }

  /** The expression-semantics fallback (invalid UTF-8 or an embedded
   * line terminator): the original regex legs, verbatim. */
  private[graft] def computeViaString(s: String): InternalRow = {
    val digit =
      if (AllDigitDollar.matcher(s).find()) ALLDIGIT
      else if (AnyDigit.matcher(s).find()) CONTAINSDIGITS
      else NODIGIT
    val cap =
      if (digit eq ALLDIGIT) NOCAPS
      else if (!AnyLower.matcher(s).find()) ALLCAP
      else if (s.nonEmpty &&
        FirstUpper.matcher(firstCodepoint(s)).find()) INITCAP
      else NOCAPS
    row(digit, cap)
  }

  private val AllDigitDollar = java.util.regex.Pattern.compile("^\\p{Nd}+$")
  private val AnyDigit = java.util.regex.Pattern.compile("\\p{Nd}")
  private val AnyLower = java.util.regex.Pattern.compile("\\p{Ll}")
  private val FirstUpper = java.util.regex.Pattern.compile("^\\p{Lu}")

  private def firstCodepoint(s: String): String =
    s.substring(0, Character.charCount(s.codePointAt(0)))
}
