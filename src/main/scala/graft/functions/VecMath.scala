package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.sqrt
import org.apache.spark.sql.graftbridge.bridge
import org.apache.spark.sql.types._

/**
 * Codegen'd vector kernels for the similarity/ANN hot paths.
 *
 * Catalyst evaluates higher-order functions (`zip_with` + `aggregate`)
 * interpreted — ~1 expression-tree walk PER ELEMENT — so a 64-dim dot
 * product costs ~200 µs/row inside brute-force scoring, IVF routing and
 * PQ encoding (the round-4 `sim_topk_brute` regression surface). These
 * expressions run the same fold as ONE tight JVM loop per row: a direct
 * static call from generated code at the top level, and a plain `eval`
 * call when nested inside a HOF lambda (still one loop, not a tree walk
 * per element).
 *
 * Numerics are BIT-IDENTICAL to the HOF forms they replace, so every
 * driver oracle is unaffected:
 *  - left-to-right IEEE summation from index 0 (same as `aggregate`'s
 *    fold; no pairwise/SIMD reassociation),
 *  - float elements widened to double per element (exact, same as the
 *    `cast("double")` inside the lambda),
 *  - null array, length mismatch, or null element → null (exactly the
 *    `zip_with` null-padding → null-propagating-fold semantics).
 */
abstract class VecFold extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  /** Static kernel name on [[VecMath]], interpolated into generated code. */
  protected def kernelName: String

  private def elemType(e: Expression): DataType = e.dataType match {
    case ArrayType(t, _) => t
    case t => t
  }
  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(e => e.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects two array<float|double> columns, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }
  protected def leftFloat: Boolean = elemType(left) == FloatType
  protected def rightFloat: Boolean = elemType(right) == FloatType

  protected def kernel(a: ArrayData, b: ArrayData): java.lang.Double

  override def eval(input: InternalRow): Any = {
    val a = left.eval(input)
    val b = right.eval(input)
    kernel(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val l = left.genCode(ctx)
    val r = right.genCode(ctx)
    val tmp = ctx.freshName("vecFold")
    ev.copy(code =
      code"""
         |${l.code}
         |${r.code}
         |java.lang.Double $tmp = graft.functions.VecMath.$kernelName(
         |  ${l.isNull} ? null : ${l.value},
         |  ${r.isNull} ? null : ${r.value}, $leftFloat, $rightFloat);
         |boolean ${ev.isNull} = ($tmp == null);
         |double ${ev.value} = ${ev.isNull} ? 0.0 : $tmp.doubleValue();
       """.stripMargin)
  }
}

/** Σ aᵢ·bᵢ in double (left-to-right). */
case class VecDot(left: Expression, right: Expression) extends VecFold {
  override def prettyName: String = "graft_vec_dot"
  override protected def kernelName: String = "dot"
  override protected def kernel(a: ArrayData, b: ArrayData): java.lang.Double =
    VecMath.dot(a, b, leftFloat, rightFloat)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}

/** Σ (aᵢ−bᵢ)² in double (left-to-right) — squared L2. */
case class VecDist2(left: Expression, right: Expression) extends VecFold {
  override def prettyName: String = "graft_vec_dist2"
  override protected def kernelName: String = "dist2"
  override protected def kernel(a: ArrayData, b: ArrayData): java.lang.Double =
    VecMath.dist2(a, b, leftFloat, rightFloat)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDist2 =
    copy(left = newLeft, right = newRight)
}

object VecMath {

  /** Runtime dot kernel (also called from generated code). Null on null
   * array, length mismatch, or null element — the HOF-equivalent
   * contract. */
  def dot(a: ArrayData, b: ArrayData, aF: Boolean, bF: Boolean): java.lang.Double = {
    if (a == null || b == null) return null
    val n = a.numElements()
    if (b.numElements() != n) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (aF) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bF) b.getFloat(i).toDouble else b.getDouble(i)
      s += x * y
      i += 1
    }
    java.lang.Double.valueOf(s)
  }

  /** Runtime squared-L2 kernel (also called from generated code). */
  def dist2(a: ArrayData, b: ArrayData, aF: Boolean, bF: Boolean): java.lang.Double = {
    if (a == null || b == null) return null
    val n = a.numElements()
    if (b.numElements() != n) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (aF) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bF) b.getFloat(i).toDouble else b.getDouble(i)
      val d = x - y
      s += d * d
      i += 1
    }
    java.lang.Double.valueOf(s)
  }

  /** Column API: dot product of two vector columns (works on lambda
   * variables inside HOF bodies too). */
  def dotCol(a: Column, b: Column): Column =
    bridge.column(VecDot(bridge.expression(a), bridge.expression(b)))

  /** Column API: squared L2 distance. */
  def dist2Col(a: Column, b: Column): Column =
    bridge.column(VecDist2(bridge.expression(a), bridge.expression(b)))

  /** Column API: L2 norm — sqrt of the self-dot (same fold as the HOF
   * `aggregate` norm it replaces). */
  def normCol(a: Column): Column = sqrt(dotCol(a, a))
}
