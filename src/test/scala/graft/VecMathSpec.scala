package graft

import java.{lang => jl}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{Column, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.VecMath

/**
 * Pins the contract VecMath.scala claims in its scaladoc: VecDot/VecDist2
 * are BIT-IDENTICAL to the interpreted `zip_with` + `aggregate` folds they
 * replaced (left-to-right IEEE sum, per-element float→double widening,
 * null array / length mismatch / null element → null). The driver oracles
 * check this transitively on well-formed vectors only; this spec covers
 * the edges — nulls, mismatched lengths, empties, NaN/±Inf/-0.0/subnormal
 * values — and the interpreted `eval` path (kernel nested inside a HOF
 * lambda), which whole-stage codegen never exercises.
 */
class VecMathSpec extends SparkSpec {

  /** The exact HOF forms the kernels replaced (Similarity.cosine / Pq ADC
   * pre-round-5). */
  private def hofDot(x: Column, y: Column): Column =
    aggregate(zip_with(x, y, (p, q) => p.cast("double") * q.cast("double")),
      lit(0.0), (acc, v) => acc + v)
  private def hofDist2(x: Column, y: Column): Column =
    aggregate(zip_with(x, y,
        (p, q) => (p.cast("double") - q.cast("double")) *
          (p.cast("double") - q.cast("double"))),
      lit(0.0), (acc, v) => acc + v)

  /** null-safe canonical-bits comparison (NaN payloads canonicalized —
   * Spark normalizes NaN in unsafe rows; bit-identity means the same
   * IEEE value, not the same NaN payload). */
  private def sameBits(a: Any, b: Any): Boolean = (a, b) match {
    case (null, null) => true
    case (x: jl.Double, y: jl.Double) =>
      jl.Double.doubleToLongBits(x) == jl.Double.doubleToLongBits(y)
    case _ => false
  }

  private val specials = Array(
    Float.NaN, Float.PositiveInfinity, Float.NegativeInfinity,
    -0.0f, 0.0f, Float.MinPositiveValue, 1e30f, -1e30f, 1.5f)

  /** ~10% null arrays, ~8% null elements, ~15% special values, dims 0-8
   * drawn independently per side so mismatched lengths are common. */
  private def randomFloatRows(n: Int, seed: Long): Seq[Row] = {
    val rnd = new scala.util.Random(seed)
    def vec(): Seq[jl.Float] =
      if (rnd.nextInt(10) == 0) null
      else Seq.fill(rnd.nextInt(9)) {
        if (rnd.nextInt(12) == 0) null
        else if (rnd.nextInt(7) == 0) jl.Float.valueOf(specials(rnd.nextInt(specials.length)))
        else jl.Float.valueOf(rnd.nextGaussian().toFloat)
      }
    Seq.fill(n)(Row(vec(), vec()))
  }

  private def floatDf(rows: Seq[Row]) = {
    val at = ArrayType(FloatType, containsNull = true)
    spark.createDataFrame(rows.asJava, StructType(Seq(
      StructField("a", at, nullable = true),
      StructField("b", at, nullable = true))))
  }

  test("VecDot/VecDist2 bit-identical to the HOF folds on float vectors " +
      "incl. nulls, mismatched lengths, NaN/Inf/-0.0/subnormals") {
    val df = floatDf(randomFloatRows(400, seed = 11))
    val got = df.select(
      hofDot(col("a"), col("b")).as("hd"),
      VecMath.dotCol(col("a"), col("b")).as("kd"),
      hofDist2(col("a"), col("b")).as("h2"),
      VecMath.dist2Col(col("a"), col("b")).as("k2")).collect()
    assert(got.nonEmpty)
    got.zipWithIndex.foreach { case (r, i) =>
      assert(sameBits(r.get(0), r.get(1)), s"dot mismatch at row $i: ${r.get(0)} vs ${r.get(1)}")
      assert(sameBits(r.get(2), r.get(3)), s"dist2 mismatch at row $i: ${r.get(2)} vs ${r.get(3)}")
    }
    // the generator must actually have produced the edge shapes
    val flat = df.collect()
    assert(flat.exists(_.isNullAt(0)), "generator produced no null arrays")
    assert(flat.exists(r => !r.isNullAt(0) && !r.isNullAt(1) &&
      r.getSeq[jl.Float](0).length != r.getSeq[jl.Float](1).length),
      "generator produced no length mismatches")
    assert(flat.exists(r => !r.isNullAt(0) &&
      r.getSeq[jl.Float](0).contains(null)), "generator produced no null elements")
  }

  test("double-element and mixed float/double arrays match the HOF folds") {
    val rnd = new scala.util.Random(23)
    val rows = Seq.fill(150)(Row(
      if (rnd.nextInt(10) == 0) null
      else Seq.fill(rnd.nextInt(7))(
        if (rnd.nextInt(12) == 0) null else jl.Double.valueOf(rnd.nextGaussian())),
      if (rnd.nextInt(10) == 0) null
      else Seq.fill(rnd.nextInt(7))(
        if (rnd.nextInt(12) == 0) null else jl.Float.valueOf(rnd.nextGaussian().toFloat))))
    val df = spark.createDataFrame(rows.asJava, StructType(Seq(
      StructField("a", ArrayType(DoubleType, containsNull = true), nullable = true),
      StructField("b", ArrayType(FloatType, containsNull = true), nullable = true))))
    val got = df.select(
      hofDot(col("a"), col("b")).as("hd"),
      VecMath.dotCol(col("a"), col("b")).as("kd"),
      hofDist2(col("a"), col("b")).as("h2"),
      VecMath.dist2Col(col("a"), col("b")).as("k2")).collect()
    got.zipWithIndex.foreach { case (r, i) =>
      assert(sameBits(r.get(0), r.get(1)), s"mixed dot mismatch at row $i")
      assert(sameBits(r.get(2), r.get(3)), s"mixed dist2 mismatch at row $i")
    }
  }

  test("empty × empty folds to exactly 0.0 (the aggregate zero), not null") {
    val df = floatDf(Seq(Row(Seq.empty[jl.Float], Seq.empty[jl.Float])))
    val r = df.select(
      VecMath.dotCol(col("a"), col("b")),
      VecMath.dist2Col(col("a"), col("b")),
      hofDot(col("a"), col("b"))).collect().head
    assert(r.getDouble(0) == 0.0 && r.getDouble(1) == 0.0 && r.getDouble(2) == 0.0)
  }

  test("interpreted eval path (kernel inside a HOF lambda, the Pca shape) " +
      "matches the top-level codegen path") {
    val df = floatDf(randomFloatRows(120, seed = 37))
    // wrap both sides in single-element arrays and apply the kernel inside
    // transform's lambda: lambda variables force interpreted eval
    val nested = df.select(
      get(transform(array(col("a")), v => VecMath.dotCol(v, col("b"))), lit(0)).as("n"),
      VecMath.dotCol(col("a"), col("b")).as("t")).collect()
    nested.zipWithIndex.foreach { case (r, i) =>
      assert(sameBits(r.get(0), r.get(1)), s"eval/codegen divergence at row $i")
    }
  }

  test("rejects non-array and non-float/double inputs at analysis") {
    val df = spark.range(1).select(
      array(lit("x")).as("s"), array(lit(1)).as("i"), array(lit(1.0f)).as("f"))
    val e1 = intercept[Exception] {
      df.select(VecMath.dotCol(col("s"), col("f"))).collect()
    }
    assert(e1.getMessage.contains("graft_vec_dot"))
    val e2 = intercept[Exception] {
      df.select(VecMath.dist2Col(col("i"), col("f"))).collect()
    }
    assert(e2.getMessage.contains("graft_vec_dist2"))
  }
}
