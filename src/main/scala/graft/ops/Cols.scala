package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-expression helpers shared across operators. */
private[graft] object Cols {

  /**
   * Let-binding for Column expressions: evaluate `v` ONCE per row and
   * expose it to `f` as a higher-order-function lambda variable.
   *
   * Catalyst performs no common-subexpression elimination inside
   * higher-order lambdas, so `element_at(arr, i)` / `s.substr(i, n)` /
   * `slice(arr, i, n)` over a COMPUTED `arr` re-evaluates the producing
   * expression per ELEMENT — turning a tokenizing split into O(n²·len)
   * per row (measured 6-20× slowdowns at sf0.1; worse with regexes).
   * `bound` wraps the value in a single-element array and binds it
   * through `transform`, whose lambda variable IS a materialized value:
   * every use inside `f` is then an O(1) reference. Works for any type.
   */
  def bound(v: Column)(f: Column => Column): Column =
    element_at(transform(array(v), x => f(x)), 1)

  /**
   * Exact 4-decimal rounding of the integer ratio p/q (p ≥ 0, q > 0) as
   * a double: `(p·2·10⁴ + q) div (2·q)` in long arithmetic, then an
   * exact /10⁴. `round(p/q, 4)` over doubles is ENGINE-DEPENDENT when
   * the exact rational is a ten-thousandth-half: 3/160 = 0.01875
   * exactly, but its nearest double sits BELOW the half, so
   * binary-value rounding (Spark) says 0.0187 while shortest-decimal
   * rounding (DuckDB et al.) says 0.0188 — a one-ulp, one-row oracle
   * red that only appears at whatever corpus first produces such a
   * ratio (a 160-line doc with 3 repeated lines suffices). Integer
   * division of the exact rational rounds half-up bit-stably on every
   * engine, and /10⁴ is exact in binary for all 4-place values in
   * range. NULL/zero-divisor semantics match `round(p/q)`: null in →
   * null out, q = 0 → null (Spark `div` and DuckDB `//` agree).
   * Overflow-safe while p·2·10⁴ < 2⁶³ (p < 4.6·10¹⁴).
   *
   * SQL mirror fragment: `((p * 20000 + q) // (2 * q)) / 10000.0`.
   */
  def ratio4dp(p: Column, q: Column): Column = ratioDp(p, q, 4)

  /** [[ratio4dp]] at `dp` decimal places: `(p·2·10^dp + q) div (2·q)`,
    * then an exact /10^dp.
    *
    * PRECONDITION: p ≥ 0 (q > 0 guarded to null below). The half-up
    * identity holds only for non-negative numerators — Spark's `div`
    * truncates toward zero while DuckDB's `//` floors, so a NEGATIVE p
    * would silently reintroduce the cross-engine divergence this helper
    * exists to remove. Every current caller passes counts/lengths (or
    * negates first, as xent4dp does); keep it that way. */
  def ratioDp(p: Column, q: Column, dp: Int): Column = {
    import org.apache.spark.sql.graftbridge.bridge
    import org.apache.spark.sql.catalyst.expressions.IntegralDivide
    require(dp >= 0 && dp <= 9, "dp in [0, 9]")
    val scale = math.pow(10, dp).toLong
    val pl = p.cast("long"); val ql = q.cast("long")
    val div = bridge.column(IntegralDivide(
      bridge.expression(pl * lit(2L * scale) + ql),
      bridge.expression(ql * lit(2L))))
    // ANSI IntegralDivide throws on a zero divisor; the contract (like
    // DuckDB `//` and non-ANSI div) is null — guard lazily per row
    when(ql === 0, lit(null).cast("double"))
      .otherwise(div.cast("double") / lit(scale.toDouble))
  }
}
